package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.{GraftClient, GraftCollection}
import graft.catalog.Catalog
import graft.dedup.Dedup
import graft.sparse.Bm25
import graft.vector.{IvfPq, LshIndex, PqIndex, IvfIndex}

/** Round-3 regressions: ADVICE findings (index-column schema leak,
  * terminate_after on string ids, LSH dim, IVF_PQ duplicate qids,
  * catalog name traversal) + the persisted fulltext/embedding indexes
  * and the LSH-composed embedding dedup. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Double] = xs

  test("catalog rejects path-traversal names") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft-names").toString)
    intercept[IllegalArgumentException](cat.createDatabase("../escape"))
    intercept[IllegalArgumentException](cat.createDatabase("a/b"))
    cat.createDatabase("ok-name_1.x")
    intercept[IllegalArgumentException](cat.createCollection("ok-name_1.x", "bad/../../x"))
    cat.createCollection("ok-name_1.x", "c1")
    intercept[IllegalArgumentException](cat.setAlias("ok-name_1.x", "../alias", "c1"))
  }

  test("if_not_exists conveniences are idempotent") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-ine").toString)
    client.createDatabaseIfNotExists("db")
    val db = client.createDatabaseIfNotExists("db")
    db.createCollectionIfNotExists("c", Map("k" -> "v"))
    db.createCollectionIfNotExists("c")
    assert(db.collection("c").describe == Map("k" -> "v"))
  }

  test("rebuildIndex twice, then upsert with user-shaped docs (no cell leak)") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-reb").toString)
    val coll = client.createDatabase("db").createCollection("v")
    coll.upsert(Seq((1L, vec(1.0, 0.0)), (2L, vec(0.0, 1.0)), (3L, vec(0.7, 0.7)),
      (4L, vec(-1.0, 0.0))).toDF("id", "vector"))
    coll.rebuildIndex(nlist = 2)
    coll.rebuildIndex(nlist = 2) // second rebuild must not trip on a stored cell column
    // user batches never carry the internal cell column
    coll.upsert(Seq((5L, vec(0.5, -0.5)), (2L, vec(0.1, 0.9))).toDF("id", "vector"))
    assert(coll.count() == 5)
    assert(!coll.df.columns.contains("cell") || coll.df.where(col("id") === 5L).count() == 1)
    val hits = coll.search(Seq((9L, vec(1.0, 0.0))).toDF("qid", "qvec"), "qid", "qvec", limit = 2)
    assert(hits.count() == 2)
  }

  test("fulltext terminate_after works with string doc ids") {
    val docs = Seq(("docB", "spark spark join"), ("docA", "spark scan"),
      ("docC", "spark window"), ("docD", "other words")).toDF("doc_id", "text")
    val res = Bm25.fulltext(docs, "doc_id", "text", Seq("spark"), k = 10,
      terminateAfter = Some(2)).collect()
    // lowest 2 doc ids (lexicographic) containing 'spark' survive
    assert(res.map(_.getString(1)).sorted.toSeq == Seq("docA", "docB"))
  }

  test("fulltext terminate_after keeps lowest long ids deterministically") {
    val docs = Seq((30L, "spark join"), (10L, "spark scan"), (20L, "spark window"),
      (40L, "nothing here")).toDF("doc_id", "text")
    val res = Bm25.fulltext(docs, "doc_id", "text", Seq("spark"), k = 10,
      terminateAfter = Some(2)).collect()
    assert(res.map(_.getLong(1)).sorted.toSeq == Seq(10L, 20L))
  }

  test("LshIndex.ann derives dim from data and rejects a mismatched explicit dim") {
    val data = (0 until 20).map(i => (i.toLong, Seq.tabulate(8)(j =>
      math.sin(i * 8 + j).abs + 0.01))).toDF("id", "v")
    val q = Seq((0L, Seq.fill(8)(0.5))).toDF("qid", "qv")
    val res = LshIndex.ann(data, "id", "v", q, "qid", "qv", k = 3)
    assert(res.count() > 0)
    intercept[IllegalArgumentException](
      LshIndex.ann(data, "id", "v", q, "qid", "qv", k = 3, dim = 64))
  }

  test("IvfPq.search rejects duplicate query ids") {
    val data = (0 until 64).map(i => (i.toLong, Seq.tabulate(8)(j =>
      math.cos(i * 3 + j)))).toDF("id", "vector")
    val model = IvfPq.train(data, "vector", dim = 8, nlist = 2, m = 2, k = 4)
    val enc = IvfPq.encode(model, data, "id", "vector")
    val dup = Array((1L, Array.fill(8)(0.1)), (1L, Array.fill(8)(0.2)))
    intercept[IllegalArgumentException](IvfPq.search(model, enc, dup, kTop = 2, nprobe = 2))
  }

  test("embedLsh equals all-pairs embedCosine with exhaustive bands") {
    val embs = Tables.embeddingsDf(spark)
    val exact = Dedup.embedCosine(embs, "vec_id", "embedding", 0.45).collect().toSeq
    val lsh = Dedup.embedLsh(embs, "vec_id", "embedding", 0.45).collect().toSeq
    assert(lsh == exact)
    assert(exact.nonEmpty)
  }

  test("embedLsh selective bands prune candidates but keep planted near-dups") {
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    val base = Array.fill(16)(rnd.nextGaussian())
    val nearDup = base.zipWithIndex.map { case (x, i) => x + (if (i == 0) 0.01 else 0.0) }
    val rows = Seq((0L, unit(base)), (1L, unit(nearDup))) ++
      (2L until 120L).map(i => (i, unit(Array.fill(16)(rnd.nextGaussian()))))
    val embs = rows.toDF("vec_id", "embedding")
    // r=8, b=8: strong pruning, miss ~1e-3 at cos>=0.95 (deterministic seed)
    val cand = Dedup.lshCandidates(embs, "vec_id", "embedding", nBits = 64, bands = 8, seed = 42L)
    val nAll = 120L * 119L / 2L
    assert(cand.count() < nAll / 4, "selective bands must prune the candidate space")
    val pairs = Dedup.embedLsh(embs, "vec_id", "embedding", 0.95, nBits = 64, bands = 8)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
  }

  test("rebuildFulltextIndex: persisted index serves fulltext, invalidated on write") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-ft").toString)
    val db = client.createDatabase("db")
    val coll = db.createCollection("texts")
    coll.upsert(Seq(
      (1L, "spark join fast spark"), (2L, "slow scan table"),
      (3L, "spark window agg"), (4L, "join order join")).toDF("id", "text"))
    val inline = coll.fulltext(Seq("spark", "join"), k = 4).collect().toSeq
    coll.rebuildFulltextIndex()
    assert(db.listCollections().contains("texts__ft_postings"))
    val indexed = coll.fulltext(Seq("spark", "join"), k = 4).collect().toSeq
    assert(indexed == inline)
    // a mutation drops the derived index (stale results are never served)
    coll.upsert(Seq((5L, "fresh spark doc")).toDF("id", "text"))
    assert(!db.listCollections().contains("texts__ft_postings"))
    val after = coll.fulltext(Seq("spark", "join"), k = 5).collect()
    assert(after.exists(_.getLong(1) == 5L))
  }

  test("embed-at-upsert: searchByText uses the stored embedding column") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-emb").toString)
    val coll = client.createDatabase("db")
      .createCollection("docs", Map("embedding.text_field" -> "text"))
    coll.upsert(Seq((1L, "spark join fast"), (2L, "slow scan table"),
      (3L, "spark window agg"), (4L, "")).toDF("id", "text"))
    assert(coll.df.columns.contains(GraftCollection.EmbedCol))
    // zero-token doc survives the upsert with a null embedding
    assert(coll.count() == 4)
    val hits = coll.searchByText(Seq("spark join"), limit = 2).collect()
    assert(hits.length == 2 && hits.head.getLong(2) == 1L)
    // the plan reads the stored column (corpus side = parquet scan of
    // __embed, not a tokenize+hash pipeline over text)
    val plan = coll.searchByText(Seq("x"), limit = 1).queryExecution.optimizedPlan.toString
    assert(plan.contains("isnotnull(__embed"))
    assert(!plan.contains("split(text"), "corpus must not be re-tokenized per query")
    // updating the text re-derives the stored embedding
    coll.updateByIds(Seq(2L), Map("text" -> lit("spark join fast")))
    val hits2 = coll.searchByText(Seq("spark join fast"), limit = 2).collect()
    assert(hits2.map(_.getLong(2)).toSet == Set(1L, 2L))
  }
}

/** tiny fixture: sf0.001 embeddings via the shared Tables source. */
private object Tables {
  def embeddingsDf(spark: org.apache.spark.sql.SparkSession) =
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
}
