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
    // 1:1 parity surface: exists/describe/AI-database aliases
    assert(db.existsCollection("c") && !db.existsCollection("nope"))
    assert(db.describeCollection("c") == Map("k" -> "v"))
    val ai = client.createAIDatabase("aidb")
    assert(client.listDatabases().contains("aidb"))
    ai.createCollectionView("docs")
    client.dropAIDatabase("aidb")
    assert(!client.listDatabases().contains("aidb"))
  }

  test("rebuildIndex twice, then upsert with user-shaped docs (no cell leak)") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-reb").toString)
    val coll = client.createDatabase("db").createCollection("v")
    coll.upsert(Seq((1L, vec(1.0, 0.0)), (2L, vec(0.0, 1.0)), (3L, vec(0.7, 0.7)),
      (4L, vec(-1.0, 0.0))).toDF("id", "vector"))
    coll.rebuildIndex(nlist = 2)
    coll.rebuildIndex(nlist = 2) // second rebuild must not trip on a stored cell column
    assert(coll.describe("index.ivf.nlist") == "2")
    // nprobe search serves from the persisted centroids + cell layout;
    // nprobe = nlist is exhaustive, so it equals the exact scan IN THE
    // INDEX'S STORED METRIC (l2, the rebuildIndex default — the r10
    // rule: index-served routes rank in index.ivf.metric, Round10Spec)
    val q = Seq((9L, vec(1.0, 0.0))).toDF("qid", "qvec")
    val exact = coll.search(q, "qid", "qvec", metric = "l2", limit = 3).collect().toSeq
    val ivf = coll.search(q, "qid", "qvec", limit = 3, nprobe = Some(2)).collect().toSeq
    assert(ivf == exact)
    val pruned = coll.search(q, "qid", "qvec", limit = 3, nprobe = Some(1)).collect()
    assert(pruned.nonEmpty && pruned.length <= 3)
    // user batches never carry the internal cell column
    coll.upsert(Seq((5L, vec(0.5, -0.5)), (2L, vec(0.1, 0.9))).toDF("id", "vector"))
    assert(coll.count() == 5)
    // the index survives the upsert (incremental assignment to the
    // stored centroids) and nprobe search keeps serving
    val hits = coll.search(Seq((9L, vec(1.0, 0.0))).toDF("qid", "qvec"), "qid", "qvec",
      limit = 2, nprobe = Some(2))
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

  test("multimodal resize + frame sampling are deterministic and fan out per frame") {
    import graft.multimodal.Multimodal
    val docs = Seq((1L, "x" * 400, "img"), (2L, "y" * 100, "img")).toDF("doc_id", "text", "source")
    val media = Multimodal.pack(docs, "doc_id", "text", "source")
    val resized = Multimodal.resize(media, 320, 180).collect()
    assert(resized.forall(m => m.width == 320 && m.height == 180))
    // stride shrinks the payload deterministically
    assert(resized.find(_.doc_id == 1L).get.payload.length < 400)
    val frames = Multimodal.frameSample(media, frameBytes = 64, everyN = 2, maxFrames = 3)
      .collect()
    // doc 1: 400/64 = 6 frames -> sampled 0,2,4; doc 2: 100/64 = 1 frame -> 0
    assert(frames.filter(_.doc_id == 1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.filter(_.doc_id == 2L).map(_.frame_idx).toSeq == Seq(0))
    // identical byte content -> identical checksums (deterministic stub)
    val cks = frames.filter(_.doc_id == 1L).map(_.checksum).distinct
    assert(cks.length == 1) // all-'x' payload: every frame identical
  }

  test("ngramJaccard hot-gram cutoff bounds fanout, keeps rare-gram near-dups") {
    // 2 near-identical docs + 30 docs sharing one boilerplate shingle
    val boiler = "terms of service apply"
    val docs = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta")) ++
      (10L until 40L).map(i => (i, s"doc$i unique$i words$i $boiler"))).toDF("doc_id", "text")
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5,
      maxDf = Some(5L))
    // the true near-dup pair (rare grams) survives the cutoff
    assert(capped.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .contains((1L, 2L)))
    // boilerplate-only pairs can only shrink the result, never grow it
    assert(capped.count() <= exact.count())
  }

  test("LSH paths return empty results on empty input (no dim-derivation crash)") {
    val emptyV = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL("vec_id BIGINT, embedding ARRAY<DOUBLE>"))
    assert(Dedup.embedLsh(emptyV, "vec_id", "embedding", 0.5).isEmpty)
    val data = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "v")
    assert(LshIndex.ann(data, "id", "v",
      emptyV.select(col("vec_id").as("qid"), col("embedding").as("qv")),
      "qid", "qv", k = 3).isEmpty)
  }

  test("embedLsh equals all-pairs embedCosine with exhaustive bands") {
    val embs = Tables.embeddingsDf(spark)
    val exact = Dedup.embedCosineAllPairs(embs, "vec_id", "embedding", 0.45).collect().toSeq
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

  test("rebuildFulltextIndex: persisted index serves fulltext, stays live across upsert") {
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
    // an upsert is merged into the LIVE index (round-4 incremental
    // maintenance): the batch's postings land as a new segment and the
    // stats refresh — no drop, no full rebuild, results identical to one
    coll.upsert(Seq((5L, "fresh spark doc")).toDF("id", "text"))
    assert(db.listCollections().contains("texts__ft_postings"))
    val after = coll.fulltext(Seq("spark", "join"), k = 5).collect().toSeq
    assert(after.exists(_.getLong(1) == 5L))
    coll.rebuildFulltextIndex()
    val rebuilt = coll.fulltext(Seq("spark", "join"), k = 5).collect().toSeq
    assert(after == rebuilt, "incremental index must equal a from-scratch rebuild")
  }

  test("addIndex partitions the layout so filters prune; dropIndex restores; schema survives") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-sidx").toString)
    val coll = client.createDatabase("db").createCollection("docs")
    coll.upsert((1L to 40L).map(i => (i, s"tag${i % 4}", i * 10)).toDF("id", "tag", "score"))
    coll.addIndex("tag")
    assert(coll.describe("index.partitioned") == "tag")
    // numeric columns keep their written types through the partitioned round-trip
    assert(coll.df.schema("score").dataType.typeName == "long")
    assert(coll.df.columns.toSeq == Seq("id", "tag", "score"))
    val q = coll.query(filter = """tag = "tag1"""")
    assert(q.count() == 10)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") && physical.contains("tag1"),
      s"expected a partition-pruned scan, got:\n$physical")
    // mutations preserve the indexed layout (describe stays truthful)
    coll.upsert(Seq((41L, "tag1", 999L)).toDF("id", "tag", "score"))
    val q2 = coll.query(filter = """tag = "tag1"""")
    assert(q2.count() == 11)
    assert(q2.queryExecution.executedPlan.toString.contains("PartitionFilters"),
      "scalar index layout must survive an upsert")
    // a second scalar index on a numeric field: partition pruning still applies
    coll.addIndex("score")
    assert(coll.query(filter = "score > 350").count() == 6) // 360..400 + the upserted 999
    assert(coll.df.schema("score").dataType.typeName == "long")
    coll.dropIndex("tag")
    coll.dropIndex("score")
    assert(!coll.describe.contains("index.partitioned"))
    assert(coll.count() == 41)
  }

  test("addIndex sorted mode range-clusters without directory partitions") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-sortidx").toString)
    val coll = client.createDatabase("db").createCollection("docs")
    coll.upsert((1L to 100L).map(i => (i, i * 3 % 97)).toDF("id", "v"))
    coll.addIndex("v", partitioned = false)
    assert(coll.describe("index.sorted") == "v")
    assert(coll.query(filter = "v > 90").count() ==
      (1L to 100L).count(i => i * 3 % 97 > 90))
  }

  test("rebuildIndex on a bucketed collection keeps the bucket layout") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-bktivf").toString)
    val coll = client.createDatabase("db")
      .createCollection("v", Map("buckets" -> "4"))
    coll.upsert((0L until 40L).map(i =>
      (i, Seq(math.cos(i * 0.7), math.sin(i * 0.7)))).toDF("id", "vector"))
    coll.rebuildIndex(nlist = 2)
    val q = Seq((0L, Seq(1.0, 0.0))).toDF("qid", "qvec")
    // nprobe search serves from the cell column (no directory partitioning)
    val ivf = coll.search(q, "qid", "qvec", metric = "l2", limit = 3, nprobe = Some(2))
      .collect().toSeq
    val exact = coll.search(q, "qid", "qvec", metric = "l2", limit = 3).collect().toSeq
    assert(ivf == exact)
    // upsert after rebuild still takes the pruned merge path (bucket
    // layout intact) and the index stays LIVE: the batch is assigned to
    // the existing centroids, so nprobe search keeps serving (round-4
    // incremental maintenance; previously the upsert invalidated it)
    coll.upsert(Seq((100L, Seq(0.5, 0.5))).toDF("id", "vector"))
    assert(coll.count() == 41)
    assert(coll.describe.contains("index.ivf.nlist"))
    val after = coll.search(q, "qid", "qvec", metric = "l2", limit = 3, nprobe = Some(2))
      .collect().toSeq
    val exactAfter = coll.search(q, "qid", "qvec", metric = "l2", limit = 3).collect().toSeq
    assert(after == exactAfter)
  }

  test("existsCollection resolves aliases") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-alias").toString)
    val db = client.createDatabase("db")
    db.createCollection("real")
    db.setAlias("nick", "real")
    assert(db.existsCollection("nick") && db.existsCollection("real"))
    assert(!db.existsCollection("ghost"))
  }

  test("bucketed collection: upsert rewrites only touched buckets, last-wins intact") {
    import java.nio.file.{Files => JFiles, Path, Paths}
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft-bkt").toString
    val client = new GraftClient(spark, root)
    val coll = client.createDatabase("db").createCollection("docs", Map("buckets" -> "8"))
    coll.upsert((1L to 200L).map(i => (i, s"v$i")).toDF("id", "payload"))
    assert(coll.count() == 200)
    assert(!coll.df.columns.contains("__bucket"), "bucket column must stay internal")

    def partFiles(): Map[String, Long] = {
      val data = Paths.get(root, "db", "docs", "data")
      val s = JFiles.walk(data)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> JFiles.getLastModifiedTime(p).toMillis).toMap
      finally s.close()
    }
    val before = partFiles()
    Thread.sleep(20)
    // update two existing ids + one new — touches at most 3 of 8 buckets
    coll.upsert(Seq((5L, "five"), (6L, "six"), (1000L, "new")).toDF("id", "payload"))
    val after = partFiles()
    assert(coll.count() == 201)
    assert(coll.queryByIds(Seq(5L)).head().getString(1) == "five")
    assert(coll.queryByIds(Seq(17L)).head().getString(1) == "v17")
    // untouched buckets keep their exact files; at most 3 bucket dirs
    // (the buckets of ids 5, 6, 1000) may differ
    val untouchedSurvivors = before.keySet.intersect(after.keySet)
      .filter(k => before(k) == after(k))
    assert(untouchedSurvivors.nonEmpty, "some bucket files must survive the upsert untouched")
    def bucketOf(p: String): String =
      Paths.get(p).getParent.getFileName.toString
    val changedBuckets = (after.keySet ++ before.keySet)
      .filter(k => before.get(k) != after.get(k)).map(bucketOf)
    assert(changedBuckets.size <= 3,
      s"upsert of 3 ids must rewrite at most 3 buckets, touched: $changedBuckets")
    // delete preserves the bucketed layout, so the next upsert still prunes
    coll.deleteByIds(Seq(6L))
    assert(coll.count() == 200)
    coll.upsert(Seq((7L, "seven")).toDF("id", "payload"))
    assert(coll.queryByIds(Seq(7L)).head().getString(1) == "seven")
    assert(coll.count() == 200) // id 7 existed: replaced, not added
  }

  test("a user document field named 'cell' survives reads, mutations, and rebuilds") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cellcol").toString)
    val coll = client.createDatabase("db").createCollection("v")
    coll.upsert(Seq((1L, Seq(1.0, 0.0), "A1", Seq(9.0)), (2L, Seq(0.0, 1.0), "B2", Seq(8.0)))
      .toDF("id", "vector", "cell", "features"))
    assert(coll.df.columns.contains("cell"))
    coll.rebuildIndex(nlist = 2) // internal columns are __cell/__graft_features
    assert(coll.df.columns.contains("cell"))
    // user 'features' field data survives the MLlib pipeline
    assert(coll.queryByIds(Seq(1L)).head().getSeq[Double](3) == Seq(9.0))
    assert(coll.queryByIds(Seq(1L)).head().getString(2) == "A1")
    coll.updateByIds(Seq(2L), Map("cell" -> lit("B9")))
    assert(coll.queryByIds(Seq(2L)).head().getString(2) == "B9")
    assert(coll.df.columns.count(_ == "cell") == 1)
  }

  test("PQ index persists: a fresh client serves searchPq without retraining") {
    val root = Files.createTempDirectory("graft-pq").toString
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val builderClient = new GraftClient(spark, root)
    val collA = builderClient.createDatabase("db").createCollection("v")
    collA.upsert(rows.toDF("id", "vector"))
    collA.rebuildPqIndex(m = 4, k = 16)
    // brand-new client: model comes from the persisted codebooks
    val coll2 = new GraftClient(spark, root).database("db").collection("v")
    assert(coll2.describe("index.pq.m") == "4")
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    // candMult covering the whole corpus makes the rerank exhaustive ->
    // equals the exact L2 top-k
    val pq = coll2.searchPq(q, "qid", "qvec", limit = 5, candMult = 40).collect().toSeq
    val exact = coll2.search(q, "qid", "qvec", metric = "l2", limit = 5).collect().toSeq
    assert(pq == exact)
    assert(pq.head.getLong(2) == 7L) // self is the nearest neighbor
    // upsert AND delete keep the index LIVE (round-4 incremental
    // maintenance); truncate invalidates
    coll2.upsert(Seq((999L, Seq.fill(16)(0.0))).toDF("id", "vector"))
    assert(coll2.describe.contains("index.pq.m"))
    assert(coll2.searchPq(q, "qid", "qvec", limit = 5, candMult = 40)
      .collect().head.getLong(2) == 7L)
    coll2.deleteByIds(Seq(999L))
    assert(coll2.describe.contains("index.pq.m"))
    assert(coll2.searchPq(q, "qid", "qvec", limit = 5, candMult = 40)
      .collect().head.getLong(2) == 7L)
    coll2.truncate()
    assert(!coll2.describe.contains("index.pq.m"))
    intercept[IllegalArgumentException](coll2.searchPq(q, "qid", "qvec"))
  }

  test("LSH index persists: fresh-client banded ANN equals the inline path") {
    val root = Files.createTempDirectory("graft-lshidx").toString
    val rnd = new scala.util.Random(31)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 150L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val builder = new GraftClient(spark, root)
    val collA = builder.createDatabase("db").createCollection("v")
    collA.upsert(rows.toDF("id", "vector"))
    collA.rebuildLshIndex(nBits = 16, bands = 4)
    val coll2 = new GraftClient(spark, root).database("db").collection("v")
    val q = Seq((0L, rows(9)._2)).toDF("qid", "qvec")
    val served = coll2.searchLsh(q, "qid", "qvec", limit = 5).collect().toSeq
    val inline = LshIndex.ann(coll2.df, "id", "vector", q, "qid", "qvec",
      k = 5, nBits = 16, bands = 4).collect().toSeq
    assert(served == inline && served.head.getLong(2) == 9L)
    // delete keeps the LSH index live (tombstone masking, round 4);
    // the deleted doc stops serving
    coll2.deleteByIds(Seq(9L))
    assert(coll2.describe.contains("index.lsh.nbits"))
    assert(!coll2.searchLsh(q, "qid", "qvec", limit = 5).collect()
      .exists(_.getLong(2) == 9L))
  }

  test("IVF_PQ index persists: a fresh client probes cells and scans codes") {
    val root = Files.createTempDirectory("graft-ivfpq").toString
    val rnd = new scala.util.Random(23)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val builder = new GraftClient(spark, root)
    val collA = builder.createDatabase("db").createCollection("v")
    collA.upsert(rows.toDF("id", "vector"))
    collA.rebuildIvfPqIndex(nlist = 4, m = 4, k = 16)
    // fresh client: centroids + codebooks + codes all come from disk
    val coll2 = new GraftClient(spark, root).database("db").collection("v")
    assert(coll2.describe("index.ivfpq.nlist") == "4")
    val q = Seq((0L, rows(42)._2)).toDF("qid", "qvec")
    val full = coll2.searchIvfPq(q, "qid", "qvec", limit = 10, nprobe = 4).collect()
    assert(full.length == 10 && full.head.getLong(2) == 42L) // ADC finds self first
    val pruned = coll2.searchIvfPq(q, "qid", "qvec", limit = 10, nprobe = 1).collect()
    assert(pruned.nonEmpty && pruned.map(_.getLong(2)).toSet.subsetOf(
      full.map(_.getLong(2)).toSet ++ pruned.map(_.getLong(2))))
    // delete keeps the composed index live (tombstone masking); the
    // deleted doc stops serving; truncate invalidates
    coll2.deleteByIds(Seq(42L))
    assert(coll2.describe.contains("index.ivfpq.nlist"))
    assert(!coll2.searchIvfPq(q, "qid", "qvec", limit = 10, nprobe = 4).collect()
      .exists(_.getLong(2) == 42L))
    coll2.truncate()
    assert(!coll2.describe.contains("index.ivfpq.nlist"))
    intercept[IllegalArgumentException](coll2.searchIvfPq(q, "qid", "qvec"))
  }

  test("stored sparse_vector field: dot-product search with filter") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-sv").toString)
    val coll = client.createDatabase("db").createCollection("docs")
    def sv(pairs: (String, Double)*): Seq[(String, Double)] = pairs
    coll.upsert(Seq(
      (1L, "a", sv("spark" -> 0.5, "join" -> 0.3)),
      (2L, "b", sv("spark" -> 0.9)),
      (3L, "a", sv("scan" -> 1.0, "join" -> 0.1)),
      (4L, "a", sv("other" -> 9.9))
    ).toDF("id", "tag", "sv0")
      .select(col("id"), col("tag"),
        expr("transform(sv0, e -> struct(e._1 AS term, e._2 AS weight))")
          .as("sparse_vector")))
    val hits = coll.fulltextSearchSparse(Seq("spark" -> 1.0, "join" -> 2.0), limit = 3)
      .collect()
    // scores: d1 = .5 + .6 = 1.1, d2 = .9, d3 = .2; d4 no overlap
    assert(hits.map(r => (r.getLong(1), r.getDouble(2))).toSeq ==
      Seq((1L, 1.1), (2L, 0.9), (3L, 0.2)))
    val filtered = coll.fulltextSearchSparse(Seq("spark" -> 1.0, "join" -> 2.0),
      limit = 3, filter = """tag = "a"""").collect()
    assert(filtered.map(_.getLong(1)).toSeq == Seq(1L, 3L))

    // indexed serving tier: bit-identical results (plain + filtered)
    // from the inverted postings artifact instead of a corpus scan
    coll.rebuildSparseVectorIndex()
    assert(coll.describe("index.sv.field") == "sparse_vector")
    val idxHits = coll.fulltextSearchSparse(Seq("spark" -> 1.0, "join" -> 2.0),
      limit = 3).collect()
    assert(idxHits.map(r => (r.getLong(1), r.getDouble(2))).toSeq ==
      hits.map(r => (r.getLong(1), r.getDouble(2))).toSeq)
    val idxFiltered = coll.fulltextSearchSparse(Seq("spark" -> 1.0, "join" -> 2.0),
      limit = 3, filter = """tag = "a"""").collect()
    assert(idxFiltered.map(_.getLong(1)).toSeq == Seq(1L, 3L))

    // maintenance: an upsert appends a postings segment (replace doc 2
    // with a dominant join weight, add doc 5) and the ledger masks the
    // replaced doc's old postings
    coll.upsert(Seq(
      (2L, "b", sv("join" -> 5.0)),
      (5L, "a", sv("spark" -> 2.0))
    ).toDF("id", "tag", "sv0")
      .select(col("id"), col("tag"),
        expr("transform(sv0, e -> struct(e._1 AS term, e._2 AS weight))")
          .as("sparse_vector")))
    assert(coll.describe.contains("index.sv.field"),
      "upsert must keep the sparse-vector index live")
    val after = coll.fulltextSearchSparse(Seq("spark" -> 1.0, "join" -> 2.0),
      limit = 4).collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // d2 = 10.0 (new), d5 = 2.0, d1 = 1.1, d3 = 0.2; d2's old 0.9 gone
    assert(after == Seq((2L, 10.0), (5L, 2.0), (1L, 1.1), (3L, 0.2)))
    // compaction folds segments without changing results
    coll.compactIndexes()
    val compacted = coll.fulltextSearchSparse(Seq("spark" -> 1.0, "join" -> 2.0),
      limit = 4).collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(compacted == after)
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
