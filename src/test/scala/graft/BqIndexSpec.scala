package graft

import org.apache.spark.sql.functions._

import graft.vector.{BqIndex, KnnSearch}

/** Binary quantization: bit packing (incl. multi-word + pad bits),
  * integer-exact Hamming ranking vs a per-dimension sign-compare
  * reference, the full-coverage rerank ≡ exact-KNN certificate, model
  * persistence round-trip, and the ragged-input guard. */
class BqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val qDf = embs.where(col("vec_id") < 6)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val qLocal = qDf
    .select(col("qid"), col("qvec").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  test("train fails fast on ragged vectors; thresholds are per-dim means") {
    val ragged = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(1.0, 2.0))).toDF("id", "v")
    val err = intercept[IllegalArgumentException] { BqIndex.train(ragged, "v") }
    assert(err.getMessage.contains("ragged"))
    val ok = Seq((1L, Seq(0.0, 10.0)), (2L, Seq(2.0, 20.0))).toDF("id", "v")
    val m = BqIndex.train(ok, "v")
    assert(m.dim == 2 && m.thr.toSeq == Seq(1.0, 15.0))
  }

  test("packing: strict >, multi-word layout, pad bits zero") {
    // dim 70 -> 2 words; thresholds 0 everywhere
    val dim = 70
    val v = Array.tabulate(dim)(i => if (i == 0 || i == 63 || i == 69) 1.0 else -1.0)
    val at = Array.tabulate(dim)(i => if (i == 5) 0.0 else -1.0) // ==thr -> bit 0
    val docs = Seq((1L, v.toSeq), (2L, at.toSeq)).toDF("id", "v")
    val model = BqIndex.Model(dim, new Array[Double](dim))
    val enc = BqIndex.encode(model, docs, "id", "v")
      .orderBy("id").as[(Long, Array[Long])].collect()
    assert(enc(0)._2.length == 2)
    assert(enc(0)._2(0) == ((1L << 0) | (1L << 63)))
    assert(enc(0)._2(1) == (1L << 5)) // bit 69 = word 1, offset 5
    // value exactly AT the threshold quantizes to 0 (strict >); word 1
    // of a doc with no high bits is 0 — pad bits (70..127) never set
    assert(enc(1)._2.toSeq == Seq(0L, 0L))
  }

  test("Hamming ranking equals the per-dimension sign-compare reference") {
    val model = BqIndex.train(embs, "embedding")
    assert(model.dim == 64 && model.words == 1)
    val enc = BqIndex.encode(model, embs, "vec_id", "embedding").cache()
    val got = BqIndex.search(model, enc, qLocal, k = 10)
      .as[(Long, Int, Long, Double)].collect().toSeq

    // reference: count sign disagreements dimension-by-dimension
    val corpus = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val want = qLocal.flatMap { case (qid, qv) =>
      corpus.map { case (id, v) =>
        val h = (0 until model.dim).count(i =>
          (v(i) > model.thr(i)) != (qv(i) > model.thr(i)))
        (qid, h, id)
      }.sortBy { case (_, h, id) => (h, id) }.take(10).zipWithIndex
        .map { case ((q, h, id), r) => (q, r + 1, id, h.toDouble) }
    }.toSeq
    assert(got == want)
  }

  test("rerank with full shortlist coverage equals exact cosine KNN") {
    val model = BqIndex.train(embs, "embedding")
    val enc = BqIndex.encode(model, embs, "vec_id", "embedding")
    val n = embs.count().toInt
    val got = BqIndex.searchRerank(model, enc, embs, "vec_id", "embedding",
      qLocal, k = 10, candMult = n / 10 + 1)
    val want = KnnSearch.topK(embs, "vec_id", "embedding", qDf, "qid", "qvec",
      "cosine", k = 10)
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("model persists and round-trips bit-exactly") {
    val model = BqIndex.train(embs, "embedding")
    val back = BqIndex.modelFromDf(
      BqIndex.thresholdsDf(model, spark), model.dim)
    assert(back.thr.toSeq == model.thr.toSeq)
  }

  test("client BQ lifecycle: persists, stays live across upsert, compacts") {
    import graft.api.GraftClient
    val root = java.nio.file.Files.createTempDirectory("graft-bqinc").toString
    val rnd = new scala.util.Random(41)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildBqIndex()
    assert(coll.describe("index.bq.metric") == "cosine")

    // new doc carrying doc 7's vector + replace doc 42 with a far one
    val moved: Seq[Double] = Seq.fill(16)(rnd.nextGaussian())
    coll.upsert(Seq((500L, rows(7)._2), (42L, moved)).toDF("id", "vector"))
    assert(coll.describe.contains("index.bq.dim"),
      "upsert must keep the BQ index live")

    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    val hits = coll.searchBq(q, "qid", "qvec", limit = 5).collect()
    val ids = hits.map(_.getLong(2)).toSet
    assert(ids.contains(500L) && ids.contains(7L),
      s"both copies of the query vector must be found, got $ids")

    // incremental segments serve the SAME results as a fresh rebuild
    // at a corpus-covering shortlist (the rerank is exact both ways)
    val n = 301
    val live = coll.searchBq(q, "qid", "qvec", limit = 5, candMult = (n + 4) / 5)
      .collect().toSeq
    // compaction folds the mutation segments without changing results
    coll.compactIndexes()
    val compacted = coll.searchBq(q, "qid", "qvec", limit = 5, candMult = (n + 4) / 5)
      .collect().toSeq
    assert(compacted == live)
    coll.rebuildBqIndex()
    val rebuilt = coll.searchBq(q, "qid", "qvec", limit = 5, candMult = (n + 4) / 5)
      .collect().toSeq
    assert(live.map(_.getLong(2)) == rebuilt.map(_.getLong(2)))
  }

  test("searchRadius: the Hamming-gated ranking is exact at any width — no ladder needed") {
    val model = BqIndex.train(embs, "embedding")
    val enc = BqIndex.encode(model, embs, "vec_id", "embedding")
    val n = embs.count().toInt
    // reference: gate + re-rank the FULL integer Hamming ranking
    val full = BqIndex.search(model, enc, qLocal, k = n)
      .collect().map(r => (r.getLong(0), r.getDouble(3), r.getLong(2)))
    val limit = 15
    val expect = full.filter(_._2 <= 24.0).groupBy(_._1).toSeq
      .flatMap { case (_, rs) =>
        rs.sortBy(t => (t._2, t._3)).take(limit).zipWithIndex
          .map { case ((qq, s, id), i) => (qq, i + 1, id, s) }
      }.sortBy(t => (t._1, t._2))
    val got = BqIndex.searchRadius(model, enc, qLocal, radius = 24, k = limit)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect,
      "one bounded-heap scan must equal the gated full ranking exactly")
    // radius 0: each corpus-member query finds (at least) itself at
    // distance 0; every returned row IS at distance 0
    val self = BqIndex.searchRadius(model, enc, qLocal, radius = 0, k = n)
      .collect()
    assert(self.forall(_.getDouble(3) == 0.0))
    assert(qLocal.map(_._1).toSet.subsetOf(
      self.filter(r => r.getLong(0) == r.getLong(2)).map(_.getLong(0)).toSet))
  }

  test("client searchBqRadius/searchBqFiltered: exact among eligible; filter pre-joins codes") {
    import graft.api.GraftClient
    val root = java.nio.file.Files.createTempDirectory("graft-bqrad").toString
    val rnd = new scala.util.Random(43)
    val rows: Seq[(Long, Seq[Double], Long)] =
      (0L until 240L).map(i => (i, Seq.fill(16)(rnd.nextGaussian()), i % 3))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector", "tag"))
    val q = Seq((0L, rows(5)._2), (1L, rows(100)._2)).toDF("qid", "qvec")
    // routes require the index
    intercept[IllegalArgumentException] {
      coll.searchBqRadius(q, "qid", "qvec", radius = 4)
    }
    coll.rebuildBqIndex()
    val n = 240
    // filtered top-k at corpus-covering candMult ≡ the FLAT filtered
    // cosine scan (exact among eligible at any selectivity)
    val flat = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      filter = "tag = 1").collect().toSeq
    val bqf = coll.searchBqFiltered(q, "qid", "qvec", "tag = 1", limit = 5,
      candMult = n).collect().toSeq
    assert(bqf == flat, "corpus-covering filtered BQ must equal exact filtered KNN")
    // radius = dim covers every eligible code: exactly the tag-1 rows
    val ball = coll.searchBqRadius(q, "qid", "qvec", radius = 16, limit = n,
      filter = "tag = 1").collect()
    assert(ball.length == 2 * rows.count(_._3 == 1L))
    assert(ball.forall(r => r.getLong(2) % 3 == 1L),
      "every radius hit must satisfy the pre-join filter")
    // radius 0 finds the query's own row (q 0 = doc 5's vector)
    val self = coll.searchBqRadius(q, "qid", "qvec", radius = 0, limit = n)
      .collect().filter(_.getLong(0) == 0L).map(_.getLong(2)).toSet
    assert(self.contains(5L))
  }
}
