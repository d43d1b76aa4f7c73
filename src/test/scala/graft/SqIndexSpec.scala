package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient
import graft.vector.{IvfSq, KnnSearch, SqIndex}

/** SQ8 / IVF_SQ8 — the scalar-quantized member of the reference's
  * "IVF series": quantization soundness, exhaustive-grade equality to
  * exact KNN, cell pruning, and client-level persistence + incremental
  * maintenance (the same contract every other index family carries). */
class SqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val qLocal = embs.where(col("vec_id") < 6)
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  test("train fails fast on ragged vectors (per-dim counts differ)") {
    // a short vector fills the LOW positions only — the position SET
    // stays contiguous 0..dim-1, so a row-count guard can never fire
    // (the round-5 guard was exactly that, and vacuous); the count
    // guard must
    val ragged = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(1.0, 2.0)))
      .toDF("id", "v")
    val err = intercept[IllegalArgumentException] {
      SqIndex.train(ragged, "v")
    }
    assert(err.getMessage.contains("ragged"))
    // equal-length corpora with identical values per dim still train
    val ok = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0))).toDF("id", "v")
    assert(SqIndex.train(ok, "v").dim == 2)
  }

  test("quantization is sound: codes in [0,255], per-dim error <= step/2") {
    val model = SqIndex.train(embs, "embedding")
    assert(model.dim == 64)
    val enc = SqIndex.encode(model, embs, "vec_id", "embedding")
    val raw = embs.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .join(enc, "id").collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val v = r.getSeq[Double](1)
      val codes = r.getAs[Array[Byte]]("codes")
      assert(codes.length == model.dim)
      var i = 0
      while (i < model.dim) {
        val c = codes(i) & 0xff
        val dec = model.vmin(i) + c * model.vdelta(i)
        // in-bounds values decode within half a quantization step
        assert(math.abs(v(i) - dec) <= model.vdelta(i) / 2 + 1e-12,
          s"dim $i: ${v(i)} decoded as $dec (step ${model.vdelta(i)})")
        i += 1
      }
    }
  }

  test("bounds round-trip through the persisted form") {
    val model = SqIndex.train(embs, "embedding")
    val back = SqIndex.modelFromDf(SqIndex.boundsDf(model, spark), model.dim)
    assert(back.vmin.toSeq == model.vmin.toSeq)
    assert(back.vdelta.toSeq == model.vdelta.toSeq)
  }

  test("corpus-covering rerank equals exact L2 KNN byte-for-byte") {
    val model = SqIndex.train(embs, "embedding")
    val enc = SqIndex.encode(model, embs, "vec_id", "embedding").cache()
    val n = enc.count()
    val sq = SqIndex.searchRerank(model, enc, embs, "vec_id", "embedding",
      qLocal, k = 10, candMult = ((n + 9) / 10).toInt).collect().toSeq
    val qdf = embs.where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = KnnSearch.topK(embs, "vec_id", "embedding",
      qdf, "qid", "qvec", "l2", 10).collect().toSeq
    assert(sq == exact)
  }

  test("code-only ranking is near-exact (8-bit quantization error)") {
    // SQ8's pitch vs PQ: 4x compression with almost no ranking loss —
    // the code-only top-10 should overlap the exact top-10 nearly
    // everywhere even WITHOUT a rerank (PQ at m=8 measures ~0.33)
    val model = SqIndex.train(embs, "embedding")
    val enc = SqIndex.encode(model, embs, "vec_id", "embedding").cache()
    val approx = SqIndex.search(model, enc, qLocal, k = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val qdf = embs.where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = KnnSearch.topK(embs, "vec_id", "embedding",
      qdf, "qid", "qvec", "l2", 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recall = exact.map { case (q, ids) =>
      (ids intersect approx.getOrElse(q, Set.empty)).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.9, s"SQ8 code-only recall@10 = $recall")
  }

  test("nprobe = nlist degenerates to plain SQ search") {
    val model = IvfSq.train(embs, "embedding", nlist = 8)
    val enc = IvfSq.encode(model, embs, "vec_id", "embedding").cache()
    val full = IvfSq.search(model, enc, qLocal, kTop = 10, nprobe = 8).collect().toSeq
    val plain = SqIndex.search(model.sq,
      enc.select("id", "codes"), qLocal, k = 10).collect().toSeq
    assert(full == plain)
  }

  test("small nprobe prunes candidates to the probed cells") {
    val model = IvfSq.train(embs, "embedding", nlist = 8)
    val enc = IvfSq.encode(model, embs, "vec_id", "embedding").cache()
    val res = IvfSq.search(model, enc, qLocal, kTop = 10, nprobe = 2)
    val rows = res.collect()
    assert(rows.nonEmpty && rows.length <= qLocal.length * 10)
    val cellsPerQuery = enc.join(
        res.select(col("query_id"), col("id")), "id")
      .groupBy("query_id").agg(countDistinct("cell").as("nc")).collect()
    assert(cellsPerQuery.forall(_.getLong(1) <= 2))
  }

  test("contract edges: string ids rejected, empty corpus untrainable") {
    import org.apache.spark.sql.functions.col
    val model = SqIndex.train(embs, "embedding")
    val strIds = embs.select(col("vec_id").cast("string").as("sid"), col("embedding"))
    assertThrows[IllegalArgumentException] {
      SqIndex.encode(model, strIds, "sid", "embedding")
    }
    assertThrows[IllegalArgumentException] {
      SqIndex.train(embs.where(col("vec_id") < 0), "embedding")
    }
  }

  test("IVF_SQ8 stays live across upsert; exhaustive search equals exact") {
    val root = Files.createTempDirectory("graft-ivfsqinc").toString
    val rnd = new scala.util.Random(37)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIvfSqIndex(nlist = 4)

    // new doc carrying doc 7's vector + replace doc 42 with a far vector
    val moved: Seq[Double] = Seq.fill(16)(rnd.nextGaussian())
    coll.upsert(Seq((500L, rows(7)._2), (42L, moved)).toDF("id", "vector"))
    assert(coll.describe.contains("index.ivfsq.nlist"),
      "upsert must keep the IVF_SQ8 index live")

    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    val hits = coll.searchIvfSq(q, "qid", "qvec", limit = 5, nprobe = 4).collect()
    val ids = hits.map(_.getLong(2)).toSet
    assert(ids.contains(500L) && ids.contains(7L),
      s"both copies of the query vector must be found, got $ids")

    // incremental segments serve the SAME results as a fresh rebuild
    // (bounds clamp the moved vector identically either way only when
    // it lands in-range; compare on the rerank path, which is exact)
    val n = 301
    val live = coll.searchIvfSq(q, "qid", "qvec", limit = 5, nprobe = 4,
      candMult = Some((n + 4) / 5)).collect().toSeq
    coll.rebuildIvfSqIndex(nlist = 4)
    val rebuilt = coll.searchIvfSq(q, "qid", "qvec", limit = 5, nprobe = 4,
      candMult = Some((n + 4) / 5)).collect().toSeq
    assert(live.map(_.getLong(2)) == rebuilt.map(_.getLong(2)))
  }
}
