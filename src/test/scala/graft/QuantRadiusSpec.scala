package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient
import graft.vector.{IvfIndex, IvfSq, KnnSearch, PqIndex, SqIndex}

/** Exact radius serving from the LOSSY quantized families (SURVEY §2
  * row 118) — the triangle-inequality certificates:
  *
  *  - per-row: |d(q,x) - ADC(q,x̂)| ≤ resid = ||x - x̂|| (stored at
  *    encode time), so gating the coded scan at ADC ≤ R + resid keeps
  *    a provable superset of the true ball;
  *  - per-cell (IVF_SQ8): rho_j = max member distance to centroid j,
  *    so ||q - c_j|| > R + rho_j prunes the whole cell at file listing.
  *
  * Both prunes are certificate-backed, so every route here must equal
  * the FLAT L2 radius+limit result BYTE-FOR-BYTE — including clamped
  * out-of-bounds rows, coarse codebooks, filters, upserts that expand
  * a cell, and compaction. Contrast the graph/cell-beam radius routes
  * (HNSW/IVF), which navigate a proxy without a per-row bound and pay
  * an escalation ladder with measured recall instead. */
class QuantRadiusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val qdf = embs.where(col("vec_id") < 6)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val qLocal = embs.where(col("vec_id") < 6)
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private def flatRadius(data: org.apache.spark.sql.DataFrame, r: Double,
                         k: Int): Seq[org.apache.spark.sql.Row] = {
    val q = data.where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    KnnSearch.radiusTopK(data, "vec_id", "embedding", q, "qid", "qvec",
      "l2", r = r, k = k).collect().toSeq
  }

  test("IVF_SQ8 radius equals FLAT radius+limit byte-for-byte") {
    val model = IvfSq.train(embs, "embedding", nlist = 8)
    val enc = IvfSq.encode(model, embs, "vec_id", "embedding").cache()
    val centers = model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex.toSeq
    val stats = IvfSq.cellStats(centers, embs, "embedding")
    val got = IvfSq.searchStoredRadius(centers, stats, model.sq, enc,
      embs, "vec_id", "embedding", qLocal, radius = 1.2, k = 15)
      .collect().toSeq
    assert(got.nonEmpty)
    assert(got == flatRadius(embs, 1.2, 15))
  }

  test("PQ radius equals FLAT at a COARSE codebook (wide gate, exact answer)") {
    // m=8/k=4 is deliberately terrible: resids are large, the gate is
    // wide and the scan prunes little — but the answer must not move
    for (k <- Seq(4, 16)) {
      val pq = PqIndex.train(embs, "embedding", dim = 64, m = 8, k = k)
      val enc = PqIndex.encode(pq, embs, "vec_id", "embedding")
      val got = PqIndex.searchRadius(pq, enc, embs, "vec_id", "embedding",
        qLocal, radius = 1.2, k = 15).collect().toSeq
      assert(got == flatRadius(embs, 1.2, 15), s"codebook k=$k diverged")
    }
  }

  test("out-of-bounds rows clamp with honest resids: radius stays exact") {
    // bounds trained on HALF the corpus: the other half's extremes
    // clamp to the trained range — the per-dim ≤ step/2 error story is
    // gone, but resid is computed from the ACTUAL reconstruction, so
    // the certificate (and the answer) must hold anyway
    val half = embs.where(col("vec_id") % 2 === 0)
    val sq = SqIndex.train(half, "embedding")
    val ivf = IvfIndex.train(embs, "embedding", 4, 42L, maxIter = 10)
    val centers = ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex.toSeq
    val enc = IvfSq.encodeAssigned(centers, sq, embs, "vec_id", "embedding").cache()
    val stats = IvfSq.cellStats(centers, embs, "embedding")
    val got = IvfSq.searchStoredRadius(centers, stats, sq, enc,
      embs, "vec_id", "embedding", qLocal, radius = 1.2, k = 15)
      .collect().toSeq
    assert(got == flatRadius(embs, 1.2, 15))
    // the clamped half really does carry larger resids than in-bounds
    // encoding would produce (the honesty the gate rides on)
    val inB = SqIndex.encode(sq, half, "vec_id", "embedding")
      .agg(max("resid")).head.getDouble(0)
    val outB = SqIndex.encode(sq, embs.where(col("vec_id") % 2 === 1),
      "vec_id", "embedding").agg(max("resid")).head.getDouble(0)
    assert(outB > inB, s"out-of-bounds resid $outB should exceed in-bounds $inB")
  }

  test("cell certificate provably prunes a far cluster, result still exact") {
    val rnd = new scala.util.Random(11)
    val near = (0L until 200L).map(i => (i, Seq.fill(8)(rnd.nextGaussian() * 0.1)))
    val far = (200L until 400L).map(i =>
      (i, Seq.fill(8)(50.0 + rnd.nextGaussian() * 0.1)))
    val data = (near ++ far).toDF("vec_id", "embedding")
    val model = IvfSq.train(data, "embedding", nlist = 2)
    val centers = model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex.toSeq
    val enc = IvfSq.encode(model, data, "vec_id", "embedding").cache()
    val stats = IvfSq.cellStats(centers, data, "embedding")

    // a query at the near cluster with a small radius: the far cell's
    // certificate ||q - c_far|| > R + rho_far must hold (the prune the
    // serving path takes at file listing)
    val q = near.head._2.toArray
    val rho = stats.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val R = 1.0
    val pruned = centers.count { case (c, cell) =>
      val d = math.sqrt(c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      d > R + rho(cell)
    }
    assert(pruned == 1, s"exactly the far cell should be certificate-pruned, got $pruned")

    val got = IvfSq.searchStoredRadius(centers, stats, model.sq, enc,
      data, "vec_id", "embedding", Array((0L, q)), radius = R, k = 300)
      .collect().toSeq
    val want = KnnSearch.radiusTopK(data, "vec_id", "embedding",
      Seq((0L, near.head._2)).toDF("qid", "qvec"), "qid", "qvec",
      "l2", r = R, k = 300).collect().toSeq
    assert(got == want && got.size == 200, "the whole near cluster is in-ball")
  }

  test("cell certificate generalizes: C-cluster mixture prunes every non-home cell, result exact") {
    // the two-cluster pin above, generalized to the mixture geometry
    // the §7-probes clustered sweep measures (r11 verdict #6): C
    // well-separated gaussian clusters, nlist = C — a ball query at
    // one cluster must certificate-prune every OTHER cell at file
    // listing, and the answer stays byte-exact regardless
    val rnd = new scala.util.Random(13)
    val C = 8
    val data = (0 until C).flatMap { c =>
      (0L until 100L).map { i =>
        val base = Seq.fill(8)(rnd.nextGaussian() * 0.1)
        // cluster c sits at 25·(c+1) along axis c — pairwise distances
        // dwarf the 0.1-σ spread, so k-means recovers the mixture
        (c * 100L + i, base.zipWithIndex.map { case (v, j) =>
          if (j == c) v + 25.0 * (c + 1) else v })
      }
    }.toDF("vec_id", "embedding")
    val model = IvfSq.train(data, "embedding", nlist = C)
    val centers = model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex.toSeq
    val enc = IvfSq.encode(model, data, "vec_id", "embedding").cache()
    val stats = IvfSq.cellStats(centers, data, "embedding")
    val rho = stats.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    // query at cluster 3's center region, R covers only that cluster
    val q = data.where(col("vec_id") === 301L)
      .select(col("embedding")).head.getSeq[Double](0).toArray
    val R = 1.0
    val pruned = centers.count { case (c, cell) =>
      val d = math.sqrt(c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
      d > R + rho(cell)
    }
    assert(pruned == C - 1,
      s"every non-home cell must be certificate-pruned, got $pruned of ${C - 1}")

    val got = IvfSq.searchStoredRadius(centers, stats, model.sq, enc,
      data, "vec_id", "embedding", Array((0L, q)), radius = R, k = 200)
      .collect().toSeq
    val want = KnnSearch.radiusTopK(data, "vec_id", "embedding",
      Seq((0L, q.toSeq)).toDF("qid", "qvec"), "qid", "qvec",
      "l2", r = R, k = 200).collect().toSeq
    assert(got == want && got.size == 100, "exactly the home cluster is in-ball")
  }

  test("client lifecycle: rebuild -> radius; upsert EXPANDS a cell's rho; compaction folds") {
    val root = Files.createTempDirectory("graft-sqradius").toString
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIvfSqIndex(nlist = 4)

    val q = Seq((0L, rows(5)._2)).toDF("qid", "qvec")
    val got = coll.searchIvfSqRadius(q, "qid", "qvec", radius = 4.0, limit = 50)
      .collect().toSeq
    val want = KnnSearch.radiusTopK(rows.toDF("id", "vector"), "id", "vector",
      q, "qid", "qvec", "l2", r = 4.0, k = 50).collect().toSeq
    assert(got == want && got.nonEmpty)

    // upsert a vector FAR outside every trained cell's ball: without
    // the appended per-cell stats row, the old rho would certificate-
    // prune its cell and silently drop a true ball member
    val outlier: Seq[Double] = Seq.fill(16)(25.0)
    coll.upsert(Seq((900L, outlier)).toDF("id", "vector"))
    val qOut = Seq((0L, outlier)).toDF("qid", "qvec")
    val hit = coll.searchIvfSqRadius(qOut, "qid", "qvec", radius = 0.5, limit = 5)
      .collect().toSeq
    assert(hit.map(_.getLong(2)) == Seq(900L),
      s"appended-segment stats must admit the outlier's cell, got $hit")

    // compaction folds stats by max(rho) — conservative, still found
    coll.compactIndexes()
    val hit2 = coll.searchIvfSqRadius(qOut, "qid", "qvec", radius = 0.5, limit = 5)
      .collect().toSeq
    assert(hit2.map(_.getLong(2)) == Seq(900L))

    // filter arm: exact among eligible rows (semi-join before the scan)
    val evens = coll.searchIvfSqRadius(q, "qid", "qvec", radius = 4.0,
      limit = 50, filter = "id >= 100").collect().toSeq
    val wantF = KnnSearch.radiusTopK(
      rows.filter(_._1 >= 100L).toDF("id", "vector"), "id", "vector",
      q, "qid", "qvec", "l2", r = 4.0, k = 50).collect().toSeq
    assert(evens == wantF && evens.forall(_.getLong(2) >= 100L))
  }

  test("client PQ radius: filter arm + string-PK surrogate resolution") {
    val root = Files.createTempDirectory("graft-pqradius").toString
    val rnd = new scala.util.Random(19)
    val rows: Seq[(String, Seq[Double])] =
      (0 until 200).map(i => (s"doc-$i", Seq.fill(16)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildPqIndex(m = 4, k = 8)

    val q = Seq(("q0", rows(3)._2)).toDF("qid", "qvec")
    val got = coll.searchPqRadius(q, "qid", "qvec", radius = 4.0, limit = 40)
      .collect().toSeq
    assert(got.nonEmpty && got.head.getString(0) == "q0")
    // real string ids come back (the surrogate never leaks), and the
    // query's own row ranks first at distance 0
    assert(got.head.getString(2) == "doc-3" && got.head.getDouble(3) == 0.0)
    val want = KnnSearch.radiusTopK(rows.toDF("id", "vector"), "id", "vector",
      Seq((0L, rows(3)._2)).toDF("qid", "qvec"), "qid", "qvec",
      "l2", r = 4.0, k = 40).collect().toSeq
    assert(got.map(r => (r.getInt(1), r.getString(2), r.getDouble(3))) ==
      want.map(r => (r.getInt(1), r.getString(2), r.getDouble(3))))

    val filtered = coll.searchPqRadius(q, "qid", "qvec", radius = 4.0,
      limit = 40, filter = "id != \"doc-3\"").collect().toSeq
    assert(filtered.nonEmpty && !filtered.exists(_.getString(2) == "doc-3"))
  }

  test("kth-upper-bound exact top-k equals FLAT KNN (SQ8 + coarse PQ)") {
    val want = KnnSearch.topK(embs, "vec_id", "embedding",
      qdf, "qid", "qvec", "l2", 10).collect().toSeq
    val sq = SqIndex.train(embs, "embedding")
    val encS = SqIndex.encode(sq, embs, "vec_id", "embedding").cache()
    assert(SqIndex.searchTopKExact(sq, encS, embs, "vec_id", "embedding",
      qLocal, k = 10).collect().toSeq == want)
    // a deliberately terrible codebook: the certificate gate admits
    // most of the corpus, the ANSWER must still be byte-equal
    val pq = PqIndex.train(embs, "embedding", dim = 64, m = 8, k = 4)
    val encP = PqIndex.encode(pq, embs, "vec_id", "embedding").cache()
    assert(PqIndex.searchTopKExact(pq, encP, embs, "vec_id", "embedding",
      qLocal, k = 10).collect().toSeq == want)
    // corpus smaller than k: U = +inf keeps everything, the rerank
    // returns what exists
    val tiny = embs.where(col("vec_id") < 4)
    val encT = SqIndex.encode(sq, tiny, "vec_id", "embedding")
    val gotT = SqIndex.searchTopKExact(sq, encT, tiny, "vec_id", "embedding",
      qLocal.take(1), k = 10).collect()
    assert(gotT.length == 4 && gotT.map(_.getInt(1)).toSeq == (1 to 4))
  }

  test("IVF_PQ radius: client lifecycle with appended-outlier rho expansion") {
    val root = Files.createTempDirectory("graft-ivfpqradius").toString
    val rnd = new scala.util.Random(31)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIvfPqIndex(nlist = 4, m = 4, k = 8)

    val q = Seq((0L, rows(11)._2)).toDF("qid", "qvec")
    val got = coll.searchIvfPqRadius(q, "qid", "qvec", radius = 4.0, limit = 50)
      .collect().toSeq
    val want = KnnSearch.radiusTopK(rows.toDF("id", "vector"), "id", "vector",
      q, "qid", "qvec", "l2", r = 4.0, k = 50).collect().toSeq
    assert(got == want && got.nonEmpty)

    // an appended far outlier must expand its cell's certificate
    val outlier: Seq[Double] = Seq.fill(16)(-30.0)
    coll.upsert(Seq((901L, outlier)).toDF("id", "vector"))
    val qOut = Seq((0L, outlier)).toDF("qid", "qvec")
    val hit = coll.searchIvfPqRadius(qOut, "qid", "qvec", radius = 0.5, limit = 5)
      .collect().toSeq
    assert(hit.map(_.getLong(2)) == Seq(901L))
    coll.compactIndexes()
    assert(coll.searchIvfPqRadius(qOut, "qid", "qvec", radius = 0.5, limit = 5)
      .collect().map(_.getLong(2)).toSeq == Seq(901L))

    // filter arm: exact among eligible rows
    val f = coll.searchIvfPqRadius(q, "qid", "qvec", radius = 4.0,
      limit = 50, filter = "id < 150").collect().toSeq
    val wantF = KnnSearch.radiusTopK(
      rows.filter(_._1 < 150L).toDF("id", "vector"), "id", "vector",
      q, "qid", "qvec", "l2", r = 4.0, k = 50).collect().toSeq
    assert(f == wantF && f.forall(_.getLong(2) < 150L))
  }

  test("client exact top-k routes equal the FLAT search (filter arm too)") {
    val root = Files.createTempDirectory("graft-exacttopk").toString
    val rnd = new scala.util.Random(41)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 250L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    // a rebuild invalidates every other family (one index type per
    // collection — the reference's modify_vector_index semantics), so
    // the two routes get sibling collections
    val db = new GraftClient(spark, root).createDatabase("db")
    val sqColl = db.createCollection("vsq")
    val pqColl = db.createCollection("vpq")
    Seq(sqColl, pqColl).foreach(_.upsert(rows.toDF("id", "vector")))
    sqColl.rebuildIvfSqIndex(nlist = 4)
    pqColl.rebuildPqIndex(m = 4, k = 8)

    val q = Seq((0L, rows(17)._2), (1L, rows(99)._2)).toDF("qid", "qvec")
    val want = sqColl.search(q, "qid", "qvec", metric = "l2", limit = 7)
      .collect().toSeq
    assert(sqColl.searchIvfSqExact(q, "qid", "qvec", limit = 7)
      .collect().toSeq == want)
    assert(pqColl.searchPqExact(q, "qid", "qvec", limit = 7)
      .collect().toSeq == want)

    val wantF = sqColl.search(q, "qid", "qvec", metric = "l2", limit = 7,
      filter = "id >= 50").collect().toSeq
    assert(sqColl.searchIvfSqExact(q, "qid", "qvec", limit = 7,
      filter = "id >= 50").collect().toSeq == wantF)
    assert(pqColl.searchPqExact(q, "qid", "qvec", limit = 7,
      filter = "id >= 50").collect().toSeq == wantF)
  }

  test("empty probe set on a string-PK collection keeps the string id schema") {
    // the cell certificate can prune EVERY cell (far query, tiny
    // radius): the empty result must carry the same schema as the
    // non-empty path — in particular id: string on a string-PK
    // collection, so callers can union/filter it without a type fork
    val root = Files.createTempDirectory("graft-emptyball").toString
    val rnd = new scala.util.Random(3)
    val rows = (0 until 100).map(i => (s"d-$i", Seq.fill(8)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIvfSqIndex(nlist = 2)
    val farQ = Seq(("q0", Seq.fill(8)(1e6))).toDF("qid", "qvec")
    val got = coll.searchIvfSqRadius(farQ, "qid", "qvec", radius = 0.01, limit = 5)
    assert(got.schema("id").dataType == org.apache.spark.sql.types.StringType)
    assert(got.count() == 0)
    // and it unions cleanly with a non-empty result (the failure mode
    // the old bigint-typed empty shortcut produced)
    val hitQ = Seq(("q1", rows(7)._2)).toDF("qid", "qvec")
    val hit = coll.searchIvfSqRadius(hitQ, "qid", "qvec", radius = 0.5, limit = 5)
    assert(got.unionByName(hit).collect().map(_.getString(2)).toSeq == Seq("d-7"))
  }

  test("empty ball returns an empty ranked frame, not an error") {
    val model = IvfSq.train(embs, "embedding", nlist = 4)
    val centers = model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex.toSeq
    val enc = IvfSq.encode(model, embs, "vec_id", "embedding")
    val stats = IvfSq.cellStats(centers, embs, "embedding")
    // a query far from the corpus with a tiny radius: every cell is
    // certificate-pruned, the early-exit empty frame keeps the shape
    val farQ = Array((0L, Array.fill(64)(1e6)))
    val got = IvfSq.searchStoredRadius(centers, stats, model.sq, enc,
      embs, "vec_id", "embedding", farQ, radius = 0.01, k = 5)
    assert(got.columns.toSeq == Seq("query_id", "rank", "id", "score"))
    assert(got.count() == 0)
  }
}
