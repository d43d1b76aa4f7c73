package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient
import graft.vector.KnnSearch

/** Round-13 pins: the COSINE arm of the quantized certificate tier
  * (r12 verdict #1) and the certificate SIDECAR next to a live HNSW
  * graph (r12 verdict #3).
  *
  * The artifact contract: a quantized index built with
  * metric="cosine" stores codes / resids / cell stats of the
  * UNIT-NORMALIZED vectors, so the L2 triangle certificates run on the
  * unit sphere where cos(q,x) ≥ r ⇔ ‖q̂−x̂‖₂ ≤ √(2−2r); the exact
  * rerank scores TRUE cosine over the RAW vectors with the FLAT
  * route's own expression and gate — byte-equality by superset +
  * identical postlude, mirroring Round12Spec's four L2 arms
  * (plain / guardrails / mutation / string-PK). */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private def mkColl(tag: String, rows: Seq[(Long, Seq[Double])]) = {
    val root = Files.createTempDirectory(s"graft-r13-$tag").toString
    val coll = new GraftClient(spark, root).createDatabase("db")
      .createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("search(radius, cosine) routes through a cosine-built IVF_SQ8 certificate, byte-equal to FLAT") {
    val rnd = new scala.util.Random(131)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val q = Seq((0L, rows(5)._2), (1L, rows(200)._2)).toDF("qid", "qvec")

    val flatColl = mkColl("flatcos", rows)
    // r = 0.2 keeps a non-trivial in-ball set on gaussian 16-dim data
    val want = flatColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 40, radius = Some(0.2)).collect().toSeq

    val sqColl = mkColl("sqcos", rows)
    sqColl.rebuildIvfSqIndex(nlist = 4, metric = "cosine")
    val routed = sqColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 40, radius = Some(0.2))
    assert(planOf(routed).contains("resid"),
      "a cosine radius on a cosine-built IVF_SQ8 collection must serve from the certificate tier")
    assert(routed.collect().toSeq == want && want.nonEmpty,
      "cosine certificate routing must be answer-invariant (unit-sphere byte-equality)")

    // filter composes: exact among eligible on both routes
    val wantF = flatColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 40, radius = Some(0.2), filter = "id >= 100").collect().toSeq
    val gotF = sqColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 40, radius = Some(0.2), filter = "id >= 100").collect().toSeq
    assert(gotF == wantF && gotF.forall(_.getLong(2) >= 100L))

    // a NEGATIVE cosine radius is legal (keep score >= r) and must
    // stay exact: the gate radius √(2−2r) > √2 just admits more cells
    val wantNeg = flatColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 25, radius = Some(-0.1)).collect().toSeq
    assert(sqColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 25, radius = Some(-0.1)).collect().toSeq == wantNeg)
  }

  test("metric-mismatch guardrails: cosine radius on an l2-built index stays FLAT and vice versa; cosine PQ routes") {
    val rnd = new scala.util.Random(137)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 250L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    val base = rows.toDF("id", "vector")

    // l2-built certificate: a cosine radius must NOT ride it (its
    // gate space is raw L2 — re-gating cosine there is the hybridDense
    // bug class); the l2 radius still routes
    val l2Coll = mkColl("guardl2", rows)
    l2Coll.rebuildIvfSqIndex(nlist = 4)
    val cosOnL2 = l2Coll.search(q, "qid", "qvec", metric = "cosine",
      limit = 20, radius = Some(0.2))
    assert(!planOf(cosOnL2).contains("resid"),
      "cosine radius on an l2-built certificate must keep the FLAT scan")
    assert(cosOnL2.collect().toSeq == KnnSearch.radiusTopK(base, "id",
      "vector", q, "qid", "qvec", "cosine", r = 0.2, k = 20).collect().toSeq)

    // cosine-built certificate: an L2 radius must not ride it either
    val cosColl = mkColl("guardcos", rows)
    cosColl.rebuildIvfSqIndex(nlist = 4, metric = "cosine")
    val l2OnCos = cosColl.search(q, "qid", "qvec", metric = "l2",
      limit = 20, radius = Some(4.0))
    assert(!planOf(l2OnCos).contains("resid"),
      "l2 radius on a cosine-built certificate must keep the FLAT scan")
    assert(l2OnCos.collect().toSeq == KnnSearch.radiusTopK(base, "id",
      "vector", q, "qid", "qvec", "l2", r = 4.0, k = 20).collect().toSeq)

    // ip has no triangle certificate: the build rejects it outright
    val e = intercept[IllegalArgumentException] {
      mkColl("guardip", rows).rebuildIvfSqIndex(nlist = 4, metric = "ip")
    }
    assert(e.getMessage.contains("triangle"))

    // flat-PQ cosine certificate routes when it is the live family
    val pqColl = mkColl("pqcos", rows)
    pqColl.rebuildPqIndex(m = 4, k = 8, metric = "cosine")
    val viaPq = pqColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 30, radius = Some(0.2))
    assert(planOf(viaPq).contains("resid"),
      "a cosine radius on a cosine-built PQ collection must serve from the PQ certificate")
    val wantPq = KnnSearch.radiusTopK(base, "id", "vector", q, "qid", "qvec",
      "cosine", r = 0.2, k = 30).collect().toSeq
    assert(viaPq.collect().toSeq == wantPq && wantPq.nonEmpty)
  }

  test("cosine routing survives mutations: an appended new-direction outlier is served exactly; deletes never resurface") {
    val rnd = new scala.util.Random(139)
    // corpus confined to the +/- first-half coordinates so a later
    // outlier direction (last coordinate) genuinely lies outside every
    // trained cell's ball on the unit sphere
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(8)(rnd.nextGaussian()) ++ Seq.fill(8)(0.0)))
    val coll = mkColl("mutcos", rows)
    coll.rebuildIvfSqIndex(nlist = 4, metric = "cosine")

    val outlier: Seq[Double] = Seq.fill(8)(0.0) ++ Seq.fill(8)(3.0)
    coll.upsert(Seq((900L, outlier)).toDF("id", "vector"))
    val qOut = Seq((0L, outlier)).toDF("qid", "qvec")
    val routed = coll.search(qOut, "qid", "qvec", metric = "cosine",
      limit = 5, radius = Some(0.99))
    assert(planOf(routed).contains("resid"),
      "the mutated cosine collection must still serve radius from the certificate")
    assert(routed.collect().map(_.getLong(2)).toSeq == Seq(900L),
      "appended-segment stats must admit the outlier's cell through the cosine router")

    coll.deleteByIds(Seq(900L))
    assert(coll.search(qOut, "qid", "qvec", metric = "cosine",
      limit = 5, radius = Some(0.99)).collect().isEmpty,
      "deleted rows must not resurface through the routed cosine certificate")
  }

  test("cosine routing on a string-PK collection: surrogate resolution through the certificate, byte-equal to FLAT") {
    val rnd = new scala.util.Random(149)
    val rows: Seq[(String, Seq[Double])] =
      (0 until 200).map(i => (s"doc-$i", Seq.fill(16)(rnd.nextGaussian())))
    val root = Files.createTempDirectory("graft-r13-str").toString
    val coll = new GraftClient(spark, root).createDatabase("db")
      .createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    val q = Seq(("q0", rows(3)._2), ("q1", rows(150)._2)).toDF("qid", "qvec")
    val want = coll.search(q, "qid", "qvec", metric = "cosine",
      limit = 25, radius = Some(0.2)).collect().toSeq
    coll.rebuildIvfSqIndex(nlist = 4, metric = "cosine")
    val routed = coll.search(q, "qid", "qvec", metric = "cosine",
      limit = 25, radius = Some(0.2))
    assert(planOf(routed).contains("resid"),
      "string-PK cosine radius must route through the certificate too")
    val got = routed.collect().toSeq
    assert(got == want && got.nonEmpty)
    // the query's own row ranks first at similarity 1
    assert(got.head.getString(0) == "q0" && got.head.getString(2) == "doc-3"
      && got.head.getDouble(3) == 1.0)
  }

  test("certificate sidecar next to a live HNSW graph: routed radius byte-equal, graph serving untouched, mutations maintained") {
    val rnd = new scala.util.Random(151)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(8)(rnd.nextGaussian()) ++ Seq.fill(8)(0.0)))
    val q = Seq((0L, rows(5)._2), (1L, rows(200)._2)).toDF("qid", "qvec")

    val coll = mkColl("sidecar", rows)
    coll.rebuildHnswIndex(m = 8, efConstruction = 32, numSegments = 2,
      metric = "cosine")
    val graphBefore = coll.search(q, "qid", "qvec", limit = 10,
      ef = Some(48)).collect().toSeq
    val flatWant = coll.search(q, "qid", "qvec", metric = "cosine",
      limit = 40, radius = Some(0.2)).collect().toSeq

    // the sidecar inherits the graph's stored metric (cosine)
    coll.buildCertificateSidecar(nlist = 4)
    assert(coll.describe.contains("index.hnsw.m") &&
      coll.describe.contains("index.ivfsq.nlist"),
      "graph and sidecar must coexist in meta")
    assert(coll.describe("index.ivfsq.metric") == "cosine")

    // param-less radius now rides the sidecar's certificate — exactly
    val routed = coll.search(q, "qid", "qvec", metric = "cosine",
      limit = 40, radius = Some(0.2))
    assert(planOf(routed).contains("resid"),
      "an HNSW collection with a live sidecar must serve param-less radius from the certificate")
    assert(routed.collect().toSeq == flatWant && flatWant.nonEmpty)

    // graph serving is untouched by the sidecar build
    assert(coll.search(q, "qid", "qvec", limit = 10, ef = Some(48))
      .collect().toSeq == graphBefore)

    // mutations maintain BOTH artifacts: the outlier lands in the
    // graph (searchable by ef) AND in the sidecar's codes+stats
    // (served exactly by the routed radius)
    val outlier: Seq[Double] = Seq.fill(8)(0.0) ++ Seq.fill(8)(3.0)
    coll.upsert(Seq((900L, outlier)).toDF("id", "vector"))
    val qOut = Seq((0L, outlier)).toDF("qid", "qvec")
    val routedOut = coll.search(qOut, "qid", "qvec", metric = "cosine",
      limit = 5, radius = Some(0.99))
    assert(planOf(routedOut).contains("resid"))
    assert(routedOut.collect().map(_.getLong(2)).toSeq == Seq(900L),
      "an appended outlier must be served exactly through the sidecar after upsert")
    assert(coll.search(qOut, "qid", "qvec", limit = 1, ef = Some(500))
      .collect().map(_.getLong(2)).toSeq == Seq(900L),
      "the same upsert must keep maintaining the graph")

    coll.deleteByIds(Seq(900L))
    assert(coll.search(qOut, "qid", "qvec", metric = "cosine",
      limit = 5, radius = Some(0.99)).collect().isEmpty)

    // rebuilding the graph invalidates the sidecar like any sibling —
    // meta must not keep advertising a dropped certificate
    coll.rebuildHnswIndex(m = 8, efConstruction = 32, numSegments = 2,
      metric = "cosine")
    assert(!coll.describe.contains("index.ivfsq.nlist"),
      "a graph rebuild must invalidate the sidecar (stale certificates are wrong answers)")
    assert(!planOf(coll.search(q, "qid", "qvec", metric = "cosine",
      limit = 10, radius = Some(0.2))).contains("resid"))
  }

  test("calibrated nprobe default: geometry-adaptive, recall-floored, overridable (the auto-ef contract on the cell axis)") {
    val rnd = new scala.util.Random(167)
    // ISOTROPIC corpus — the hard case where a fixed nprobe=4 at
    // auto-sqrt(N) nlist measured 0.49 recall@10: the calibration must
    // pick a probe count wide enough for the 0.95 coverage target
    val iso: Seq[(Long, Seq[Double])] =
      (0L until 600L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val isoColl = mkColl("npiso", iso)
    isoColl.rebuildIvfSqIndex() // auto nlist = ceil(sqrt(600)) = 25
    val nlist = isoColl.describe("index.ivfsq.nlist").toInt
    val npIso = isoColl.describe("index.ivfsq.nprobe_default").toInt
    assert(npIso > 4 && npIso <= nlist,
      s"isotropic geometry must calibrate well above the old fixed 4 (got $npIso of $nlist)")

    // the default-serve IS the calibrated count (same bytes as the
    // explicit override at that value), and explicit nprobe overrides
    val q = Seq((0L, iso(3)._2), (1L, iso(500)._2)).toDF("qid", "qvec")
    val byDefault = isoColl.searchIvfSq(q, "qid", "qvec", limit = 10)
      .collect().toSeq
    assert(byDefault == isoColl.searchIvfSq(q, "qid", "qvec", limit = 10,
      nprobe = npIso).collect().toSeq)
    // recall floor vs the exact certificate route (member queries sit
    // inside the calibration's coverage target)
    val exact = isoColl.searchIvfSqExact(q, "qid", "qvec", limit = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = byDefault.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got.intersect(exact).size >= math.ceil(0.8 * exact.size).toInt,
      s"calibrated-default recall floor: ${got.intersect(exact).size}/${exact.size}")

    // CLUSTERED corpus — 8 tight clusters: neighborhoods live in one
    // cell, so the calibration must pick a SMALL count (adaptive, not
    // a fixed nlist ratio)
    val clustered: Seq[(Long, Seq[Double])] =
      (0L until 600L).map { i =>
        val c = (i % 8).toInt
        (i, Seq.tabulate(16)(d => (if (d == c * 2) 10.0 else 0.0) +
          0.05 * rnd.nextGaussian()))
      }
    val cColl = mkColl("npclu", clustered)
    cColl.rebuildIvfSqIndex()
    val npClu = cColl.describe("index.ivfsq.nprobe_default").toInt
    assert(npClu < npIso,
      s"clustered geometry must calibrate below isotropic ($npClu vs $npIso)")

    // IVF_PQ carries the same calibrated key
    val pqColl = mkColl("npivfpq", iso)
    pqColl.rebuildIvfPqIndex(m = 4, k = 16)
    assert(pqColl.describe.contains("index.ivfpq.nprobe_default"))
  }

  test("cosine-built quantized top-k serving: exact certificate + rerank arms rank in the stored metric") {
    val rnd = new scala.util.Random(157)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val q = Seq((0L, rows(3)._2), (1L, rows(90)._2)).toDF("qid", "qvec")
    val base = rows.toDF("id", "vector")
    val wantTop = KnnSearch.topK(base, "id", "vector", q, "qid", "qvec",
      "cosine", k = 10).collect().toSeq

    val coll = mkColl("topkcos", rows)
    coll.rebuildIvfSqIndex(nlist = 4, metric = "cosine")
    // kth-upper-bound certificate: byte-equal to FLAT cosine KNN
    assert(coll.searchIvfSqExact(q, "qid", "qvec", limit = 10)
      .collect().toSeq == wantTop)
    // full-probe rerank arm: exact rerank in the stored metric makes
    // nprobe = nlist degenerate to exact cosine KNN
    assert(coll.searchIvfSq(q, "qid", "qvec", limit = 10, nprobe = 4,
      candMult = Some(20)).collect().toSeq == wantTop)
    // native arm emits the dequantized-cosine estimate, descending
    val native = coll.searchIvfSq(q, "qid", "qvec", limit = 10, nprobe = 4)
      .collect()
    assert(native.nonEmpty)
    val perQ = native.groupBy(_.getLong(0))
    perQ.values.foreach { hits =>
      val scores = hits.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "cosine-built native scores must descend")
      assert(scores.head <= 1.0 + 1e-6)
    }

    // PQ family: the same two exact contracts
    val pqColl = mkColl("topkpq", rows)
    pqColl.rebuildPqIndex(m = 4, k = 16, metric = "cosine")
    assert(pqColl.searchPqExact(q, "qid", "qvec", limit = 10)
      .collect().toSeq == wantTop)

    // IVF_PQ cosine: the third family's routed radius + rerank arms
    // (implemented alongside SQ8/PQ but otherwise unexercised — the
    // PQ-native lesson: an untested branch ships bugs)
    locally {
      val ipqColl = mkColl("topkivfpq", rows)
      ipqColl.rebuildIvfPqIndex(nlist = 4, m = 4, k = 16, metric = "cosine")
      val routed = ipqColl.search(q, "qid", "qvec", metric = "cosine",
        limit = 30, radius = Some(0.2))
      assert(planOf(routed).contains("resid"),
        "cosine radius on a cosine-built IVF_PQ collection must route")
      val wantBall = KnnSearch.radiusTopK(base, "id", "vector", q, "qid",
        "qvec", "cosine", r = 0.2, k = 30).collect().toSeq
      assert(routed.collect().toSeq == wantBall && wantBall.nonEmpty)
      // full-probe + wide rerank degenerates to exact cosine KNN
      assert(ipqColl.searchIvfPq(q, "qid", "qvec", limit = 10, nprobe = 4,
        candMult = Some(20)).collect().toSeq == wantTop)
    }

    // flat-PQ NATIVE cosine arm, pinned at the vector layer (the one
    // family arm with no client route wired to it — searchPq always
    // reranks; an unexercised branch is where a future bug ships
    // unverified, the review finding): cosineScores=true must keep the
    // gate-space ADC ranking byte-identical and emit 1 − d²/2 desc
    locally {
      import graft.vector.{PqIndex, VectorScore}
      val normed = rows.toDF("id", "vector")
        .withColumn("vector", VectorScore.unitNorm(col("vector")))
      val model = PqIndex.train(normed, "vector", dim = 16, m = 4, k = 16)
      val enc = PqIndex.encode(model, normed, "id", "vector")
      val gq = Seq((0L, rows(3)._2), (1L, rows(90)._2))
        .map { case (i, v) => (i, VectorScore.unitNormArr(v.toArray)) }.toArray
      val asL2 = PqIndex.search(model, enc, gq, k = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      val asCos = PqIndex.search(model, enc, gq, k = 10, cosineScores = true)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      assert(asL2.map(t => (t._1, t._2, t._3)).toSeq ==
        asCos.map(t => (t._1, t._2, t._3)).toSeq,
        "cosineScores must not change the gate-space ranking")
      // d is the ROUNDED emitted distance, c rounds the unrounded
      // transform — 2e-4 covers the worst compounding at d ≤ 2
      asL2.zip(asCos).foreach { case ((_, _, _, d), (_, _, _, c)) =>
        assert(math.abs(c - (1.0 - d * d / 2)) <= 2e-4,
          s"emitted score must be the dequantized-cosine estimate (d=$d c=$c)")
      }
      val perQ2 = asCos.groupBy(_._1)
      perQ2.values.foreach { hits =>
        val sc = hits.sortBy(_._2).map(_._4)
        assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
      }
    }
  }
}
