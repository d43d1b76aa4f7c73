package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient
import graft.vector.KnnSearch

/** Round-12 pins: the certificate-tier cost routing behind
  * `search(radius)` (r11 verdict #5) — a param-less L2 radius query on
  * a collection with a live quantized certificate index serves through
  * the certificate (coded scan + exact rerank, byte-equal to FLAT by
  * row 118's triangle bounds) instead of the raw-vector scan; every
  * non-eligible shape (cosine, explicit index params, no artifacts)
  * keeps its pre-r12 route unchanged. */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  private def mkColl(tag: String, rows: Seq[(Long, Seq[Double])]) = {
    val root = Files.createTempDirectory(s"graft-r12-$tag").toString
    val coll = new GraftClient(spark, root).createDatabase("db")
      .createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("search(radius, l2) routes through a live IVF_SQ8 certificate, byte-equal to FLAT") {
    val rnd = new scala.util.Random(61)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val q = Seq((0L, rows(5)._2), (1L, rows(200)._2)).toDF("qid", "qvec")

    val flatColl = mkColl("flat", rows)
    val want = flatColl.search(q, "qid", "qvec", metric = "l2",
      limit = 40, radius = Some(4.0)).collect().toSeq

    val sqColl = mkColl("sq", rows)
    sqColl.rebuildIvfSqIndex(nlist = 4)
    val routed = sqColl.search(q, "qid", "qvec", metric = "l2",
      limit = 40, radius = Some(4.0))
    // the certificate route reads the stored per-row resid column —
    // an attribute no FLAT raw-vector scan ever references
    assert(planOf(routed).contains("resid"),
      "an L2 radius on an IVF_SQ8-indexed collection must serve from the certificate tier")
    assert(routed.collect().toSeq == want && want.nonEmpty,
      "certificate routing must be answer-invariant (row 118 byte-equality)")

    // filter composes: exact among eligible on both routes
    val wantF = flatColl.search(q, "qid", "qvec", metric = "l2",
      limit = 40, radius = Some(4.0), filter = "id >= 100").collect().toSeq
    val gotF = sqColl.search(q, "qid", "qvec", metric = "l2",
      limit = 40, radius = Some(4.0), filter = "id >= 100").collect().toSeq
    assert(gotF == wantF && gotF.forall(_.getLong(2) >= 100L))

    // output_fields ride the routed hits like any search
    val withF = sqColl.search(q, "qid", "qvec", metric = "l2", limit = 5,
      radius = Some(4.0), outputFields = Seq("vector")).collect()
    assert(withF.nonEmpty && withF.head.schema.fieldNames.contains("vector"))
  }

  test("routing guardrails: cosine stays FLAT; explicit nprobe keeps the IVF ladder; PQ routes when it is the live certificate") {
    val rnd = new scala.util.Random(67)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 250L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")

    val sqColl = mkColl("guard", rows)
    sqColl.rebuildIvfSqIndex(nlist = 4)
    // a COSINE radius must not touch an L2-BUILT certificate tier —
    // its gate space is the raw vectors, and silently re-gating in a
    // different metric is the hybridDense bug class. (Since r13 a
    // cosine radius DOES route on a cosine-built index via the
    // unit-sphere gate space — Round13Spec; the metric-match rule is
    // what this pin now guards.)
    val cosine = sqColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 20, radius = Some(0.2))
    assert(!planOf(cosine).contains("resid"),
      "cosine radius on an l2-built index must keep the FLAT scan")
    val flatCos = KnnSearch.radiusTopK(rows.toDF("id", "vector"), "id",
      "vector", q, "qid", "qvec", "cosine", r = 0.2, k = 20).collect().toSeq
    assert(cosine.collect().toSeq == flatCos)

    // PQ-only collection: the flat-PQ certificate is the live one
    val pqColl = mkColl("pq", rows)
    pqColl.rebuildPqIndex(m = 4, k = 8)
    val viaPq = pqColl.search(q, "qid", "qvec", metric = "l2",
      limit = 30, radius = Some(4.0))
    assert(planOf(viaPq).contains("resid"),
      "an L2 radius on a PQ-indexed collection must serve from the PQ certificate")
    val want = KnnSearch.radiusTopK(rows.toDF("id", "vector"), "id",
      "vector", q, "qid", "qvec", "l2", r = 4.0, k = 30).collect().toSeq
    assert(viaPq.collect().toSeq == want && want.nonEmpty)

    // an EXPLICIT nprobe keeps the user's chosen cell route (the
    // reference's SearchParams contract) — structurally: the router
    // only fires on the (no-ef, no-nprobe) shape, and since
    // beginVectorRebuild enforces ONE vector index per collection
    // (the reference's model), a collection with an explicit-nprobe
    // IVF index cannot even hold a live certificate to route to
    val ivfColl = mkColl("ivf", rows)
    ivfColl.rebuildIndex(nlist = 4)
    val viaLadder = ivfColl.search(q, "qid", "qvec", metric = "l2",
      limit = 30, radius = Some(4.0), nprobe = Some(4))
    assert(viaLadder.collect().toSeq == want,
      "nprobe radius serves from the cell layout (full probe = exact)")
  }

  test("routing survives mutations: an appended outlier is served exactly through the routed path") {
    // QuantRadiusSpec pins append-expands-cell on the DIRECT route;
    // this pins it through the ROUTER — an upsert after rebuild must
    // not silently degrade the param-less search(radius) to a stale
    // or partial answer (liveSegRows + appended stats rows compose
    // under the routing exactly as on the explicit call)
    val rnd = new scala.util.Random(73)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = mkColl("mut", rows)
    coll.rebuildIvfSqIndex(nlist = 4)

    // an outlier FAR outside every trained cell's ball: without the
    // appended per-cell stats row the old rho would certificate-prune
    // its cell and the routed search would drop a true ball member
    val outlier: Seq[Double] = Seq.fill(16)(25.0)
    coll.upsert(Seq((900L, outlier)).toDF("id", "vector"))
    val qOut = Seq((0L, outlier)).toDF("qid", "qvec")
    val routed = coll.search(qOut, "qid", "qvec", metric = "l2",
      limit = 5, radius = Some(0.5))
    assert(planOf(routed).contains("resid"),
      "the mutated collection must still serve radius from the certificate")
    assert(routed.collect().map(_.getLong(2)).toSeq == Seq(900L),
      "appended-segment stats must admit the outlier's cell through the router")

    // a delete only SHRINKS cells — the routed answer stays exact
    coll.deleteByIds(Seq(900L))
    assert(coll.search(qOut, "qid", "qvec", metric = "l2",
      limit = 5, radius = Some(0.5)).collect().isEmpty,
      "deleted rows must not resurface through the routed certificate")
  }

  test("routing on a string-PK collection: surrogate resolution through the certificate, byte-equal to FLAT") {
    // the reference's PK is ALWAYS a string — the routed certificate
    // path must resolve the xxhash64 surrogate back to real ids and
    // still equal the FLAT route byte-for-byte (the StringIdSpec
    // contract, one tier up at the router)
    val rnd = new scala.util.Random(71)
    val rows: Seq[(String, Seq[Double])] =
      (0 until 200).map(i => (s"doc-$i", Seq.fill(16)(rnd.nextGaussian())))
    val root = Files.createTempDirectory("graft-r12-str").toString
    val coll = new GraftClient(spark, root).createDatabase("db")
      .createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    val q = Seq(("q0", rows(3)._2), ("q1", rows(150)._2)).toDF("qid", "qvec")
    val want = coll.search(q, "qid", "qvec", metric = "l2",
      limit = 25, radius = Some(4.0)).collect().toSeq
    coll.rebuildIvfSqIndex(nlist = 4)
    val routed = coll.search(q, "qid", "qvec", metric = "l2",
      limit = 25, radius = Some(4.0))
    assert(planOf(routed).contains("resid"),
      "string-PK L2 radius must route through the certificate too")
    val got = routed.collect().toSeq
    assert(got == want && got.nonEmpty)
    // real string ids come back (the surrogate never leaks), the
    // query's own row ranks first at distance 0
    assert(got.head.getString(0) == "q0" && got.head.getString(2) == "doc-3"
      && got.head.getDouble(3) == 0.0)
  }
}
