package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** Round-14 pins: the cosine-certificate BOUNDARY radius (a radius
  * that EQUALS an exact stored pair cosine must keep that pair on the
  * routed tier exactly like FLAT does — the √(2−2r) metric-to-gate
  * conversion now carries its own widening, not just the downstream
  * resid slack), plus sidecar staleness surfacing.
  */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private def mkColl(tag: String, rows: Seq[(Long, Seq[Double])]) = {
    val root = Files.createTempDirectory(s"graft-r14-$tag").toString
    val coll = new GraftClient(spark, root).createDatabase("db")
      .createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll
  }

  /** Driver-side cosine in VectorScore's exact fp order:
    * dot/(sqrt(na)*sqrt(nb)), sequential over dims. */
  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine radius EXACTLY on a stored pair's score: certificate route keeps the boundary row") {
    val rnd = new scala.util.Random(141)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val qv = rows(5)._2
    val q = Seq((0L, qv)).toDF("qid", "qvec")
    // the radius IS an exact pair cosine — the adversarial boundary
    // where any fp slack in the √(2−2r) gate conversion could drop the
    // row the FLAT gate (score >= r) provably keeps
    val boundary = cos(qv, rows(77)._2)

    val flatColl = mkColl("flatb", rows)
    val want = flatColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 200, radius = Some(boundary)).collect().toSeq
    assert(want.exists(_.getLong(2) == 77L),
      "FLAT must keep the boundary row (gate is score >= r)")

    val sqColl = mkColl("sqb", rows)
    sqColl.rebuildIvfSqIndex(nlist = 4, metric = "cosine")
    val routed = sqColl.search(q, "qid", "qvec", metric = "cosine",
      limit = 200, radius = Some(boundary))
    assert(routed.queryExecution.optimizedPlan.toString.contains("resid"),
      "the boundary query must still serve from the certificate tier")
    assert(routed.collect().toSeq == want,
      "certificate route must byte-equal FLAT at the exact boundary radius")
  }

  test("animated GIF is a REAL multi-frame container: count from the file, frames decode to the planted formulas") {
    import graft.multimodal.Multimodal
    val docs = (0L until 7L).toDF("doc_id")
    val media = Multimodal.plantGif(docs, "doc_id").collect()

    // the payload really holds 2+id%3 frames, discoverable by an
    // INDEPENDENT reader (not our sampler) — the container is genuine
    media.foreach { m =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(m.payload))
      reader.setInput(iis, false, true)
      assert(reader.getNumImages(true) == (2 + m.doc_id % 3).toInt,
        s"doc ${m.doc_id}: container frame count must be 2+id%%3")
      reader.dispose(); iis.close()
    }

    // everyN = 1: EVERY frame decodes back to the planted gray formula
    def plant(id: Long, f: Long, x: Long, y: Long): Long =
      (id * 31 + f * 101 + x * 7 + y * 13) % 256
    val all = Multimodal.gifFrameStats(
      Multimodal.plantGif(docs, "doc_id"), everyN = 1, maxFrames = 8).collect()
    assert(all.length == (0L until 7L).map(id => 2 + id % 3).sum)
    all.foreach { st =>
      val want = (for (x <- 0L until 12L; y <- 0L until 8L)
        yield plant(st.doc_id, st.frame_idx.toLong, x, y)).sum
      assert(st.sum_r == want && st.sum_g == want && st.sum_b == want,
        s"doc ${st.doc_id} frame ${st.frame_idx}: decoded sum must equal the formula")
    }

    // everyN/maxFrames sampling contract (the frameStats contract)
    val sampled = Multimodal.gifFrameStats(
      Multimodal.plantGif(docs, "doc_id"), everyN = 2, maxFrames = 2).collect()
    sampled.foreach(st => assert(st.frame_idx % 2 == 0 && st.frame_idx < 4))

    // a frame size disagreeing with the metadata struct fails LOUDLY
    val lied = Multimodal.plantGif(docs, "doc_id").map(m =>
      Multimodal.MediaRow(m.doc_id, m.format, m.width + 1, m.height, m.payload))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    intercept[org.apache.spark.SparkException] {
      Multimodal.gifFrameStats(lied).collect()
    }
  }

  test("sidecar staleness is REPORTABLE: a graph rebuild that invalidates the sidecar flags it") {
    val rnd = new scala.util.Random(142)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 120L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val coll = mkColl("stale", rows)
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    // never wanted -> never stale
    assert(!coll.sidecarStale && coll.sidecarRecommendation.isEmpty)
    coll.buildCertificateSidecar(nlist = 4)
    assert(!coll.sidecarStale,
      "a live sidecar is not stale")
    // the documented contract: a graph rebuild invalidates the sidecar
    // — previously an invisible FLAT fallback, now a reportable state
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    assert(coll.sidecarStale,
      "rebuild must leave the wanted-but-gone sidecar reportably stale")
    assert(coll.sidecarRecommendation.exists(_.contains("buildCertificateSidecar")),
      "the staleness report must carry the one-line fix")
    // rebuilding the sidecar clears the flag
    coll.buildCertificateSidecar(nlist = 4)
    assert(!coll.sidecarStale && coll.sidecarRecommendation.isEmpty)
    // the deliberate opt-OUT (r14 review fix — the witness must not be
    // irrevocable): dropping the sidecar clears artifacts AND witness,
    // so an owner who decided FLAT serving is fine is never nagged
    coll.dropCertificateSidecar()
    assert(!coll.sidecarStale && coll.sidecarRecommendation.isEmpty,
      "a dropped sidecar must not report stale")
    val meta = coll.describe
    assert(!meta.contains("index.ivfsq.nlist"),
      "the opt-out drops the sidecar artifact set")
    assert(meta.contains("index.hnsw.m"),
      "the primary graph survives the opt-out")
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    assert(!coll.sidecarStale,
      "after the opt-out, later rebuilds must not resurrect the debt report")
  }

  test("BPE loader-id map of the pinned merges has the layout the oracle re-derives in SQL") {
    // the q_bpe_apply_ids oracle computes the id table FROM the
    // inlined merges (EndMark=0, sorted unit-char alphabet, products
    // in rank order, first-wins); this pins Bpe.pieceIds over the SAME
    // persisted artifact to that exact layout, so any change to the
    // id-assignment discipline fails here before it desyncs the oracle
    val ids = graft.text.Bpe.pieceIds(SparkEntry.bpeApplyMergesFor(spark))
    assert(ids("</w>") == 0)
    // alphabet of the 12 pinned merges: a,c,e,k,n,o,p,r,s,t
    assert(ids("a") == 1 && ids("t") == 10,
      s"sorted 10-char alphabet must occupy ids 1..10, got $ids")
    assert(ids("ta") == 11 && ids("or") == 22,
      "products must follow in rank order after the alphabet")
    assert(ids.size == 23, s"1 + 10 + 12 distinct pieces, got ${ids.size}")
    // the unigram side: stored piece_id must be the 0-based
    // (logp DESC, piece ASC) rank the oracle's row_number re-derives
    val pt = SparkEntry.unigramApplyModelFor(spark)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val rederived = pt.sortBy { case (p, lp, _) => (-lp, p) }
      .zipWithIndex.map { case ((p, lp, _), i) => (p, lp, i) }
    assert(pt.sortBy(_._3).toList == rederived.sortBy(_._3).toList,
      "stored unigram piece_id must equal the (logp DESC, piece ASC) row rank")
  }

  test("IVF-assign centroids: trained artifact equals the pinned oracle rows exactly") {
    // the artifact-as-fixture contract (q_bpe_apply's device on the
    // index side): the q_ivf_assign oracle inlines IvfAssignCentroids
    // as VALUES; this pins the GENUINELY TRAINED persisted artifact to
    // those exact doubles, so any training/determinism drift fails
    // here before it can desync the oracle
    val trained = SparkEntry.ivfAssignCentroidsFor(spark).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toList)).sortBy(_._1).toList
    val pinned = SparkEntry.IvfAssignCentroids
      .map { case (c, a) => (c, a.toList) }.toList
    assert(trained == pinned,
      "trained centroids must equal the pinned oracle VALUES bit-for-bit")
  }

  test("IVF-assign argmin margin over the real corpus is far above fp noise") {
    // the measured-not-remembered tie-risk device (r13's
    // round2ObjectiveGap): the oracle's row_number argmin replays
    // Spark's least() only if no vector sits within fp noise of TWO
    // centroids — measure the smallest (d2nd − d1st) gap over the real
    // sf0.001 embeddings and require orders of magnitude above ulp
    import graft.vector.IvfIndex
    val cents = SparkEntry.IvfAssignCentroids
      .map { case (c, a) => (a.toSeq, c) }.toSeq
    val embs = graft.sources.Tables.embeddings(spark, sf)
    val gaps = embs.select(IvfIndex.assign2Expr(cents,
        col("embedding").cast("array<double>")).as("t2"))
      .select((col("t2")(1)("d") - col("t2")(0)("d")).as("gap"))
      .agg(org.apache.spark.sql.functions.min("gap")).head.getDouble(0)
    assert(gaps > 1e-9, s"assignment margin $gaps too close to an exact tie")
  }

  test("quality micro model: trained+quantized artifact equals the pinned oracle weights") {
    val m6 = SparkEntry.qcMicroModelFor(spark)
    assert(m6.intercept6 == SparkEntry.QcIntercept6,
      s"intercept6 ${m6.intercept6} must equal pinned ${SparkEntry.QcIntercept6}")
    // pin BOTH halves of each (token → bucket → w6) chain: the bucket
    // (HashingTF's placement of the token) and the weight at it
    import spark.implicits._
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("feat")
      .setNumFeatures(SparkEntry.QcNumFeatures)
    val toks = SparkEntry.QcTokenWeights.map(_._1)
    val actualBuckets = tf.transform(toks.map(t => Tuple1(Seq(t))).toDF("toks"))
      .select(org.apache.spark.ml.functions.vector_to_array(col("feat")).as("fa"))
      .collect().map(_.getSeq[Double](0).indexWhere(_ > 0.0))
    SparkEntry.QcTokenWeights.zip(actualBuckets).foreach {
      case ((tok, bucket, w6), actual) =>
        assert(actual == bucket, s"$tok hashes to $actual, pinned $bucket")
        assert(m6.coef6(bucket) == w6,
          s"$tok: trained w6 ${m6.coef6(bucket)} must equal pinned $w6")
    }
    // tokens sharing a bucket (key/value at 107) necessarily share the
    // weight — witness the collision is real, not a typo in the pins
    assert(SparkEntry.QcTokenWeights.groupBy(_._2).exists(_._2.length > 1))
  }
}
