package graft

import org.apache.spark.sql.functions._

import graft.ops.Dsir

/** DSIR importance resampling (q_dsir_weights / q_dsir_select): the
  * oracle equality pins engine agreement; these tests pin the
  * SEMANTICS the equality can't see — target-like documents outscore
  * raw-like ones, the ratio table is the dense persistable artifact,
  * weights are exactly the sum of the doc's per-bucket table entries,
  * and Gumbel top-k is a deterministic size-k subset that follows the
  * weights in aggregate.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // target talks about cats; raw is dominated by database chatter
  private val target = docs(
    0L -> "cat sat mat", 1L -> "cat purred softly", 2L -> "the cat sat")
  private val raw = docs(
    10L -> "select rows fast", 11L -> "join tables quickly",
    12L -> "the cat sat", 13L -> "scan rows join",
    14L -> "cat sat mat")

  test("ratio table is dense over the whole bucket space") {
    val m = Dsir.fit(target, raw, "doc_id", "text", nBuckets = 64)
    val r = m.ratios
    assert(m.nBuckets === 64)
    assert(r.count() === 64)
    assert(r.columns.toSeq === Seq("b", "lr6"))
    // unseen-everywhere buckets carry the smoothing-mass constant, not null
    assert(r.where(col("lr6").isNull).count() === 0)
  }

  test("target-flavored candidates outweigh raw-flavored ones") {
    val m = Dsir.fit(target, raw, "doc_id", "text")
    val w = Dsir.weights(docs(
        100L -> "cat sat mat",          // pure target vocabulary
        101L -> "select rows join"),    // pure raw vocabulary
      "doc_id", "text", m)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(w(100L) > w(101L),
      s"target-like doc must outscore raw-like: $w")
  }

  test("a weight is exactly the integer sum of its grams' table entries") {
    val n = 64
    val m = Dsir.fit(target, raw, "doc_id", "text", nBuckets = n)
    val table = m.ratios.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val probe = docs(100L -> "cat sat mat")
    val got = Dsir.weights(probe, "doc_id", "text", m)
      .collect().head
    // replicate the hashed unigram+bigram feature stream through the
    // engine's own hash expression, then sum table entries by hand
    val grams = Seq("cat", "sat", "mat", "cat sat", "sat mat")
    val buckets = grams.toDF("g").select(
      pmod(conv(substring(md5(concat(col("g"), lit(":dsir"))), 1, 8), 16, 10)
        .cast("long"), lit(n.toLong)).as("b"))
      .collect().map(_.getLong(0))
    assert(got.getLong(1) === grams.size)
    assert(got.getDouble(2) === buckets.map(table).sum.toDouble / 1e6)
  }

  test("gumbel top-k: deterministic size-k candidate subset, id-ordered") {
    val m = Dsir.fit(target, raw, "doc_id", "text")
    val cands = docs((0 until 20).map(i =>
      (100L + i, if (i % 2 == 0) "cat sat mat" else "select rows join")): _*)
    val s1 = Dsir.select(cands, "doc_id", "text", m, k = 5).collect()
    val s2 = Dsir.select(cands, "doc_id", "text", m, k = 5).collect()
    assert(s1.toSeq === s2.toSeq, "selection must be content-addressed")
    assert(s1.length === 5)
    val ids = s1.map(_.getLong(0))
    assert(ids.toSeq === ids.sorted.toSeq, "output is id-ordered")
    assert(ids.forall(i => i >= 100L && i < 120L))
    // weights dominate the noise here (the two vocabularies are far
    // apart): the draw should be mostly target-flavored docs
    val targetLike = ids.count(_ % 2 == 0)
    assert(targetLike >= 4, s"expected target-like majority, got $targetLike/5")
  }

  test("token-less candidates carry no weight row (the LM-gate contract)") {
    val m = Dsir.fit(target, raw, "doc_id", "text")
    val w = Dsir.weights(docs(100L -> "cat sat", 101L -> ""),
      "doc_id", "text", m)
    assert(w.collect().map(_.getLong(0)).toSeq === Seq(100L))
  }

  test("collection round-trip: trainDsirModel persists, a later session serves and gates") {
    val root = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("cands")
    coll.upsert(raw.withColumnRenamed("doc_id", "id"))
    coll.trainDsirModel(target, "doc_id", "text")

    val again = new graft.api.GraftClient(spark, root)
      .database("db").collection("cands")
    val probe = Seq((100L, "cat sat mat"), (101L, "select rows join"),
      (102L, "")).toDF("id", "text")
    val served = again.dsirWeightsOf(probe, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // byte-equal to the direct in-memory fit (raw = the stored docs)
    val direct = Dsir.weights(probe, "id", "text",
        Dsir.fit(target.withColumnRenamed("doc_id", "id"),
          raw.withColumnRenamed("doc_id", "id"), "id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(served === direct, "stored ratios must serve the identical weights")
    assert(!served.contains(102L), "feature-less doc has no weight")
    assert(served(100L) > served(101L))

    // the gate: floor between the two probe weights keeps exactly one
    val floor = (served(100L) + served(101L)) / 2
    val kept = again.dsirGateOf(probe, "id", "text", floor)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(100L),
      "gate keeps target-like rows, drops raw-like AND feature-less rows")
    // top-k serving from the artifact
    val sel = again.dsirSelectOf(probe.where(col("id") < 102), "id", "text", 1)
      .collect()
    assert(sel.length === 1)
  }

  test("buildTrainingSet dsirGate equals manually pre-filtering by the weight") {
    val corpus = graft.sources.Tables.documents(spark, sf)
    val m = Dsir.fit(corpus.where(col("lang") === "en"), corpus,
      "doc_id", "text")
    val floor = Dsir.weights(corpus, "doc_id", "text", m)
      .agg(org.apache.spark.sql.functions.expr("percentile(logw, 0.5)"))
      .collect().head.getDouble(0)
    val gatedBuild = graft.ops.Curation.buildTrainingSet(
      corpus, "doc_id", "text", "source", dsirGate = Some((m, floor)))
    val preFiltered = graft.ops.Curation.buildTrainingSet(
      corpus.join(Dsir.weights(corpus, "doc_id", "text", m)
          .where(col("logw") >= floor).select("doc_id"),
        Seq("doc_id"), "left_semi"),
      "doc_id", "text", "source")
    assert(gatedBuild.collect().toSet === preFiltered.collect().toSet)
  }

  test("streaming: curatedIngest minDsirLogw gates at the door") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-dsir-stream").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("c")
    coll.upsert(graft.ops.Curation.curateBatch(
      raw.withColumn("source", lit("web")), "doc_id", "text", "source"))
    coll.trainDsirModel(target, "doc_id", "text")
    val floorProbe = coll.dsirWeightsOf(
        Seq((1L, "cat sat mat"), (2L, "select rows join")).toDF("id", "text"),
        "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val floor = (floorProbe(1L) + floorProbe(2L)) / 2

    val ckpt = java.nio.file.Files.createTempDirectory("graft-dsir-ck").toString
    val in = MemoryStream[(Long, String, String)]
    val q = graft.streaming.Streams.curatedIngest(
      in.toDF().toDF("doc_id", "text", "source"), coll, ckpt,
      minDsirLogw = Some(floor))
    try {
      val before = coll.count()
      in.addData((100L, "cat sat mat purred", "web"),
        (101L, "select rows join scan", "web"))
      q.processAllAvailable()
      assert(coll.count() === before + 1,
        "exactly the target-like doc passes the importance gate")
      assert(coll.df.where(col("text") === "cat sat mat purred").count() === 1)
      assert(coll.df.where(col("text") === "select rows join scan").count() === 0)
    } finally q.stop()
  }
}
