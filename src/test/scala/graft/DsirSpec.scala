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
}
