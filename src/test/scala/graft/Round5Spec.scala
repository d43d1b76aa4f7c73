package graft

import org.apache.spark.sql.functions._

/** Round-5 regression coverage: null-score quantile exclusion,
  * repetitionStats operating on frames that already carry its internal
  * column names, and the window-free rank postlude. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  test("topQuantileByGroup excludes null scores from ranking and output") {
    val docs = Seq(
      ("a", "g1", Some(1.0)), ("b", "g1", Some(2.0)),
      ("c", "g1", Some(3.0)), ("d", "g1", Some(4.0)),
      ("e", "g1", None), ("f", "g1", None)
    ).toDF("id", "grp", "score")
    // Without the exclusion the two nulls inflate the group size to 6
    // and shift the q=0.5 threshold; with it the threshold is computed
    // over {1,2,3,4} alone: percent_rank >= 0.5 keeps scores >= 3.
    val kept = graft.ops.Curation
      .topQuantileByGroup(docs, "grp", "score", q = 0.5)
      .select("id").as[String].collect().sorted
    assert(kept.toSeq == Seq("c", "d"))

    // q = 0 keeps every scored row but still never a null-score row
    val keptAll = graft.ops.Curation
      .topQuantileByGroup(docs, "grp", "score", q = 0.0)
      .select("id").as[String].collect().sorted
    assert(keptAll.toSeq == Seq("a", "b", "c", "d"))
  }

  test("repetitionStats ignores pre-existing __toks / top_cnt columns") {
    val docs = Seq(
      ("d1", "x x x y", "poison", 99),
      ("d2", "a b c d", "poison", 99)
    ).toDF("id", "text", "__toks", "top_cnt")
    val out = graft.text.TextAnalysis.repetitionStats(docs, "id", "text")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Int]("top_cnt")).toSeq == Seq(3, 1))
    assert(out.map(_.getAs[Int]("n_words")).toSeq == Seq(4, 4))
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("id", "n_words", "n_distinct", "dup_frac", "top_cnt", "top_share"))
  }

  test("simhashVerified equals the exhaustive posting-join jaccard at 8 blocks") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val sig = graft.dedup.Dedup.simhashSignatures(docs, "doc_id", "text")
    val ng = graft.dedup.Dedup.ngrams(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val got = graft.dedup.Dedup.simhashVerified(sig, ng, blocks = 8, threshold = 0.5)
      .collect().toSeq
    val want = graft.dedup.Dedup.ngramJaccardFromPostings(ng, threshold = 0.5)
      .collect().toSeq
    ng.unpersist()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("rankTop matches an unpartitioned row_number over the same order") {
    val scored = spark.range(100)
      .select(col("id").cast("string").as("doc_id"),
        (col("id") % 7).cast("double").as("score"))
    val got = graft.vector.Ranked
      .rankTop(scored, 10, col("score").desc, col("doc_id"))
      .select("rank", "doc_id", "score").collect()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    val want = scored.orderBy(col("score").desc, col("doc_id")).limit(10)
      .withColumn("rank", row_number().over(w))
      .select("rank", "doc_id", "score").collect()
    assert(got.toSeq == want.toSeq)
  }
}
