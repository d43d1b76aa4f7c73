package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.vector.KnnSearch

/** The RankLimitToTopK optimizer rule: the naive window-rank-then-filter
  * top-k must plan graft's bounded heap (TopKAgg objectagg, no Window
  * exec), produce identical results, and leave non-matching plans
  * untouched. */
class RankLimitRuleSpec extends SparkSpec {
  import spark.implicits._

  private def scored = (0L until 400L).map { i =>
    (i % 4, (i * 37 % 101).toDouble + i * 1e-3, i)
  }.toDF("query_id", "__s", "id")

  private def naiveTopK(k: Int) = scored
    .withColumn("rank", row_number().over(
      Window.partitionBy($"query_id").orderBy($"__s".desc, $"id")))
    .where($"rank" <= k)

  test("window rank <= k plans the bounded heap, no Window exec") {
    val df = naiveTopK(5)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("topk"), s"expected the TopKAgg plan, got:\n$physical")
    assert(!physical.contains("Window"), s"expected no Window exec, got:\n$physical")
  }

  test("fused plan returns exactly what the window form computes") {
    val expected = scored.collect().toSeq
      .groupBy(_.getLong(0)).toSeq
      .flatMap { case (q, rows) =>
        rows.sortBy(r => (-r.getDouble(1), r.getLong(2))).take(5).zipWithIndex
          .map { case (r, i) => (q, r.getDouble(1), r.getLong(2), i + 1) }
      }.toSet
    val got = naiveTopK(5).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected)
  }

  test("radius-then-rank (the reference search(radius, limit)) fuses too") {
    val data = (0L until 300L).map(i => (i, Seq((i % 17).toDouble, 1.0, (i % 5).toDouble)))
      .toDF("id", "vec")
    val queries = Seq((1L, Seq(3.0, 1.0, 2.0)), (2L, Seq(9.0, 1.0, 0.0)))
      .toDF("qid", "qvec")
    // the naive user composition: radius scan, then window top-k
    val inRadius = KnnSearch.radiusScored(data, "id", "vec",
      queries, "qid", "qvec", "cosine", r = 0.8)
    val naive = inRadius.withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"__s".desc, $"id")))
      .where($"rank" <= 3)
    val physical = naive.queryExecution.executedPlan.toString
    assert(physical.contains("topk") && !physical.contains("Window"),
      s"expected the fused bounded-heap plan, got:\n$physical")
    // identical rows to the explicit bounded-heap API
    val viaApi = KnnSearch.radiusTopK(data, "id", "vec", queries, "qid", "qvec",
      "cosine", r = 0.8, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaRule = naive.collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(2))).toSet
    assert(viaRule == viaApi)
  }

  test("plans the rule cannot prove equivalent are left untouched") {
    // extra payload column: the aggregate cannot carry it — no rewrite
    val extra = scored.withColumn("payload", $"id" * 2)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"__s".desc, $"id")))
      .where($"rank" <= 5)
    assert(extra.queryExecution.executedPlan.toString.contains("Window"))
    assert(extra.count() == 20)
    // no id tie-break: row_number is nondeterministic there — no rewrite
    val noTie = scored.withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"__s".desc)))
      .where($"rank" <= 5)
    assert(noTie.queryExecution.executedPlan.toString.contains("Window"))
    // nullable score with no null-dropping predicate below the window:
    // the window would rank nulls, TopKAgg drops them — no rewrite
    val nullableScore = scored
      .select($"query_id", when($"id" % 7 =!= 0, $"__s").as("__s"), $"id")
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"__s".desc, $"id")))
      .where($"rank" <= 5)
    assert(nullableScore.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("a guard inside an OR disjunct proves nothing — no rewrite") {
    // parquet round-trip: columns come back NULLABLE (the schema any
    // real corpus read has), and a filter on them stays a bare
    // comparison conjunct instead of folding into the fixture
    val p = java.nio.file.Files.createTempDirectory("rank-guard").toString
    scored.write.mode("overwrite").parquet(p)
    def base = spark.read.parquet(p)
    // `__s >= 0.5 OR id < 10` passes null-score rows (the id arm), so
    // the comparison must NOT count as a null guard: the window form
    // ranks those rows while the heap would drop them
    val naive = base.where($"__s" >= 0.5 || $"id" < 10)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"__s".desc, $"id")))
      .where($"rank" <= 5)
    val physical = naive.queryExecution.executedPlan.toString
    assert(physical.contains("Window"),
      s"an OR-guarded nullable score must not fuse, got:\n$physical")
    assert(naive.count() == 20)
    // the same guard as a CONJUNCT does license the rewrite (the
    // radius shape: a null-intolerant comparison below the window) —
    // the parquet-nullable id needs its own guard too
    val guarded = base.where($"__s" >= 0.5 && $"id".isNotNull)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"__s".desc, $"id")))
      .where($"rank" <= 5)
    val gphysical = guarded.queryExecution.executedPlan.toString
    assert(!gphysical.contains("Window"),
      s"a conjunct score guard must license the rewrite, got:\n$gphysical")
    assert(guarded.count() == 20)
  }

  test("a guard in one Union leg proves nothing for the whole Union — no rewrite") {
    val p = java.nio.file.Files.createTempDirectory("rank-union").toString
    scored.write.mode("overwrite").parquet(p)
    def base = spark.read.parquet(p)
    val guardedLeg = base.where($"__s" >= 0.5 && $"id".isNotNull)
    // union output reuses the FIRST child's exprIds, so the guarded
    // leg's Filter would falsely vouch for the unguarded leg's rows;
    // the non-deterministic id keeps the projection above the Union
    val mixed = guardedLeg.unionAll(base)
      .select($"query_id", $"__s", monotonically_increasing_id().as("id"))
    val naive = mixed.withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"__s".desc, $"id")))
      .where($"rank" <= 5)
    val physical = naive.queryExecution.executedPlan.toString
    assert(physical.contains("Window"),
      s"a Union below the window must void guard proofs, got:\n$physical")
  }

  test("a nullable id is never rewritten (heap drops null ids)") {
    val nullableId = scored
      .select($"query_id", $"__s", when($"id" % 11 =!= 0, $"id").as("id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"__s".desc, $"id")))
      .where($"rank" <= 5)
    val physical = nullableId.queryExecution.executedPlan.toString
    assert(physical.contains("Window"),
      s"a nullable id must not fuse, got:\n$physical")
  }
}
