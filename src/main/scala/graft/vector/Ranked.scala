package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared KNN result postlude: bounded-heap top-k per query over a
  * scored frame, exploded to (query_id, rank, id, score) with the
  * 4-decimal rounding applied AFTER ranking. One definition keeps the
  * output contract (and oracle parity) identical across every search
  * path (exact, IVF, LSH, PQ, IVF_PQ, gemm).
  *
  * Input contract: columns (query_id, __s: double, id).
  */
private[graft] object Ranked {
  def topK(scored: DataFrame, k: Int, asc: Boolean): DataFrame =
    scored
      .groupBy("query_id")
      .agg(TopKAgg.topk(col("__s"), col("id"), k, asc).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__r")))
      .select(
        col("query_id"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__r.id").as("id"),
        round(col("__r.score"), 4).as("score"))
      .orderBy("query_id", "rank")

  /** Single-list variant: rank the global top-k of `df` under `order`
    * without a WindowExec. `orderBy(...).limit(k)` collapses to
    * TakeOrderedAndProject (distributed k-merge, one sorted output
    * partition — never a global sort); the explicit coalesce(1) +
    * sortWithinPartitions pins the single-partition total order
    * independent of planner choice (k rows — free), and rank is then a
    * monotonically_increasing_id projection over that one partition
    * (partition 0 ⇒ consecutive 0-based ids in row order). Replaces
    * the unpartitioned `row_number()` postlude, which emitted a
    * `WindowExec: No Partition Defined` warning on every run despite
    * only ever seeing k rows — identical values, quiet plan, and no
    * RDD closure (pure expressions, nothing for ClosureCleaner to
    * clean). */
  def rankTop(df: DataFrame, k: Int, order: Column*): DataFrame = {
    val top = df.orderBy(order: _*).limit(k)
      .coalesce(1).sortWithinPartitions(order: _*)
    top
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("int"))
      .select(col("rank") +: top.columns.map(col): _*)
  }
}
