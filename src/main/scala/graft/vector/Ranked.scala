package graft.vector

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

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
    * partition — never a global sort), and rank is each row's position
    * in that order: a zip-with-index projection over the k survivors.
    * Replaces the unpartitioned `row_number()` postlude, which emitted
    * a `WindowExec: No Partition Defined` warning on every run despite
    * only ever seeing k rows — identical values, quiet plan. */
  def rankTop(df: DataFrame, k: Int, order: Column*): DataFrame = {
    val top = df.orderBy(order: _*).limit(k)
    val schema = StructType(
      StructField("rank", IntegerType, nullable = false) +: top.schema.fields)
    val rows = top.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 1).toInt +: r.toSeq)
    }
    top.sparkSession.createDataFrame(rows, schema)
  }
}
