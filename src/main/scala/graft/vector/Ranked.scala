package graft.vector

import org.apache.spark.sql.DataFrame
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
}
