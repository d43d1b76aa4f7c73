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

  /** Exact-rerank input: the ORIGINAL (id, vector) rows of `data`
    * restricted to the candidate (query_id, id) pairs. `nodeKey` maps
    * data rows onto the candidates' id space — `None` = the id column
    * cast to long (numeric-PK collections: the historical plan,
    * byte-identical); `Some(k)` = a surrogate key (string-PK
    * collections key their graph/coded artifacts by xxhash64(id), the
    * chunk layer's device). With a surrogate the OUTPUT id is the real
    * id column, so a 64-bit collision can only merge two documents'
    * candidacy — the ranked output is always over real ids. `bcast`
    * broadcast-hints the candidate side (the PQ-family rerank's
    * bounded k·candMult rows); traversal paths whose exhaustive
    * certificate makes candidates corpus-sized leave the choice to
    * AQE. */
  def candidateRows(data: DataFrame, idCol: String, vecCol: String,
                    cand: DataFrame, nodeKey: Option[Column],
                    bcast: Boolean): DataFrame = {
    val c0 = cand.select(col("query_id"), col("id"))
    val c = if (bcast) broadcast(c0) else c0
    nodeKey match {
      case None =>
        data.select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
          .join(c, "id")
      case Some(nk) =>
        data.select(nk.as("__nk"), col(idCol).as("id"), col(vecCol).as("__v"))
          .join(c.withColumnRenamed("id", "__nk"), "__nk")
          .drop("__nk")
    }
  }

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
