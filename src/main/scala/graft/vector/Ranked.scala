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

  /** The certificate gates' fp-rounding slack: widening a provable-
    * superset gate only grows the candidate set, never the answer.
    * ONE definition — the radius and kth-upper-bound routes across all
    * four quantized families must not be allowed to drift apart. */
  @inline private[vector] def gateEps(gate: Double): Double =
    gate + 1e-9 * (math.abs(gate) + 1.0)

  /** Overrides the exact-rerank postlude's scoring space — the cosine
    * arm of the certificate routes (r12 verdict #1): a cosine-built
    * quantized index stores codes of the UNIT-NORMALIZED vectors, so
    * the codes-level gates run in that L2 gate space (on the unit
    * sphere cos(q,x) ≥ r ⇔ ‖q̂−x̂‖₂ ≤ √(2−2r), the same triangle
    * certificates), while the final rerank must score/gate/rank the
    * STORED METRIC over the RAW vectors with the RAW queries — the
    * SAME VectorScore expression, gate direction and heap order as the
    * FLAT route, which is what keeps the byte-equality argument:
    * provable superset + identical postlude. `radius` is in metric
    * space (cosine: keep similarity ≥ r). */
  private[graft] final case class Rerank(metric: String,
                                         queries: Array[(Long, Array[Double])],
                                         radius: Option[Double])

  /** Shared exact-rerank postlude of the certificate routes (SQ / PQ /
    * IVF_SQ8 / IVF_PQ radius and kth-upper-bound top-k): fetch the
    * ORIGINAL vectors of the gate's (query_id, id) survivors, score
    * the stored metric against the broadcast query batch (L2 when no
    * `rerank` override — the historical plan, byte-identical),
    * optionally apply the exact radius gate, bounded top-k. `cand` is
    * ball/top-k-superset-sized, so the join side is left to AQE
    * (bcast=false). An empty `cand` flows through normally — the
    * output schema (including the id column's type, which
    * candidateRows binds from `data`) is identical to the non-empty
    * path's, string PKs included. */
  private[graft] def exactRerank(data: DataFrame, idCol: String, vecCol: String,
                                 cand: DataFrame,
                                 queries: Array[(Long, Array[Double])],
                                 k: Int, radius: Option[Double],
                                 nodeKey: Option[Column],
                                 rerank: Rerank = null): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val rr = if (rerank == null) Rerank("l2", queries, radius) else rerank
    val m = VectorMetric(rr.metric)
    val qdf = rr.queries.toSeq.toDF("query_id", "__qv")
    val scored = candidateRows(data, idCol, vecCol, cand, nodeKey, bcast = false)
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"),
        VectorScore.score(m.name, col("__v"), col("__qv")).as("__s"),
        col("id"))
    val gated = rr.radius.fold(scored)(r =>
      if (m.largerIsBetter) scored.where(col("__s") >= r)
      else scored.where(col("__s") <= r))
    topK(gated, k, asc = !m.largerIsBetter)
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
