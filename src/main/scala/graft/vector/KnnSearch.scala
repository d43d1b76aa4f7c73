package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact (FLAT-index) batch KNN, radius search, and search-by-id —
  * the reference's `collection.search` / `search_by_id` semantics
  * (/root/reference/aiotcvectordb/model/collection.py: search with
  * vectors|document_ids, limit, radius, filter, output_fields).
  *
  * Scale shape: the query batch is small (an RPC carries at most a few
  * hundred vectors) and the data side is huge, so queries are BROADCAST
  * and the scan side never shuffles. Scoring happens in whole-stage
  * codegen ([[VectorScore]]); per-partition bounded heaps ([[TopKAgg]])
  * reduce each partition to k rows per query before the only shuffle
  * (the final k-merge). Plan: Scan → BroadcastNestedLoopJoin →
  * partial TopKAgg → exchange(query_id) → final TopKAgg.
  */
object KnnSearch {

  /** Keep string PKs as-is (the reference's document ids are strings),
    * widen numeric ids to long. */
  private[graft] def idNorm(df: DataFrame, idCol: String): Column =
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.StringType => col(idCol)
      case _ => col(idCol).cast("long")
    }

  /** Batch exact top-k.
    *
    * @param data     corpus with `idCol: long` and `vecCol: array<float|double>`
    * @param queries  small query batch with `qIdCol`, `qVecCol`
    * @param metric   cosine | l2 | ip
    * @param filter   reference `filter` param — applied BEFORE scoring so
    *                 Catalyst pushes it into the parquet scan
    * @return (query_id, rank, id, score) with score rounded to 4 decimals,
    *         ordered by (query_id, rank); ties broken by smaller id
    */
  def topK(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      metric: String,
      k: Int,
      filter: Option[Column] = None): DataFrame = {
    val m = VectorMetric(metric)
    val corpus = filter.foldLeft(data)(_ where _)
      .select(idNorm(data, idCol).as("id"), col(vecCol).as("__vec"))
    val q = broadcast(
      queries.select(idNorm(queries, qIdCol).as("query_id"), col(qVecCol).as("__qvec")))
    val scored = corpus.crossJoin(q)
      .select(col("query_id"),
        VectorScore.score(m.name, col("__vec"), col("__qvec")).as("__s"),
        col("id"))
    Ranked.topK(scored, k, asc = !m.largerIsBetter)
  }

  /** Radius (score-threshold) search: reference `radius` param. For
    * similarity metrics keeps score >= radius, for L2 keeps distance
    * <= radius. No top-k heap — this is a pure filtered scan. */
  def radius(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      metric: String,
      r: Double,
      filter: Option[Column] = None): DataFrame = {
    val m = VectorMetric(metric)
    val corpus = filter.foldLeft(data)(_ where _)
      .select(idNorm(data, idCol).as("id"), col(vecCol).as("__vec"))
    val q = broadcast(
      queries.select(idNorm(queries, qIdCol).as("query_id"), col(qVecCol).as("__qvec")))
    val scored = corpus.crossJoin(q)
      .select(col("query_id"), col("id"),
        VectorScore.score(m.name, col("__vec"), col("__qvec")).as("__s"))
    val kept = if (m.largerIsBetter) scored.where(col("__s") >= r)
               else scored.where(col("__s") <= r)
    kept.select(col("query_id"), col("id"), round(col("__s"), 4).as("score"))
      .orderBy("query_id", "id")
  }

  /** radius AND limit together (the reference's search accepts both):
    * top-k among the rows within the radius. The radius predicate runs
    * BEFORE the bounded heap, so each partition still reduces to at
    * most k in-radius rows before the only shuffle. */
  def radiusTopK(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      metric: String,
      r: Double,
      k: Int,
      filter: Option[Column] = None): DataFrame =
    Ranked.topK(
      radiusScored(data, idCol, vecCol, queries, qIdCol, qVecCol, metric, r, filter),
      k, asc = !VectorMetric(metric).largerIsBetter)

  /** The in-radius scored rows (query_id, __s, id) with RAW scores — the
    * shared radius stage of [[radiusTopK]], also the shape a caller's
    * own window-rank top-k composes on (which the RankLimitToTopK rule
    * then fuses back into the bounded heap). */
  private[graft] def radiusScored(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      metric: String,
      r: Double,
      filter: Option[Column] = None): DataFrame = {
    val m = VectorMetric(metric)
    val corpus = filter.foldLeft(data)(_ where _)
      .select(idNorm(data, idCol).as("id"), col(vecCol).as("__vec"))
    val q = broadcast(
      queries.select(idNorm(queries, qIdCol).as("query_id"), col(qVecCol).as("__qvec")))
    val scored = corpus.crossJoin(q)
      .select(col("query_id"),
        VectorScore.score(m.name, col("__vec"), col("__qvec")).as("__s"),
        col("id"))
    if (m.largerIsBetter) scored.where(col("__s") >= r)
    else scored.where(col("__s") <= r)
  }

  /** Hard-negative mining — for each anchor, the top-k nearest
    * neighbors with a DIFFERENT label (contrastive/embedding training
    * wants negatives that are CLOSE to the anchor but known
    * non-positives; random negatives are too easy to teach anything).
    * The label test is null-safe (NULL vs non-NULL labels differ, two
    * NULLs match — SQL IS DISTINCT FROM), and an anchor can never mine
    * itself (it shares its own label). Same plan shape as [[topK]]:
    * broadcast anchors, codegen'd score + label predicate on the scan,
    * bounded per-partition heaps — the corpus never shuffles. */
  def hardNegatives(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      qLabelCol: String,
      metric: String,
      k: Int): DataFrame = {
    val m = VectorMetric(metric)
    val corpus = data.select(idNorm(data, idCol).as("id"),
      col(vecCol).as("__vec"), col(labelCol).as("__lab"))
    val q = broadcast(queries.select(
      idNorm(queries, qIdCol).as("query_id"),
      col(qVecCol).as("__qvec"), col(qLabelCol).as("__qlab")))
    val scored = corpus.crossJoin(q)
      .where(!(col("__lab") <=> col("__qlab")))
      .select(col("query_id"),
        VectorScore.score(m.name, col("__vec"), col("__qvec")).as("__s"),
        col("id"))
    Ranked.topK(scored, k, asc = !m.largerIsBetter)
  }

  /** search_by_id: look the query vectors up from the stored corpus
    * (reference `search_by_id(document_ids=...)`), then run exact KNN.
    * The id lookup is a broadcast semi-join — no corpus shuffle. */
  def byId(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      ids: Seq[Any],
      metric: String,
      k: Int,
      filter: Option[Column] = None): DataFrame = {
    val queries = data
      .where(col(idCol).isin(ids: _*))
      .select(col(idCol).as("__qid"), col(vecCol).as("__qv"))
    topK(data, idCol, vecCol, queries, "__qid", "__qv", metric, k, filter)
  }
}
