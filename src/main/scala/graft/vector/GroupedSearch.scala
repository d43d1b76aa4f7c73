package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped vector search — top `limitGroups` GROUPS per query, each
  * carrying its top `groupSize` members (the Milvus `group_by_field` /
  * Vespa grouping shape): retrieval that must not let one near-
  * duplicate cluster monopolize the result page, and the serving face
  * of dedup-aware retrieval over a chunked corpus (group = document,
  * members = its best chunks).
  *
  * Semantics: groups rank per query by their BEST member score
  * (ties → smaller group key), members rank within their group by
  * (score, id) — both total orders, so the result is deterministic and
  * fully SQL-oracle-able.
  *
  * Scale shape: queries broadcast, the scan never shuffles vectors —
  * scoring happens in whole-stage codegen ([[VectorScore]]) and BOTH
  * rankings reduce through bounded heaps ([[TopKAgg]]): per
  * (query, group) heaps of `groupSize` before the only wide exchange,
  * then per-query heaps of `limitGroups` over the one-row-per-group
  * bests. No WindowExec anywhere — a window over (query, group) would
  * sort corpus-sized partitions; the heap form moves
  * O(queries · groups · groupSize) rows total.
  */
object GroupedSearch {

  /** Group keys ride through [[TopKAgg]], which accepts long or string
    * ids — integral group columns widen to long, strings stay. Any
    * other type is REJECTED: a silent cast("long") would truncate
    * non-integral keys (1.2 and 1.7 both → 1) and merge distinct
    * groups without an error. */
  private[graft] def grpNorm(df: DataFrame, grpCol: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(grpCol).dataType match {
      case StringType => col(grpCol)
      case ByteType | ShortType | IntegerType | LongType => col(grpCol).cast("long")
      case other => throw new IllegalArgumentException(
        s"group column $grpCol has type ${other.catalogString}: grouped search " +
          "supports string and integral group keys (a lossy cast would " +
          "silently merge distinct groups)")
    }
  }

  /** @return (query_id, grp_rank, grp, rank, id, score) ordered by
    *         (query_id, grp_rank, rank); scores rounded to 4 decimals
    *         AFTER both rankings (oracle parity with every other
    *         search route). */
  def groupedTopK(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      grpCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      metric: String,
      limitGroups: Int,
      groupSize: Int,
      filter: Option[Column] = None): DataFrame = {
    require(limitGroups > 0 && groupSize > 0,
      s"limitGroups=$limitGroups and groupSize=$groupSize must be positive")
    // results are keyed by query id — duplicates would silently pool
    // two queries' scores into one heap (the same guard every coded
    // route carries, here on the DataFrame form: one tiny aggregate
    // over the query batch, which is RPC-bounded by contract). The
    // check runs on the NORMALIZED id — idNorm casts non-string qids
    // to long, so two raw qids of 1.2 and 1.7 would pass a raw-column
    // check and still merge downstream (review finding).
    val qCounts = queries
      .select(KnnSearch.idNorm(queries, qIdCol).as("__qid"))
      .agg(count(lit(1)), countDistinct(col("__qid"))).head
    require(qCounts.getLong(0) == qCounts.getLong(1),
      "duplicate query ids (after id normalization): results are keyed by query id")
    val m = VectorMetric(metric)
    val asc = !m.largerIsBetter
    // a null group key is unsearchable-by-group, the same contract as
    // null vectors: dropped HERE, before any scoring — TopKAgg skips
    // null ids anyway, so heaping those rows would be silent waste
    val corpus = filter.foldLeft(data)(_ where _)
      .where(col(grpCol).isNotNull)
      .select(KnnSearch.idNorm(data, idCol).as("id"),
        grpNorm(data, grpCol).as("grp"), col(vecCol).as("__vec"))
    val q = broadcast(queries.select(
      KnnSearch.idNorm(queries, qIdCol).as("query_id"), col(qVecCol).as("__qvec")))
    val scored = corpus.crossJoin(q)
      .select(col("query_id"), col("grp"),
        VectorScore.score(m.name, col("__vec"), col("__qvec")).as("__s"),
        col("id"))
    rankGrouped(scored, limitGroups, groupSize, asc)
  }

  /** The double-bounded-heap grouped ranking over an already-scored
    * frame (query_id, grp, __s: double raw, id) — shared by the exact
    * route above and the ANN-served arm (which feeds it graph-beam
    * candidates instead of the full corpus). Output contract:
    * (query_id, grp_rank, grp, rank, id, score-rounded-4), ordered. */
  private[graft] def rankGrouped(scored: DataFrame, limitGroups: Int,
                                 groupSize: Int, asc: Boolean): DataFrame = {
    // per-(query, group): bounded member heap + the group's raw best
    // (min/max is exact — no summation — so the group ranking below
    // compares the same doubles the oracle computes)
    val perGrp = scored.groupBy("query_id", "grp")
      .agg(TopKAgg.topk(col("__s"), col("id"), groupSize, asc).as("__top"),
        (if (asc) min(col("__s")) else max(col("__s"))).as("__best"))

    // per-query: rank groups by best member — one row per non-empty
    // group feeds this heap, so it is groups-bounded, not corpus-bounded
    val grpRanked = perGrp
      .groupBy("query_id")
      .agg(TopKAgg.topk(col("__best"), col("grp"), limitGroups, asc).as("__gt"))
      .select(col("query_id"), posexplode(col("__gt")).as(Seq("__gpos", "__gr")))
      .select(col("query_id"), (col("__gpos") + 1).cast("int").as("grp_rank"),
        col("__gr.id").as("grp"))

    grpRanked.join(perGrp, Seq("query_id", "grp"))
      .select(col("query_id"), col("grp_rank"), col("grp"),
        posexplode(col("__top")).as(Seq("__pos", "__r")))
      .select(col("query_id"), col("grp_rank"), col("grp"),
        (col("__pos") + 1).cast("int").as("rank"),
        col("__r.id").as("id"), round(col("__r.score"), 4).as("score"))
      .orderBy("query_id", "grp_rank", "rank")
  }
}
