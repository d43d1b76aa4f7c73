package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** Shared HNSW graph-artifact maintenance: crash-ordered segment
  * appends, tiered (Lucene-style) compaction, and mid-merge crash
  * recovery over a seg-partitioned graph collection. One discipline,
  * two owners — [[GraftCollection]] (collection-level index, meta on
  * the collection itself) and [[GraftCollectionView]] (the chunk
  * graph, meta on the graph collection) — so the orderings audited on
  * the collection path (claim → write → publish; never-clobbered
  * pending marker; merge marker covering the fold's two-write window)
  * cannot drift between the two.
  *
  * All meta keys live under the `index.hnsw.` prefix of `metaColl`:
  * m/efc/segments (build params), seed/heur, nextseg (claimed segment
  * watermark), gen (serving-cache nonce), pending (crashed-append
  * sweep marker), merge_pending (crashed-fold marker).
  */
private[api] final case class HnswStore(catalog: Catalog, db: String,
                                        metaColl: String, graphColl: String) {
  def meta: Map[String, String] = catalog.describeCollection(db, metaColl)
  def update(entries: Map[String, String]): Unit =
    catalog.updateMeta(db, metaColl, entries)
}

private[api] object HnswMaintain {
  private val P = "index.hnsw."
  /** One graph per ~200k rows keeps segment build memory and
    * per-segment search latency pinned regardless of batch size. */
  private def shardsFor(n: Long): Int = (((n - 1) / 200000) + 1).toInt

  /** Append `keyed` (already null-filtered and numeric-keyed by `kid`)
    * as fresh graph segments. CLAIM nextseg first (plus a `pending`
    * crash marker), write partitions second, PUBLISH the gen nonce and
    * clear the marker last. A crash after the claim can only leave the
    * batch temporarily unindexed (the surviving marker tells the next
    * compaction to sweep ids missing from the graph) — never orphan
    * graph rows that searches would traverse, and never a later
    * smaller append overwriting part of a dead claim (that append
    * allocates ABOVE the claimed range). The gen moves only once the
    * rows are really there, so a search interleaving between the steps
    * caches the pre-append graph under the pre-append gen.
    *
    * A SURVIVING marker from an earlier crashed append is never
    * overwritten and outlives this append's success — it is the only
    * evidence that sweep-eligible ids exist. The marker is single-slot
    * by design: any surviving marker means "sweep at next compaction",
    * which covers every crashed batch at once. */
  /** @return the LARGEST appended shard's actual row count (0 for an
    *         empty batch) — the basis callers max-fold into a derived
    *         default serving beam (row 123: an appended segment larger
    *         than the stored derivation's basis must widen the
    *         default, or it serves under-beamed until compaction).
    *         Actual counts, not ⌈n/shards⌉: shards are xxhash64-hash-
    *         split, so the largest can exceed the ceil-average — the
    *         same basis error compaction's re-derivation closes (one
    *         small groupBy over the batch; the single-shard common
    *         case pays nothing, the count IS the shard size). */
  def append(st: HnswStore, keyed: DataFrame, kid: String, vecCol: String,
             meta: Map[String, String]): Long = {
    val n = keyed.count()
    if (n > 0) {
      val shards = shardsFor(n)
      val maxShard =
        if (shards == 1) n
        else keyed.groupBy(pmod(xxhash64(col(kid).cast("long")), lit(shards)))
          .count().agg(max("count")).head.getLong(0)
      val offset = meta.getOrElse(P + "nextseg", meta(P + "segments")).toInt
      val foreignPending = meta.get(P + "pending")
      st.update(Map(P + "nextseg" -> (offset + shards).toString,
        P + "pending" -> foreignPending.getOrElse(offset.toString)))
      st.catalog.overwritePartitions(st.db, st.graphColl,
        graft.vector.HnswIndex.build(keyed, kid, vecCol,
          meta(P + "m").toInt, meta(P + "efc").toInt,
          shards, meta.getOrElse(P + "seed", "42").toLong,
          segOffset = offset,
          heuristic = meta.getOrElse(P + "heur", "false").toBoolean),
        "seg")
      st.update(Map(P + "gen" -> GraftCollection.freshGen()) ++
        (if (foreignPending.isEmpty) Map(P + "pending" -> null)
         else Map.empty[String, String]))
      maxShard
    } else 0L
  }

  /** Tiered compaction. `live` = the CURRENT snapshot's node rows
    * (`id` = numeric node key, `vecCol`) — folds rebuild from live
    * data, so stale nodes (deleted / re-uploaded rows) fall out of any
    * folded segment. Segments below half the per-segment target fold
    * into fresh segments at O(merged); base-tier graphs are untouched
    * until their tier fills. When nothing is fold-worthy the whole
    * graph re-derives at the configured segment count (the full
    * re-derive that also garbage-collects base-tier stale nodes).
    * Merged graphs are byte-equal to a from-scratch build over the
    * same rows at the same offset (build is deterministic).
    *
    * The unindexed sweep (an O(corpus ids) anti-join) runs ONLY when
    * the pending crash marker survived an append (or a merge recovery
    * armed it) — the marked claim is the one way ids can be missing
    * from the graph, so normal folds never pay a corpus-wide scan.
    *
    * `publishExtra` merges into the final meta publish (the collection
    * records its mutation-ledger base_seg there; the view has none). */
  def compact(st: HnswStore, live: DataFrame, vecCol: String,
              meta0: Map[String, String],
              publishExtra: Map[String, String] = Map.empty): Unit = {
    // a surviving merge marker means a tiered merge crashed between
    // its writes — recover FIRST (drop the dead attempt's overlapping
    // output), then run a normal pass over the repaired artifact
    val meta = meta0.get(P + "merge_pending") match {
      case Some(marker) => recover(st, marker); st.meta
      case None => meta0
    }
    val graph = st.catalog.read(st.db, st.graphColl)
    val counts = graph.groupBy("seg").count().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val cfgSegs = meta(P + "segments").toInt
    val target = math.max(1L, (total + cfgSegs - 1) / cfgSegs)
    val small = counts.filter(_._2 < (target + 1) / 2).map(_._1).toSeq
    val unindexed =
      if (meta.contains(P + "pending"))
        live.join(graph.select("id").distinct(), Seq("id"), "left_anti")
      else live.limit(0)
    val mergeTiered = small.length >= 2 || !unindexed.isEmpty
    if (mergeTiered) {
      // disjoint by construction: small-seg ids ⊆ graph ids, unindexed
      // ids ∉ graph ids; each side is id-unique (live is), so no distinct
      val smallIds = graph.where(col("seg").isin(small: _*)).select("id").distinct()
      val rows = live.join(smallIds, Seq("id"), "left_semi")
        .unionByName(unindexed)
      val n = rows.count()
      val offset = meta.getOrElse(P + "nextseg", meta(P + "segments")).toInt
      if (n > 0) {
        val shards = shardsFor(n)
        // claim-first, marker-guarded (the append discipline, extended
        // to the merge's two-write window): the marker records the
        // attempt's output range AND the doomed small segments, so a
        // crash anywhere between here and the final meta publish is
        // detected and repaired by the NEXT compaction ([[recover]])
        // instead of leaving the merged ids duplicated across old
        // mini-segments and the new merged segment
        st.update(Map(P + "nextseg" -> (offset + shards).toString,
          P + "merge_pending" -> s"$offset:$shards:${small.mkString(",")}"))
        st.catalog.overwritePartitions(st.db, st.graphColl,
          graft.vector.HnswIndex.build(rows, "id", vecCol,
            meta(P + "m").toInt, meta(P + "efc").toInt,
            shards, meta.getOrElse(P + "seed", "42").toLong,
            segOffset = offset,
            heuristic = meta.getOrElse(P + "heur", "false").toBoolean),
          "seg")
      }
      st.catalog.dropPartitions(st.db, st.graphColl, "seg", small.map(_.toString))
      st.update(Map(
        P + "gen" -> GraftCollection.freshGen(),
        P + "pending" -> null,
        P + "merge_pending" -> null) ++ publishExtra)
    } else {
      st.catalog.write(st.db, st.graphColl,
        graft.vector.HnswIndex.build(live, "id", vecCol,
          meta(P + "m").toInt, meta(P + "efc").toInt,
          cfgSegs, meta.getOrElse(P + "seed", "42").toLong,
          heuristic = meta.getOrElse(P + "heur", "false").toBoolean),
        partitionBy = Seq("seg"))
      st.update(Map(
        P + "nextseg" -> meta(P + "segments"),
        P + "gen" -> GraftCollection.freshGen(),
        P + "pending" -> null,
        P + "merge_pending" -> null) ++ publishExtra)
    }
  }

  /** Repair a tiered merge that crashed mid-flight. The marker
    * (`offset:shards:smallSegs`) names the dead attempt's output range
    * and the small segments it meant to fold:
    *
    *  - ANY listed small segment still present ⇒ the attempt may have
    *    stopped anywhere (partial merged write, or complete write with
    *    partial drops) and its output overlaps the survivors — drop
    *    the whole output range `[offset, offset+shards)` and arm the
    *    unindexed sweep (a small segment that WAS dropped before the
    *    crash leaves its ids indexed nowhere until the sweep folds
    *    them back from the data snapshot). The pass that follows then
    *    redoes the fold over intact inputs.
    *  - NO listed small segment present ⇒ the merged write and every
    *    drop landed; only the final meta publish was lost. Nothing to
    *    repair — clear the marker and let the following pass publish a
    *    fresh gen. */
  def recover(st: HnswStore, marker: String): Unit = {
    val Array(offS, shardsS, smallsS) = marker.split(":", 3)
    val dead = (offS.toInt until offS.toInt + shardsS.toInt).map(_.toString)
    val smalls = smallsS.split(",").filter(_.nonEmpty).map(_.toInt).toSet
    val present = st.catalog.read(st.db, st.graphColl).select("seg").distinct()
      .collect().map(_.getInt(0)).toSet
    if (smalls.exists(present)) {
      st.catalog.dropPartitions(st.db, st.graphColl, "seg", dead)
      st.update(Map(
        P + "pending" -> offS,
        P + "merge_pending" -> null,
        P + "gen" -> GraftCollection.freshGen()))
    } else
      st.update(Map(P + "merge_pending" -> null))
  }
}
