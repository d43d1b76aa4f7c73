package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators: streaming upsert ingestion (the
  * continuous form of the reference's `upsert` — last-wins by key) and
  * watermarked windowed aggregation over the events stream.
  *
  * State is per-key and bounded: `mapGroupsWithState` keeps one row per
  * key (the current version of the document), watermarks bound the
  * window state — both are the shapes that survive unbounded streams on
  * a real cluster.
  */
object Streams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class KeyedLatest(user_id: Long, ts: Timestamp, event_id: Long,
                               event_type: String, value: Double, n_versions: Long)

  /** Streaming upsert: for each key emit the latest-by-(ts, event_id)
    * version seen so far plus how many versions arrived. The (ts,
    * event_id) tie-break is a total order, so the survivor is
    * independent of micro-batch arrival order (replay-safe). */
  def streamingUpsert(events: Dataset[Event]): Dataset[KeyedLatest] = {
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[KeyedLatest, KeyedLatest](GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Event], state: GroupState[KeyedLatest]) =>
          val incoming = rows.toSeq
          val prior = state.getOption
          val newest = (incoming.map(e =>
              KeyedLatest(key, e.ts, e.event_id, e.event_type, e.value, 1L)) ++ prior.toSeq)
            .maxBy(k => (k.ts.getTime, k.event_id))
          val updated = newest.copy(n_versions =
            prior.map(_.n_versions).getOrElse(0L) + incoming.size)
          state.update(updated)
          updated
      }(Encoders.product[KeyedLatest], Encoders.product[KeyedLatest])
  }

  /** Exactly-once-style streaming dedup: drop events whose event_id was
    * already seen within the watermark horizon. dropDuplicatesWithinWatermark
    * (not plain dropDuplicates on the id alone) is what lets Spark EVICT
    * per-id state once the watermark passes — the difference between
    * bounded state and an executor OOM on an unbounded stream. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user: events within `gap` of each other merge
    * into one session (watermark-bounded state). */
  def sessionize(events: DataFrame, gap: String = "5 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Continuous ingestion into a persisted collection: every
    * micro-batch is an upsert (last-wins by id) against the catalog
    * collection, so embed-at-ingest, bucketed merge-on-write, AND
    * incremental index maintenance all apply per batch — a collection
    * with a live fulltext/LSH/PQ/dedup index keeps serving fresh
    * results as the stream runs, each micro-batch appending its own
    * O(batch) index segment (the streaming form of the reference's
    * upsert with build_index=True). Precondition (same as upsert):
    * each batch carries at most one row per id. */
  def ingestInto(stream: DataFrame, coll: graft.api.GraftCollection,
                 checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // restart recovery fires empty batches — an unconditional upsert
        // would pay a full snapshot rewrite + index invalidation for a no-op
        if (!batch.isEmpty) coll.upsert(batch)
      }
      .start()

  /** Streaming curation ingest — the training-data front door as one
    * continuous pipeline: each micro-batch of raw documents is
    * quality-scored and thresholded, domain-sampled (deterministic
    * hash, so replays and retries sample identically), content-
    * fingerprinted, and upserted keyed BY the fingerprint. Exact
    * duplicates therefore collapse across the entire stream — a doc
    * re-arriving hours later overwrites its earlier self instead of
    * duplicating — with zero streaming dedup state: the collection is
    * the state, and incremental index maintenance (fulltext segments,
    * LSH buckets, …) applies per batch exactly as in [[ingestInto]].
    *
    * `nearDupThreshold` (requires the collection to have a minhash
    * index) extends the same state-free shape to NEAR-duplicates:
    * each batch is gated through
    * [[graft.api.GraftCollection.nearDupFilter]] before the upsert, so
    * a doc that is almost — but not byte — identical to anything
    * already ingested is suppressed at the door. The gate probes the
    * collection's own incrementally-maintained band-bucket index
    * (O(batch) per batch, pushed In(h) pruning), so here too the
    * collection IS the dedup state.
    *
    * `minClassifierProb` (requires a stored quality model,
    * [[graft.api.GraftCollection.trainQualityModel]]) adds the LEARNED
    * quality gate next to the heuristic one: each batch is scored
    * against the persisted model (a pure projection — O(batch), no
    * state) and rows below the probability floor drop at the door. The
    * heuristic floor (`minQuality`) and the learned floor compose; the
    * canonical pipeline bootstraps the model from the heuristic, then
    * gates the stream on both.
    *
    * `maxLmNll` (requires a stored bigram LM,
    * [[graft.api.GraftCollection.trainLmModel]]) adds the CCNet-style
    * perplexity gate: each batch's held-out NLL is scored against the
    * persisted count artifact (token-key joins, O(batch)) and rows
    * above the ceiling drop at the door — the third composable gate
    * next to the heuristic and learned ones. Token-less docs drop when
    * this gate is on (an LM cannot vouch for unscoreable text).
    *
    * `minDsirLogw` (requires a stored DSIR model,
    * [[graft.api.GraftCollection.trainDsirModel]]) adds the FOURTH
    * gate: DSIR importance weights against the persisted ratio table
    * (one broadcast join, O(batch)); rows below the log-weight floor —
    * insufficiently target-like — drop at the door. The threshold is
    * the streaming form of the paper's fixed-budget resampling (an
    * unbounded stream has no top-k); feature-less docs drop when the
    * gate is on, same as the LM gate's token-less contract.
    *
    * Curation params mirror [[graft.ops.Curation.curateBatch]]. */
  def curatedIngest(docs: DataFrame, coll: graft.api.GraftCollection,
                    checkpoint: String, idCol: String = "doc_id",
                    textCol: String = "text", domainCol: String = "source",
                    weights: Map[String, Double] = Map.empty,
                    defaultWeight: Double = 1.0,
                    minQuality: Double = 0.0,
                    nearDupThreshold: Option[Double] = None,
                    minClassifierProb: Option[Double] = None,
                    scrubPii: Boolean = false,
                    maxLmNll: Option[Double] = None,
                    maintainLm: Boolean = false,
                    minDsirLogw: Option[Double] = None): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist BEFORE the emptiness probe: curation carries scoring,
        // sampling, hashing, and a dedup shuffle — unpersisted, the
        // isEmpty check and the upsert would each run the whole plan
        val curated0 = graft.ops.Curation.curateBatch(
          batch, idCol, textCol, domainCol, weights, defaultWeight, minQuality,
          scrubPii = scrubPii)
        // learned gate: a where() over the scored single scan — the
        // curateBatch plan runs ONCE, never duplicated across a join
        val curated1 = minClassifierProb match {
          case Some(p) => coll.qualityGateOf(curated0, textCol, p)
          case None => curated0
        }
        // importance + perplexity gates: each is one batch-bounded
        // semi-join against a persisted artifact (curateBatch keyed
        // rows by content, so the gates join back on the "id" content
        // key). Persist every gate's INPUT: dsirGateOf/lmGateOf put
        // the batch plan on BOTH sides of their semi-join —
        // unpersisted, scoring, sampling, and the dedup shuffle would
        // execute twice per micro-batch per gate
        var gateInputs = List.empty[DataFrame]
        def gated1(in: DataFrame,
                   apply: DataFrame => DataFrame): DataFrame = {
          in.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          gateInputs ::= in
          apply(in)
        }
        var cur = curated1
        minDsirLogw.foreach(m =>
          cur = gated1(cur, coll.dsirGateOf(_, "id", textCol, m)))
        maxLmNll.foreach(ceil =>
          cur = gated1(cur, coll.lmGateOf(_, "id", textCol, ceil)))
        val curated = cur
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // curation can empty a batch (all filtered/sampled out) — skip
        // the snapshot rewrite, same as the restart-recovery guard above
        try {
          if (!curated.isEmpty) {
            // curateBatch keys rows by content (id = md5(text)): the
            // gate's same-id exclusion is then exactly "byte-identical
            // re-arrival updates, near-identical suppresses"
            val gated = nearDupThreshold match {
              case Some(t) => coll.nearDupFilter(curated, t,
                batchIdCol = Some("id"), batchTextCol = Some(textCol))
              case None => curated
            }
            if (nearDupThreshold.isEmpty || !gated.isEmpty) {
              // optional LM maintenance: fold the admitted batch's
              // counts into the stored artifact — exact (additive
              // sufficient statistic), O(batch types + stored types),
              // the fulltext index's per-batch discipline without its
              // O(corpus) rebuild. Fold ONLY content ids not already
              // stored, MATERIALIZED before the upsert mutates the
              // snapshot: rows are content-keyed (id = md5(text)), so
              // a byte-identical re-arrival — an upsert no-op — must
              // not add its counts twice, and a foreachBatch REPLAY
              // (at-least-once) sees its docs already stored and folds
              // nothing. The fold runs after the upsert commits; a
              // crash in between under-counts that one batch (visible,
              // recoverable by re-running trainLmModel) rather than
              // silently double-counting forever. With maxLmNll also on, the
              // model self-reinforces on admitted docs — the CCNet
              // trusted-corpus mode trains once elsewhere and never
              // sets this flag.
              // checkpoint (RDD-level, eager), not persist+count: a
              // persisted block dropped under memory pressure would
              // silently RECOMPUTE the anti-join against the
              // post-upsert snapshot (fold skipped for the whole
              // batch); checkpointing severs the lineage, so the
              // pre-upsert evaluation is the only one that can ever be
              // served. The RDD handle is kept so the finally can
              // UNPERSIST the checkpoint blocks — an unbounded stream
              // must not accumulate per-batch blocks until driver GC
              // happens to collect the frame
              val fresh = if (!maintainLm) None else {
                val raw = gated.join(coll.df.select(col("id")), Seq("id"),
                  "left_anti")
                val rdd = raw.rdd.localCheckpoint()
                rdd.count() // materialize: pin the pre-upsert snapshot NOW
                Some((raw.sparkSession.createDataFrame(rdd, raw.schema), rdd))
              }
              try {
                coll.upsert(gated)
                fresh.filterNot(_._1.isEmpty)
                  .foreach(p => coll.updateLmModel(p._1, "id", textCol))
              } finally fresh.foreach(_._2.unpersist(blocking = false))
            }
          }
        } finally { curated.unpersist(); gateInputs.foreach(_.unpersist()) }
      }
      .start()

  /** Watermarked sliding-window aggregation over the events stream. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))
}
