package graft.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality measurement for the approximate ANN families —
  * the number a vector-db user asks first: what recall does an index
  * trade for its speed (the reference exposes the same trade through
  * its index params: /root/reference/aiotcvectordb/model/index.py
  * nlist/nprobe, PQ m/nbits).
  *
  * recall@k = |approx ∩ exact| / |exact| over a query batch, where
  * `exact` is the FLAT-index ground truth ([[KnnSearch.topK]]) at the
  * same k. Both sides are (query_id, id) sets, so the measure is
  * order-insensitive within the top-k (the standard definition; ties at
  * the k boundary can legitimately swap members, which charges the
  * approximate index only for genuinely missed neighbors when scores
  * are distinct).
  *
  * Scale shape: two top-k frames (nQueries × k rows each) — the join
  * is trivially broadcastable regardless of corpus size; the cost of a
  * measurement is the cost of running the two searches.
  */
object Recall {

  /** recall@k of `approx` against ground-truth `exact`; both frames
    * carry (query_id, id). 1.0 on an empty ground truth (nothing to
    * miss). */
  def atK(approx: DataFrame, exact: DataFrame): Double = {
    val e = exact.select("query_id", "id")
    val denom = e.count()
    // approx deduped: a caller handing over a raw banded join (a pair
    // surfaces once per agreeing band) must not count a hit twice —
    // recall could silently exceed 1 and floors would pass vacuously
    if (denom == 0L) 1.0
    else e.join(approx.select("query_id", "id").dropDuplicates(Seq("query_id", "id")),
      Seq("query_id", "id")).count().toDouble / denom
  }

  /** Pair recall of an approximate near-dup pair list against the
    * exhaustive truth; both frames carry (id_a, id_b) with a < b. The
    * dedup-family counterpart of [[atK]] (candidates-then-verify paths
    * have exact PRECISION by construction — the verify rescores — so
    * recall is the only quality axis). */
  def pairRecall(approx: DataFrame, truth: DataFrame): Double = {
    val t = truth.select("id_a", "id_b")
    val denom = t.count()
    if (denom == 0L) 1.0
    else t.join(approx.select("id_a", "id_b").dropDuplicates(Seq("id_a", "id_b")),
      Seq("id_a", "id_b")).count().toDouble / denom
  }
}
