package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-wins segment masking for incrementally maintained index
  * artifacts — the ONE implementation every family uses (fulltext
  * postings, LSH buckets, minhash/simhash signatures, PQ / IVF_PQ
  * codes), so the masking semantics can never diverge between
  * families sharing a mutation history.
  *
  * An artifact row in segment s is live iff
  * `s == greatest(baseSeg, ledger(doc_id))`: re-mutated docs serve
  * from their newest segment, untouched docs from the family's
  * rebuild segment, deleted ids from nowhere (their ledger tombstone
  * segment has no artifact rows).
  */
object SegMask {

  /** Segment partition column of incrementally maintained artifacts. */
  val SegCol = "__seg"

  /** Apply the mask. No-op for single-snapshot artifacts (no __seg
    * column); without a ledger every stored row is live (no mutations
    * since rebuild). `ledger` is the (doc_id, seg) mutation ledger;
    * `rowIdCol` names the artifact's document-id column. */
  def live(rows: DataFrame, rowIdCol: String,
           ledger: Option[DataFrame], baseSeg: Int): DataFrame =
    if (!rows.columns.contains(SegCol)) rows
    else ledger match {
      case None => rows.drop(SegCol)
      case Some(led) =>
        val l = led.select(col("doc_id").as("__lid"), col("seg").as("__live"))
        rows.join(l, rows(rowIdCol) === col("__lid"), "left")
          .where(col(SegCol) ===
            greatest(lit(baseSeg), coalesce(col("__live"), lit(0))))
          .drop("__lid", "__live", SegCol)
    }
}
