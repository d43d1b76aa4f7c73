package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.filter.FilterParser

/** Document CRUD surface of the reference collection API re-expressed as
  * DataFrame transforms: upsert / query / count / delete / update
  * (/root/reference/aiotcvectordb/model/collection.py `upsert`, `query`,
  * `delete`, `update`, plus stub.py count semantics).
  *
  * Batch engines have no in-place mutation; each op returns the new
  * snapshot of the collection (the caller persists it — e.g. rewrites
  * the parquet collection dir via [[graft.catalog.Catalog]]).
  */
object DocumentOps {

  /** Parse a reference filter-language string to a Catalyst predicate. */
  def filterCol(filter: String): Column = FilterParser.parse(filter)

  /** `query(filter, sort, limit, offset, output_fields)`.
    * Sort keys: (column, ascending). A trailing id sort should be
    * included by the caller for full determinism when keys tie. */
  def query(
      df: DataFrame,
      filter: String = "",
      sort: Seq[(String, Boolean)] = Nil,
      limit: Option[Int] = None,
      offset: Int = 0,
      outputFields: Seq[String] = Nil): DataFrame = {
    var out = df.where(FilterParser.parse(filter))
    if (sort.nonEmpty)
      out = out.orderBy(sort.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)
    if (offset > 0) out = out.offset(offset)
    out = limit.fold(out)(out.limit)
    if (outputFields.nonEmpty) out = out.select(outputFields.map(col): _*)
    out
  }

  /** `query(document_ids=..., output_fields=...)`. The id set is a
    * literal IN-list so it prunes at the scan. */
  def byIds(df: DataFrame, idCol: String, ids: Seq[Any], outputFields: Seq[String] = Nil): DataFrame = {
    val filtered = df.where(col(idCol).isin(ids: _*))
    if (outputFields.nonEmpty) filtered.select(outputFields.map(col): _*) else filtered
  }

  /** `count(filter)` as an aggregate over the filtered scan. */
  def countRows(df: DataFrame, filter: String = ""): DataFrame =
    df.where(FilterParser.parse(filter)).agg(count(lit(1)).as("cnt"))

  /** `upsert`: last-wins merge by id (reference upsert replaces the
    * whole document for an existing id). One hash shuffle on the id;
    * at scale both sides should be bucketed by id to make this
    * shuffle-free. Precondition: `updates` has no internal id dups. */
  def upsert(base: DataFrame, updates: DataFrame, idCol: String): DataFrame = {
    val cols = base.columns
    val tagged = updates.select(cols.map(col): _*).withColumn("__v", lit(1))
      .unionAll(base.withColumn("__v", lit(0)))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__v").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__v", "__rn")
  }

  /** `delete(filter, limit)`: with a limit, deletes the first `limit`
    * matches ordered by id (deterministic, mirrors a stable server).
    * The doomed-id set is tiny → broadcast anti-join, corpus never
    * shuffles. Without a limit it's a pure negated filter. */
  def delete(df: DataFrame, idCol: String, filter: String, limit: Option[Int] = None): DataFrame =
    deleteSplit(df, idCol, filter, limit)._1

  /** [[delete]] split into (survivors, doomed) from ONE shared
    * derivation — callers that tombstone indexes for the doomed rows
    * while writing the survivors (incremental index maintenance) can
    * never desync the two sets, because there is no second place for
    * the limit/ordering semantics to drift. */
  def deleteSplit(df: DataFrame, idCol: String, filter: String,
                  limit: Option[Int] = None): (DataFrame, DataFrame) = {
    // NULL-predicate rows did NOT match the filter -> they survive
    // (coalesce, else `!pred` is NULL and where() drops them — silent
    // data loss, and inconsistent with update()/the limit branch)
    val pred = coalesce(FilterParser.parse(filter), lit(false))
    limit match {
      case None => (df.where(!pred), df.where(pred))
      case Some(n) =>
        val doomedIds = df.where(pred).select(col(idCol)).orderBy(col(idCol)).limit(n)
        (df.join(broadcast(doomedIds), Seq(idCol), "left_anti"),
          df.join(broadcast(doomedIds), Seq(idCol), "left_semi"))
    }
  }

  /** `update(filter, set)`: set columns on matching rows, keep the rest.
    * A single projection over the scan — no shuffle at all. */
  def update(df: DataFrame, filter: String, set: Map[String, Column]): DataFrame = {
    val pred = FilterParser.parse(filter)
    val projections = df.columns.map { c =>
      set.get(c) match {
        case Some(v) => when(pred, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }
    df.select(projections.toSeq: _*)
  }
}
