package graft.hybrid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-search fusion — the reference's `Rerank` types
  * (/root/reference/aiotcvectordb/model/document.py: RRFRerank(k),
  * WeightedRerank(weights)) applied to one dense (ANN) and one sparse
  * (keyword) ranked list.
  *
  * Both fusions are expressed as UNION ALL + groupBy-sum of per-list
  * contributions rather than N-way outer joins: the union is
  * shuffle-free, the single groupBy on (group, id) is the only
  * exchange, and with at most one contribution per list the double
  * summation is order-independent (IEEE addition is commutative), so
  * results are deterministic and oracle-exact.
  */
object Fusion {

  /** Reciprocal-rank fusion: score(id) = Σ_lists 1/(k + rank).
    *
    * @param lists each (groupCols..., idCol, rankCol)
    */
  def rrf(lists: Seq[DataFrame], groupCols: Seq[String], idCol: String,
          rankCol: String, k: Int = 60, topN: Int = 10): DataFrame = {
    val contribs = lists.map { df =>
      df.select((groupCols :+ idCol).map(col) :+
        (lit(1.0) / (lit(k) + col(rankCol))).as("__c"): _*)
    }.reduce(_ unionAll _)
    val fused = contribs.groupBy((groupCols :+ idCol).map(col): _*)
      .agg(sum(col("__c")).as("rrf"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("rrf").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
      .select(groupCols.map(col) ++ Seq(col("rank"), col(idCol),
        round(col("rrf"), 6).as("rrf")): _*)
      .orderBy(groupCols.map(col) :+ col("rank"): _*)
  }

  /** Weighted score fusion: score(id) = Σ_lists w_i * score_i.
    *
    * Inputs are 4-decimal scores and weights, so every fused score is an
    * EXACT decimal — computed in DECIMAL arithmetic end-to-end. Rounding
    * the double sum instead would sit exactly on .00005 boundaries
    * (0.7·x₄ + 0.3·y₄ has 5 decimals) where Spark's BigDecimal HALF_UP
    * and DuckDB's scaled std::round disagree about the 4th decimal.
    *
    * @param lists (df, weight) pairs, each df (groupCols..., idCol, scoreCol)
    */
  def weighted(lists: Seq[(DataFrame, Double)], groupCols: Seq[String], idCol: String,
               scoreCol: String, topN: Int = 10): DataFrame = {
    val contribs = lists.map { case (df, w) =>
      df.select((groupCols :+ idCol).map(col) :+
        (lit(w).cast("decimal(8,4)") * col(scoreCol).cast("decimal(18,4)")).as("__c"): _*)
    }.reduce(_ unionAll _)
    val fused = contribs.groupBy((groupCols :+ idCol).map(col): _*)
      .agg(sum(col("__c")).cast("double").as("score"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("score").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
      .select(groupCols.map(col) ++ Seq(col("rank"), col(idCol), col("score")): _*)
      .orderBy(groupCols.map(col) :+ col("rank"): _*)
  }
}
