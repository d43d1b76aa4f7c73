package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when a single key dominates an AGGREGATION
  * (AQE can't split a hash-aggregate group) or when join skew must be
  * fixed in the plan (e.g. a deterministic pipeline that can't rely on
  * runtime stats).
  */
object Skew {

  /** Two-phase salted aggregation: groupBy (key, salt) partials, then
    * merge partials per key. `partialAggs` must be re-aggregable (sum,
    * count→sum, min, max...). Spreads one hot key over `salts`
    * reducers.
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
                partialAgg: Column => Column, valueCol: Column): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
    salted.groupBy(key.as("__k"), col("__salt"))
      .agg(partialAgg(valueCol).as("__partial"))
      .groupBy(col("__k"))
      .agg(partialAgg(col("__partial")).as("agg"))
  }

  /** Salted join of a skewed fact against a small-ish dim: fact rows get
    * a random-free deterministic salt, the dim is exploded `salts` ways,
    * and the join key becomes (key, salt) — a hot fact key now lands on
    * `salts` reducers instead of one. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
