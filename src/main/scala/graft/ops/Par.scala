package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism floor for CPU-heavy narrow stages (optimization guide
  * §2.5, "input skew: one huge unsplittable file … repartition
  * immediately after the read"). The test corpora are single parquet
  * files with one row group, so a scan yields ONE task no matter the
  * core count and an expensive per-row projection (per-gram md5,
  * per-token DP) serializes on one core while the other 31 idle.
  *
  * `floor` hash-repartitions by a deterministic key to the session's
  * default parallelism ONLY when the input's partitioning is below it:
  * on a real corpus (100 TB = many files / row groups) the scan
  * already carries >= cores partitions and the floor is a no-op — the
  * device is scale-adaptive, not a local[32] constant. Hash-by-key
  * rather than round-robin so task retries are deterministic
  * (SPARK-38388) and the keyless-repartition sort (SPARK-23207) is
  * never paid. The explicit partition count keeps AQE from coalescing
  * the stage back to one task (AQE honours user-specified counts).
  *
  * The exchange doubles as a projection barrier: a column materialized
  * below it (e.g. a token array) is computed once, where
  * CollapseProject would otherwise inline its expression into every
  * consumer — including per-element lambda bodies.
  *
  * The under-parallelized probe uses plan STATISTICS, never execution
  * (the [[graft.dedup.Dedup.embedCosine]] device): materializing the
  * RDD here would eagerly run any upstream AQE stages at plan-
  * construction time. A scan can only reach `cores` tasks when its
  * input is at least cores x maxPartitionBytes, so below that the
  * floor fires; above it the scan parallelizes naturally and the floor
  * is a no-op. Derived plans overestimate stats, which errs toward
  * skipping the repartition — the safe direction at scale. */
object Par {
  def floor(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(maxSplit) * target) df
    else df.repartition(target, key)
  }
}
