package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once, read-many parquet materialization for derived indexes
  * (BM25 postings, corpus embeddings, chunk indexes) keyed by a logical
  * name. The reference server maintains these structures persistently
  * at ingest/rebuild time (client/stub.py rebuild_index,
  * fulltext_search against a stored inverted index); queries then read
  * the index instead of re-deriving it from the raw corpus — the
  * difference between O(postings-of-query-terms) and O(corpus) per
  * query, which is the whole game at 100 TB.
  *
  * Each JVM rebuilds an index the first time it is requested (so a
  * stale on-disk copy from an older code version can never leak into
  * results) and serves every subsequent request from the parquet files.
  */
object IndexStore {

  private val built = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def root: String = sys.env.getOrElse("GRAFT_INDEX_DIR",
    System.getProperty("java.io.tmpdir") + "/graft-index")

  /** Read the index named `key`, building + persisting it first if this
    * JVM has not yet done so. `build` runs fully distributed; the
    * returned frame is a plain parquet scan (filters push down).
    * `partitionBy` lays the files out under key=value directories, so
    * equality/In filters on those columns prune whole directories at
    * file listing (PartitionFilters). */
  def ensure(spark: SparkSession, key: String, partitionBy: Seq[String] = Nil)
            (build: => DataFrame): DataFrame = {
    val path = java.nio.file.Paths.get(root, key.replaceAll("[^A-Za-z0-9_.-]", "_")).toString
    synchronized {
      // mark as built only AFTER the write succeeds: a failed/interrupted
      // build must be retried by the next caller, not served as a
      // phantom empty index for the rest of the JVM's life
      if (!built.contains(path)) {
        val df = build
        // output-file sizing (guide §6): small artifacts otherwise land
        // as shuffle.partitions tiny files (32 x ~10 KB here) and every
        // consumer query pays per-file open + task overhead on each
        // scan. The file budget derives from plan statistics
        // (bytes / 128 MB target, zero jobs), so a 100 TB build keeps
        // its parallelism; coalesce — never repartition — preserves a
        // builder's range-clustered, sorted-within layout (rowgroup
        // pruning) since it concatenates partitions in order.
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        val files = (bytes / (128L * 1024 * 1024) + 1)
          .min(BigInt(200000)).toInt
        val w = df.coalesce(files).write.mode("overwrite")
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
        built.add(path)
      }
    }
    spark.read.parquet(path)
  }
}
