package graft

import org.apache.spark.sql.functions._

/** Storage-layout probe: measures what bucketed-by-id merge-on-write
  * buys over snapshot-rewrite upsert on a corpus far bigger than the
  * test data. The claim under test: a point-update batch (few ids)
  * touches a handful of hash buckets, so the partition-pruned merge
  * reads + rewrites only that sliver while the full rewrite pays the
  * whole collection every time.
  *
  * Usage: runMain graft.StorageProbe [nRows] [nBuckets] [batchIds]
  */
object StorageProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val buckets = if (args.length > 1) args(1).toInt else 64
    val batch = if (args.length > 2) args(2).toInt else 10

    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-storage-probe").toString
    val client = new graft.api.GraftClient(spark, root)
    val db = client.createDatabase("probe")

    def docs = spark.range(n).select(col("id"),
      concat(lit("payload-"), col("id")).as("payload"),
      (col("id") % 97).as("num"))
    // a point-update batch: `batch` arbitrary ids spread over the id space
    def upd = spark.range(batch).select((col("id") * (n / batch)).as("id"),
      lit("updated").as("payload"), lit(0L).as("num"))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    // untimed warmup so neither branch absorbs first-touch JVM/codegen
    val warm = db.createCollection("warm")
    warm.upsert(spark.range(1000).select(col("id"), lit("w").as("payload"),
      lit(0L).as("num")))
    warm.upsert(spark.range(10).select(col("id"), lit("w2").as("payload"), lit(0L).as("num")))

    val plain = db.createCollection("plain")
    time(s"initial plain write ($n rows)")(plain.upsert(docs))
    time(s"full-rewrite upsert of $batch ids")(plain.upsert(upd))

    val bucketed = db.createCollection("bucketed", Map("buckets" -> buckets.toString))
    time(s"initial bucketed write ($n rows)")(bucketed.upsert(docs))
    time(s"bucketed upsert of $batch ids")(bucketed.upsert(upd))

    // the scale argument is I/O VOLUME: rows re-read + rewritten by the
    // merge. Wall-clock at toy scale is constant-dominated (file count,
    // JVM); at 100 TB volume is everything.
    val touched = upd.select(pmod(xxhash64(col("id")), lit(buckets.toLong)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val sliceRows = docs.where(
      pmod(xxhash64(col("id")), lit(buckets.toLong)).cast("int")
        .isin(touched: _*)).count()
    println(f"[probe] volume: full rewrite touches $n rows; bucketed merge touches " +
      f"$sliceRows rows in ${touched.size} of $buckets buckets " +
      f"(${100.0 * sliceRows / n}%.1f%% of the collection)")

    require(bucketed.count() == n && plain.count() == n)
    spark.stop()
  }
}
