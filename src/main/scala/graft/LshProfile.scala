package graft

import org.apache.spark.sql.functions._

/** Scratch profiler for the banded embedding-dedup join (VERDICT r4 #4):
  * candidate volume vs verify cost per band config at sf0.1. */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]",
      shufflePartitions = 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = graft.sources.Tables.embeddings(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = embs.count()
    println(s"corpus=$n")

    for ((nBits, bands, t) <- Seq((32, 16, 0.45), (64, 32, 0.45), (64, 16, 0.5), (64, 8, 0.8))) {
      val buckets = graft.dedup.Dedup
        .lshBandBuckets(embs, "vec_id", "embedding", nBits, bands, 42L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      buckets.count()
      var t0 = System.nanoTime()
      val rawCand = buckets.as("x").join(buckets.as("y"),
          col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
            col("x.doc_id") < col("y.doc_id")).count()
      val tRaw = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val distinctCand = graft.dedup.Dedup
        .lshCandidatesFromBuckets(buckets, bands).count()
      val tDistinct = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val pairs = graft.dedup.Dedup
        .embedLshFromBuckets(buckets, embs, "vec_id", "embedding", t, bands).count()
      val tFull = (System.nanoTime() - t0) / 1e9
      buckets.unpersist()
      val allPairs = n * (n - 1) / 2
      println(f"""{"config":"nBits=$nBits bands=$bands t=$t","raw_collisions":$rawCand,""" +
        f""""distinct_cand":$distinctCand,"all_pairs":$allPairs,""" +
        f""""cand_frac":${distinctCand.toDouble / allPairs}%.4f,""" +
        f""""sec_raw":$tRaw%.2f,"sec_distinct":$tDistinct%.2f,"sec_full":$tFull%.2f,"pairs":$pairs}""")
    }
    spark.stop()
  }
}
