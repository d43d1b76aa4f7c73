package graft

import org.apache.spark.sql.functions._

/** Stage-cost breakdown for the verified-twin dedup queries
  * (q_dedup_simhash_verified / q_dedup_minhash_verified): candidate
  * generation vs array-attach join vs the per-pair intersect, plus the
  * exact size-ratio prune rate (J <= min|gs|/max|gs|, so pairs failing
  * min >= t*max can be dropped before their gram arrays are ever
  * attached). Run: sbt "runMain graft.VerifyPairsProfile [sfDir]". */
object VerifyPairsProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup
    import graft.sources.Tables

    val sig = graft.catalog.IndexStore.ensure(spark,
        s"simhashsig_${SparkEntry.sfKey(sfDir)}") {
        Dedup.simhashSignatures(Tables.documents(spark, sfDir), "doc_id", "text")
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sets = SparkEntry.gramSetsFor(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"sig=${sig.count()} sets=${sets.count()}")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    (1 to 2).foreach { pass =>
      println(s"-- pass $pass --")
      val cand = time("candidates.count") {
        Dedup.simhashCandidates(sig, 8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      val nCand = cand.count()
      val szs = sets.select(col("doc_id"), size(col("__gs")).as("n"))
      val kept = time("size-ratio survivors") {
        cand.join(szs.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
          .join(szs.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
          .where(least(col("na"), col("nb")).cast("double") /
            greatest(col("na"), col("nb")) >= 0.5)
          .count()
      }
      val keptPct = if (nCand == 0) 100.0 else 100.0 * kept / nCand
      println(s"candidates=$nCand kept=$kept ($keptPct%)")
      time("attach-arrays only") {
        cand
          .join(sets.select(col("doc_id").as("id_a"), col("__gs").as("__ga")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("__gs").as("__gb")), "id_b")
          .select(count(lit(1))).collect()
      }
      time("attach + intersect") {
        cand
          .join(sets.select(col("doc_id").as("id_a"), col("__gs").as("__ga")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("__gs").as("__gb")), "id_b")
          .select(sum(size(array_intersect(col("__ga"), col("__gb"))))).collect()
      }
      time("attach + merge-count") {
        cand
          .join(sets.select(col("doc_id").as("id_a"), col("__gs").as("__ga")), "id_a")
          .join(sets.select(col("doc_id").as("id_b"), col("__gs").as("__gb")), "id_b")
          .select(sum(graft.dedup.SortedIntersectCount(col("__ga"), col("__gb"))))
          .collect()
      }
      time("full verified query") {
        Dedup.simhashVerifiedFromSets(sig, sets, 8, 0.5).count()
      }
      cand.unpersist()
    }
    spark.stop()
  }
}
