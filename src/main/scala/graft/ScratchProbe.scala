package graft

import org.apache.spark.sql.functions._

/** Scratch investigation probe for the r14 optimization round. */
object ScratchProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($r)")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup
    import graft.sources.Tables
    val embs = Tables.embeddings(spark, dir)
    embs.count()
    // warm
    Dedup.semDedup(embs, "vec_id", "embedding", eps = 0.45, nclusters = 1).count()
    t("semdedup x1")(
      Dedup.semDedup(embs, "vec_id", "embedding", eps = 0.45, nclusters = 1).count())
    t("semdedup pairs only")(
      Dedup.semDedupPairs(embs, "vec_id", "embedding", eps = 0.45, nclusters = 1).count())
    val pairs = Dedup.semDedupPairs(embs, "vec_id", "embedding", 0.45, 1)
    t("connectedComponents over pairs")(
      Dedup.connectedComponents(pairs, "id_a", "id_b").count())
    // prod config
    val centDf = graft.catalog.IndexStore.ensure(spark, s"semcent8_${SparkEntry.sfKey(dir)}") {
      graft.vector.IvfIndex.centroids(
        graft.vector.IvfIndex.train(embs, "embedding", nlist = 8, maxIter = 10), spark)
    }
    val cents = graft.vector.IvfIndex.centersFromDf(centDf)
    Dedup.semDedup(embs, "vec_id", "embedding", 0.45, 8,
      centers = Some(cents), maxCellSize = 4096, assignMargin = 0.05).count()
    t("semdedup_prod x1")(
      Dedup.semDedup(embs, "vec_id", "embedding", 0.45, 8,
        centers = Some(cents), maxCellSize = 4096, assignMargin = 0.05).count())
    t("semdedup_prod pairs only")(
      Dedup.semDedupPairs(embs, "vec_id", "embedding", 0.45, 8,
        centers = Some(cents), maxCellSize = 4096, assignMargin = 0.05).count())
    spark.stop()
  }
}
