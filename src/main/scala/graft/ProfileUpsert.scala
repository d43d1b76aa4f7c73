package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling of the incremental-upsert path (not part of the
  * driver contract). */
object ProfileUpsert {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val root = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("p").createCollection("docs", Map("buckets" -> "32"))
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text"))
    val docs = (0 until 64).map(i =>
        base.select((col("id") + lit(i * 1000000L)).as("id"), col("text")))
      .reduce(_ unionAll _)
    t("initial load")(coll.upsert(docs))
    t("rebuild fulltext")(coll.rebuildFulltextIndex())
    val ids = spark.range(10000000L, 12000000L).toDF("id")
      .where(pmod(xxhash64(col("id")), lit(32L)) === 0).limit(200)
      .collect().map(_.getLong(0)).toSeq
    val texts = base.limit(200).select(col("text")).collect().map(_.getString(0)).toSeq
    val batch = ids.zip(texts).toDF("id", "text")
    t("upsert live (1st)")(coll.upsert(batch))
    val batch2 = ids.map(_ + 7L).zip(texts).toDF("id", "text")
    t("upsert live (2nd)")(coll.upsert(batch2))
    t("rebuild fulltext again")(coll.rebuildFulltextIndex())
    val batch3 = ids.map(_ + 13L).zip(texts).toDF("id", "text")
    t("upsert live (3rd)")(coll.upsert(batch3))
    t("fulltext query")(coll.fulltext(Seq("spark", "data"), k = 10).count())
    spark.stop()
  }
}
