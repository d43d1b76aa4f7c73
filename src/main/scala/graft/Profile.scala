package graft
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[prof] $name%-30s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder(master = "local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = sources.Tables.documents(spark, dir)
    docs.count(); spark.read.parquet(s"$dir/embeddings.parquet").count()

    def jaccard(ng: org.apache.spark.sql.DataFrame) = {
      val sizes = ng.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = ng.as("a").join(ng.as("b"), col("a.g")===col("b.g") && col("a.doc_id")<col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).agg(count(lit(1)).as("inter"))
      val jac = col("inter") / (col("sz_a") + col("sz_b") - col("inter"))
      inter.join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
        .where(jac >= 0.5).select(col("id_a"))
    }
    // plain x2
    time("ngram plain x1")(jaccard(dedup.Dedup.ngrams(docs, "doc_id", "text", 3)).count())
    time("ngram plain x2")(jaccard(dedup.Dedup.ngrams(docs, "doc_id", "text", 3)).count())
    // persisted
    val ngp = dedup.Dedup.ngrams(docs, "doc_id", "text", 3).persist(StorageLevel.MEMORY_AND_DISK)
    time("ngram persist x1")(jaccard(ngp).count())
    time("ngram persist x2")(jaccard(ngp).count())
    ngp.unpersist()
    time("ivf_search x1")(SparkEntry.queries("q_ivf_search")(spark, dir).count())
    time("ivf_search x2")(SparkEntry.queries("q_ivf_search")(spark, dir).count())
    time("ivf_build x2")(SparkEntry.queries("q_ivf_build")(spark, dir).count())
    spark.stop()
  }
}
