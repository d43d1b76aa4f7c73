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
    val embs = sources.Tables.embeddings(spark, dir)
    embs.count()
    time("embed all-pairs")(
      dedup.Dedup.embedCosine(embs, "vec_id", "embedding", 0.45).count())
    for (b <- Seq(32, 24, 16)) {
      time(s"embedLsh b=$b x1")(
        dedup.Dedup.embedLsh(embs, "vec_id", "embedding", 0.45, nBits = 2 * b, bands = b).count())
      time(s"embedLsh b=$b x2")(
        dedup.Dedup.embedLsh(embs, "vec_id", "embedding", 0.45, nBits = 2 * b, bands = b).count())
    }
    // where does the time go: candidates only vs full
    time("candidates b=32")(
      dedup.Dedup.lshCandidates(embs, "vec_id", "embedding", 64, 32, 42L).count())
    spark.stop()
  }
}
