package graft

import org.apache.spark.sql.functions._

/** Synthetic-scale probe for the SemDeDup cell-size cap: a corpus with
  * ONE deliberately hot cluster (the skew k-means expectation math
  * ignores) run through the production config capped and uncapped.
  *
  * What the numbers must show: the uncapped run's pair volume is
  * dominated by hot² (the within-cell self-join of the hot cell),
  * while the capped run's pair volume is bounded by rows·cap — and
  * wall time follows pair volume. The capped run's split depth should
  * be ≈ log₂(hot/cap), confirming the mean-centered bisection halves
  * the hot group per round instead of stalling the way origin-through
  * sign splits do on a tight cone.
  *
  * Usage: runMain graft.SemDedupProbe [nBackground] [nHot] [cap]
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val nBg = args.headOption.map(_.toLong).getOrElse(200000L)
    val nHot = if (args.length > 1) args(1).toLong else 50000L
    val cap = if (args.length > 2) args(2).toInt else 2000
    val dim = 32

    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // background: iid-uniform directions; hot cluster: a tight cone
    // around +e0 (components jittered by ±0.05) — every hot vector
    // lands in the same k-means cell by construction
    def synth(n: Long, hot: Boolean) = {
      val base = if (hot) "10.0 + cast(pmod(xxhash64(id * 37 + i), 1000) as double) / 10000.0"
                 else "cast(pmod(xxhash64(id * 64 + i), 10000) as double) / 5000.0 - 1.0"
      spark.range(n).toDF("id").select(col("id"),
        expr(s"transform(sequence(0, ${dim - 1}), i -> " +
          s"case when i = 0 then $base else " +
          "cast(pmod(xxhash64(id * 97 + i * 13), 1000) as double) / " +
          (if (hot) "10000.0" else "1000.0") + " end)").as("vec"))
    }
    val corpus = synth(nBg, hot = false)
      .unionAll(synth(nHot, hot = true)
        .select((col("id") + nBg).as("id"), col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()

    val assigned = corpus
      .select(col("id").as("doc_id"), col("vec").cast("array<double>").as("__v"))
      .withColumn("__cell", when(col("doc_id") >= nBg, lit(0))
        .otherwise(pmod(col("doc_id"), lit(16L)).cast("int") + 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()

    def pairVolume(src: org.apache.spark.sql.DataFrame, key: Seq[String]): Long =
      src.groupBy(key.map(col): _*).agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2"))).head().getLong(0)

    // uncapped: the hot cell's n² dominates
    val t0 = System.nanoTime()
    val rawPairs = pairVolume(assigned.withColumn("__sub", lit(1L)),
      Seq("__cell", "__sub"))
    val tRaw = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val capped = graft.dedup.Dedup.capCells(assigned, "__v", cap, seed = 42L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = capped.groupBy("__cell", "__sub").agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("pairs"),
        max("n").as("maxGroup"), count(lit(1)).as("groups")).head()
    val tCap = (System.nanoTime() - t1) / 1e9
    val depth = capped.agg(max(expr("int(log2(__sub))"))).head().getInt(0)

    println(f"""{"probe":"semdedup_cap","n":${nBg + nHot},"hot":$nHot,"cap":$cap,""" +
      f""""uncapped_pairs":$rawPairs,"capped_pairs":${stats.getLong(0)},""" +
      f""""max_group":${stats.getLong(1)},"groups":${stats.getLong(2)},""" +
      f""""split_depth":$depth,"expected_depth":${(math.log(nHot.toDouble / cap) / math.log(2)).ceil.toInt},""" +
      f""""cap_sec":$tCap%.1f,"count_sec":$tRaw%.1f}""")
    spark.stop()
  }
}
