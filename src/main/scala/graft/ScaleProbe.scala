package graft

import org.apache.spark.sql.functions._

/** Synthetic-scale probe: measures exact-KNN scan throughput on a
  * seeded random corpus far bigger than the test data, to validate that
  * the broadcast + codegen + bounded-heap pipeline is compute-bound (it
  * should stream at memory bandwidth, with shuffle bytes independent of
  * corpus size).
  *
  * Usage: runMain graft.ScaleProbe [nVectors] [dim] [nQueries] [k]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val nq = if (args.length > 2) args(2).toInt else 8
    val k = if (args.length > 3) args(3).toInt else 10

    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic corpus: vec[i] = sin(id * primes[i]) — cheap,
    // fully distributed generation, no data skew
    def synth(ids: org.apache.spark.sql.DataFrame) = ids.select(col("id"),
      expr(s"transform(sequence(0, ${dim - 1}), i -> cast(sin(id * (i * 2 + 3)) as double))")
        .as("vec"))
    // cache so the timed region measures scoring, not sin() generation
    val corpus = synth(spark.range(n).toDF("id")).cache()
    val queries = synth(spark.range(nq).toDF("id")).withColumnRenamed("id", "qid")
      .withColumnRenamed("vec", "qvec")

    corpus.count() // warm + materialize cache
    val t0 = System.nanoTime()
    val res = graft.vector.KnnSearch.topK(corpus, "id", "vec", queries, "qid", "qvec",
      "cosine", k)
    val rows = res.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val scored = n * nq
    println(f"[scale] n=$n dim=$dim queries=$nq k=$k -> $rows rows in $sec%.1f s " +
      f"= ${scored / sec / 1e6}%.1f M vector-scores/s (${scored * dim / sec / 1e9}%.1f GFLOP-pair/s)")
    // sanity: top-1 of query q is corpus id q (identical vector, cosine 1)
    val top1 = res.where(col("rank") === 1).select("query_id", "id").collect()
    assert(top1.forall(r => r.getLong(0) == r.getLong(1)), "self-match failed")
    spark.stop()
  }
}
