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
      expr(s"transform(sequence(0, ${dim - 1}), i -> cast(sin((id + 1) * (i * 2 + 3)) as double))")
        .as("vec"))
    // cache so the timed region measures scoring, not sin() generation
    val corpus = synth(spark.range(n).toDF("id")).cache()
    val queries = synth(spark.range(nq).toDF("id")).withColumnRenamed("id", "qid")
      .withColumnRenamed("vec", "qvec")

    corpus.count() // warm + materialize cache
    val scored = n * nq

    def run(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val res = mk
      val rows = res.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $label n=$n dim=$dim queries=$nq k=$k -> $rows rows in $sec%.1f s " +
        f"= ${scored / sec / 1e6}%.1f M vector-scores/s " +
        f"(${scored * dim * 2 / sec / 1e9}%.1f GFLOP/s)")
      val top1 = res.where(col("rank") === 1).select("query_id", "id").collect()
      assert(top1.forall(r => r.getLong(0) == r.getLong(1)), s"$label self-match failed")
    }

    // the expression path materializes |corpus| x |queries| joined rows
    // through the BNLJ — beyond ~128 queries that collapses (measured
    // 3 M/s at nq=512 vs gemm's 143 M/s); skip it there
    if (nq <= 128)
      run("expr")(graft.vector.KnnSearch.topK(corpus, "id", "vec", queries,
        "qid", "qvec", "cosine", k))
    val qLocal = queries.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray))
    run("gemm")(graft.vector.KnnGemm.topKGemm(corpus, "id", "vec", qLocal, "cosine", k))

    // SQ8 coded scan: one uint8 per dim — the scan touches n·dim bytes
    // instead of n·dim·8, the memory-bandwidth play the family exists
    // for; the exact rerank restores the self-match the assert demands
    val sqModel = graft.vector.SqIndex.train(corpus, "vec")
    val enc = graft.vector.SqIndex.encode(sqModel, corpus, "id", "vec").cache()
    enc.count()
    run("sq8")(graft.vector.SqIndex.searchRerank(sqModel, enc, corpus,
      "id", "vec", qLocal, k, candMult = 10))
    spark.stop()
  }
}
