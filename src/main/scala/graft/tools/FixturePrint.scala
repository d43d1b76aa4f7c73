package graft.tools

import org.apache.spark.sql.functions._

/** One-shot fixture printer for the r14 artifact-as-fixture oracles
  * (q_ivf_assign / q_quality_score): trains the pinned models through
  * the REAL training paths and prints the exact values the DuckDB
  * oracles inline as VALUES (and the specs pin). Round-trip precision:
  * Double.toString (shortest repr that parses back to the same
  * double in both JVMs and DuckDB's strtod). */
object FixturePrint {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(master = "local[8]",
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- IVF assign centroids ----------------------------------------
    val cents = graft.SparkEntry.ivfAssignCentroidsFor(spark)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    cents.foreach { case (cell, c) =>
      println(s"CENT $cell [${c.map(d => java.lang.Double.toString(d)).mkString(", ")}]")
    }
    // second train to witness determinism
    val again = graft.vector.IvfIndex.centroids(
      graft.vector.IvfIndex.train(
        graft.SparkEntry.ivfAssignTrainInput(spark), "vec", nlist = 8,
        maxIter = 20), spark)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    println("CENT_DETERMINISTIC " +
      (cents.map(_._2.toList).toList == again.map(_._2.toList).toList))

    // ---- quality micro model ------------------------------------------
    val m6 = graft.SparkEntry.qcMicroModelFor(spark)
    println(s"QC_INTERCEPT6 ${m6.intercept6}")
    // bucket per corpus token via the same HashingTF
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
    import spark.implicits._
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("feat")
      .setNumFeatures(graft.SparkEntry.QcNumFeatures)
    val buckets = tf.transform(vocab.map(t => Tuple1(Seq(t))).toDF("toks"))
      .select(org.apache.spark.ml.functions.vector_to_array(col("feat")).as("fa"))
      .collect().map(_.getSeq[Double](0).indexWhere(_ > 0.0))
    vocab.zip(buckets).foreach { case (t, b) =>
      println(s"QC_TOKEN $t bucket=$b w6=${m6.coef6(b)}")
    }
    // determinism witness: retrain + quantize must reproduce
    val again6 = graft.ops.QualityClassifier.quantize(
      graft.ops.QualityClassifier.train(
        graft.SparkEntry.QcScoreCorpus.toDF("text", "__label").coalesce(1),
        "text", "__label", graft.SparkEntry.QcNumFeatures))
    println("QC_DETERMINISTIC " + (again6.intercept6 == m6.intercept6 &&
      again6.coef6.toSeq == m6.coef6.toSeq))
    spark.stop()
  }
}
