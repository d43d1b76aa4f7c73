package graft

/** Isolated maintenance-arm probe (r11 verdict #1 — the bisect tool):
  * runs ONLY the Bench maintenance ops in a fresh JVM, no 3×136-query
  * timed suite before them, and prints each pass's numbers. If the
  * isolated numbers are fast while the in-suite numbers are slow, the
  * regression lives in suite-accumulated executor state (block-manager
  * cache pressure, GC debt), not in the maintenance code path — which
  * is exactly what distinguishes "the harness got heavier" (a
  * hypothesis) from a real plan regression (a diagnosis).
  *
  * Usage: runMain graft.MaintProbe [sfDir] [passes] [family]
  * family ∈ all|model|index|vector|w2v|rebuild (default model — the
  * r11 regression arm; "rebuild" = the r14 IVF_SQ8 rebuild/calibration
  * cost pair at 1× vs 8×). */
object MaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val family = if (args.length > 2) args(2) else "model"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // session through GraftSession.builder like Round12Probe (ADVICE
    // r12): a hand-rolled config here would drift from the bench this
    // probe exists to bisect the moment a new required flag lands only
    // in GraftSession
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ops(): Seq[(String, Double)] = family match {
      case "model" => Bench.modelMaintenanceOps(spark, sfDir)
      case "index" => Bench.maintenanceOps(spark, sfDir)
      case "vector" => Bench.vectorMaintenanceOps(spark, sfDir)
      case "w2v" => Bench.w2vMaintenanceOps(spark, sfDir)
      case "rebuild" => Bench.rebuildCostOps(spark, sfDir)
      case "all" => Bench.maintenanceOps(spark, sfDir) ++
        Bench.modelMaintenanceOps(spark, sfDir) ++
        Bench.vectorMaintenanceOps(spark, sfDir) ++
        Bench.w2vMaintenanceOps(spark, sfDir)
      // a typo'd family must FAIL, not silently run everything with
      // the typo stamped on the output — this is a bisect tool, and a
      // mislabeled row sends the investigation the wrong way
      case other => throw new IllegalArgumentException(
        s"unknown family '$other' (expected all|model|index|vector|w2v|rebuild)")
    }
    (1 to passes).foreach { i =>
      val kvs = ops()
      println(s"""{"probe":"maint_isolated","pass":$i,"family":"$family",""" +
        kvs.map { case (k, v) => "\"" + k + "\":" + math.round(v * 1000) / 1000.0 }
          .mkString(",") + "}")
    }
    spark.stop()
  }
}
