package graft

/** Round-14 optimization measurement harness (guide §1): times a list
  * of SparkEntry queries in ONE JVM with exactly the Bench session
  * (master local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus, AQE
  * on), after the same warmup discipline (one untimed pass builds the
  * IndexStore artifacts), and dumps each query's
  * `.explain("formatted")` to plans/r14/<name>_<phase>.txt so the
  * before/after plan diff is a committed artifact.
  *
  * Usage: runMain graft.OptProbe <sfDir> <phase> [names...]
  * phase = "before" | "after" (the plans/r14 filename suffix) or
  * "time" (no plan dump). Timed action = .count(), the bench's.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val phase = if (args.length > 1) args(1) else "time"
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val planDir = java.nio.file.Paths.get("plans/r14")
    java.nio.file.Files.createDirectories(planDir)
    // warmup: untimed pass builds IndexStore artifacts + codegen
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[optprobe] warmup $n failed: ${e.getMessage}") }
    }
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (phase != "time") {
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(planDir.resolve(s"${n}_$phase.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      val scanParts =
        try df.queryExecution.toRdd.getNumPartitions catch { case _: Throwable => -1 }
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[optprobe] $n failed: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[optprobe] $n%-32s min=${ts.head}%.3f med=${ts(1)}%.3f max=${ts(2)}%.3f parts=$scanParts")
    }
    spark.stop()
  }
}
