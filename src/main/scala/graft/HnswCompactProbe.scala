package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** Probe for the TIERED HNSW compaction policy: the same appended
  * batch folded against a 1x and a `mult`x base corpus.
  *
  * What the numbers must show: fold time tracks the MERGED rows (the
  * appended batch), not the corpus — the base-tier graphs are never
  * read or rewritten — while the full from-scratch build time (also
  * printed, from the initial rebuild) grows with the corpus. That is
  * the difference between auto-compaction being O(batch·tier) and
  * every fold being O(corpus) under sustained ingest.
  *
  * Usage: runMain graft.HnswCompactProbe [nBase] [mult] [batch] [dim]
  */
object HnswCompactProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(200000L)
    val mult = if (args.length > 1) args(1).toInt else 4
    val batch = if (args.length > 2) args(2).toLong else 20000L
    val dim = if (args.length > 3) args(3).toInt else 32

    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def synth(from: Long, n: Long) = spark.range(from, from + n).toDF("id")
      .select(col("id"), expr(s"transform(sequence(0, ${dim - 1}), " +
        "i -> cast(pmod(xxhash64(id * 64 + i), 10000) / 5000.0 - 1.0 as float))")
        .as("vector"))

    Seq(("1x", nBase), (s"${mult}x", nBase * mult)).foreach { case (tag, n) =>
      val root = Files.createTempDirectory(s"graft-hcprobe-$tag").toString
      val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
      coll.setAutoCompact(0) // folds are timed manually below
      coll.upsert(synth(0, n))
      val segments = math.max(1L, n / 100000L).toInt
      val t0 = System.nanoTime()
      coll.rebuildHnswIndex(m = 16, efConstruction = 80, numSegments = segments)
      val tBuild = (System.nanoTime() - t0) / 1e9

      // the appended batch becomes its own mini-segment(s); a second
      // small batch guarantees >= 2 small segments so the tiered path
      // (not the full re-derive) is what gets timed
      coll.upsert(synth(n, batch))
      coll.upsert(synth(n + batch, batch))
      val segsBefore = coll.hnswGraphSegments
      val t1 = System.nanoTime()
      coll.compactIndexes()
      val tFold = (System.nanoTime() - t1) / 1e9
      val segsAfter = coll.hnswGraphSegments

      println(f"""{"probe":"hnsw_compact_$tag","n":$n,"segments":$segments,""" +
        f""""merged_rows":${2 * batch},"full_build_sec":$tBuild%.1f,""" +
        f""""tiered_fold_sec":$tFold%.1f,""" +
        f""""segs_before":$segsBefore,"segs_after":$segsAfter}""")
    }
    spark.stop()
  }
}
