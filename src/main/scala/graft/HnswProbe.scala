package graft

import org.apache.spark.sql.functions._

import graft.vector.{HnswIndex, KnnSearch, Recall}

/** Synthetic-scale probe for the HNSW family: build throughput and
  * search cost as the corpus grows with segment SIZE held fixed — the
  * 100 TB deployment shape, where segment count scales out with the
  * corpus and each segment's build memory / traversal cost stays
  * pinned.
  *
  * What the numbers must show:
  *  - build time grows ~linearly with the corpus (segments build
  *    independently inside one mapPartitions — more segments, same
  *    per-segment work, scheduled across cores/executors);
  *  - per-query search cost grows with SEGMENT COUNT, not corpus size
  *    (candidates = segments · ef cross the one shuffle) — the knob
  *    story: at fixed segment size, doubling the corpus doubles the
  *    candidate volume; raising the segment size bounds it;
  *  - recall@10 at the production ef stays flat as segments multiply
  *    (every segment is searched — sharding adds candidates, never
  *    drops them).
  *
  * Usage: runMain graft.HnswProbe [nBase] [mult] [dim] [segSize] [ef]
  */
object HnswProbe {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.length > 0) args(0).toLong else 250000L
    val mult = if (args.length > 1) args(1).toInt else 4
    val dim = if (args.length > 2) args(2).toInt else 64
    val segSize = if (args.length > 3) args(3).toLong else 62500L
    val ef = if (args.length > 4) args(4).toInt else 48

    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hash-based iid-uniform components — NOT ScaleProbe's sin
    // manifold, which is a 1D curve where ~100 corpus vectors sit
    // within 1e-3 cosine of any query's rank-10 score (measured):
    // recall@10 against such near-tie clusters gauges float noise,
    // not graph quality. Throughput probes don't care; a recall
    // metric does.
    def synth(n: Long) = spark.range(n).toDF("id").select(col("id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "i -> cast(pmod(xxhash64(id * 64 + i), 10000) / 5000.0 - 1.0 as float))")
        .as("vec"))

    val nq = 8
    Seq(("1x", nBase), (s"${mult}x", nBase * mult)).foreach { case (tag, n) =>
      val segments = math.max(1L, n / segSize).toInt
      val corpus = synth(n).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count()
      val queries = synth(nq).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))

      val t0 = System.nanoTime()
      val graph = HnswIndex.build(corpus, "id", "vec", m = 16,
        efConstruction = 80, numSegments = segments)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val gRows = graph.count()
      val tBuild = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val res = HnswIndex.search(graph, corpus, "id", "vec", queries,
        "cosine", k = 10, ef = ef)
      res.count()
      val tSearch = (System.nanoTime() - t1) / 1e9

      val qdf = synth(nq).select(col("id").as("qid"), col("vec").as("qvec"))
      val gt = KnnSearch.topK(corpus, "id", "vec", qdf, "qid", "qvec", "cosine", 10)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      gt.count()
      val rec = Recall.atK(res, gt)
      // ef sweep: iid-uniform vectors are the known hard case for
      // graph ANN (no cluster structure, concentrated distances) —
      // the sweep shows how much candidate budget buys back
      val sweep = Seq(ef * 2, ef * 4).map { e =>
        val r = Recall.atK(HnswIndex.search(graph, corpus, "id", "vec",
          queries, "cosine", k = 10, ef = e), gt)
        f""""recall@10_ef$e":$r%.4f"""
      }.mkString(",")

      // Algorithm-4 neighbor selection (diverse edges) vs the simple
      // keep-closest rule, at MATCHED ef — the build-quality knob the
      // paper recommends for exactly this hard case
      val tH0 = System.nanoTime()
      val graphH = HnswIndex.build(corpus, "id", "vec", m = 16,
        efConstruction = 80, numSegments = segments, heuristic = true)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graphH.count()
      val tBuildH = (System.nanoTime() - tH0) / 1e9
      val sweepH = (Seq(ef) ++ Seq(ef * 2, ef * 4)).map { e =>
        val r = Recall.atK(HnswIndex.search(graphH, corpus, "id", "vec",
          queries, "cosine", k = 10, ef = e), gt)
        f""""heur_recall@10_ef$e":$r%.4f"""
      }.mkString(",")
      graphH.unpersist()
      gt.unpersist()

      println(f"""{"probe":"hnsw_$tag","n":$n,"segments":$segments,""" +
        f""""build_sec":$tBuild%.1f,"build_vecs_per_sec":${gRows / tBuild}%.0f,""" +
        f""""search_sec":$tSearch%.2f,"per_query_sec":${tSearch / nq}%.3f,""" +
        f""""ef":$ef,"recall@10":$rec%.4f,$sweep,""" +
        f""""heur_build_sec":$tBuildH%.1f,$sweepH}""")
      graph.unpersist(); corpus.unpersist()
    }
    spark.stop()
  }
}
