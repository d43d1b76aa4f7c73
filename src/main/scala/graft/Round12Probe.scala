package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.vector._

/** The round-12 probe blocks alone (diversity-ladder work accounting +
  * IVF_SQ8 cell-certificate cluster-geometry sweep), runnable at ANY
  * scale factor in minutes — RecallProbe runs the full historical sweep
  * first, which at sf0.1 costs more wall-clock than the two new tables
  * are worth re-measuring behind. Same output format (one JSON line per
  * row) so SURVEY §7-probes tables cite either source.
  *
  * Usage: runMain graft.Round12Probe [sfDir] [nQueries] [k]
  */
object Round12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = if (args.length > 1) args(1).toInt else 16
    val k = if (args.length > 2) args(2).toInt else 10

    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]",
      shufflePartitions = 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val embs = Tables.embeddings(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusN = embs.count()
    val queries = embs.where(col("vec_id") < nQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

    // ---- diversity-arm LADDER work accounting (the §7-probes-r12
    // block, at this scale factor — shared block, ProbeUtil) ----------
    val probeRoot = java.nio.file.Files.createTempDirectory("graft-probe-r12").toString
    val probeDb = new graft.api.GraftClient(spark, probeRoot).createDatabase("p")
    ProbeUtil.diversityLadders(probeDb, embs, queries, corpusN, k)

    // ---- grouped page recovery: FIXED-beam ef sweep at this SF ------
    // (the §7-probes-r11 grouped_hnsw_page device at the target corpus
    // — the §5b-r12 ef-vs-corpus guidance's measured basis)
    ProbeUtil.groupedPageRecovery(embs, queries, Seq(12, 24, 48, 96, 192),
      (config, v) => println(f"""{"family":"grouped_hnsw_page","config":"n=$corpusN $config","value":$v%.4f}"""))

    // ---- IVF_SQ8 cell certificate vs CLUSTER GEOMETRY ---------------
    // (the §7-probes-r12 sweep at this SF's corpus size; commentary in
    // ProbeUtil.cellGeometrySweep)
    ProbeUtil.cellGeometrySweep(spark, corpusN, nQ, k,
      Seq(0.25, 0.5, 1.0, -1.0),
      (geo, config, v) => println(
        f"""{"family":"sq_radius_cells_$geo","config":"$config","value":$v%.4f}"""))
    // ---- radius serving: LADDER vs CERTIFICATE cost at matched
    // selectivity (the r11 verdict #5 done-criterion) -----------------
    // The row-102 adaptive beam ladder (l2-metric HNSW) vs the row-118
    // IVF_SQ8 certificate, radii matched to ball-occupancy mixes from
    // the exact L2 ground truth (tight / boundary / easy — the
    // hnsw_radius_ladder convention). The grid reports BOTH axes of
    // the trade the router rides on: cost (wall seconds min-of-3 after
    // a warm pass; ladder rung telemetry) AND exactness — the
    // certificate is exact BY CONSTRUCTION at every radius, while the
    // adaptive ladder's boundary-stop rule is a PROXY below the
    // exhaustive rung (its sub-exhaustive recall is measured, not
    // guaranteed — §7-probes-r10), so ladder_recall here is its ball
    // overlap against the certificate's exact result. That asymmetry
    // is the routing rationale stated in row 118: when the certificate
    // artifacts exist, search(radius) gets exactness at comparable
    // cost; the ladder remains the route for graph-indexed collections
    // where no certificate exists.
    // NOTE: one vector index at a time (beginVectorRebuild invalidates
    // the others — the reference's one-index-per-collection model), so
    // the two routes live on two SAME-DATA collections; the comparison
    // is still apples-to-apples (identical corpus, queries, radii).
    locally {
      val data = embs.select(col("vec_id").as("id"),
        col("embedding").as("vector"))
      val collH = probeDb.createCollection("routeH")
      collH.upsert(data)
      collH.rebuildHnswIndex(m = 8, efConstruction = 64, numSegments = 4,
        metric = "l2")
      val collC = probeDb.createCollection("routeC")
      collC.upsert(data)
      collC.rebuildIvfSqIndex() // auto ceil(sqrt(N)) nlist — production default
      // the r13 SIDECAR arm: the SAME graph as routeH plus the SQ8
      // certificate maintained NEXT TO it — the configuration that
      // lets the reference's default (graph-indexed) collection serve
      // param-less radius through the certificate router instead of
      // the ladder or the FLAT scan
      val collS = probeDb.createCollection("routeS")
      collS.upsert(data)
      collS.rebuildHnswIndex(m = 8, efConstruction = 64, numSegments = 4,
        metric = "l2")
      collS.buildCertificateSidecar()
      val gtL2 = KnnSearch.topK(embs, "vec_id", "embedding", queries,
        "qid", "qvec", "l2", k).cache()
      gtL2.count()
      def pct(a: Array[Double], p: Double): Double =
        a(math.min((a.length * p).toInt, a.length - 1))
      val d2 = gtL2.where(col("rank") === 2).select("score")
        .collect().map(_.getDouble(0)).sorted
      val dk = gtL2.where(col("rank") === k).select("score")
        .collect().map(_.getDouble(0)).sorted
      gtL2.unpersist()
      def timed(body: => Long): Double = {
        body // warm
        (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }.min
      }
      for ((name, r) <- Seq(("tight", pct(d2, 0.1)),
          ("boundary", pct(dk, 0.5)), ("easy", pct(dk, 0.9)))) {
        def key(rows: Seq[org.apache.spark.sql.Row]) =
          rows.map(x => (x.getLong(0), x.getLong(2))).toSet
        val viaLadder = key(collH.searchHnswRadius(queries, "qid", "qvec",
          radius = r, limit = k, ef = 10).collect().toSeq)
        val rungs = collH.lastLadderRungs
        val viaCert = key(collC.searchIvfSqRadius(queries, "qid", "qvec",
          radius = r, limit = k).collect().toSeq)
        val ladderRecall =
          if (viaCert.isEmpty) 1.0
          else (viaCert & viaLadder).size.toDouble / viaCert.size
        // graph + sidecar: the param-less search(radius) routes through
        // the sidecar certificate (answer-invariant — assert it)
        val viaSide = key(collS.search(queries, "qid", "qvec", metric = "l2",
          limit = k, radius = Some(r)).collect().toSeq)
        require(viaSide == viaCert,
          s"sidecar-routed radius must equal the certificate answer at $name")
        val tL = timed(collH.searchHnswRadius(queries, "qid", "qvec",
          radius = r, limit = k, ef = 10).count())
        val tC = timed(collC.searchIvfSqRadius(queries, "qid", "qvec",
          radius = r, limit = k).count())
        val tS = timed(collS.search(queries, "qid", "qvec", metric = "l2",
          limit = k, radius = Some(r)).count())
        println(f"""{"family":"radius_route_cost","config":"$name r=$r%.3f","ladder_sec":$tL%.3f,"cert_sec":$tC%.3f,"sidecar_sec":$tS%.3f,"ladder_rungs":"${rungs.map(x => x._1 + "x" + x._2).mkString(",")}","ladder_recall":$ladderRecall%.4f,"cert_recall":1.0,"sidecar_exact":true,"cert_over_ladder":${tC / tL}%.3f,"sidecar_over_ladder":${tS / tL}%.3f}""")
      }
    }

    println(s"""{"metric":"round12_probe","corpus":$corpusN,"n_queries":$nQ,"sf":"$sfDir"}""")
    spark.stop()
  }
}
