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

    def ladderLine(family: String, config: String,
                   rungs: Seq[(Int, Int)], cap: Long, recall: Double): Unit =
      ProbeUtil.ladderLine(family, config, rungs, cap, recall)

    // ---- diversity-arm LADDER work accounting (the §7-probes-r12
    // block, at this scale factor) ------------------------------------
    val probeRoot = java.nio.file.Files.createTempDirectory("graft-probe-r12").toString
    val probeDb = new graft.api.GraftClient(spark, probeRoot).createDatabase("p")
    locally {
      val collD = probeDb.createCollection("div")
      collD.upsert(embs.select(col("vec_id").as("id"),
        col("embedding").as("vector"), col("label"),
        pmod(col("vec_id"), lit(4L)).as("g4"),
        pmod(col("vec_id"), lit(2L)).as("g2"),
        pmod(col("vec_id"), lit(10L)).as("b10")))
      collD.rebuildHnswIndex(m = 8, efConstruction = 64, numSegments = 4,
        metric = "cosine")
      for ((name, grpCol) <- Seq(("easy", "label"), ("coarse", "g4"),
          ("unfillable", "g2"))) {
        val exactPg = collD.searchGrouped(queries, "qid", "qvec", grpCol,
            "cosine", limit = 3, groupSize = 4)
          .select("query_id", "grp", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val annPg = collD.searchGroupedHnsw(queries, "qid", "qvec", grpCol,
            limit = 3, groupSize = 4, ef = 12)
          .select("query_id", "grp", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        ladderLine("grouped_hnsw_ladder", s"$name groups=$grpCol ef0=12",
          collD.lastLadderRungs.toSeq, corpusN,
          (exactPg & annPg).size.toDouble / math.max(exactPg.size, 1))
      }
      for ((name, flt) <- Seq(("easy", ""), ("starved", "b10 = 0"))) {
        val exactSel = collD.searchMmr(queries, "qid", "qvec", "cosine",
            limit = k, lambda = 0.5, poolMult = 4, filter = flt)
          .select("query_id", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val annSel = collD.searchMmrHnsw(queries, "qid", "qvec",
            limit = k, lambda = 0.5, poolMult = 4, ef = 10, filter = flt)
          .select("query_id", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        ladderLine("mmr_hnsw_ladder", s"$name filter=${if (flt.isEmpty) "none" else flt} ef0=10",
          collD.lastLadderRungs.toSeq, corpusN,
          (exactSel & annSel).size.toDouble / math.max(exactSel.size, 1))
      }
    }

    // ---- grouped page recovery: FIXED-beam ef sweep at this SF ------
    // (the §7-probes-r11 grouped_hnsw_page device, at the target
    // corpus: what fraction of the exact (grp_rank, grp, id) page a
    // group-blind beam recovers WITHOUT the fill ladder — the §5b-r12
    // ef-vs-corpus guidance's measured basis. Page = 3 groups × 4.)
    locally {
      val hnswD = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
        efConstruction = 64, numSegments = 4).cache()
      hnswD.count()
      val qLocalD = queries.select(col("qid"), col("qvec").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val grpOf = embs.select(col("vec_id").cast("long").as("id"),
        GroupedSearch.grpNorm(embs, "label").as("grp"))
      val exactPage = GroupedSearch.groupedTopK(embs, "vec_id", "embedding",
          "label", queries, "qid", "qvec", "cosine", 3, 4)
        .select("query_id", "grp", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      for (ef <- Seq(12, 24, 48, 96, 192)) {
        val beamPage = GroupedSearch.rankGrouped(
            HnswIndex.scoredCandidates(hnswD, embs, "vec_id", "embedding",
              qLocalD, "cosine", ef, prepared = false, nodeKey = None)
              .join(grpOf, "id")
              .select(col("query_id"), col("grp"), col("__s"), col("id")),
            3, 4, asc = false)
          .select("query_id", "grp", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        println(f"""{"family":"grouped_hnsw_page","config":"n=$corpusN limit=3 groupSize=4 ef=$ef","value":${(exactPage & beamPage).size.toDouble / exactPage.size}%.4f}""")
      }
      hnswD.unpersist()
    }

    // ---- IVF_SQ8 cell certificate vs CLUSTER GEOMETRY ---------------
    // (the §7-probes-r12 sweep at this SF's corpus size; see
    // RecallProbe for the full commentary)
    locally {
      val dim = 64
      val nSynth = math.max(corpusN, 2000L)
      val nlist = math.ceil(math.sqrt(nSynth.toDouble)).toInt

      for (sigma <- Seq(0.25, 0.5, 1.0, -1.0)) {
        val geo = if (sigma < 0) "iso" else f"clustered_s$sigma%.2f"
        val mix = ProbeUtil.mixtureExpr(sigma)
        val embsC = spark.range(nSynth).select(col("id").as("vec_id"),
            expr(s"transform(sequence(1, $dim), j -> $mix)")
              .cast("array<double>").as("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        embsC.count()
        val qC = embsC.where(col("vec_id") < nQ)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val qLocalC = qC.select(col("qid"), col("qvec"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        val dists = KnnSearch.topK(embsC, "vec_id", "embedding", qC,
            "qid", "qvec", "l2", k).where(col("rank") === k)
          .select("score").collect().map(_.getDouble(0)).sorted
        val r = dists(dists.length / 2)
        val model = IvfSq.train(embsC, "embedding", nlist = nlist)
        val centersT = model.ivf.kmeans.clusterCenters.map(_.toArray)
          .zipWithIndex.toSeq
        val rho = IvfSq.cellStats(centersT, embsC, "embedding")
          .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
        val kept = qLocalC.map { case (_, qv) =>
          centersT.count { case (c, cell) =>
            val d = math.sqrt(c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
            rho.get(cell).exists(d <= r + _)
          }
        }.sum.toDouble
        println(f"""{"family":"sq_radius_cells_$geo","config":"n=$nSynth nlist=$nlist r=$r%.3f cells kept/probed","value":${kept / (qLocalC.length.toDouble * centersT.length)}%.4f}""")
        embsC.unpersist()
      }
    }
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
        val tL = timed(collH.searchHnswRadius(queries, "qid", "qvec",
          radius = r, limit = k, ef = 10).count())
        val tC = timed(collC.searchIvfSqRadius(queries, "qid", "qvec",
          radius = r, limit = k).count())
        println(f"""{"family":"radius_route_cost","config":"$name r=$r%.3f","ladder_sec":$tL%.3f,"cert_sec":$tC%.3f,"ladder_rungs":"${rungs.map(x => x._1 + "x" + x._2).mkString(",")}","ladder_recall":$ladderRecall%.4f,"cert_recall":1.0,"cert_over_ladder":${tC / tL}%.3f}""")
      }
    }

    println(s"""{"metric":"round12_probe","corpus":$corpusN,"n_queries":$nQ,"sf":"$sfDir"}""")
    spark.stop()
  }
}
