package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.vector._

/** Shared probe measurement blocks — ONE definition of the ladder
  * work-accounting formulas, the deterministic gaussian corpus
  * generator, AND the r12 measurement blocks themselves (diversity
  * ladders, grouped page recovery, cell-geometry sweep), so
  * RecallProbe and Round12Probe (which re-runs the r12 blocks alone at
  * any SF) cannot drift: a changed ef0, group mix, or radius-matching
  * rule landing in only one file would silently invalidate the other's
  * §7 tables (ADVICE r12 — the earlier extraction covered only the
  * accounting math, leaving the block logic duplicated). */
object ProbeUtil {

  /** Per-rung cost telemetry of an escalateRounds ladder. work =
    * Σ width·pending over rungs; final_work = Σ (each query's final
    * width) — the one-shot cost had the right width been known;
    * work_multiple = work/final_work (the 4/3 geometric ceiling holds
    * while each rung quadruples — a cap-clamped last rung breaks the
    * assumption, see §7-probes-r12); vs_exhaustive = work/(cap·|batch|),
    * the single-shot exhaustive backstop. */
  def ladderLine(family: String, config: String,
                 rungs: Seq[(Int, Int)], cap: Long, recall: Double): Unit = {
    // a route that returned without publishing a ladder (empty query
    // batch, non-ladder fallback) hands an empty rung list — print a
    // sentinel row instead of throwing on rungs.head (ADVICE r12)
    if (rungs.isEmpty) {
      println(s"""{"family":"$family","config":"$config","rungs":0,"note":"no ladder published"}""")
      return
    }
    val work = rungs.map { case (w, p) => w.toLong * p }.sum
    val finals = rungs.zipWithIndex.map { case ((w, p), i) =>
      val nxt = if (i + 1 < rungs.length) rungs(i + 1)._2 else 0
      w.toLong * (p - nxt)
    }.sum
    val exhaustive = cap * rungs.head._2
    println(f"""{"family":"$family","config":"$config","rungs":${rungs.length},"rung_widths":"${rungs.map(r => r._1 + "x" + r._2).mkString(",")}","work":$work,"final_work":$finals,"work_multiple":${work.toDouble / math.max(finals, 1)}%.3f,"vs_exhaustive":${work.toDouble / exhaustive}%.4f,"recall":$recall%.4f}""")
  }

  /** Hash-seeded standard normal (Box-Muller over two xxhash64 draws)
    * as a SQL fragment — no RNG state, identical across runs and
    * partitionings. `j` is the in-scope transform() lambda variable. */
  def gauss(key: String, salt: Int): String =
    s"sqrt(-2.0 * ln((pmod(xxhash64($key, j, $salt), 1000000) + 0.5) / 1000000.0)) * " +
    s"cos(6.283185307179586 * (pmod(xxhash64($key, j, ${salt + 1}), 1000000) + 0.5) / 1000000.0)"

  /** Element expression for the synthetic sweep corpora: 64 gaussian
    * centers with sigma·unit spread around each (the shape real
    * embedding models produce), or the isotropic worst case when
    * sigma < 0 (neighbors barely beat random pairs at any dim). */
  def mixtureExpr(sigma: Double): String =
    if (sigma < 0) gauss("id", 1)
    else s"${gauss("pmod(id, 64)", 11)} + $sigma * ${gauss("id", 1)}"

  /** Diversity-arm LADDER work accounting through the CLIENT routes
    * (r11 verdict #7's block): grouped — easy (label groups), coarse
    * (4 giant groups ≥ the 3-group page), unfillable (2 groups < the
    * page: the ladder must run to the exhaustive rung); MMR — easy
    * (no filter), starved (a 1-in-10 filter the traversal cannot
    * see). recall = overlap with the exact route (1.0 at exhaustion by
    * the byte-equality pins). Prints one [[ladderLine]] row per mix. */
  def diversityLadders(probeDb: graft.api.GraftDatabase, embs: DataFrame,
                       queries: DataFrame, corpusN: Long, k: Int): Unit = {
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
      ladderLine("mmr_hnsw_ladder",
        s"$name filter=${if (flt.isEmpty) "none" else flt} ef0=10",
        collD.lastLadderRungs.toSeq, corpusN,
        (exactSel & annSel).size.toDouble / math.max(exactSel.size, 1))
    }
  }

  /** Fixed-beam grouped page recovery (the §7-probes-r11 device): what
    * fraction of the exact (grp, id) page a group-blind beam recovers
    * WITHOUT the fill ladder, per ef. Results go to `emit(config,
    * value)` so each probe formats/aggregates its own way. Page = 3
    * groups × 4 members over the `label` grouping. */
  def groupedPageRecovery(embs: DataFrame, queries: DataFrame,
                          efs: Seq[Int],
                          emit: (String, Double) => Unit,
                          prebuilt: Option[DataFrame] = None): Unit = {
    // accept a caller-built (and caller-counted) graph — RecallProbe
    // shares one build with its MMR-overlap block, the probe's
    // dominant cost at sf0.1; standalone callers build + drop
    val hnswD = prebuilt.getOrElse {
      val g = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
        efConstruction = 64, numSegments = 4).cache()
      g.count()
      g
    }
    val qLocalD = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val grpOf = embs.select(col("vec_id").cast("long").as("id"),
      GroupedSearch.grpNorm(embs, "label").as("grp"))
    val exactPage = GroupedSearch.groupedTopK(embs, "vec_id", "embedding",
        "label", queries, "qid", "qvec", "cosine", 3, 4)
      .select("query_id", "grp", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (ef <- efs) {
      val beamPage = GroupedSearch.rankGrouped(
          HnswIndex.scoredCandidates(hnswD, embs, "vec_id", "embedding",
            qLocalD, "cosine", ef, prepared = false, nodeKey = None)
            .join(grpOf, "id")
            .select(col("query_id"), col("grp"), col("__s"), col("id")),
          3, 4, asc = false)
        .select("query_id", "grp", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      emit(s"limit=3 groupSize=4 ef=$ef",
        // max(size, 1): a degenerate empty exact page must emit 0.0,
        // not NaN, into the probe JSON (the diversityLadders guard)
        (exactPage & beamPage).size.toDouble / math.max(exactPage.size, 1))
    }
    if (prebuilt.isEmpty) hnswD.unpersist()
  }

  /** IVF_SQ8 cell certificate vs CLUSTER GEOMETRY (r11 verdict #6's
    * sweep): per σ of the [[mixtureExpr]] mixture (σ < 0 = isotropic
    * worst case), train at production nlist = ⌈√N⌉, match R to the
    * median kth-NN distance, and report the fraction of (query, cell)
    * pairs the ball bound ‖q − c_j‖ ≤ R + ρ_j KEEPS. Emits
    * (geo, config, value) so each probe formats its own row. */
  def cellGeometrySweep(spark: SparkSession, corpusN: Long, nQ: Int, k: Int,
                        sigmas: Seq[Double],
                        emit: (String, String, Double) => Unit): Unit = {
    val dim = 64
    val nSynth = math.max(corpusN, 2000L)
    val nlist = math.ceil(math.sqrt(nSynth.toDouble)).toInt
    for (sigma <- sigmas) {
      val geo = if (sigma < 0) "iso" else f"clustered_s$sigma%.2f"
      val mix = mixtureExpr(sigma)
      val embsC = spark.range(nSynth).select(col("id").as("vec_id"),
          expr(s"transform(sequence(1, $dim), j -> $mix)")
            .cast("array<double>").as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      embsC.count()
      val qC = embsC.where(col("vec_id") < nQ)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val qLocalC = qC.select(col("qid"), col("qvec"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      // R = median kth-NN distance: about half the balls hold ≥ k rows
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
      emit(geo, f"n=$nSynth nlist=$nlist r=$r%.3f cells kept/probed",
        kept / (qLocalC.length.toDouble * centersT.length))
      embsC.unpersist()
    }
  }
}
