package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.vector._

/** Measured recall@k for every approximate ANN family against the
  * exact FLAT ground truth, plus pair recall for the banded embedding
  * dedup — turning "correct by construction" into numbers a user can
  * pick index params from.
  *
  * Sweeps (on the driver testdata embeddings, dim 64):
  *  - sign-LSH: (nBits, bands) grid, cosine
  *  - IVF: nprobe 1..nlist at nlist=16, L2
  *  - PQ: (m, k) codebook grid, ADC-only vs exact-rerank, L2
  *  - IVF_PQ: nprobe sweep at nlist=16, m=8, k=16, L2
  *  - embedLsh dedup: band configs x thresholds vs the all-pairs scan
  *
  * Each line is one JSON object {"family","config","recall",...}; the
  * run ends with one summary line (machine-readable, like Bench).
  *
  * Usage: runMain graft.RecallProbe [sfDir] [nQueries] [k]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQ = if (args.length > 1) args(1).toInt else 32
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

    // FLAT ground truth per metric (the oracle every family is graded
    // against; cosine for LSH, L2 for the IVF/PQ families)
    val gtCos = KnnSearch.topK(embs, "vec_id", "embedding",
      queries, "qid", "qvec", "cosine", k).cache()
    val gtL2 = KnnSearch.topK(embs, "vec_id", "embedding",
      queries, "qid", "qvec", "l2", k).cache()
    gtCos.count(); gtL2.count()

    val results = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
    def emit(family: String, config: String, recall: Double): Unit = {
      results += ((family, config, recall))
      println(f"""{"family":"$family","config":"$config","recall@$k":$recall%.4f}""")
    }

    // ---- sign-LSH (cosine): r = nBits/bands bits per band ----------
    for ((nBits, bands) <- Seq((16, 4), (32, 8), (32, 16), (64, 8), (64, 16), (64, 32)))
      emit("lsh", s"nBits=$nBits bands=$bands r=${nBits / bands}",
        Recall.atK(LshIndex.ann(embs, "vec_id", "embedding",
          queries, "qid", "qvec", k, nBits, bands), gtCos))

    // ---- HNSW (cosine): ef sweep at M=8 efC=64, 4 segment graphs ---
    // (traversal navigates L2 space, the rerank is exact cosine — the
    // sweep measures what candidate coverage each ef buys; ef >= seg
    // size is exact by the chain-connectivity certificate)
    val hnswG = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
      efConstruction = 64, numSegments = 4).cache()
    hnswG.count()
    val qLocalH = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    for (ef <- Seq(10, 16, 32, 48, 64))
      emit("hnsw", s"M=8 efC=64 segs=4 ef=$ef",
        Recall.atK(HnswIndex.search(hnswG, embs, "vec_id", "embedding",
          qLocalH, "cosine", k, ef), gtCos))
    // ---- the DERIVED default beam (r13 recall-floor contract) ------
    // ef₀ = max(16, 2·⌈√segSize⌉), what searchHnsw serves with NO
    // manual ef — the row the ≥0.9 floor claim rests on at each SF
    locally {
      val autoEf = graft.api.GraftCollection.autoEf(corpusN, 4)
      emit("hnsw", s"M=8 efC=64 segs=4 ef=$autoEf (auto-derived default)",
        Recall.atK(HnswIndex.search(hnswG, embs, "vec_id", "embedding",
          qLocalH, "cosine", k, autoEf), gtCos))
    }
    // ---- graph-served radius (row 102): ball recall at fixed beams --
    // r = the MEDIAN rank-k similarity, so roughly half the balls hold
    // fewer than k rows (the count-fill regime) and half spill past k
    // (the top-k-in-ball regime) — truth is the FLAT ball, so the rows
    // measure what a fixed single-shot beam recovers of it (the
    // adaptive client route escalates from here; exhaustive ef = 1.0
    // by the byte-equality pin)
    locally {
      val scores = gtCos.where(col("rank") === k)
        .select("score").collect().map(_.getDouble(0)).sorted
      val r = scores(scores.length / 2)
      val gtBall = KnnSearch.radiusTopK(embs, "vec_id", "embedding",
        queries, "qid", "qvec", "cosine", r, k).cache()
      gtBall.count()
      for (ef <- Seq(10, 16, 32, 64))
        emit("hnsw_radius", f"M=8 efC=64 segs=4 r=$r%.2f ef=$ef",
          Recall.atK(HnswIndex.searchRadius(hnswG, embs, "vec_id",
            "embedding", qLocalH, "cosine", r, k, ef), gtBall))
      gtBall.unpersist()
    }
    hnswG.unpersist()

    // ---- IVF (L2): nprobe sweep at nlist=16 ------------------------
    val ivf = IvfIndex.train(embs, "embedding", nlist = 16, maxIter = 10)
    for (nprobe <- Seq(1, 2, 4, 8, 16))
      emit("ivf", s"nlist=16 nprobe=$nprobe",
        Recall.atK(IvfIndex.search(ivf, embs, "vec_id", "embedding",
          queries, "qid", "qvec", "l2", k, nprobe), gtL2))
    // ---- the CALIBRATED default probe count (r13 — the cell-axis
    // recall-floor contract): at PRODUCTION auto-√N nlist, the old
    // fixed default 4 vs the rebuild-time calibration, per SF.
    // Evaluation is HELD-OUT (vec_id in [sampleQ, sampleQ + nQ) —
    // disjoint from the 32 lowest-id queries the calibration fit; an
    // in-sample recall row would be circular evidence for the floor
    // claim — review finding). The calibration's internal exact-KNN
    // scan is an accepted probe cost: one 32×N job per SF, the same
    // class every rebuild pays.
    locally {
      val nlAuto = graft.api.GraftCollection.autoNlist(corpusN)
      val ivfAuto = IvfIndex.train(embs, "embedding", nlist = nlAuto,
        maxIter = 10)
      val centersA = ivfAuto.kmeans.clusterCenters.map(_.toArray)
        .zipWithIndex.toSeq
      val npAuto = IvfIndex.calibrateNprobe(embs, "vec_id", "embedding",
        centersA)
      val qEval = embs.where(col("vec_id") >= 32 && col("vec_id") < (32 + nQ))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val gtEval = KnnSearch.topK(embs, "vec_id", "embedding", qEval,
        "qid", "qvec", "l2", k).cache()
      gtEval.count()
      emit("ivf_auto", s"nlist=$nlAuto nprobe=$npAuto (calibrated default, held-out)",
        Recall.atK(IvfIndex.search(ivfAuto, embs, "vec_id", "embedding",
          qEval, "qid", "qvec", "l2", k, npAuto), gtEval))
      emit("ivf_auto", s"nlist=$nlAuto nprobe=4 (old fixed default, held-out)",
        Recall.atK(IvfIndex.search(ivfAuto, embs, "vec_id", "embedding",
          qEval, "qid", "qvec", "l2", k, 4), gtEval))
      gtEval.unpersist()
    }

    // ---- PQ (L2): codebook grid, ADC-only vs exact rerank ----------
    val qLocal = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    for ((m, cb) <- Seq((8, 16), (8, 64), (16, 16))) {
      val pq = PqIndex.train(embs, "embedding", dim = 64, m = m, k = cb)
      val enc = PqIndex.encode(pq, embs, "vec_id", "embedding").cache()
      enc.count()
      emit("pq_adc", s"m=$m k=$cb",
        Recall.atK(PqIndex.search(pq, enc, qLocal, k), gtL2))
      emit("pq_rerank", s"m=$m k=$cb candMult=10",
        Recall.atK(PqIndex.searchRerank(pq, enc, embs, "vec_id", "embedding",
          qLocal, k, candMult = 10), gtL2))
      enc.unpersist()
    }

    // ---- BQ (cosine): Hamming-only vs exact rerank, candMult sweep --
    // (1 bit/dim: the Hamming ranking is exact-in-its-own-metric, so
    // what the sweep measures is how well sign agreement proxies
    // cosine — and how small a rerank shortlist buys it back)
    val bq = BqIndex.train(embs, "embedding")
    val encB = BqIndex.encode(bq, embs, "vec_id", "embedding").cache()
    encB.count()
    emit("bq_hamming", "1bit/dim mean-thresholds",
      Recall.atK(BqIndex.search(bq, encB, qLocal, k), gtCos))
    for (cm <- Seq(2, 5, 10, 20))
      emit("bq_rerank", s"candMult=$cm",
        Recall.atK(BqIndex.searchRerank(bq, encB, embs, "vec_id", "embedding",
          qLocal, k, candMult = cm), gtCos))
    encB.unpersist()

    // ---- BQ at production dimensionality (r8 verdict #4) ------------
    // The dim-64 grid above is information-limited: 64 sign bits can't
    // separate a 2000-row corpus's cosine neighborhoods, and recall
    // decays as the corpus grows at fixed candMult. Real embedding
    // models ship 256-1536 dims — this sweep measures the SAME corpus
    // size and candMult grid at dim 64/256/768 on a deterministic
    // synthetic gaussian corpus (hash-seeded Box-Muller — no RNG state,
    // identical across runs/partitionings) to show the fixed-candMult
    // decay flattening as the bit budget grows.
    locally {
      val nSynth = math.max(corpusN, 2000L)
      // hash-seeded standard normal (Box-Muller over two hash draws)
      def g(key: String, salt: Int) = ProbeUtil.gauss(key, salt)
      // isotropic = the hard worst case (neighbors barely beat random
      // pairs at ANY dim); clustered = 64 gaussian centers with 0.5-σ
      // spread, the shape real embedding models produce
      def synth(dim: Int, clustered: Boolean) =
        spark.range(nSynth).select(col("id").as("vec_id"),
          expr(s"transform(sequence(1, $dim), j -> " + (
            if (clustered) ProbeUtil.mixtureExpr(0.5)
            else g("id", 1)) + ")").as("embedding"))
      for (clustered <- Seq(false, true); dim <- Seq(64, 256, 768)) {
        val embsD = synth(dim, clustered)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        embsD.count()
        val queriesD = embsD.where(col("vec_id") < nQ)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val qLocalD = queriesD.collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        val gtD = KnnSearch.topK(embsD, "vec_id", "embedding",
          queriesD, "qid", "qvec", "cosine", k).cache()
        gtD.count()
        val bqD = BqIndex.train(embsD, "embedding")
        val encD = BqIndex.encode(bqD, embsD, "vec_id", "embedding").cache()
        encD.count()
        val fam = if (clustered) "bq_dim_clustered" else "bq_dim"
        for (cm <- Seq(5, 10, 20))
          emit(fam, s"n=$nSynth dim=$dim candMult=$cm",
            Recall.atK(BqIndex.searchRerank(bqD, encD, embsD, "vec_id",
              "embedding", qLocalD, k, candMult = cm), gtD))
        encD.unpersist(); gtD.unpersist(); embsD.unpersist()
      }
    }

    // ---- IVF_PQ (L2): nprobe sweep, ADC-only vs exact rerank --------
    // (code-only ranking is capped by PQ quantization error regardless
    // of nprobe — the rerank lifts it back onto the IVF coverage curve)
    val ivfpq = IvfPq.train(embs, "embedding", dim = 64, nlist = 16, m = 8, k = 16)
    val encP = IvfPq.encode(ivfpq, embs, "vec_id", "embedding").cache()
    encP.count()
    for (nprobe <- Seq(2, 4, 8, 16)) {
      emit("ivf_pq_adc", s"nlist=16 m=8 k=16 nprobe=$nprobe",
        Recall.atK(IvfPq.search(ivfpq, encP, qLocal, k, nprobe), gtL2))
      emit("ivf_pq_rerank", s"nlist=16 m=8 k=16 nprobe=$nprobe candMult=10",
        Recall.atK(IvfPq.searchRerank(ivfpq, encP, embs, "vec_id", "embedding",
          qLocal, k, nprobe, candMult = 10), gtL2))
    }
    // candMult is THE per-query recall knob at fixed index params: the
    // rerank fetch is k·candMult rows per query regardless of corpus
    // size, so recall lost to corpus growth is bought back by raising it
    for (cm <- Seq(20, 40))
      emit("ivf_pq_rerank", s"nlist=16 m=8 k=16 nprobe=16 candMult=$cm",
        Recall.atK(IvfPq.searchRerank(ivfpq, encP, embs, "vec_id", "embedding",
          qLocal, k, 16, candMult = cm), gtL2))
    encP.unpersist()

    // ---- IVF_SQ8 (L2): nprobe sweep, code-only vs exact rerank ------
    // (8-bit-per-dim quantization error is far below PQ's — code-only
    // ranking tracks the IVF coverage curve almost exactly, so SQ8 is
    // the "compression for free" point of the family)
    val ivfsq = IvfSq.train(embs, "embedding", nlist = 16)
    val encS = IvfSq.encode(ivfsq, embs, "vec_id", "embedding").cache()
    encS.count()
    emit("sq_code", "flat (nprobe=nlist=16)",
      Recall.atK(IvfSq.search(ivfsq, encS, qLocal, k, 16), gtL2))
    for (nprobe <- Seq(2, 4, 8)) {
      emit("ivf_sq_code", s"nlist=16 nprobe=$nprobe",
        Recall.atK(IvfSq.search(ivfsq, encS, qLocal, k, nprobe), gtL2))
      emit("ivf_sq_rerank", s"nlist=16 nprobe=$nprobe candMult=10",
        Recall.atK(IvfSq.searchRerank(ivfsq, encS, embs, "vec_id", "embedding",
          qLocal, k, nprobe, candMult = 10), gtL2))
    }

    // ---- EXACT-RADIUS certificate selectivity (row 118) -------------
    // Not a recall — these routes are exact by construction; the number
    // that matters is the fraction of (query, row) pairs the
    // certificates ADMIT, i.e. the work the exact rerank pays for.
    // radius=1.2 is the oracled q_sq_radius operating point (balls of
    // ~5-35 rows against a 500-16k corpus).
    {
      val r = 1.2
      val pairs = qLocal.length.toDouble * corpusN
      // SQ8 row gate: the resid is tiny (8 bits/dim), the gate admits
      // nearly the true ball only
      emit("sq_radius_gate", f"r=$r survivors/corpus",
        SqIndex.radiusCandidates(ivfsq.sq,
          encS.select("id", "codes", "resid"), qLocal, r).count() / pairs)
      // SQ8 cell certificate: fraction of (query, cell) pairs the
      // ball bound keeps (the file-listing prune)
      val centersT = ivfsq.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex.toSeq
      val rho = IvfSq.cellStats(centersT, embs, "embedding")
        .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
      val kept = qLocal.map { case (_, qv) =>
        centersT.count { case (c, cell) =>
          val d = math.sqrt(c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
          rho.get(cell).exists(d <= r + _)
        }
      }.sum.toDouble
      emit("sq_radius_cells", f"r=$r cells kept/probed",
        kept / (qLocal.length * centersT.length))
      // PQ row gate vs quantizer fidelity: the gate only narrows when
      // resid falls below the corpus' distance SPREAD — on this
      // geometry k alone barely moves it at m=8 (dsub=8 subspaces stay
      // coarse), the m axis is the lever. Measured frontier: the
      // answer is exact at every point; the SCAN SAVINGS are what the
      // quantizer buys
      for ((mm, cb) <- Seq((8, 16), (8, 256), (16, 256), (32, 256))) {
        val pqR = PqIndex.train(embs, "embedding", dim = 64, m = mm, k = cb)
        val encR = PqIndex.encode(pqR, embs, "vec_id", "embedding")
        emit("pq_radius_gate", s"m=$mm k=$cb r=$r survivors/corpus",
          PqIndex.radiusCandidates(pqR, encR, qLocal, r).count() / pairs)
      }
    }
    encS.unpersist()

    // ---- FILTERED HNSW (cosine): selectivity × ef grid --------------
    // The hybrid/filtered serving path reranks graph candidates against
    // the FILTERED snapshot (GraftClient.hybridDense): the traversal is
    // filter-blind, so at a 1%-selective filter a fixed ef leaves few
    // surviving candidates — this grid measures how much ef a given
    // selectivity needs (the ef-vs-selectivity guidance in SURVEY §5b).
    val hnswF = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
      efConstruction = 64, numSegments = 4).cache()
    hnswF.count()
    val qLocalF = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    for ((sel, mod) <- Seq(("0.5", 2), ("0.1", 10), ("0.01", 100))) {
      val filtered = embs.where(col("vec_id") % mod === 0)
      val gtF = KnnSearch.topK(filtered, "vec_id", "embedding",
        queries, "qid", "qvec", "cosine", k).cache()
      gtF.count()
      for (ef <- Seq(10, 32, 64, 128, 256, 512))
        emit("hnsw_filtered", s"M=8 efC=64 segs=4 sel=$sel ef=$ef",
          Recall.atK(HnswIndex.search(hnswF, filtered, "vec_id", "embedding",
            qLocalF, "cosine", k, ef), gtF))
      gtF.unpersist()
    }
    hnswF.unpersist()

    // ---- FILTERED IVF (L2): selectivity × nprobe grid ---------------
    // The serving path PRE-filters before cell lookup (collection
    // search: base = filtered rows, candidates = filtered rows in
    // probed cells), so unlike the filter-blind HNSW beam the
    // candidate pool never collapses — recall is governed by CELL
    // COVERAGE of the filtered true neighbors, which sit farther out
    // and spread over more cells as selectivity drops. This grid
    // measures how much nprobe that spread costs.
    val ivfF = IvfIndex.train(embs, "embedding", nlist = 16, maxIter = 10)
    for ((sel, mod) <- Seq(("0.5", 2), ("0.1", 10), ("0.01", 100))) {
      val filtered = embs.where(col("vec_id") % mod === 0)
      val gtF2 = KnnSearch.topK(filtered, "vec_id", "embedding",
        queries, "qid", "qvec", "l2", k).cache()
      gtF2.count()
      for (nprobe <- Seq(1, 2, 4, 8, 16))
        emit("ivf_filtered", s"nlist=16 sel=$sel nprobe=$nprobe",
          Recall.atK(IvfIndex.search(ivfF, filtered, "vec_id", "embedding",
            queries, "qid", "qvec", "l2", k, nprobe), gtF2))
      gtF2.unpersist()
    }

    // ---- SemDeDup: qualifying-pair recall, prod cells vs exhaustive -
    // (cells legitimately drop cross-cell pairs; this is the dedup
    // analog of the LSH pair-recall rows — how many eps-qualifying
    // pairs the prod nclusters=8 / cap-4096 config finds vs the
    // nclusters=1 all-pairs twin)
    for (eps <- Seq(0.45, 0.5)) {
      val truthP = graft.dedup.Dedup.semDedupPairs(embs, "vec_id", "embedding",
          eps, nclusters = 1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTruth = truthP.count()
      for (ncl <- Seq(4, 8, 16))
        emit("semdedup_pairs", s"nclusters=$ncl cap=4096 eps=$eps truth=$nTruth",
          Recall.pairRecall(graft.dedup.Dedup.semDedupPairs(embs, "vec_id",
            "embedding", eps, nclusters = ncl, maxCellSize = 4096), truthP))
      // multi-assign (margin-gated 2nd-nearest cell): the boundary-pair
      // fix — recall gain vs single-assign at the prod config, with the
      // measured pair-work inflation next to it (the cost axis)
      for (margin <- Seq(0.01, 0.02, 0.05, 0.1))
        emit("semdedup_pairs",
          s"nclusters=8 cap=4096 eps=$eps margin=$margin truth=$nTruth",
          Recall.pairRecall(graft.dedup.Dedup.semDedupPairs(embs, "vec_id",
            "embedding", eps, nclusters = 8, maxCellSize = 4096,
            assignMargin = margin), truthP))
      // a tight cap on this corpus: measures what the hot-cell guard
      // costs when it actually bisects
      emit("semdedup_pairs", s"nclusters=8 cap=64 eps=$eps truth=$nTruth",
        Recall.pairRecall(graft.dedup.Dedup.semDedupPairs(embs, "vec_id",
          "embedding", eps, nclusters = 8, maxCellSize = 64), truthP))
      truthP.unpersist()
    }
    // pair-work inflation of multi-assign (Σ |group|² over the pair
    // join's input groups, the quantity the cap bounds) — reported as
    // a ratio so "≤ 2× at the recommended margin" is a measured claim
    locally {
      val w0 = graft.dedup.Dedup.semDedupPairWork(embs, "vec_id", "embedding",
        nclusters = 8, maxCellSize = 4096)
      for (margin <- Seq(0.01, 0.02, 0.05, 0.1)) {
        val w = graft.dedup.Dedup.semDedupPairWork(embs, "vec_id", "embedding",
          nclusters = 8, maxCellSize = 4096, assignMargin = margin)
        println(f"""{"family":"semdedup_pairwork","config":"nclusters=8 cap=4096 margin=$margin","ratio":${w.toDouble / w0}%.3f,"work":$w,"base":$w0}""")
      }
    }

    // ---- embedLsh dedup: pair recall vs the all-pairs scan ----------
    // (precision is exact by construction — the verify rescores — so
    // recall is the only axis; configs straddle the exhaustive-grade
    // oracle setting and the selective production setting. Thresholds
    // sit where this corpus HAS pairs — max pair cosine is 0.48 / 0.51
    // / 0.60 at the three SFs, so t=0.8 would grade against an empty
    // truth set and prove nothing.)
    // the O(n²) truth scan runs once per distinct threshold, not per config
    val truthByT = Seq(0.45, 0.5).map(t => t -> graft.dedup.Dedup
      .embedCosineAllPairs(embs, "vec_id", "embedding", t)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)).toMap
    for ((nBits, bands, t) <- Seq(
        (32, 16, 0.45), (64, 32, 0.45), (64, 16, 0.45), (64, 16, 0.5), (64, 8, 0.5)))
      emit("dedup_embed_lsh", s"nBits=$nBits bands=$bands r=${nBits / bands} t=$t",
        Recall.pairRecall(
          graft.dedup.Dedup.embedLsh(embs, "vec_id", "embedding", t, nBits, bands),
          truthByT(t)))
    truthByT.values.foreach(_.unpersist())

    // ---- radius-ladder COST telemetry (r9 verdict #5) ----------------
    // Recall floors are measured above; this measures what the ADAPTIVE
    // route PAYS: per-rung (width, pending) from escalateRounds for a
    // realistic radius mix — tight (most balls nearly empty: the
    // boundary-signal regime), boundary (half the balls under-filled),
    // easy (most balls over-filled: first-rung fills) — on both the
    // HNSW and IVF arms. work = Σ width·pending over rungs;
    // final_work = Σ (each query's final width) = the one-shot cost had
    // the right width been known; work_multiple = work/final_work (the
    // 4/3 geometric bound is the theory ceiling); vs_exhaustive =
    // work / (cap · |batch|), the single-shot exhaustive backstop.
    // ONE definition of the accounting math (shared with Round12Probe)
    def ladderLine(family: String, config: String,
                   rungs: Seq[(Int, Int)], cap: Long, recall: Double): Unit =
      ProbeUtil.ladderLine(family, config, rungs, cap, recall)
    def pctOf(a: Array[Double], p: Double): Double =
      a(math.min((a.length * p).toInt, a.length - 1))

    val probeRoot = java.nio.file.Files.createTempDirectory("graft-probe-ladder").toString
    val probeDb = new graft.api.GraftClient(spark, probeRoot).createDatabase("p")
    locally {
      val collH = probeDb.createCollection("h")
      collH.upsert(embs.select(col("vec_id").as("id"),
        col("embedding").as("vector"), col("label")))
      collH.rebuildHnswIndex(m = 8, efConstruction = 64, numSegments = 4,
        metric = "cosine")
      // rank-1 is the query itself (queries are corpus members, cosine
      // self-score 1.0) — the tight mix keys off rank-2, so most balls
      // hold only the self row and stay under-filled
      val r1 = gtCos.where(col("rank") === 2).select("score")
        .collect().map(_.getDouble(0)).sorted
      val rk = gtCos.where(col("rank") === k).select("score")
        .collect().map(_.getDouble(0)).sorted
      for ((name, r) <- Seq(("tight", pctOf(r1, 0.9)),
          ("boundary", pctOf(rk, 0.5)), ("easy", pctOf(rk, 0.1)))) {
        val gtBall = KnnSearch.radiusTopK(embs, "vec_id", "embedding",
          queries, "qid", "qvec", "cosine", r, k).cache()
        gtBall.count()
        val res = collH.searchHnswRadius(queries, "qid", "qvec", radius = r,
          limit = k, ef = 10)
        val rec = Recall.atK(res, gtBall)
        ladderLine("hnsw_radius_ladder", f"$name r=$r%.3f ef0=10",
          collH.lastLadderRungs.toSeq, corpusN, rec)
        gtBall.unpersist()
      }
      // hard negatives from the live graph (r9 verdict #4): recall of
      // the adaptive ANN arm vs the exact O(N·Q) scan
      val qhn = embs.where(col("vec_id") < nQ)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlab"))
      val gtHn = KnnSearch.hardNegatives(embs, "vec_id", "embedding", "label",
        qhn, "qid", "qvec", "qlab", "cosine", k).cache()
      gtHn.count()
      for (ef <- Seq(10, 32, 64))
        emit("hardneg_hnsw", s"M=8 efC=64 segs=4 ef=$ef adaptive",
          Recall.atK(collH.hardNegativesHnsw(qhn, "qid", "qvec", "qlab",
            "label", k = k, ef = ef), gtHn))
      gtHn.unpersist()
    }

    // ---- hard-negative LADDER COST (r10 verdict #7) -----------------
    // The row-102/103 work-accounting device on the label-filtered arm:
    // three negative-AVAILABILITY mixes decide how deep the one
    // label-blind traversal per rung must dig before the exact-rerank
    // label predicate fills k negatives per anchor — easy (anchor
    // label ~10% of the corpus: 90% of every beam is negative, first
    // rung fills), boundary (~50%), starved (~95% anchor label: the
    // negatives are a 5% tail and early rungs cannot fill, so the
    // ladder must escalate toward the exhaustive bound). work_multiple
    // ≤ 4/3 is the geometric claim under test on this arm.
    for ((name, pct) <- Seq(("easy", 10), ("boundary", 50), ("starved", 95))) {
      val collM = probeDb.createCollection(s"hn_$name")
      // deterministic relabel: label 0 on ~pct% of rows (salted hash —
      // independent of vec_id order), everything else keeps a shifted
      // original label (never 0)
      val relabeled = embs.select(col("vec_id").as("id"),
        col("embedding").as("vector"),
        when(pmod(xxhash64(col("vec_id"), lit(name)), lit(100)) < pct, lit(0L))
          .otherwise(col("label") + 1L).as("label"))
      collM.upsert(relabeled)
      collM.rebuildHnswIndex(m = 8, efConstruction = 64, numSegments = 4,
        metric = "cosine")
      // anchors: label-0 members (the mix's majority/minority class)
      val anchors = collM.query(filter = "label = 0",
          sort = Seq(("id", true)), limit = Some(nQ))
        .select(col("id").as("qid"), col("vector").as("qvec"),
          col("label").as("qlab"))
      val gtM = KnnSearch.hardNegatives(relabeled, "id", "vector", "label",
        anchors, "qid", "qvec", "qlab", "cosine", k).cache()
      gtM.count()
      val res = collM.hardNegativesHnsw(anchors, "qid", "qvec", "qlab",
        "label", k = k, ef = 10)
      ladderLine("hardneg_hnsw_ladder", s"$name anchor_label_pct=$pct ef0=10",
        collM.lastLadderRungs.toSeq, corpusN, Recall.atK(res, gtM))
      gtM.unpersist()
    }
    locally {
      val collI = probeDb.createCollection("i")
      collI.upsert(embs.select(col("vec_id").as("id"),
        col("embedding").as("vector")))
      collI.rebuildIndex(nlist = 16, metric = "l2")
      // rank-1 is the query itself (L2 self-distance exactly 0.0) —
      // the tight mix keys off rank-2, same as the HNSW arm
      val d1 = gtL2.where(col("rank") === 2).select("score")
        .collect().map(_.getDouble(0)).sorted
      val dk = gtL2.where(col("rank") === k).select("score")
        .collect().map(_.getDouble(0)).sorted
      for ((name, r) <- Seq(("tight", pctOf(d1, 0.1)),
          ("boundary", pctOf(dk, 0.5)), ("easy", pctOf(dk, 0.9)))) {
        val gtBall = KnnSearch.radiusTopK(embs, "vec_id", "embedding",
          queries, "qid", "qvec", "l2", r, k).cache()
        gtBall.count()
        val res = collI.searchIvfRadius(queries, "qid", "qvec", radius = r,
          limit = k, nprobe = 1)
        val rec = Recall.atK(res, gtBall)
        ladderLine("ivf_radius_ladder", f"$name r=$r%.3f nprobe0=1 nlist=16",
          collI.lastLadderRungs.toSeq, 16L, rec)
        gtBall.unpersist()
      }
    }

    // ---- IVF ladder at LARGER nlist: the vs_exhaustive claim --------
    // At nlist=16 a 3-rung ladder costs ~the full probe (cap is tiny);
    // the ladder's win is supposed to GROW with nlist — rungs stay ~3
    // while the cap grows 4×. Measure instead of assert.
    locally {
      val collI64 = probeDb.createCollection("i64")
      collI64.upsert(embs.select(col("vec_id").as("id"),
        col("embedding").as("vector")))
      collI64.rebuildIndex(nlist = 64, metric = "l2")
      val d1 = gtL2.where(col("rank") === 2).select("score")
        .collect().map(_.getDouble(0)).sorted
      val dk = gtL2.where(col("rank") === k).select("score")
        .collect().map(_.getDouble(0)).sorted
      for ((name, r) <- Seq(("tight", pctOf(d1, 0.1)),
          ("boundary", pctOf(dk, 0.5)), ("easy", pctOf(dk, 0.9)))) {
        val gtBall = KnnSearch.radiusTopK(embs, "vec_id", "embedding",
          queries, "qid", "qvec", "l2", r, k).cache()
        gtBall.count()
        val res = collI64.searchIvfRadius(queries, "qid", "qvec", radius = r,
          limit = k, nprobe = 1)
        val rec = Recall.atK(res, gtBall)
        ladderLine("ivf_radius_ladder64", f"$name r=$r%.3f nprobe0=1 nlist=64",
          collI64.lastLadderRungs.toSeq, 64L, rec)
        gtBall.unpersist()
      }
    }

    // ---- hard-negative serving vs LABEL COUNT (single-traversal) ----
    // hardNegativesHnsw traverses once per rung regardless of how many
    // distinct labels the batch carries (a per-label-group design
    // would pay one traversal per label). Measure wall time for a
    // 32-anchor batch at 2 / 8 / 32 distinct labels — the claim is a
    // FLAT row, min-of-3 after a warm run.
    for (nLabels <- Seq(2, 8, 32)) {
      val collL = probeDb.createCollection(s"hl$nLabels")
      collL.upsert(embs.select(col("vec_id").as("id"),
        col("embedding").as("vector"),
        pmod(col("vec_id"), lit(nLabels)).as("label")))
      collL.rebuildHnswIndex(m = 8, efConstruction = 64, numSegments = 4,
        metric = "cosine")
      val qhn = embs.where(col("vec_id") < nQ)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          pmod(col("vec_id"), lit(nLabels)).as("qlab"))
      collL.hardNegativesHnsw(qhn, "qid", "qvec", "qlab", "label",
        k = k, ef = 32).count() // warm (graph prepare + codegen)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        collL.hardNegativesHnsw(qhn, "qid", "qvec", "qlab", "label",
          k = k, ef = 32).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"family":"hardneg_labels","config":"n_labels=$nLabels anchors=$nQ ef=32","sec":${ts.min}%.3f}""")
    }

    // ---- SemDeDup multi-assign on REALISTIC geometry (r9 verdict #8) -
    // The grid above measures the clusterless worst case (testdata
    // embeddings) and RecallSpec pins exact-clustered = 1.0; real
    // embedding spaces sit between — tight clusters plus an isotropic
    // noise fraction. Two mixtures (hash-seeded, deterministic):
    // tight = 32 centers at 0.25σ spread + 25% noise; loose = 64
    // centers at 0.5σ + 25% noise. Rows report where the margin
    // default actually lands there, with the pair-work multiple.
    locally {
      val nS = math.max(corpusN, 2000L)
      def g(key: String, salt: Int) = ProbeUtil.gauss(key, salt)
      def mixture(centers: Int, spread: Double) =
        spark.range(nS).select(col("id").as("vec_id"),
          expr(s"transform(sequence(1, 64), j -> " +
            s"CASE WHEN pmod(id, 4) < 3 THEN ${g(s"pmod(id, $centers)", 21)} + $spread * ${g("id", 3)} " +
            s"ELSE ${g("id", 3)} END)").as("embedding"))
      for ((geo, centers, spread, epses) <- Seq(
          ("mix_tight", 32, 0.25, Seq(0.7, 0.8)),
          ("mix_loose", 64, 0.5, Seq(0.5, 0.6)))) {
        val embsM = mixture(centers, spread)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        embsM.count()
        // pair work has no eps dependence — compute the margin grid's
        // work once per geometry, not once per eps (review finding)
        val margins = Seq(0.0, 0.02, 0.05, 0.1)
        val workOf = margins.map(mg => mg ->
          graft.dedup.Dedup.semDedupPairWork(embsM, "vec_id", "embedding",
            nclusters = 8, maxCellSize = 4096, assignMargin = mg)).toMap
        for (eps <- epses) {
          val truthM = graft.dedup.Dedup.semDedupPairs(embsM, "vec_id",
              "embedding", eps, nclusters = 1)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val nT = truthM.count()
          if (nT > 0) {
            for (margin <- margins) {
              val rec = Recall.pairRecall(graft.dedup.Dedup.semDedupPairs(
                embsM, "vec_id", "embedding", eps, nclusters = 8,
                maxCellSize = 4096, assignMargin = margin), truthM)
              println(f"""{"family":"semdedup_$geo","config":"nclusters=8 cap=4096 eps=$eps margin=$margin truth=$nT","recall":$rec%.4f,"work_ratio":${workOf(margin).toDouble / workOf(0.0)}%.3f}""")
            }
          } else
            println(s"""{"family":"semdedup_$geo","config":"eps=$eps","note":"no qualifying pairs at this eps"}""")
          truthM.unpersist()
        }
        embsM.unpersist()
      }
    }

    // ---- diversity serving from the graph (rows 119-120) ------------
    // What a fixed group-blind beam recovers of the exact GROUPED page
    // (fraction of the exact (grp_rank, grp, id) page present in the
    // beam page — the client ladder escalates from here; exhaustive
    // beam = 1.0 by the byte-equality DiversitySpec pin), and how much
    // the MMR selection over a graph-seeded pool overlaps the
    // exact-pool selection at the same lambda.
    // (shared block — ProbeUtil.groupedPageRecovery; the ef list is the
    // probe's own sweep; ONE graph build serves this block and the MMR
    // overlap below)
    locally {
      val hnswD = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
        efConstruction = 64, numSegments = 4).cache()
      hnswD.count()
      ProbeUtil.groupedPageRecovery(embs, queries, Seq(12, 24, 48, 96),
        (config, v) => emit("grouped_hnsw_page", config, v),
        prebuilt = Some(hnswD))
      val qLocalD = queries.select(col("qid"), col("qvec").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val exactSel = Mmr.topKDiverse(embs, "vec_id", "embedding", queries,
          "qid", "qvec", "cosine", k, lambda = 0.5, poolMult = 4)
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the beam is swept HONESTLY below the pool size too (a sub-pool
      // beam yields a smaller pool — that is the measurement, not a
      // clamp; review finding: max(ef, k*4) silently re-ran the k*4
      // beam and mislabeled the row)
      for (ef <- Seq(k * 2, k * 4, k * 8)) {
        val pool = HnswIndex.scoredCandidates(hnswD, embs, "vec_id",
            "embedding", qLocalD, "cosine", ef,
            prepared = false, nodeKey = None)
          .groupBy("query_id")
          .agg(TopKAgg.topk(col("__s"), col("id"), k * 4, asc = false).as("__t"))
          .select(col("query_id"), explode(col("__t")).as("__r"))
          .select(col("query_id"), col("__r.id").as("id"), col("__r.score").as("__s"))
        val rows = embs.select(col("vec_id").cast("long").as("id"),
            col("embedding").cast("array<double>").as("__v"))
          .join(pool, "id")
          .select(col("query_id"), col("id"), col("__s"), col("__v"))
        val annSel = Mmr.greedySelect(rows, "cosine", k, 0.5)
          .select("query_id", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        emit("mmr_hnsw_overlap", s"k=$k lambda=0.5 poolMult=4 ef=$ef",
          (exactSel & annSel).size.toDouble / exactSel.size)
      }
      hnswD.unpersist()
    }

    // ---- diversity-arm LADDER work accounting (r11 verdict #7) ------
    // (shared block — ProbeUtil.diversityLadders: three grouped mixes
    // easy/coarse/unfillable + two MMR mixes easy/starved through the
    // CLIENT routes; recall = overlap with the exact route.)
    ProbeUtil.diversityLadders(probeDb, embs, queries, corpusN, k)

    // ---- IVF_SQ8 cell certificate vs CLUSTER GEOMETRY (r11 verdict #6)
    // The sq_radius_cells row above measures the cell gate on the
    // driver's UN-clustered corpus — the worst case. The file-listing-
    // prune claim rests on clustered data (shared sweep —
    // ProbeUtil.cellGeometrySweep: mixture corpus per sigma, production
    // nlist = ceil(sqrt N), R matched to the median kth-NN distance).
    ProbeUtil.cellGeometrySweep(spark, corpusN, nQ, k,
      Seq(0.25, 0.5, 1.0, -1.0),
      (geo, config, v) => emit(s"sq_radius_cells_$geo", config, v))

    // ---- hybrid + chunk DERIVED default beams (r13 weak → r14) ------
    // The row-123 ef_default contract now covers the last two serving
    // routes that hard-coded a fixed beam of 10: hybrid's unfiltered
    // dense arm and the chunk graph. These rows measure, through the
    // CLIENT routes, what the no-ef default recovers of the exhaustive
    // page — the ≥ 0.9 floor claim — with the old fixed 10 alongside.
    locally {
      val docs = Tables.documents(spark, sfDir)
      val hroot = java.nio.file.Files.createTempDirectory("graft-probe-hybef").toString
      val hcoll = new graft.api.GraftClient(spark, hroot)
        .createDatabase("p").createCollection("h")
      hcoll.upsert(docs.select(col("doc_id").as("id"), col("text"))
        .join(embs.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vector")), "id"))
      hcoll.rebuildHnswIndex(m = 8, efConstruction = 64, numSegments = 4)
      val kw = Seq("spark", "data", "query")
      val autoEf = hcoll.describe("index.hnsw.ef_default").toInt
      val hq = queries.select(col("qid"), col("qvec").cast("array<double>").as("qvec"))
      def page(ef: Option[Int]): Set[(Long, String)] =
        hcoll.hybridSearch(hq, "qid", "qvec", kw, limit = k, ef = ef)
          .select("query_id", "id").collect()
          .map(r => (r.getLong(0), r.get(1).toString)).toSet
      val exact = page(Some(Int.MaxValue))
      emit("hybrid_auto", s"no-ef (derived ef=$autoEf) vs exhaustive",
        (page(None) & exact).size.toDouble / math.max(exact.size, 1))
      emit("hybrid_auto", "fixed ef=10 (old default) vs exhaustive",
        (page(Some(10)) & exact).size.toDouble / math.max(exact.size, 1))

      val vroot = java.nio.file.Files.createTempDirectory("graft-probe-chunkef").toString
      val view = new graft.api.GraftClient(spark, vroot)
        .createDatabase("p").createCollectionView("docs")
      view.uploadFiles(docs.select(
        concat(lit("d"), col("doc_id"), lit(".md")).as("file_name"),
        encode(col("text"), "UTF-8").as("content")))
      view.rebuildChunkGraph()
      val chunkEf = view.chunkGraphMeta("index.hnsw.default_ef").toInt
      val contents = docs.orderBy("doc_id").limit(8).collect()
        .map(_.getAs[String]("text").split(" ").take(5).mkString(" "))
      def chunkPage(ef: Option[Int]): Set[(Int, String, String)] =
        contents.zipWithIndex.flatMap { case (c, qi) =>
          view.search(c, limit = k, ef = ef).collect()
            .map(r => (qi, r.getString(1), r.get(2).toString))
        }.toSet
      val chunkExact = chunkPage(Some(Int.MaxValue))
      emit("chunk_auto", s"no-ef (derived ef=$chunkEf) vs exhaustive",
        (chunkPage(None) & chunkExact).size.toDouble / math.max(chunkExact.size, 1))
      emit("chunk_auto", "fixed ef=10 (old default) vs exhaustive",
        (chunkPage(Some(10)) & chunkExact).size.toDouble / math.max(chunkExact.size, 1))
    }

    val qs = results.map { case (f, c, r) =>
      "\"" + f + " " + c + "\":" + f"$r%.4f" }.mkString("{", ",", "}")
    println(s"""{"metric":"recall@$k","corpus":$corpusN,"n_queries":$nQ,"sf":"$sfDir","results":$qs}""")
    spark.stop()
  }
}
