package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * A short warmup (two representative queries, untimed) absorbs
  * one-time JVM / codegen / parquet-footer costs so the timed loop
  * measures steady-state query latency, which is what would scale on a
  * cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup covers each table family (lineitem, vectors, documents) so
    // no timed query absorbs first-touch parquet/codegen cost, and
    // triggers the one-time persisted-index builds (fulltext postings,
    // corpus embedding, chunk index) that production pays at ingest —
    // timed queries then measure the serving path.
    Seq("q1_agg", "q_knn_cosine", "q_lang_id", "q_fulltext",
        "q_search_by_text", "q_chunk_search", "q_scalar_index", "q_sparse_search",
        "q_dedup_clusters", "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram",
        "q_dedup_embed_lsh", "q_ivf_search",
        // first touch builds the persisted gram-set / band-bucket
        // artifacts (ingest-time cost) — timed runs measure serving
        "q_dedup_minhash_verified", "q_lsh_ann", "q_lsh_ann_exhaustive",
        // builds the per-segment HNSW graph artifact (ingest-time cost)
        "q_hnsw_search",
        // builds pqbooks + pqcodes / ivfpqcodes / sqbounds + ivfsqcodes
        "q_pq_search", "q_ivfpq_exhaustive", "q_ivfsq_search",
        // builds the per-cell ball-radius stats artifact (ingest-time
        // cost of the exact-radius certificate); the _cos twin builds
        // the unit-sphere artifact set (r13 cosine arm)
        "q_sq_radius", "q_sq_radius_cos",
        // builds the pinned-dictionary merge artifact (r13)
        "q_bpe_apply", "q_unigram_apply",
        // builds the bigram-frequency and distilled-classifier artifacts
        // (ingest-time cost) — timed runs then measure serving
        "q_rare_bigrams", "q_quality_classifier",
        // builds the vocabulary / BPE-merge tokenizer artifacts
        "q_tokenize_ids", "q_bpe_encode",
        // builds the SemDeDup centroid artifact (ingest-time k-means)
        "q_semdedup_prod",
        // builds the pinned-corpus trained artifacts (r14): the
        // assignment centroids (KMeans train + parquet write) and the
        // micro-quantized classifier weights (L-BFGS fit) — one-time
        // ingest cost that must not land inside timed run 1
        "q_ivf_assign", "q_quality_score")
      .foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case _: Throwable => () }
      }

    // The timed suite runs N=3 times in-process and the reported
    // per-query number is the MIN of the three: min isolates plan cost
    // from box noise (GC pauses, page-cache eviction, a loaded driver
    // host) that a single pass cannot distinguish from a regression —
    // BENCH_r05's uniform multi-x slowdowns on code-identical paths
    // were exactly that failure mode. All three runs land in
    // BENCH_DETAIL.json for bisection.
    val names = SparkEntry.queries.keys.toSeq.sorted
    // per-run 1-minute load average, sampled as each run STARTS — the
    // co-tenant-pressure witness (r12 verdict #5: three straight
    // rounds needed forensic reconstruction because a pressured run
    // shipped with no self-identification)
    val loadAvgs = scala.collection.mutable.ArrayBuffer.empty[Double]
    // per-run failed-query count: a run where queries THREW records
    // near-zero elapsed for them and would otherwise masquerade as the
    // FASTEST run — the review pass caught that the clean-run basis
    // below must be able to see broken runs, not just slow ones
    val runFails = scala.collection.mutable.ArrayBuffer.empty[Int]
    val runs: Seq[Map[String, Double]] = (1 to 3).map { _ =>
      loadAvgs += java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      var fails = 0
      val run = names.map { name =>
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, sfDir).count() }
        catch { case _: Throwable => fails += 1 }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
      runFails += fails
      run
    }
    val minQ = names.map(n => n -> runs.map(_(n)).min)
    val meanQ = names.map(n => n -> runs.map(_(n)).sum / runs.length)
    // per-query MEDIAN-of-3 alongside min (r12): min is the right
    // plan-cost isolator WITHIN a run set, but it is not comparable
    // ACROSS runs with different noise profiles — r11's committed runs
    // spread 125–171s (its per-query min cherry-picked deep valleys)
    // while r12's spread 115–122s, and the min-vs-min ratio read 1.24
    // on code-identical paths where mean-vs-mean read 0.82. The median
    // is robust to one bad AND one lucky run; future round-over-round
    // comparisons should lead with it.
    // true median: midpoint of the middle pair on an even count — the
    // clean-run recompute below can legitimately hold 2 runs, and
    // upper-element "median" would systematically report the slower
    // of the pair (r14 review fix)
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val medQ = names.map(n => n -> med(runs.map(_(n))))
    // the maintenance arm gets the same noise treatment as the timed
    // suite — min-of-3 since r12 (the r11 min-of-2 numbers swung 10x
    // in BOTH directions on unchanged code: m_lm_retrain_8x 1.2→12.1s
    // while m_upsert_live_index_8x 16.0→3.0s — two samples cannot
    // separate a real regression from one bad draw). Each pass drops
    // the page/executor cache first: the maintenance arms run AFTER
    // the 3×136-query timed suite has filled the block manager with
    // pinned index artifacts, and that pressure — not the maintenance
    // code — is what the r11 regression measured (r11 verdict #1; the
    // isolated-JVM probe reproduces the fast numbers). The timed-query
    // artifacts are IndexStore-ensured parquet, so dropping the cache
    // costs re-reads, never correctness.
    val maintRuns: Seq[Seq[(String, Double)]] = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      maintenanceOps(spark, sfDir) ++ prodBandCost(spark, sfDir) ++
        modelMaintenanceOps(spark, sfDir) ++ vectorMaintenanceOps(spark, sfDir) ++
        w2vMaintenanceOps(spark, sfDir)
    }
    val maintKeys = maintRuns.head.map(_._1)
    val maint = maintKeys.map { k =>
      k -> maintRuns.map(_.toMap.apply(k)).filter(_ >= 0.0)
        .reduceOption((a: Double, b: Double) => math.min(a, b)).getOrElse(-1.0)
    }

    def r3(v: Double): Double = math.round(v * 1000) / 1000.0
    def js(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    // credibility signal (r12 verdict #5): per-run wall totals, their
    // max/min spread, and a pressure flag at spread > 1.7 — the
    // threshold sits ABOVE the box's measured NORMAL envelope (routine
    // idle-box run sets spread 1.4–1.6×; r11/r12 committed sets read
    // 1.37/1.69 un-pressured) and BELOW the measured co-tenant
    // profiles (2.7× r12 driver run, 2.7× the discarded fifth run) —
    // a flag at 1.5 would cry wolf on ordinary noise and train readers
    // to ignore it. A flagged run's min/median must not be compared
    // across rounds without the BENCH_DETAIL forensics.
    val runTotals = runs.map(run => r3(names.map(run(_)).sum))
    val runsSpread = r3(runTotals.max / math.max(runTotals.min, 1e-9))
    val pressureFlag = runsSpread > 1.7
    // r13 verdict #6: a flagged run set must never HEADLINE a
    // certification — when the flag fires, the summary's min/mean/
    // median are recomputed over the CLEAN runs only (runs whose wall
    // total is within the 1.7 envelope of the fastest; the pressured
    // outlier is a co-tenant artifact, not a measurement of this
    // code), the raw 3-run totals stay in run_totals for forensics,
    // and headline_basis says exactly what the numbers are drawn
    // from. An unflagged set is byte-identical to the historical
    // output (basis "all_runs").
    // clean = within the 1.7 envelope of the MEDIAN total, two-sided,
    // and zero failed queries (r14 review fix: the envelope was
    // anchored at the minimum, which assumes the fastest run is always
    // honest — a run whose queries failed in milliseconds would have
    // been the sole "clean" basis; the median anchor rejects both the
    // co-tenant outlier above and the broken run below it)
    val totalsMed = med(runTotals)
    val cleanIdx = runTotals.zipWithIndex.filter { case (t, i) =>
      runFails(i) == 0 && t <= totalsMed * 1.7 && t >= totalsMed / 1.7
    }.map(_._2)
    val cleanRuns = cleanIdx.map(runs(_))
    val (minQ2, meanQ2, medQ2, basis) =
      if (!pressureFlag || cleanRuns.isEmpty) (minQ, meanQ, medQ, "all_runs")
      else (
        names.map(n => n -> cleanRuns.map(_(n)).min),
        names.map(n => n -> cleanRuns.map(_(n)).sum / cleanRuns.length),
        names.map(n => n -> med(cleanRuns.map(_(n)))),
        s"clean_runs(${cleanRuns.length}of${runs.length})")
    val pressureJs =
      s""""run_totals":[${runTotals.mkString(",")}],""" +
      s""""run_failures":[${runFails.mkString(",")}],""" +
      s""""load_avg":[${loadAvgs.map(r3).mkString(",")}],""" +
      s""""runs_spread":$runsSpread,"pressure_flag":$pressureFlag,""" +
      s""""headline_basis":"$basis""""
    val minTotal2 = r3(minQ2.map(_._2).sum)
    val meanTotal2 = r3(meanQ2.map(_._2).sum)
    val medTotal2 = r3(medQ2.map(_._2).sum)

    // full per-run detail to a file (the stdout line must stay compact:
    // the driver captures a bounded TAIL of stdout, and r5's long line
    // was truncated mid-JSON — values here are 3-decimal for the same
    // reason)
    val detail = runs.zipWithIndex.map { case (run, i) =>
      "\"run" + (i + 1) + "\":" + js(names.map(n => n -> run(n)))
    }.mkString("{", ",",
      ",\"median\":" + js(medQ) +
        "," + pressureJs +
        ",\"maintenance\":" + js(maint) +
        maintRuns.zipWithIndex.map { case (mr, i) =>
          ",\"maintenance_run" + (i + 1) + "\":" + js(mr)
        }.mkString + "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    println(s"""{"metric":"total","value":$minTotal2,"unit":"sec","queries":${js(minQ2 ++ maint)},"mean_total":$meanTotal2,"median_total":$medTotal2,"runs":3,$pressureJs,"sf":"$sfDir"}""")

    // The driver captures a bounded 2000-char TAIL of stdout (which
    // also swallows sbt's trailing "[success]" line) and parses the
    // LAST JSON line it finds — the full per-query line above overflows
    // that window and was head-truncated in BENCH_r07 ("parsed": null).
    // So the FINAL line is a compact summary guaranteed to fit: totals,
    // every m_* maintenance key (the incremental-index claims), and the
    // slowest query mins greedily filled to the budget; everything
    // omitted here is in the full line above and BENCH_DETAIL.json.
    val budget = 1600
    val maintJs = js(maint)
    val head = s"""{"metric":"total","value":$minTotal2,"unit":"sec","mean_total":$meanTotal2,"median_total":$medTotal2,"runs":3,$pressureJs,"sf":"$sfDir","maintenance":$maintJs,"detail":"BENCH_DETAIL.json","queries":{"""
    val tail2 = s"},\"queries_total\":${names.length}}"
    val slowest = minQ2.sortBy(-_._2)
    val sb = new StringBuilder(head)
    var first = true
    slowest.foreach { case (n, v) =>
      val piece = (if (first) "" else ",") + "\"" + n + "\":" + r3(v)
      if (sb.length + piece.length + tail2.length <= budget) {
        sb.append(piece); first = false
      }
    }
    sb.append(tail2)
    // file-based copy of the summary line (BENCH_SUMMARY.json): the
    // driver's stdout parse has a second, decoration-proof way in
    println(sb.toString)
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SUMMARY.json"),
      (sb.toString + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }

  /** Trained-embedding (row 113) maintenance pair: the Word2Vec FIT is
    * the one-time O(corpus) cost (m_w2v_train at 1× and 8× corpus —
    * expected to grow), while EMBEDDING a fixed 200-doc batch through
    * the stored vocab artifact is the per-upsert cost and must stay
    * FLAT against corpus growth (a posting join against a
    * dictionary-sized broadcast — the artifact-serving split every
    * maintained model here carries). */
  private[graft] def w2vMaintenanceOps(spark: SparkSession,
                                sfDir: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    var batch: org.apache.spark.sql.DataFrame = null
    try {
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      batch = base.limit(200).cache()
      batch.count()
      // warm the fit/embed codepaths once
      locally {
        val v = graft.text.TextEmbed.trainWord2VecVocab(
          base.limit(500), "text", dim = 32)
        graft.text.TextEmbed.embedWithVocab(batch, "doc_id", "text", v).count()
      }
      def measure(name: String, mult: Int): Seq[(String, Double)] = {
        val corpus = (0 until mult).map(i =>
            base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
              col("text")))
          .reduce(_ unionAll _)
        val t0 = System.nanoTime()
        val vocab = graft.text.TextEmbed.trainWord2VecVocab(
          corpus, "text", dim = 32)
        vocab.cache().count()
        val tTrain = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.text.TextEmbed.embedWithVocab(batch, "doc_id", "text", vocab)
          .count()
        val tEmbed = (System.nanoTime() - t1) / 1e9
        vocab.unpersist()
        Seq(s"m_w2v_train_$name" -> tTrain, s"m_w2v_embed_$name" -> tEmbed)
      }
      val corpusAxis = measure("1x", 1) ++ measure("8x", 8)
      // the VOCABULARY axis (r10 verdict #8): serving cost of the same
      // 200-doc batch against a 1× and a 10× STORED vocab — the axis
      // the (now removed) broadcast hint was hiding. The 10× table
      // inflates the artifact with distinct suffixed words (they match
      // no corpus token, exactly like the long tail of a 100 TB vocab)
      // — the posting equi-join must stay FLAT in stored-vocab size,
      // because the join is keyed by word and the batch's postings,
      // not the dictionary, are the probe side.
      val vocabAxis = {
        var v1: org.apache.spark.sql.DataFrame = null
        var v10: org.apache.spark.sql.DataFrame = null
        // unpersist in finally — the catch-all below swallows failures
        // and a leaked cache entry would shadow the rest of the bench
        // (the same advisor finding as `batch`)
        try {
          v1 = graft.text.TextEmbed.trainWord2VecVocab(
            base, "text", dim = 32).cache()
          v1.count()
          v10 = (0 until 10).map(i =>
              if (i == 0) v1
              else v1.select(concat(col("word"), lit(s"~$i")).as("word"),
                col("vec"), col("freq")))
            .reduce(_ unionAll _).cache()
          v10.count()
          def t(v: org.apache.spark.sql.DataFrame): Double = {
            val t0 = System.nanoTime()
            graft.text.TextEmbed.embedWithVocab(batch, "doc_id", "text", v).count()
            (System.nanoTime() - t0) / 1e9
          }
          Seq("m_w2v_embed_v1x" -> t(v1), "m_w2v_embed_v10x" -> t(v10))
        } finally {
          if (v1 != null) v1.unpersist()
          if (v10 != null) v10.unpersist()
        }
      }
      corpusAxis ++ vocabAxis
    } catch { case _: Throwable =>
      Seq("m_w2v_train_1x" -> -1.0, "m_w2v_embed_1x" -> -1.0,
          "m_w2v_train_8x" -> -1.0, "m_w2v_embed_8x" -> -1.0,
          "m_w2v_embed_v1x" -> -1.0, "m_w2v_embed_v10x" -> -1.0)
    // unpersist on BOTH paths — the failure path used to leak the
    // cached batch for the rest of the bench run (advisor finding)
    } finally if (batch != null) batch.unpersist()
  }

  /** Serving cost of the banded embedding dedup at the PRODUCTION band
    * config (r=4 selective bands, t=0.5) vs the exhaustive-grade r=2
    * config the q_dedup_embed_lsh oracle entry must run (m_ key,
    * excluded from the query total). The pair quantifies what the
    * exhaustive banding costs: candidate volume is ~99% of all pairs at
    * r=2 (LshProfile, sf0.1) vs ~64% at r=4 — the measured recall trade
    * lives in SURVEY §5b (selective bands lose ~5–7% of pairs sitting
    * AT the threshold on this clusterless synthetic corpus). */
  private[graft] def prodBandCost(spark: SparkSession, sfDir: String): Seq[(String, Double)] =
    try {
      val embs = graft.sources.Tables.embeddings(spark, sfDir)
      val buckets = graft.catalog.IndexStore.ensure(spark,
          s"emblsh_prod_bench_${SparkEntry.sfKey(sfDir)}") {
        graft.dedup.Dedup.lshBandBuckets(embs, "vec_id", "embedding", 64, 16, 42L)
      }
      val t0 = System.nanoTime()
      graft.dedup.Dedup.embedLshFromBuckets(buckets, embs,
        "vec_id", "embedding", threshold = 0.5, bands = 16).count()
      Seq("m_dedup_embed_lsh_prod" -> (System.nanoTime() - t0) / 1e9)
    } catch { case _: Throwable => Seq("m_dedup_embed_lsh_prod" -> -1.0) }

  /** Index-maintenance costs (reported as m_* keys, excluded from the
    * query total): an upsert against a live fulltext index costs
    * O(batch) — the batch's postings land as a new segment and the
    * stats table refreshes — while a full rebuild re-pays O(corpus).
    *
    * Measured as a SCALING experiment, not a single point: the same
    * 200-doc point-batch upsert and the full rebuild each run against a
    * 1x and an 8x corpus. The incremental upsert must stay FLAT across
    * the 8x growth while the rebuild grows with the corpus — the pair
    * of slopes is the incremental-maintenance claim, robust to the
    * fixed orchestration floor that dominates any single small-scale
    * measurement. */
  /** Coded-vector-family maintenance pair (BQ — the round-8 family):
    * appending a 200-vector batch to a live BQ index (pack against the
    * STORED thresholds — O(batch)) versus the old cost of a full
    * rebuild (train + encode — O(corpus)), at 1× and 8× corpus sizes.
    * The flat-vs-linear contrast is the scaling evidence every
    * maintained artifact here carries. */
  private[graft] def vectorMaintenanceOps(spark: SparkSession,
                                   sfDir: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    try {
      // fresh artifact root per arm — the modelMaintenanceOps rationale
      def freshClient() = new graft.api.GraftClient(spark,
        java.nio.file.Files.createTempDirectory("graft-bench-vec").toString)
        .createDatabase("bench")
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vector"))
      // POINT batch on a bucketed collection, like the ft arm: all ids
      // hash into bucket 0 so the upsert's DATA merge rewrites one
      // bucket — the timed number then isolates index maintenance
      // (otherwise the O(corpus) snapshot rewrite dominates and the
      // pair cannot show the flat-vs-linear contrast)
      // id range DISJOINT from every corpus slice (slice i of the 64x
      // arm covers i*1M + [0, base rows); 90M clears i <= 63): the two
      // timed arms must both be pure inserts — colliding ids would turn
      // the bigger arm's batch into part-updates (ledger masking +
      // replacement), a different operation under the same key
      val ids = spark.range(90000000L, 92000000L).toDF("id")
        .where(pmod(xxhash64(col("id")), lit(32L)) === 0).limit(200)
        .collect().map(_.getLong(0)).toSeq
      import spark.implicits._
      val vecs = base.limit(200).select(col("vector"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      val batch = ids.zip(vecs).toDF("id", "vector").cache()
      batch.count()
      // warm the pack/append/rebuild paths once (the index arm's lesson)
      locally {
        val warm = freshClient().createCollection("vwarm", Map("buckets" -> "32"))
        warm.upsert(base.limit(2000))
        warm.rebuildBqIndex()
        warm.upsert(batch)
        warm.rebuildBqIndex()
      }
      def measure(name: String, mult: Int): Seq[(String, Double)] = {
        val coll = freshClient().createCollection(name, Map("buckets" -> "32"))
        val docs = (0 until mult).map(i =>
            base.select((col("id") + lit(i * 1000000L)).as("id"), col("vector")))
          .reduce(_ unionAll _)
        coll.upsert(docs)        // untimed: initial corpus load
        coll.rebuildBqIndex()    // untimed: ingest-time build (warms too)
        val t0 = System.nanoTime()
        coll.upsert(batch)       // incremental: O(batch) packed segment
        val tUpsert = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        coll.rebuildBqIndex()    // the old cost: O(corpus)
        val tRebuild = (System.nanoTime() - t1) / 1e9
        Seq(s"m_bq_upsert_live_$name" -> tUpsert,
            s"m_bq_rebuild_$name" -> tRebuild)
      }
      // 8/64 corpus multiples like the sibling arms: at 1/8 both
      // points are floor-dominated and the flat-vs-linear contrast
      // the pair exists to demonstrate is invisible in the numbers.
      // Labels stay RELATIVE (1x = the arm's baseline), the
      // maintenanceOps convention — the absolute multiple is a
      // property of the arm, recorded here and in SURVEY §7
      val out = measure("1x", 8) ++ measure("8x", 64)
      batch.unpersist()
      out
    } catch { case _: Throwable =>
      Seq("m_bq_upsert_live_1x" -> -1.0, "m_bq_rebuild_1x" -> -1.0,
          "m_bq_upsert_live_8x" -> -1.0, "m_bq_rebuild_8x" -> -1.0)
    }
  }

  /** Rebuild cost accounting for the stacked r13 steps (r13 verdict
    * #5): the IVF_SQ8 rebuild now pays gate-space projection +
    * cellStats + nprobe CALIBRATION — this times the full
    * rebuildIvfSqIndex at 1× and 8× corpus, plus the calibration step
    * ALONE at each scale (centers retrained untimed, isolating the
    * calibrate call's own sample-bounded exact-KNN job), so §7 can
    * show the calibration's share stays bounded as the corpus grows.
    * MaintProbe family "rebuild"; deliberately NOT in the bench's
    * default maintenance set — a full 8× quantized rebuild would
    * stretch every bench run for a number that only moves when the
    * rebuild path changes. */
  private[graft] def rebuildCostOps(spark: SparkSession,
                                    sfDir: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    def freshClient() = new graft.api.GraftClient(spark,
      java.nio.file.Files.createTempDirectory("graft-bench-rebuild").toString)
      .createDatabase("bench")
    val base = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vector"))
    // warm the train/encode/cellStats/calibrate path once (JIT + MLlib
    // init — the index arm's lesson)
    locally {
      val warm = freshClient().createCollection("rwarm")
      warm.upsert(base.limit(500))
      warm.rebuildIvfSqIndex()
    }
    Seq(1, 8).flatMap { mult =>
      val coll = freshClient().createCollection(s"r${mult}x")
      val docs = (0 until mult).map(i =>
          base.select((col("id") + lit(i * 1000000L)).as("id"), col("vector")))
        .reduce(_ unionAll _)
      coll.upsert(docs) // untimed: initial corpus load
      val t0 = System.nanoTime()
      coll.rebuildIvfSqIndex() // auto nlist, auto calibration — the prod path
      val tRebuild = (System.nanoTime() - t0) / 1e9
      val data = docs.select(col("id").as("vec_id"), col("vector").as("embedding"))
      val model = graft.vector.IvfIndex.train(data, "embedding",
        graft.api.GraftCollection.autoNlist(docs.count()))
      val centers = model.kmeans.clusterCenters.map(_.toArray).zipWithIndex.toSeq
      val t1 = System.nanoTime()
      graft.vector.IvfIndex.calibrateNprobe(data, "vec_id", "embedding", centers)
      val tCal = (System.nanoTime() - t1) / 1e9
      Seq(s"m_ivfsq_rebuild_${mult}x" -> tRebuild,
          s"m_ivfsq_calibrate_${mult}x" -> tCal)
    }
  }

  private[graft] def maintenanceOps(spark: SparkSession,
                             sfDir: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    try {
      // fresh artifact root per arm — the modelMaintenanceOps rationale
      def freshClient() = new graft.api.GraftClient(spark,
        java.nio.file.Files.createTempDirectory("graft-bench-maint").toString)
        .createDatabase("bench")
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id").as("id"), col("text"))
      // the POINT batch — all ids hash into bucket 0 — the workload
      // hash-bucketed storage exists for: the data merge reads and
      // rewrites one bucket, the index append tokenizes 200 docs.
      // Materialized: a real caller hands over concrete rows, not a
      // corpus-sized lazy plan that re-executes per reference.
      val ids = spark.range(10000000L, 12000000L).toDF("id")
        .where(pmod(xxhash64(col("id")), lit(32L)) === 0).limit(200)
        .collect().map(_.getLong(0)).toSeq
      val texts = base.limit(200).select(col("text")).collect().map(_.getString(0)).toSeq
      import spark.implicits._

      // Untimed throwaway cycle over a small collection: the timed 1x
      // pass otherwise absorbs ALL first-touch JIT/codegen cost of the
      // mutation path and reads 4x LARGER than the 8x point (BENCH_r04:
      // 18.9s vs 4.7s) — inverted evidence for the flat-incremental
      // claim the scaling pair exists to demonstrate. Warm the exact
      // code paths (upsert merge, segment append, rebuild) once so both
      // timed points measure steady-state.
      {
        val warm = freshClient().createCollection("warm", Map("buckets" -> "32"))
        warm.upsert(base.limit(2000))
        warm.rebuildFulltextIndex()
        warm.upsert(ids.zip(texts).toDF("id", "text"))
        warm.rebuildFulltextIndex()
      }

      def measure(name: String, mult: Int): Seq[(String, Double)] = {
        val coll = freshClient().createCollection(name, Map("buckets" -> "32"))
        val docs = (0 until mult).map(i =>
            base.select((col("id") + lit(i * 1000000L)).as("id"), col("text")))
          .reduce(_ unionAll _)
        coll.upsert(docs)                // untimed: initial corpus load
        coll.rebuildFulltextIndex()      // untimed: ingest-time build (warms too)
        val batch = ids.zip(texts).toDF("id", "text")
        val t0 = System.nanoTime()
        coll.upsert(batch)               // incremental: O(batch) segment
        val tUpsert = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        coll.rebuildFulltextIndex()      // the old cost: O(corpus)
        val tRebuild = (System.nanoTime() - t1) / 1e9
        Seq(s"m_upsert_live_index_$name" -> tUpsert,
            s"m_fulltext_rebuild_$name" -> tRebuild)
      }
      measure("1x", 8) ++ measure("8x", 64)
    } catch { case _: Throwable =>
      Seq("m_upsert_live_index_1x" -> -1.0, "m_fulltext_rebuild_1x" -> -1.0,
          "m_upsert_live_index_8x" -> -1.0, "m_fulltext_rebuild_8x" -> -1.0)
    }
  }

  /** Model-artifact maintenance costs, same scaling-pair discipline as
    * the index arm: folding a 200-doc batch into the stored LM counts
    * (`updateLmModel` — O(batch types + stored types), the additive-
    * sufficient-statistic fold) versus retraining on the corpus
    * (O(corpus)); and DSIR weight serving for the same batch against
    * the persisted ratio table (O(batch) through a fixed-size
    * broadcast — flat by construction). */
  private[graft] def modelMaintenanceOps(spark: SparkSession,
                                  sfDir: String): Seq[(String, Double)] = {
    import org.apache.spark.sql.functions._
    try {
      // fresh artifact root PER ARM (r11 verdict #1): a shared root
      // lets one arm's accumulated segments/artifacts sit in the
      // filesystem cache the next arm's timings contend with
      def freshClient() = new graft.api.GraftClient(spark,
        java.nio.file.Files.createTempDirectory("graft-bench-model").toString)
        .createDatabase("bench")
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id").as("id"), col("text"))
      val batch = base.limit(200)
        .select((col("id") + lit(50000000L)).as("id"), col("text"))
        .cache()
      batch.count()
      // warm the fold/score/retrain paths once (the index arm's lesson:
      // the 1x point otherwise absorbs all first-touch codegen cost)
      locally {
        val warm = freshClient().createCollection("mwarm")
        warm.upsert(base.limit(2000))
        warm.trainLmModel()
        warm.updateLmModel(batch, "id", "text")
        warm.trainDsirModel(base.limit(1000), "id", "text")
        warm.dsirWeightsOf(batch, "id", "text").count()
      }
      def measure(name: String, mult: Int): Seq[(String, Double)] = {
        val coll = freshClient().createCollection("m" + name)
        coll.upsert((0 until mult).map(i =>
            base.select((col("id") + lit(i * 1000000L)).as("id"), col("text")))
          .reduce(_ unionAll _))
        coll.trainLmModel()                    // untimed ingest-time build
        coll.trainDsirModel(base.limit(1000), "id", "text") // untimed
        val t0 = System.nanoTime()
        coll.updateLmModel(batch, "id", "text")   // the fold: batch + types
        val tFold = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        coll.trainLmModel()                        // the old cost: O(corpus)
        val tRetrain = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        coll.dsirWeightsOf(batch, "id", "text").count()
        val tServe = (System.nanoTime() - t2) / 1e9
        Seq(s"m_lm_fold_$name" -> tFold, s"m_lm_retrain_$name" -> tRetrain,
            s"m_dsir_serve_$name" -> tServe)
      }
      // VOCAB-scaling arm (the corpus arm above multiplies rows with
      // IDENTICAL text, so stored TYPES stay constant): suffix-rewriting
      // every token per copy multiplies the stored bigram vocabulary
      // ~10x while the fold batch stays fixed — the log-structured
      // append must keep the fold flat against artifact SIZE, not just
      // corpus rows (r8 verdict #5)
      def measureVocab(name: String, vmult: Int): Seq[(String, Double)] = {
        val coll = freshClient().createCollection("mlv" + name)
        coll.upsert((0 until vmult).map(i =>
            base.select((col("id") + lit(i * 1000000L)).as("id"),
              regexp_replace(col("text"), "(\\S+)", s"$$1x$i").as("text")))
          .reduce(_ unionAll _))
        coll.trainLmModel()
        val t0 = System.nanoTime()
        coll.updateLmModel(batch, "id", "text")
        Seq(s"m_lm_fold_vocab_$name" -> ((System.nanoTime() - t0) / 1e9))
      }
      val out = measure("1x", 8) ++ measure("8x", 64) ++
        measureVocab("1x", 1) ++ measureVocab("10x", 10)
      batch.unpersist()
      out
    } catch { case _: Throwable =>
      Seq("m_lm_fold_1x" -> -1.0, "m_lm_retrain_1x" -> -1.0,
          "m_dsir_serve_1x" -> -1.0, "m_lm_fold_8x" -> -1.0,
          "m_lm_retrain_8x" -> -1.0, "m_dsir_serve_8x" -> -1.0,
          "m_lm_fold_vocab_1x" -> -1.0, "m_lm_fold_vocab_10x" -> -1.0)
    }
  }
}
