package graft

import org.apache.spark.sql.functions._

/** Synthetic-scale probe for the curation operators: runs weighted
  * domain sampling, sequence packing, and repetition stats over a
  * deterministic generated corpus at 1x and 8x, printing wall times.
  *
  * What the pair of timings must show: sampling and repetition are
  * pure projections (time ~ scan, linear), and packing's only shuffle
  * is the single hashpartitioning(shard) — per-shard window sorts are
  * bounded by nShards, so its time also grows linearly with the
  * corpus, never super-linearly on a single global sort.
  *
  * Usage: runMain graft.CurationProbe [nDocs] [mult]
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val mult = if (args.length > 1) args(1).toInt else 8

    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic docs: 10-60 pseudo-words drawn from a
    // 1000-word vocabulary, 16 domains — fully distributed generation
    def docs(k: Long) = spark.range(k).toDF("doc_id").select(
      col("doc_id"),
      expr("concat_ws(' ', transform(sequence(0, cast(pmod(doc_id, 51) as int) + 9), " +
        "i -> conv(pmod(doc_id * 31 + i * 7, 1000), 10, 36)))").as("text"),
      concat(lit("src"), pmod(col("doc_id"), lit(16L))).as("source"))

    // `work` is the op's own output volume (kept rows / tokens / words
    // processed) — it must scale with the corpus, proving the timed run
    // wasn't a pruned plan
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val work = body
      println(f"""{"probe":"$label","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"work":$work}""")
    }

    Seq(("1x", n), (s"${mult}x", n * mult)).foreach { case (tag, k) =>
      val d = docs(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count() // materialize so timed regions measure the operator
      val weights = (0 until 16).map(i => s"src$i" -> (i % 4) * 0.25).toMap
      time(s"sample_$tag") {
        graft.ops.Curation.sampleByWeights(d, "doc_id", "source", weights).count()
      }
      time(s"pack_$tag") {
        // collect()ing the agg forces the full window evaluation (a
        // count() would let Catalyst prune the aggregate away; an agg
        // without max(start_tok) would prune the Window itself). The
        // reported number is sum(tokens) — REAL evidence the run
        // processed the whole corpus, not a pruned plan: it must be
        // ~8x larger at 8x.
        graft.ops.Curation.packSequences(d, "doc_id",
            size(split(col("text"), " ")), budget = 2048, nShards = 256)
          .agg(max("start_tok"), sum("tokens").as("t")).collect().head.getLong(1)
      }
      time(s"repetition_$tag") {
        // sum(top_cnt) forces the run-length aggregate; sum(n_words)
        // is the scale evidence (8x at 8x)
        graft.text.TextAnalysis.repetitionStats(d, "doc_id", "text")
          .agg(sum("top_cnt"), sum("n_words")).collect().head.getLong(1)
      }
      time(s"passage_repeats_$tag") {
        // explode-heavy: ~n_tokens/stride passage rows per doc into one
        // groupBy(passage). The synthetic generator repeats word
        // sequences with period lcm(1000, 51), so boilerplate exists at
        // every scale; work = total repeated-passage occurrences
        graft.dedup.Dedup.passageRepeats(d, "doc_id", "text",
            window = 16, stride = 16, approxDocs = true)
          .agg(coalesce(sum("n_docs"), lit(0L))).collect().head.getLong(0)
      }
      // the bigram-count artifact is PERSISTED in production
      // (bigramCountsFor / an ingest table): measure its build and the
      // novelty serving separately — passing the lazy plan would
      // recompute the full 280M-bigram groupBy three times inside the
      // serving measurement (total scalar, rare slice, and nothing of
      // the sort happens in production)
      val bgCounts = graft.text.TextAnalysis.bigramCounts(d, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"bigram_counts_build_$tag") { bgCounts.count() }
      time(s"bigram_novelty_$tag") {
        // rare-tail equi-join against the persisted counts; work = docs
        // scored (the join must not drop rows). The generator's 1000
        // bigrams all occur >= ~35k times, so at the production
        // threshold NOTHING is rare and the join would be vacuous —
        // invFreq = 1 makes every bigram "rare", i.e. the FULL
        // 280M-row join volume, the worst case the operator can see.
        // sum(n_rare) FORCES the join and the explode — a count() lets
        // Catalyst eliminate the left outer join (unique keys preserve
        // cardinality) and the probe would time a pruned plan; work =
        // total rare hits, which must 8x at 8x
        graft.text.TextAnalysis.bigramNovelty(d, "doc_id", "text", bgCounts,
            invFreq = 1L)
          .agg(org.apache.spark.sql.functions.sum("n_rare"))
          .collect().head.getLong(0)
      }
      bgCounts.unpersist()
      time(s"shuffle_shards_$tag") {
        // the rank window runs per shard (nShards bounds every sort
        // partition at k/nShards); max(pos)+count forces the window —
        // work = rows addressed, must 8x at 8x
        graft.ops.Curation.shuffleShards(d.select("doc_id"), "doc_id",
            nShards = 256)
          .agg(max("pos"), count(lit(1)).as("n")).collect().head.getLong(1)
      }
      time(s"length_batches_$tag") {
        // per-(bucket, shard) rank windows — the sub-shard key exists
        // so a hot length band cannot single-task-sort; work = docs
        // batched (sum over batches must equal the corpus)
        graft.ops.Curation.lengthBatches(d, "doc_id", "text",
            batchSize = 1024, bandTokens = 8, nShards = 256)
          .agg(max("batch_id"), count(lit(1)).as("n")).collect().head.getLong(1)
      }
      time(s"pii_scrub_$tag") {
        // pure regexp projection; work = docs with any redaction (the
        // generator has no PII, so plant it like the oracle entry does)
        val planted = d.select(col("doc_id"),
          concat(col("text"), when(pmod(col("doc_id"), lit(3L)) === 0,
            concat(lit(" u"), col("doc_id").cast("string"), lit("@x.org")))
            .otherwise(lit(""))).as("text"))
        graft.text.TextAnalysis.scrubPii(planted, "doc_id", "text")
          .where(col("n_emails") > 0).count()
      }
      time(s"vocab_drift_$tag") {
        // two token groupBys + a token-key full-outer join (never
        // doc-pairwise); the halves are id-disjoint so both sides scan
        // k/2 docs; work = tokens compared
        val a = d.where(pmod(col("doc_id"), lit(2L)) === 0)
        val b = d.where(pmod(col("doc_id"), lit(2L)) === 1)
        graft.ops.Curation.vocabDrift(a, b, "text")
          .agg(sum("c_a") + sum("c_b")).collect().head.getLong(0)
      }
      time(s"cross_corpus_exact_$tag") {
        // bloom gate at the 4M item CLAMP (bloomExpectedItems = 8M >
        // the BloomFilterAggregate cap): reference carries k distinct
        // fingerprints, half the corpus overlaps it — survivors must be
        // exactly the novel half on the clamped path too
        val ref = spark.range(k).select(concat(lit("ref "), col("id")).as("text"))
        val corpus = spark.range(k).toDF("doc_id").select(col("doc_id"),
          when(pmod(col("doc_id"), lit(2L)) === 0,
              concat(lit("ref "), expr("doc_id div 2")))
            .otherwise(concat(lit("novel "), col("doc_id"))).as("text"))
        graft.dedup.Dedup.crossCorpusExact(corpus, "text", ref, "text",
          bloomExpectedItems = Some(8000000L)).count()
      }
      time(s"winnow_postings_$tag") {
        // the sketch is a pure projection + ONE distinct on the
        // (doc, fingerprint) key; work = distinct selections, which
        // must track tokens linearly (density <= 2/(w+1) of grams)
        graft.text.TextAnalysis.winnowPostings(d, "doc_id", "text").count()
      }
      time(s"winnow_matches_$tag") {
        // pair-bounded generator: docs 2i and 2i+1 share ONE 8-token
        // passage, noise is doc-unique — every passage fingerprint has
        // df = 2, so true pairs = k/2 and the probe measures the JOIN
        // at linear pair volume (the df-quadratic blowup of
        // mass-duplicated content is exactly what maxDf exists to cap,
        // measured separately by the generator's own duplicates in the
        // postings row above). work = pairs found, must ~8x at 8x
        val wd = spark.range(k).toDF("doc_id").select(col("doc_id"),
          expr("concat_ws(' ', " +
            "transform(sequence(0, 9), i -> concat('n', cast(doc_id as string), 'x', cast(i as string))), " +
            "transform(sequence(0, 7), i -> concat('p', cast(doc_id div 2 as string), 'q', cast(i as string))))")
            .as("text"))
        graft.text.TextAnalysis.winnowMatches(wd, "doc_id", "text",
          minShared = 1).count()
      }
      d.unpersist()
    }

    // ---- bigram-LM train + held-out score (row 86) ------------------
    // train = two map-side-combinable aggs over exploded (v, w) pairs;
    // score = token-key joins against the count slivers + one
    // groupBy(id). Both must track corpus tokens linearly; the forced
    // agg sums scored tokens (must ~8x at 8x).
    Seq(("1x", n), (s"${mult}x", n * mult)).foreach { case (tag, k) =>
      val d = docs(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      val model = graft.text.NgramLm.train(
        d.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      time(s"lm_train_$tag") {
        // materializing the bigram table is the train cost (contexts/
        // unigrams/totals derive from the same pass shape)
        model.bigrams.agg(sum("c_vw")).collect().head.getLong(0)
      }
      time(s"lm_score_$tag") {
        graft.text.NgramLm.score(
            d.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", model)
          .agg(min("nll"), sum("n_tokens").as("t")).collect().head.getLong(1)
      }
      // the order-3 chain: one wider count table, two more joins
      val model3 = graft.text.NgramLm.train3(
        d.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      time(s"lm3_train_$tag") {
        model3.trigrams.agg(sum("c_uvw")).collect().head.getLong(0)
      }
      time(s"lm3_score_$tag") {
        graft.text.NgramLm.score3(
            d.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", model3)
          .agg(min("nll"), sum("n_tokens").as("t")).collect().head.getLong(1)
      }
      // ---- DSIR fit + weights + Gumbel top-k (row 89) --------------
      // fit = two gram explodes collapsing onto <= 4096 bucket keys
      // (kilobyte shuffle at any corpus size); weights = one broadcast
      // join over the candidate gram stream + groupBy(id); select adds
      // only a TakeOrderedAndProject. All linear in candidate tokens —
      // the forced agg sums features scored (must ~8x at 8x).
      val dsirModel = graft.ops.Dsir.fit(
        d.where(col("source") === "src0"), d, "doc_id", "text")
      val ratios = dsirModel.ratios
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cached = dsirModel.copy(ratios = ratios)
      time(s"dsir_fit_$tag") { ratios.agg(sum("lr6")).collect(); ratios.count() }
      time(s"dsir_weights_$tag") {
        graft.ops.Dsir.weights(
            d.where(col("source") =!= "src0"), "doc_id", "text", cached)
          .agg(min("logw"), sum("n_feats").as("f")).collect().head.getLong(1)
      }
      time(s"dsir_select_$tag") {
        graft.ops.Dsir.select(
          d.where(col("source") =!= "src0"), "doc_id", "text", cached,
          k = 10000).count()
      }
      ratios.unpersist()
      d.unpersist()
    }

    // ---- SKEWED length distribution: 80% of docs in ONE band --------
    // The uniform generator above spreads lengths across ~7 bands; real
    // corpora concentrate in a few. 80% of these docs are exactly 24
    // tokens (one band), the rest spread as before — the case the
    // (bucket, shard) sub-shard key exists for. nShards = 1 IS the
    // anti-pattern (the hot band funnels through one sort task); the
    // sweep shows where the bound stops paying, justifying the default.
    def skewDocs(k: Long) = spark.range(k).toDF("doc_id").select(
      col("doc_id"),
      expr("concat_ws(' ', transform(sequence(0, " +
        "case when pmod(doc_id, 10) < 8 then 23 " +
        "else cast(pmod(doc_id, 51) as int) + 9 end), " +
        "i -> conv(pmod(doc_id * 31 + i * 7, 1000), 10, 36)))").as("text"))
    Seq(("1x", n), (s"${mult}x", n * mult)).foreach { case (tag, k) =>
      val d = skewDocs(k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.count()
      for (ns <- Seq(1, 16, 64, 256))
        time(s"length_batches_skew_${tag}_ns$ns") {
          graft.ops.Curation.lengthBatches(d, "doc_id", "text",
              batchSize = 1024, bandTokens = 8, nShards = ns)
            .agg(max("batch_id"), count(lit(1)).as("n")).collect().head.getLong(1)
        }
      d.unpersist()
    }

    // ---- shuffleShards nShards sweep (8x size) ----------------------
    // shard is a salted id hash, so skew cannot concentrate it; the
    // sweep justifies the default shard count by measurement — the
    // knee is where per-shard sorts stop dominating
    val d8 = docs(n * mult).select("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d8.count()
    for (ns <- Seq(16, 64, 256, 1024))
      time(s"shuffle_shards_8x_ns$ns") {
        graft.ops.Curation.shuffleShards(d8, "doc_id", nShards = ns)
          .agg(max("pos"), count(lit(1)).as("n")).collect().head.getLong(1)
      }
    d8.unpersist()
    spark.stop()
  }
}
