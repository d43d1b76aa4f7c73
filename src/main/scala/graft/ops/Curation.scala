package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the LLM-training-data pipeline:
  * deterministic dataset splits and per-group quality selection.
  *
  * Both are designed around the 100 TB rule that the CORPUS must not
  * shuffle: the split is a pure projection, and the quantile filter
  * reduces the corpus to a (group, score) value-histogram first —
  * thresholds are derived on the tiny histogram and broadcast back, so
  * the only full-width pass over the data is the final filter scan.
  */
object Curation {

  /** The split-bucket expression: first 8 md5 hex chars of the id ->
    * 32 bits -> mod `buckets`. An EXPRESSION, not a table — any frame
    * carrying the id can compute its split membership in place, with
    * no join against a corpus-sized assignment map. Cheap to mirror
    * bit-for-bit in any engine with md5(). 32 bits keeps the modulo
    * bias ≤ buckets/2^32 (a 16-bit hash mod 10000 would over-sample
    * buckets below 65536 mod 10000 = 5536 by a material ~7% relative —
    * the bias an A/B split must not have). */
  private def bucketOf(id: org.apache.spark.sql.Column, buckets: Int) =
    saltedBucket(id, "", buckets)

  /** Deterministic train/eval split: bucket = md5(id) mod `buckets`,
    * split = "train" below `trainPct` buckets, else "eval".
    *
    * Content-addressed (a cryptographic hash of the PRIMARY KEY, not a
    * RNG): the assignment is reproducible across runs, engines, and
    * re-shards — the property a training pipeline needs so that eval
    * documents can never leak into train between pipeline versions.
    * Pure projection: no shuffle, no state; at 100 TB this runs at
    * parquet-scan speed and composes with any downstream filter. */
  def hashSplit(docs: DataFrame, idCol: String,
                trainPct: Int = 90, buckets: Int = 100): DataFrame = {
    require(trainPct >= 0 && trainPct <= buckets, "trainPct must be within buckets")
    docs.withColumn("bucket", bucketOf(col(idCol), buckets))
      .withColumn("split", when(col("bucket") < trainPct, "train").otherwise("eval"))
  }

  /** Train/eval contamination detection: for every eval-split document,
    * how much of it already appears in the train split — the standard
    * n-gram-overlap check a training pipeline runs before trusting its
    * held-out metrics.
    *
    * Returns (doc_id, n_grams, n_shared, share) for eval docs sharing
    * at least one word n-gram with ANY train document, where share =
    * n_shared / n_grams (unrounded: both sides of an oracle compute the
    * identical int/int division).
    *
    * Scale shape: split membership is the [[bucketOf]] EXPRESSION
    * evaluated on each gram row's doc_id — no join against a
    * corpus-sized assignment table. The train side then collapses to
    * DISTINCT grams, so each eval gram matches AT MOST ONE train row —
    * the join is a containment probe (semi-join semantics with a
    * countable match), never a posting-fanout pair join; a boilerplate
    * gram shared by a million train docs still contributes one row.
    * Cost is two gram scans + one equi-join on gram — each side
    * shuffled once by gram, no step quadratic in anything. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, trainPct: Int = 90,
                    buckets: Int = 100): DataFrame =
    contaminationFromGrams(
      graft.dedup.Dedup.ngrams(docs, idCol, textCol, n), trainPct, buckets)

  /** [[contamination]] over a precomputed (doc_id, g) gram/posting
    * frame — the ingest-artifact path: the probe's three consumers
    * (eval grams, train distinct grams, eval sizes) each column-prune
    * a stored posting table instead of re-tokenizing the corpus three
    * times. */
  def contaminationFromGrams(grams: DataFrame, trainPct: Int = 90,
                             buckets: Int = 100): DataFrame = {
    // no Par.floor: the frame feeds THREE consumers whose differing
    // column pruning defeats exchange reuse — each would pay its own
    // posting-table shuffle (measured slower than the single-task scan)
    val g = grams.withColumn("__b", bucketOf(col("doc_id"), buckets))
    val evalG = g.where(col("__b") >= trainPct).select("doc_id", "g")
    val trainG = g.where(col("__b") < trainPct).select("g").distinct()
    val sizes = evalG.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    evalG.join(trainG, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .join(sizes, "doc_id")
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        (col("n_shared") / col("n_grams")).as("share"))
      .orderBy("doc_id")
  }

  /** Train-side decontamination — the APPLY step that [[contamination]]
    * reports feed: keep the train-split documents whose n-gram overlap
    * with the eval split stays BELOW `maxShare` (a training set is
    * decontaminated against its benchmark by dropping the train docs
    * that contain the benchmark, not by touching the benchmark).
    *
    * Returns (doc_id, n_grams, n_shared, share) for every surviving
    * train doc that has at least one n-gram (share = n_shared/n_grams,
    * unrounded — both engines compute the identical long/long → double
    * division). Docs too short to produce a gram have no containment
    * measure and are not reported; [[decontaminate]] passes them
    * through.
    *
    * Scale shape (the mirror image of [[contaminationFromGrams]], with
    * the asymmetry exploited the other way): the EVAL side is the
    * benchmark — small by construction — so its distinct grams
    * BROADCAST, and the 100-TB train side never shuffles for the
    * probe join; it pays only the per-doc gram counts, both of which
    * partial-aggregate map-side over doc-clustered postings. Nothing
    * is quadratic, nothing corpus-sized crosses the network. */
  def decontaminateFromGrams(grams: DataFrame, trainPct: Int = 90,
                             buckets: Int = 100,
                             maxShare: Double = 0.8): DataFrame = {
    // no Par.floor — the contaminationFromGrams multi-consumer rationale
    val g = grams.withColumn("__b", bucketOf(col("doc_id"), buckets))
    val trainG = g.where(col("__b") < trainPct).select("doc_id", "g")
    val evalG = g.where(col("__b") >= trainPct).select("g").distinct()
    val sizes = trainG.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val shared = trainG.join(broadcast(evalG), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    sizes.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("share", col("n_shared") / col("n_grams"))
      .where(col("share") < maxShare)
      .orderBy("doc_id")
  }

  /** [[decontaminateFromGrams]] applied to the documents themselves:
    * the surviving train-split rows of `docs` (gramless train docs
    * pass through — with no grams they cannot contain the benchmark). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, trainPct: Int = 90, buckets: Int = 100,
                    maxShare: Double = 0.8): DataFrame = {
    val grams = graft.dedup.Dedup.ngrams(docs, idCol, textCol, n)
    val g = grams.withColumn("__b", bucketOf(col("doc_id"), buckets))
    val trainG = g.where(col("__b") < trainPct).select("doc_id", "g")
    val evalG = g.where(col("__b") >= trainPct).select("g").distinct()
    val sizes = trainG.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val contaminated = trainG.join(broadcast(evalG), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .join(sizes, "doc_id")
      .where(col("n_shared") / col("n_grams") >= maxShare)
      .select(col("doc_id").as("__dc_id"))
    docs
      .where(bucketOf(col(idCol), buckets) < trainPct)
      .join(broadcast(contaminated), col(idCol) === col("__dc_id"), "left_anti")
  }

  /** Keep each group's top quality quantile: docs whose percent_rank of
    * `scoreCol` within `groupCol` (ascending; SQL percent_rank
    * semantics, ties share a rank) is at least `q`.
    *
    * Scale shape: the corpus itself never shuffles or sorts. Pass 1
    * collapses it to a (group, score) value-count histogram — near-dup
    * scores collide heavily for ratio-of-small-int score formulas — and
    * ranks live on the histogram: cntBelow(v) = Σ counts of smaller
    * values, computed with a cumulative window over the (small) distinct
    * value table. Pass 2 broadcasts the per-group keep-thresholds (one
    * row per group) and filters the corpus in place. A window
    * partitioned by group over the raw docs would instead sort whole
    * groups on single partitions — the non-scalable plan this avoids.
    * (If distinct scores ever approached corpus size, pass 1 coarsens
    * to an equi-width histogram + an exact in-bucket second pass; not
    * needed for bounded-ratio scores.)
    *
    * NULL scores are excluded from both the ranking and the output: a
    * doc with no score has no quantile position. (Leaving them in would
    * also diverge from the SQL oracle — Spark windows order NULLS
    * FIRST, DuckDB percent_rank NULLS LAST — so the exclusion is pinned
    * here rather than left to engine defaults.) */
  def topQuantileByGroup(docs: DataFrame, groupCol: String, scoreCol: String,
                         q: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = docs.where(col(scoreCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__cnt"))
    // per-value rank-1 (= docs with strictly smaller score) and group
    // size, on the histogram: the window input is distinct values only
    val w = Window.partitionBy(groupCol).orderBy(scoreCol)
    val ranked = hist
      .withColumn("__below", coalesce(sum(col("__cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__cnt")).over(
        Window.partitionBy(groupCol)))
    // SQL percent_rank = (rank-1)/(n-1), 0.0 for single-row groups;
    // the smallest value with pr >= q is the group's keep-threshold
    val pr = when(col("__n") === 1, lit(0.0))
      .otherwise(col("__below").cast("double") / (col("__n") - 1).cast("double"))
    val thresholds = ranked.select(col(groupCol), col(scoreCol), pr.as("__pr"))
      .where(col("__pr") >= q)
      .groupBy(groupCol).agg(min(col(scoreCol)).as("__thr"))
      .withColumnRenamed(groupCol, "__grp")
    // null-safe join: SQL percent_rank treats a NULL group key as its
    // own partition (PARTITION BY matches nulls together) — a plain
    // equi-join would silently drop every null-keyed doc instead of
    // curating them as a group
    docs.join(broadcast(thresholds), col(groupCol) <=> col("__grp"), "inner")
      .where(col(scoreCol) >= col("__thr"))
      .drop("__grp", "__thr")
  }

  /** Sketch-based variant of [[topQuantileByGroup]] for score columns
    * whose DISTINCT-value count approaches the corpus size (continuous
    * model scores, where the exact value-histogram would itself be
    * corpus-sized): per-group thresholds come from percentile_approx
    * (a bounded-memory KLL-style sketch, mergeable map-side), so pass 1
    * is one aggregation with O(accuracy) state per group regardless of
    * corpus size, and pass 2 is the same broadcast-threshold filter
    * scan. Keeps docs with score >= the approximate q-quantile; rank
    * error is bounded by 1/accuracy of the group size.
    *
    * NOT a drop-in for [[topQuantileByGroup]] on TIE-HEAVY scores: this
    * keeps every row AT the threshold value, while exact percent_rank
    * semantics can drop whole tied runs (an all-tied group keeps 100%
    * here, 0% there). For continuous scores — the case this variant
    * exists for — the boundary mass is negligible and the two agree to
    * within the rank-error bound. */
  def topQuantileByGroupApprox(docs: DataFrame, groupCol: String,
                               scoreCol: String, q: Double = 0.75,
                               accuracy: Int = 10000): DataFrame = {
    val thr = docs.groupBy(groupCol)
      .agg(percentile_approx(col(scoreCol), lit(q), lit(accuracy)).as("__thr"))
      .withColumnRenamed(groupCol, "__grp")
    docs.join(broadcast(thr), col(groupCol) <=> col("__grp"), "inner")
      .where(col(scoreCol) >= col("__thr"))
      .drop("__grp", "__thr")
  }

  /** Per-domain document-length quantile report — the distribution
    * profile [[corpusStats]]'s single mean cannot show (a curation
    * pipeline tunes its Gopher word floors, packing ctx sizes and
    * length-bucket bands off p50/p90/p99, not off a mean a few long
    * docs dominate). Quantiles are EXACT by the integer rank rule
    * pX = smallest length whose cumulative doc count · 100 ≥ X · N —
    * pure integer cross-multiplication (no float percentile
    * interpolation for two engines to disagree on; `quantile_disc`
    * semantics, deterministic everywhere).
    *
    * 100 TB shape: one groupBy collapses the corpus to (domain, len)
    * rows; the cumulative window runs over that GROUPED sliver — the
    * row-90 argument: partitions are bounded by the length VALUE
    * SPACE, not the corpus — and one final groupBy(domain) reduces to
    * a row per domain. Text never shuffles; only (domain, len, count)
    * moves. */
  /** Per-domain TOKEN-BUDGET truncation — the final sizing step of a
    * data-mixing recipe: a mixture spec ends in "take B tokens of each
    * domain", not a doc-count or a rate ([[temperatureSample]] rescales
    * RATES; this op cuts an absolute token budget). Docs are taken in
    * content-addressed order (salted md5 of the PRIMARY KEY — the
    * detSplit reproducibility contract: same budget, same corpus ⇒ the
    * same kept set on any engine or shard layout, and a grown corpus
    * only appends candidates after the already-ordered prefix) and a
    * doc is kept while the domain's running token total stays within
    * `budget` (inclusive-prefix rule: cum_tokens counts the doc
    * itself).
    *
    * Token convention: ws_tokens ([[graft.text.TextAnalysis.tokenCount]]
    * — size of the single-space split), NULL text folds to '' (1
    * token, the totality contract). Returns every doc with its verdict
    * — (doc_id, domain, n_tokens, cum_tokens, keep) — so the report
    * doubles as an audit of what the budget cut.
    *
    * Scale shape — TWO-PHASE prefix sum (the q_pack device): domains
    * are FEW (dozens) and a window partitioned by domain alone would
    * put a 100-TB domain's billions of doc rows into ONE window
    * partition = one task's sort (the round-9 `weak` finding). The
    * order key `__ord` is a uniform 32-bit hash, so its TOP BITS shard
    * the sort order into `shards` contiguous ranges: phase 1 windows
    * over (domain, shard) — each partition is ~1/shards of a domain —
    * and phase 2 adds each shard's broadcast offset (the running total
    * of strictly-preceding shards, a domains×shards sliver). The
    * verdict depends only on the prefix SUM, which is associative, so
    * the two-phase form is byte-equal to the single-window form
    * (pinned in Round10Spec) and the oracle is unchanged. */
  def tokenBudget(docs: DataFrame, idCol: String, textCol: String,
                  domainCol: String, budget: Long,
                  salt: String = "budget", shards: Int = 64): DataFrame = {
    require(shards >= 1 && (shards & (shards - 1)) == 0,
      "shards must be a power of two (top bits of the 32-bit order hash)")
    import org.apache.spark.sql.expressions.Window
    val shardBits = 31 - Integer.numberOfLeadingZeros(shards)
    val base = docs.select(col(idCol).as("doc_id"), col(domainCol).as("domain"),
      size(split(coalesce(col(textCol), lit("")), " ")).as("n_tokens"),
      saltedHash32(col(idCol), salt).as("__ord"))
      // shard = top log2(shards) bits of __ord: monotone in __ord, so
      // shard ranges are contiguous runs of the (__ord, doc_id) order
      // and equal __ord values (ties) always share a shard
      .withColumn("__shard", shiftright(col("__ord"), 32 - shardBits).cast("int"))
    // phase 1: partial prefix sums inside each (domain, shard) run
    val w = Window.partitionBy("domain", "__shard")
      .orderBy(col("__ord"), col("doc_id"))
    val partial = base.select(col("doc_id"), col("domain"), col("n_tokens"),
      col("__shard"), sum(col("n_tokens").cast("long")).over(w).as("__part"))
    // phase 2: each shard's offset = sum of preceding shards' totals —
    // a domains×shards sliver (the only whole-domain window left runs
    // over THAT, shards rows per domain, never doc rows)
    val wOff = Window.partitionBy("domain").orderBy("__shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("domain", "__shard")
      .agg(sum(col("n_tokens").cast("long")).as("__tot"))
      .select(col("domain"), col("__shard"),
        coalesce(sum("__tot").over(wOff), lit(0L)).as("__off"))
    partial.join(broadcast(offsets), Seq("domain", "__shard"))
      .select(col("doc_id"), col("domain"), col("n_tokens"),
        (col("__part") + col("__off")).as("cum_tokens"))
      .withColumn("keep", col("cum_tokens") <= budget)
      .orderBy("doc_id")
  }

  def lengthQuantiles(docs: DataFrame, textCol: String, domainCol: String,
                      ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    import org.apache.spark.sql.expressions.Window
    // null-text docs are excluded on BOTH sides (a length report cannot
    // measure text that isn't there; Spark's NULLS-FIRST cumulative
    // window vs DuckDB's NULLS-LAST would otherwise shift every
    // quantile) — the corpusStats null-guard convention
    val grp = docs
      .where(col(textCol).isNotNull)
      .groupBy(col(domainCol).as("domain"),
        size(split(col(textCol), " ")).as("len"))
      .agg(count(lit(1)).as("__c"))
    val byLen = Window.partitionBy("domain").orderBy("len")
    val cum = grp.select(col("domain"), col("len"), col("__c"),
      sum("__c").over(byLen).as("__cum"),
      sum("__c").over(Window.partitionBy("domain")).as("__n"))
    val qCols = ps.map(p =>
      min(when(col("__cum") * 100 >= col("__n") * p, col("len"))).as(s"p$p"))
    val aggs: Seq[org.apache.spark.sql.Column] =
      max(col("__n")).as("n_docs") +: qCols :+
        min("len").as("min_len") :+ max("len").as("max_len") :+
        sum(col("len").cast("long") * col("__c")).as("total_tokens")
    cum.groupBy("domain").agg(aggs.head, aggs.tail: _*)
  }

  /** The raw 32-bit salted hash every bucket/draw decision derives
    * from: first 8 md5 hex digits of (value || salt) as a long in
    * [0, 2³²) — THE one definition of the engine-portable hash width
    * (shared with [[graft.ops.Dsir]]'s feature buckets and Gumbel
    * uniforms; a DuckDB oracle writes it as
    * `('0x' || substr(md5(x || salt), 1, 8))::BIGINT`). */
  private[ops] def saltedHash32(value: org.apache.spark.sql.Column,
                                salt: String): org.apache.spark.sql.Column =
    conv(substring(md5(concat(value.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  /** [[bucketOf]] with a salt folded into the hash input: independent
    * hash-derived decisions made from the SAME primary key (train/eval
    * split, sampling, pack sharding) must not correlate — md5(id) mod k
    * and md5(id) mod k' share low-order structure, md5(id||salt) does
    * not. The empty salt is the identity (md5(id||"") = md5(id)), so
    * [[bucketOf]] delegates here — ONE definition of the hash width. */
  private def saltedBucket(id: org.apache.spark.sql.Column, salt: String,
                           buckets: Int) =
    pmod(saltedHash32(id, salt), lit(buckets.toLong)).cast("int")

  /** Deterministic weighted domain sampling — the data-mixing step of a
    * training pipeline: keep each document of domain d with rate
    * `weights(d)` (fraction in [0,1]; `defaultWeight` for unlisted
    * domains).
    *
    * Content-addressed, not random: a doc survives iff its salted hash
    * bucket falls below rate×`buckets`, so the kept set is reproducible
    * across runs/engines/re-shards, is a strict SUBSET relation as a
    * rate grows (raising src from 0.25 to 0.5 keeps every previously
    * kept doc — stable ablations), and never correlates with the
    * [[hashSplit]] assignment (different salt). Pure projection over a
    * broadcast-free when-chain: no shuffle, no RNG state, runs at
    * parquet-scan speed at 100 TB. Rates quantize to 1/`buckets`.
    * A NULL domain never equals any listed domain, so null-domain docs
    * sample at `defaultWeight`; a NULL id has no content to address
    * and coalesces to bucket 0 — kept at any nonzero rate, dropped at
    * rate 0 (the rate-1-keeps-all / rate-0-drops-all contract stays
    * total). */
  def sampleByWeights(docs: DataFrame, idCol: String, domainCol: String,
                      weights: Map[String, Double], defaultWeight: Double = 1.0,
                      buckets: Int = 10000): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(w => w >= 0.0 && w <= 1.0),
      "sampling weights must be fractions in [0, 1]")
    val thresh = weights.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultWeight * buckets).toInt)) { case (acc, (d, w)) =>
        when(col(domainCol) === d, lit(math.round(w * buckets).toInt)).otherwise(acc)
      }
    docs.where(coalesce(saltedBucket(col(idCol), ":mix", buckets), lit(0)) < thresh)
  }

  /** Temperature-based domain rebalancing at T = 2 — the multilingual-
    * pretraining mixing rule (sample domain d proportionally to
    * c_d^(1/T) instead of its raw count c_d, so head domains flatten
    * toward the tail without ever upsampling): per-doc keep rate
    * rate_d = sqrt(c_min / c_d), i.e. the smallest domain keeps
    * everything and a domain k× larger keeps sqrt(1/k) of its docs.
    *
    * T is FIXED at 2 deliberately: sqrt is correctly rounded in IEEE
    * 754 on every engine, so the derived per-domain thresholds —
    * floor(sqrt(c_min/c_d) · buckets), exact integer compares against
    * the same salted-hash bucket as [[sampleByWeights]] — reproduce
    * bit-identically cross-engine (DuckDB-oracled). A general pow(x,
    * 1/T) is NOT correctly rounded and would put boundary docs at the
    * mercy of each engine's libm; arbitrary fixed rates already exist
    * via [[sampleByWeights]].
    *
    * Domain counts are one tiny agg collected to the driver (bounded
    * by the number of domains, same contract as the centroid
    * collects); the sample itself is a pure filter projection — the
    * corpus never shuffles. */
  def temperatureSample(docs: DataFrame, idCol: String, domainCol: String,
                        buckets: Int = 10000, maxDomains: Int = 1000): DataFrame = {
    val counts = docs.groupBy(col(domainCol).cast("string").as("__d"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._1 != null) // null-domain docs keep threshold 0 (dropped)
    require(counts.nonEmpty, "cannot temperature-sample an empty corpus")
    // the per-domain thresholds become one when-chain expression, so
    // domain cardinality bounds BOTH the driver collect and the plan
    // size — a high-cardinality column (URL host, author id) needs a
    // coarser domain key, not a million-branch CASE
    require(counts.length <= maxDomains,
      s"domain column '$domainCol' has ${counts.length} distinct values " +
        s"(max $maxDomains): temperature-sample over a coarser domain key")
    val cMin = counts.map(_._2).min
    val thresh = counts.sortBy(_._1).foldLeft(lit(0)) { case (acc, (d, c)) =>
      when(col(domainCol).cast("string") === d,
        lit(math.floor(math.sqrt(cMin.toDouble / c.toDouble) * buckets).toInt))
        .otherwise(acc)
    }
    docs.where(coalesce(saltedBucket(col(idCol), ":temp", buckets), lit(0)) < thresh)
  }

  /** Deterministic sequence packing — the materialization step that
    * turns a curated corpus into fixed-token-budget training rows:
    * documents are concatenated in a canonical order and sliced into
    * `budget`-token packs (concat-and-chunk; a doc whose tokens
    * straddle a boundary starts in one pack and overflows into the
    * next, exactly like a pretraining context window).
    *
    * Returns (id, shard, tokens, start_tok, pack, pack_off): the doc's
    * shard, its global token offset within the shard stream, the pack
    * (= training row) its first token lands in, and the offset inside
    * that pack.
    *
    * Scale shape: a single GLOBAL ordering would funnel 100 TB through
    * one sorted partition, so the canonical order is (salted hash shard,
    * id) — the corpus shuffles ONCE on shard, each shard's running
    * offset is an independent window, and `nShards` directly bounds
    * per-partition sort size (pick shards of a few GB at the target
    * scale). Assignment is content-addressed end-to-end: re-running the
    * pipeline, on any engine, yields byte-identical pack layouts.
    * `idCol` must be the collection's primary key (unique, non-null) —
    * the canonical order is undefined between duplicate or null ids. */
  def packSequences(docs: DataFrame, idCol: String,
                    tokensCol: org.apache.spark.sql.Column,
                    budget: Int, nShards: Int = 64,
                    keep: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "token budget must be positive")
    require(nShards > 0, "need at least one shard")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // clamp tokens at 0: size(NULL) is -1 under Spark's default config,
    // and ONE negative count would silently shift every later doc's
    // offset in its shard — corrupting pack alignment with no error
    docs.select(col(idCol) +: saltedBucket(col(idCol), ":pack", nShards).as("shard") +:
        greatest(coalesce(tokensCol.cast("long"), lit(0L)), lit(0L)).as("tokens") +:
        keep.map(col): _*)
      .withColumn("start_tok", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("pack", expr(s"start_tok div ${budget.toLong}").cast("long"))
      .withColumn("pack_off", pmod(col("start_tok"), lit(budget.toLong)))
  }

  /** Materialize a packed training set: [[packSequences]] with the
    * document payload carried through (`keep`), written
    * shard-partitioned and sorted by id within each shard's files, so
    * a training loader streams any shard directory and reads its packs
    * in exact pack order with zero runtime sorting or joining.
    *
    * One corpus pass: the payload rides through the pack window (no
    * second scan or join-back), the shard shuffle doubles as the write
    * partitioning, and the within-partition sort is the same per-shard
    * order the window already established. `nShards` is both the
    * parallelism and the file-layout granularity. */
  def writePacked(docs: DataFrame, idCol: String, textCol: String,
                  outPath: String, budget: Int = 2048,
                  nShards: Int = 64): Unit =
    // no repartition here: the pack window's own Exchange already hash-
    // partitions by shard (each shard wholly inside one partition, so
    // each shard DIR gets one file), and an explicit repartition would
    // re-shuffle the corpus + payload a second time. The sort is the
    // window's (shard, id) order re-stated for the writer; Spark elides
    // it when already satisfied.
    packSequences(docs, idCol, size(split(coalesce(col(textCol), lit("")), " ")),
        budget, nShards, keep = Seq(textCol))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(outPath)

  /** The complete batch training-set build — every curation stage
    * composed end-to-end, each reusing its standalone operator:
    *
    *   1. quality-score and threshold ([[graft.text.TextAnalysis.quality]])
    *   2. deterministic domain mix ([[sampleByWeights]])
    *   3. exact content dedup: one survivor per md5(text), lowest id
    *      wins (content identity, not row identity — re-crawled copies
    *      under new ids collapse)
    *   4. train split ([[hashSplit]]; eval docs never reach packing)
    *   5. sequence packing into `budget`-token training rows
    *      ([[packSequences]])
    *
    * Returns the packed layout (id, shard, tokens, start_tok, pack,
    * pack_off) of the surviving train docs. Fully content-addressed:
    * every stage is reproducible across runs, engines, and re-shards,
    * so the SAME corpus + params always yields byte-identical training
    * rows — the provenance property a model-training audit needs.
    *
    * Scale shape: stages 1, 2, 4 are projections/filters fused into the
    * scan; stage 3 is ONE shuffle of the surviving rows by content hash
    * (the only pass that moves the payload — size the dedup stage for
    * it); stage 5 is the single shard shuffle. No stage holds the
    * corpus in memory or sorts it globally. */
  /** THE content-identity dedup, shared by the batch pipeline and the
    * streaming front door so both always agree on what a duplicate is:
    * key = md5(text) — 128 bits, birthday collisions negligible at any
    * corpus size (never the ~30-bit rolling-hash fingerprint METRIC,
    * which silently merges distinct docs from ~37k distinct texts up).
    * One shuffle: the window formulation dedups in a single pass where
    * a groupBy + semi-join would re-evaluate the upstream on both
    * sides. Lowest id wins deterministically. */
  private def dedupByContent(docs: DataFrame, idCol: String,
                             textCol: String,
                             keepFp: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val deduped = docs.withColumn("__fp", md5(col(textCol).cast("binary")))
      .withColumn("__rn",
        row_number().over(Window.partitionBy("__fp").orderBy(idCol)))
      .where(col("__rn") === 1).drop("__rn")
    // keepFp lets content-keyed callers (curateBatch) reuse the
    // fingerprint instead of re-hashing every surviving text
    if (keepFp) deduped else deduped.drop("__fp")
  }

  /** `nearDupPairs`: an optional near-dup pair list (id_a, id_b — e.g.
    * a persisted [[graft.dedup.Dedup.minhashLsh]] /
    * [[graft.dedup.Dedup.ngramJaccard]] artifact). When given, a
    * near-dup collapse runs after the exact content dedup:
    * [[graft.dedup.Dedup.clusterRepresentatives]] keeps the
    * highest-quality doc per connected component, so the packed set
    * contains one representative per near-dup cluster, not one per
    * distinct byte string. Components and ranking run over the pair
    * graph only — the stage adds no corpus-wide shuffle. */
  def buildTrainingSet(docs: DataFrame, idCol: String, textCol: String,
                       domainCol: String,
                       weights: Map[String, Double] = Map.empty,
                       defaultWeight: Double = 1.0, minQuality: Double = 0.0,
                       trainPct: Int = 90, budget: Int = 2048,
                       nShards: Int = 64,
                       nearDupPairs: Option[DataFrame] = None,
                       lmGate: Option[(graft.text.NgramLm.Model, Double)] = None,
                       dsirGate: Option[(Dsir.Model, Double)] = None): DataFrame = {
    val scored = graft.text.TextAnalysis.quality(
        docs, idCol, textCol, keep = Seq(textCol, domainCol))
      .where(col("quality") >= minQuality)
    // optional CCNet-style perplexity gate: NLL under a TRUSTED-corpus
    // bigram LM (trained elsewhere — the artifact is the model), one
    // semi-join on the id; token-less docs drop when the gate is on.
    // BOTH gates' score sides read the RAW docs projected to
    // (id, text) — a column-pruned scan — NOT the `scored` plan:
    // putting `scored` on both sides of a semi-join would run the
    // quality pass (the expensive stage) twice per build
    val rawSlice = docs.select(col(idCol), col(textCol))
    val fluent = lmGate match {
      case Some((m, maxNll)) => scored.join(
        graft.text.NgramLm.score(rawSlice, idCol, textCol, m)
          .where(col("nll") <= maxNll).select(idCol),
        Seq(idCol), "left_semi")
      case None => scored
    }
    // optional DSIR importance floor (row 89's batch-side compose —
    // the threshold form of the paper's fixed-budget resampling):
    // feature-less docs drop when the gate is on
    val targeted = dsirGate match {
      case Some((m, minLogw)) => fluent.join(
        Dsir.weights(rawSlice, idCol, textCol, m)
          .where(col("logw") >= minLogw).select(idCol),
        Seq(idCol), "left_semi")
      case None => fluent
    }
    val mixed = sampleByWeights(targeted, idCol, domainCol, weights, defaultWeight)
    val deduped = dedupByContent(mixed, idCol, textCol)
    val collapsed = nearDupPairs match {
      case Some(pairs) => graft.dedup.Dedup
        .clusterRepresentatives(deduped, idCol, "quality", pairs)
        .drop("cluster_id")
      case None => deduped
    }
    val train = hashSplit(collapsed, idCol, trainPct)
      .where(col("split") === "train")
    packSequences(train, idCol, size(split(col(textCol), " ")), budget, nShards)
  }

  /** Per-domain corpus report card — the "know your data" pass a
    * training-data pipeline runs before (and after) curation: document
    * count, distinct-content count (md5 identity, the same key the
    * dedup stages use), token volume, vocabulary size, char volume,
    * and mean doc length. Two aggregation passes: one doc-level groupBy
    * and one token-level distinct (the vocabulary count is the only
    * stage that explodes tokens; with `approxVocabulary` it switches to
    * HLL++ `approx_count_distinct`, whose map-side sketch merge avoids
    * shuffling the token stream — the 100 TB default, left off here so
    * the output stays exactly SQL-oracle-able). Every metric is
    * integer-derived; the one ratio is a single long/long division, so
    * both engines evaluate the identical IEEE expression (no
    * order-dependent double summation anywhere).
    *
    * The vocabulary excludes the empty token (the convention of every
    * tokenizer here: BM25, TextEmbed, simhash), while token/char
    * volumes follow the raw `split` convention of q_token_count /
    * q_quality. The vocabulary join is LEFT: a domain whose docs are
    * all null-text still reports its doc count with vocabulary 0 —
    * a profiling report must surface pathological domains, not drop
    * them. */
  def corpusStats(docs: DataFrame, textCol: String, domainCol: String,
                  approxVocabulary: Boolean = false): DataFrame = {
    val toks = split(col(textCol), " ")
    // null text contributes NULL (sum-skipped, the SQL convention) —
    // never size(null) = -1, which would silently DEDUCT from the total
    val tokCount = when(col(textCol).isNotNull, size(toks).cast("long"))
    val docLevel = docs.groupBy(col(domainCol).as("domain")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol).cast("binary"))).as("distinct_texts"),
      sum(tokCount).as("total_tokens"),
      sum(length(col(textCol)).cast("long")).as("total_chars"))
    val tokLevel = docs
      .select(col(domainCol).as("domain"), explode(toks).as("__tk"))
      .where(col("__tk") =!= "")
      .groupBy("domain")
      .agg((if (approxVocabulary) approx_count_distinct(col("__tk"))
            else countDistinct(col("__tk"))).as("distinct_tokens"))
    docLevel.join(tokLevel, Seq("domain"), "left")
      .withColumn("distinct_tokens", coalesce(col("distinct_tokens"), lit(0L)))
      .withColumn("avg_doc_tokens",
        col("total_tokens").cast("double") / col("n_docs"))
  }

  /** Per-domain LEXICAL SPECTRUM — the corpus-health report the
    * corpusStats counts can't see: how the token mass distributes over
    * TYPES. A healthy natural-language domain has a Zipfian spectrum
    * (hapax_ratio ≈ 0.4–0.6 of types); template/boilerplate-heavy
    * domains collapse it (few types carry everything, hapax_ratio
    * small), and encoding garbage explodes it (nearly every "type"
    * unique, type_token_ratio → 1). Monitors tokenizer-vocabulary
    * assumptions and flags domains whose crawl changed character.
    *
    * Returns per domain: n_tokens, n_types, hapax_types (frequency-1
    * types), top_type_tokens (the most frequent type's count — a
    * boilerplate-concentration signal), type_token_ratio and
    * hapax_ratio (unrounded
    * long/long IEEE divisions, the row-35 discipline). Tokens are the
    * whitespace convention with empties dropped (the corpusStats
    * rule); NULL text contributes nothing.
    *
    * Scale shape: one token explode collapses IMMEDIATELY to
    * (domain, token) counts — map-side-combinable — then per-domain
    * aggregates over the type table; text never shuffles, nothing
    * wider than (domain, token) crosses an Exchange. */
  def lexicalSpectrum(docs: DataFrame, textCol: String,
                      domainCol: String): DataFrame = {
    val typeCounts = docs
      .select(col(domainCol).as("domain"),
        explode(split(col(textCol), " ")).as("__tk"))
      .where(col("__tk") =!= "")
      .groupBy("domain", "__tk").agg(count(lit(1)).as("__c"))
    typeCounts.groupBy("domain")
      .agg(
        sum("__c").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax_types"),
        max(col("__c")).as("top_type_tokens"))
      .select(col("domain"), col("n_tokens"), col("n_types"),
        col("hapax_types"), col("top_type_tokens"),
        (col("n_types").cast("double") / col("n_tokens")).as("type_token_ratio"),
        (col("hapax_types").cast("double") / col("n_types")).as("hapax_ratio"))
      .orderBy("domain")
  }

  /** Vocabulary drift report between two corpora — the ingest-monitor
    * companion of [[corpusStats]] (is today's crawl batch distributed
    * like the accepted corpus? did a scraper change shift the token
    * mix?): per token, counts and relative frequencies on both sides
    * plus the frequency delta. One groupBy per side over exploded
    * tokens, one full-outer equi-join on the token key — no doc-level
    * or pairwise work anywhere, so the report costs one groupBy token
    * scan plus one projection-only count scan per side at any corpus
    * size (the totals come from a shuffle-free size() sum — NOT from
    * re-running the groupBy plan, which would double the dominant
    * cost). Totals are two bounded driver scalars (same contract as
    * the centroid/codebook collects); sum(size(filter(...))) over docs
    * equals sum over the grouped counts exactly, so the rates stay
    * engine-reproducible (DuckDB-oracled): exact integer counts, one
    * long/long double division per rate. */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(d: DataFrame) = d
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    def total(d: DataFrame): Long = d
      .agg(coalesce(sum(size(filter(
          split(coalesce(col(textCol), lit("")), " "),
          t => t =!= "")).cast("long")), lit(0L)))
      .collect()(0).getLong(0)
    val ca = counts(a)
    val cb = counts(b)
    val nA = total(a)
    val nB = total(b)
    // a side of all-empty/null text divides by zero: Spark (non-ANSI)
    // yields NULL rates where DuckDB yields Infinity — fail fast
    // instead of silently diverging cross-engine
    require(nA > 0 && nB > 0, "cannot compute drift against an empty side")
    val rateA = col("c_a").cast("double") / lit(nA).cast("double")
    val rateB = col("c_b").cast("double") / lit(nB).cast("double")
    ca.select(col("tok"), col("c").as("c_a"))
      .join(cb.select(col("tok"), col("c").as("c_b")), Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .select(col("tok"), col("c_a"), col("c_b"),
        rateA.as("rate_a"), rateB.as("rate_b"),
        (rateA - rateB).as("rate_diff"))
  }

  /** Deterministic sharded corpus SHUFFLE — the loader-side "shuffle
    * the dataset" step, done the only way a 100 TB corpus can be
    * shuffled: no global permutation index (a corpus-wide
    * `row_number()` would be a single-partition sort), but a
    * (shard, pos) addressing scheme — shard = salted md5 of the id
    * (the [[saltedBucket]] device, engine-portable bit-for-bit), pos =
    * the rank of a SECOND salted hash within the shard. Readers stream
    * shards in any order and rows within a shard in pos order; the
    * composite order is uniformly pseudo-random in the ids, stable
    * across runs/engines/re-shards (content-addressed, like
    * [[hashSplit]] — reshuffling = changing the salt), and the only
    * shuffle is one hash partitioning + per-shard sorts bounded by
    * corpus/nShards. */
  def shuffleShards(docs: DataFrame, idCol: String, nShards: Int,
                    salt: String = "shuffle"): DataFrame = {
    require(nShards >= 1, "nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val orderKey = md5(concat(col(idCol).cast("string"), lit(salt + ":pos")))
    docs
      .withColumn("shard", saltedBucket(col(idCol), salt, nShards))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(orderKey, col(idCol))) - 1)
  }

  /** Length-bucketed batch assignment — the padding-minimizing loader
    * batching step (documents of similar token length share a batch,
    * so per-batch padding-to-max waste is bounded by the band width):
    * bucket = whitespace-token count div `bandTokens`, and within a
    * (bucket, shard) group batch_id = salted-hash rank div
    * `batchSize`. Banding by integer division (not floor(log2)) keeps
    * the bucket boundary integer-exact on every engine; the hash
    * order mixes domains into each batch deterministically.
    *
    * Scale shape: bucket CARDINALITY is bounded by max-length/band, so
    * a window keyed on bucket alone would funnel a popular band's 10⁹
    * docs through one sort task — the same single-partition-window
    * anti-pattern as an unpartitioned rank. `nShards` sub-shards each
    * band by a salted id hash (the [[packSequences]] discipline): the
    * rank window runs per (bucket, shard), every partition bounded by
    * band/nShards, and a batch is addressed (bucket, shard, batch_id).
    * Batches stay length-homogeneous (the padding property lives on
    * the bucket key alone). The window input prunes to
    * (id, count, keys) when the caller does not retain the text
    * column (Catalyst column pruning — the entry and probe shapes);
    * a caller carrying text through the assignment pays its shuffle
    * or joins batch ids back by id. */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
                    batchSize: Int, bandTokens: Int = 16,
                    nShards: Int = 64, salt: String = "batch"): DataFrame = {
    require(batchSize >= 1 && bandTokens >= 1 && nShards >= 1,
      "batchSize, bandTokens, nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val orderKey = md5(concat(col(idCol).cast("string"), lit(salt)))
    docs
      // coalesce: legacy size(split(NULL)) is -1 on Spark but NULL on
      // other engines — a null-text doc must land in the 1-token band
      // on BOTH sides of an oracle (the packSequences guard)
      .withColumn("ws_tokens", size(split(coalesce(col(textCol), lit("")), " ")))
      .withColumn("bucket", expr(s"ws_tokens div $bandTokens").cast("int"))
      .withColumn("shard", saltedBucket(col(idCol), salt + ":shard", nShards))
      .withColumn("batch_id", ((row_number().over(
        Window.partitionBy("bucket", "shard").orderBy(orderKey, col(idCol))) - 1)
        / batchSize).cast("int"))
  }

  /** GPT-style concat-and-chunk materialization — the OTHER loader
    * layout next to [[packSequences]]: instead of packing whole
    * documents under a budget, the corpus is (conceptually)
    * concatenated in shuffle order with one end-of-document separator
    * per doc and cut every `ctxTokens` tokens, so every training block
    * is exactly full and documents SPLIT across block boundaries
    * (Brown et al. 2020's data layout; what most decoder pretraining
    * actually consumes). Returns one SLICE row per (doc, overlapped
    * block): (id, shard, pos, block_id, slice_start, slice_len) with
    * slice offsets in DOC token coordinates — position `n_tokens` is
    * the EOD separator. Slices tile each document exactly
    * (Σ slice_len = n_tokens + 1) and every block except each shard's
    * last sums to exactly `ctxTokens` (CurationSpec pins both).
    *
    * Deterministic and engine-portable end-to-end: the concatenation
    * order is [[shuffleShards]]' salted-md5 (shard, pos) addressing,
    * offsets are integer cumulative sums, block spans are integer
    * divisions — nothing a DuckDB oracle can disagree on.
    *
    * Scale shape: only (id, token count, keys) ever shuffles — the
    * text column prunes out of the window input; the pos and
    * cumulative-offset windows share ONE hashpartitioning(shard)
    * (each partition bounded by corpus/nShards — `nShards` must scale
    * with the corpus, the [[shuffleShards]] contract), and the slice
    * explode emits at most n_tokens/ctx + 1 rows per doc (linear).
    * A reader materializes block b of shard s by fetching its slice
    * rows and the referenced docs — a semi-join, never a global
    * sort. */
  def concatChunks(docs: DataFrame, idCol: String, textCol: String,
                   ctxTokens: Int, nShards: Int = 64,
                   salt: String = "shuffle"): DataFrame = {
    require(ctxTokens >= 2, "ctxTokens must be at least 2")
    import org.apache.spark.sql.expressions.Window
    val ctx = lit(ctxTokens.toLong)
    val addressed = shuffleShards(
      docs.select(col(idCol),
        (size(expr(s"filter(split($textCol, ' '), x -> x <> '')")) + lit(1))
          .cast("long").as("__c")),
      idCol, nShards, salt)
    val ofs = coalesce(sum("__c").over(
      Window.partitionBy("shard").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    addressed
      .withColumn("__ofs", ofs)
      .withColumn("block_id", explode(expr(
        s"sequence(__ofs DIV $ctxTokens, (__ofs + __c - 1) DIV $ctxTokens)")))
      .select(col(idCol), col("shard"), col("pos"), col("block_id"),
        greatest(col("block_id") * ctx - col("__ofs"), lit(0L))
          .as("slice_start"),
        (least((col("block_id") + lit(1L)) * ctx, col("__ofs") + col("__c")) -
          greatest(col("block_id") * ctx, col("__ofs"))).as("slice_len"))
  }

  /** One micro-batch (or one partition of a backfill) through the full
    * curation front door: quality-score and threshold, apply the
    * deterministic domain mix, then re-key each surviving doc by its
    * content identity, md5(text) — 128 bits, collision-negligible at
    * any corpus size (never the ~30-bit rolling-hash fingerprint
    * metric, which would silently merge distinct docs). Returns one
    * row per content key — (id = md5, src_id, text, domain, quality),
    * lowest source id winning ties deterministically.
    *
    * Content keying is what makes exact dedup FREE across an unbounded
    * stream: upserting these rows into a collection collapses every
    * re-arrival of the same text into one stored row (last-wins by id)
    * with no dedup state beyond the collection itself — see
    * [[graft.streaming.Streams.curatedIngest]]. Every step is a
    * projection or filter except the per-batch fingerprint dedup, whose
    * shuffle is bounded by the micro-batch, never the corpus. */
  def curateBatch(batch: DataFrame, idCol: String, textCol: String,
                  domainCol: String, weights: Map[String, Double] = Map.empty,
                  defaultWeight: Double = 1.0,
                  minQuality: Double = 0.0,
                  scrubPii: Boolean = false): DataFrame = {
    // scrub BEFORE scoring/keying: redaction changes the text, so the
    // quality signal and the content key (md5 of text) must see the
    // CLEAN form — otherwise a re-arrival of the same document with a
    // rotated email would defeat exact content dedup. A pure in-place
    // projection (no join, no shuffle).
    val input =
      if (!scrubPii) batch
      else batch.withColumn(textCol,
        graft.text.TextAnalysis.scrubExpr(col(textCol)))
    val scored = graft.text.TextAnalysis.quality(
        input, idCol, textCol, keep = Seq(textCol, domainCol))
      .where(col("quality") >= minQuality)
    dedupByContent(
        sampleByWeights(scored, idCol, domainCol, weights, defaultWeight),
        idCol, textCol, keepFp = true)
      .select(col("__fp").as("id"),
        col(idCol).as("src_id"), col(textCol), col(domainCol), col("quality"))
  }
}
