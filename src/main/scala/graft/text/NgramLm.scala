package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the CCNet-style quality
  * filter real pretraining pipelines run (Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data":
  * an LM trained on a trusted reference corpus scores candidate
  * documents; low average log-likelihood = disfluent/boilerplate/
  * machine-generated text, filtered or bucketed by perplexity). The
  * engine analog of row 67's rare-bigram rate with an actual
  * probability model: interpolated absolute discounting (discount
  * d = 0.75) over whitespace tokens with a `<s>` start context,
  *
  *   p(w|v) = max(c(v,w) − d, 0) / c(v)  +  d · n₁₊(v) / c(v) · p₁(w)
  *   p₁(w)  = (c(w) + 1) / (T + V + 1)          (add-one, shared OOV)
  *
  * and p(w|v) = p₁(w) for a context never seen in training. Scoring a
  * HELD-OUT split exercises every backoff path (unseen bigram, unseen
  * context, unseen word), which is the deployment shape: the model is
  * an artifact trained once, candidates stream through it.
  *
  * Engine-reproducible by construction: all probabilities are ratios
  * of exact integer counts evaluated in one pinned double-precision
  * expression; the only libm call (ln) rounds to an integer MICRO-NAT
  * (ln p × 10⁶ → BIGINT) per token, the per-document sum and 4-decimal
  * mean are pure integer arithmetic (floor division), and the single
  * final ÷10⁴ is exact — no double summation, no round() at a half
  * boundary, nothing an engine pair can disagree on.
  *
  * 100 TB shape: [[train]] is two hash aggregations over exploded
  * (v, w) pairs with map-side combine — the counts tables are the
  * persisted artifact, the corpus text never shuffles. [[score]]
  * explodes candidate pairs and joins the artifact by token keys
  * (bigram join shuffles only (id, v, w) slivers; the context and
  * unigram tables are usually broadcast-sized after AQE); one final
  * groupBy(id) aggregates per-document scores. No step is more than
  * linear in candidate tokens.
  */
object NgramLm {

  /** Discount mass moved to the unigram backoff per seen bigram. */
  val Discount = 0.75

  /** Trained artifact: exact count tables (all that [[score]] needs —
    * persist these as collections/parquet to reuse across sessions).
    *
    *  - bigrams:  (v, w, c_vw)
    *  - contexts: (v, c_v, n1p) with c_v = Σ_w c(v,w), n1p = |{w}|
    *  - unigrams: (w, c_w)
    *  - totals:   one row (t_tokens, vocab)
    */
  final case class Model(bigrams: DataFrame, contexts: DataFrame,
                         unigrams: DataFrame, totals: DataFrame)

  /** (id, v, w) bigram pairs of every non-empty document, with the
    * `<s>` start context so position 0 is scored too — one
    * struct-pair transform + explode, nothing but (id, v, w) leaves
    * the projection. */
  /** `par = true` applies the Par.floor parallelism repartition before
    * the explode — right for the SCORING probe side (one heavy
    * pre-shuffle stage per query). Training callers must keep the
    * default: the train subplan is re-executed once per derived model
    * table each time the tables are broadcast, and a shuffle inside
    * each of those broadcast builds serializes what are otherwise
    * concurrent narrow pipelines (measured 1.2s -> 2.2s on
    * q_ppl_buckets when train carried the floor too). */
  private def pairRows(docs: DataFrame, idCol: String, textCol: String,
                       par: Boolean = false): DataFrame = {
    val base = docs.select(col(idCol), expr(
        s"filter(split($textCol, ' '), x -> x <> '')").as("__a"))
      .where(size(col("__a")) > 0)
    (if (par) graft.ops.Par.floor(base, col(idCol)) else base)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(__a) - 1), " +
          "i -> struct(if(i = 0, '<s>', __a[i - 1]) AS v, __a[i] AS w))"))
        .as("__p"))
      .select(col(idCol), col("__p.v").as("v"), col("__p.w").as("w"))
  }

  /** Rebuild a full [[Model]] from a persisted bigram table alone —
    * the bigram counts are the SUFFICIENT STATISTIC: every token
    * instance appears exactly once as a `w` (the `<s>` context covers
    * position 0), so the unigram marginal Σ_v c(v,w), the context
    * totals and the grand totals all derive by aggregation. Persist
    * one (v, w, c_vw) table, get the whole artifact back. */
  def fromBigrams(bigrams: DataFrame): Model = {
    val contexts = bigrams.groupBy("v")
      .agg(sum("c_vw").as("c_v"), count(lit(1)).as("n1p"))
    val unigrams = bigrams.groupBy("w").agg(sum("c_vw").as("c_w"))
    val totals = unigrams.agg(sum("c_w").as("t_tokens"),
      count(lit(1)).as("vocab"))
    Model(bigrams, contexts, unigrams, totals)
  }

  /** Count tables from the training corpus (two aggregations, fully
    * map-side-combinable; the text column never shuffles). */
  def train(docs: DataFrame, idCol: String, textCol: String): Model = {
    val bg = pairRows(docs, idCol, textCol)
    val bigrams = bg.groupBy("v", "w").agg(count(lit(1)).as("c_vw"))
    val contexts = bigrams.groupBy("v")
      .agg(sum("c_vw").as("c_v"), count(lit(1)).as("n1p"))
    // unigram counts = the w-column marginal (every token appears
    // exactly once as a w, including position 0)
    val unigrams = bg.groupBy("w").agg(count(lit(1)).as("c_w"))
    val totals = unigrams.agg(sum("c_w").as("t_tokens"),
      count(lit(1)).as("vocab"))
    Model(bigrams, contexts, unigrams, totals)
  }

  /** Trained order-3 artifact: the trigram counts plus the derived
    * (u,v) context totals and the full order-2 chain it backs off
    * into. Like [[Model]], one table is the sufficient statistic —
    * see [[fromTrigrams]]. */
  final case class Model3(trigrams: DataFrame, bicontexts: DataFrame,
                          bigram: Model)

  /** (id, u, v, w) trigram rows with DOUBLE `<s>` padding: position 0
    * scores under (`<s>`, `<s>`) and position 1 under (`<s>`, w₀), so
    * every token instance appears exactly once as a `w` here too. */
  private def tripleRows(docs: DataFrame, idCol: String, textCol: String,
                         par: Boolean = false): DataFrame = {
    val base = docs.select(col(idCol), expr(
        s"filter(split($textCol, ' '), x -> x <> '')").as("__a"))
      .where(size(col("__a")) > 0)
    (if (par) graft.ops.Par.floor(base, col(idCol)) else base)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(__a) - 1), " +
          "i -> struct(if(i <= 1, '<s>', __a[i - 2]) AS u, " +
          "if(i = 0, '<s>', __a[i - 1]) AS v, __a[i] AS w))"))
        .as("__p"))
      .select(col(idCol), col("__p.u").as("u"), col("__p.v").as("v"),
        col("__p.w").as("w"))
  }

  /** Rebuild the full order-3 chain from the persisted trigram table
    * alone: the (v, w) marginal Σ_u c(u,v,w) IS the bigram table (the
    * double-`<s>` padding makes position 0's marginal land on the
    * bigram layer's own `<s>` start convention), and [[fromBigrams]]
    * derives the rest — so order-3 persistence is STILL one table. */
  def fromTrigrams(trigrams: DataFrame): Model3 = {
    val bicontexts = trigrams.groupBy("u", "v")
      .agg(sum("c_uvw").as("c_uv"), count(lit(1)).as("n1p3"))
    val bigrams = trigrams.groupBy("v", "w").agg(sum("c_uvw").as("c_vw"))
    Model3(trigrams, bicontexts, fromBigrams(bigrams))
  }

  /** Order-3 count tables: one aggregation over exploded (u, v, w)
    * triples; everything else derives ([[fromTrigrams]]). */
  def train3(docs: DataFrame, idCol: String, textCol: String): Model3 =
    fromTrigrams(tripleRows(docs, idCol, textCol)
      .groupBy("u", "v", "w").agg(count(lit(1)).as("c_uvw")))

  /** The shared scoring tail over the per-token MICRO-NAT column
    * `__lp6` (ln p × 10⁶ rounded to a BIGINT — ln of a ratio of
    * integer counts never sits on an integer boundary, so the one
    * rounding is safe): sum exact integers, then take the 4-decimal
    * mean by INTEGER floor-division, dividing by 10⁴ only for
    * display. A double mean + round() is NOT cross-engine safe — the
    * mean of micro-nat integers lands exactly on x.xxxx5 whenever n
    * divides the sum that way, and at a half boundary Spark
    * (shortest-repr HALF_UP) and DuckDB (binary-double rounding) can
    * disagree by one ulp of the output (observed once in 2 500 docs
    * at sf0.1). Truncation via integer arithmetic has no boundary to
    * disagree on. */
  private def aggregateNll(scored: DataFrame, idCol: String): DataFrame =
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("__lp6").as("__s6"))
      .select(col(idCol), col("n_tokens"),
        (expr("CAST(((-__s6) * 10000L) DIV (n_tokens * 1000000L) AS DOUBLE)")
          / lit(10000.0)).as("nll"))

  /** The order-2 per-token probability expression over a row that has
    * joined (c_w, c_v, n1p, __cvw, t_tokens, vocab). */
  private def p2Expr = {
    val d = lit(Discount)
    val pUni = (coalesce(col("c_w"), lit(0L)).cast("double") + lit(1.0)) /
      (col("t_tokens").cast("double") + col("vocab").cast("double") + lit(1.0))
    when(col("c_v").isNull, pUni).otherwise(
      greatest(coalesce(col("__cvw"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("c_v").cast("double") +
        (d * col("n1p").cast("double") / col("c_v").cast("double")) * pUni)
  }

  /** Score against an order-3 chain:
    *
    *   p₃(w|u,v) = max(c(u,v,w) − d, 0) / c(u,v)
    *             + d · n₁₊(u,v) / c(u,v) · p₂(w|v)
    *
    * with p₃ = p₂ for an (u,v) context never seen in training; same
    * rounding discipline and output schema as [[score]]. */
  def score3(docs: DataFrame, idCol: String, textCol: String,
             model: Model3): DataFrame = {
    val d = lit(Discount)
    val m2 = model.bigram
    val scored = tripleRows(docs, idCol, textCol, par = true)
      .join(model.trigrams.withColumnRenamed("c_uvw", "__cuvw"),
        Seq("u", "v", "w"), "left")
      .join(model.bicontexts, Seq("u", "v"), "left")
      .join(m2.bigrams.withColumnRenamed("c_vw", "__cvw"), Seq("v", "w"), "left")
      .join(m2.contexts, Seq("v"), "left")
      .join(m2.unigrams, Seq("w"), "left")
      .crossJoin(broadcast(m2.totals))
      .select(col(idCol), round(log({
        val p2 = p2Expr
        when(col("c_uv").isNull, p2).otherwise(
          greatest(coalesce(col("__cuvw"), lit(0L)).cast("double") - d, lit(0.0)) /
            col("c_uv").cast("double") +
            (d * col("n1p3").cast("double") / col("c_uv").cast("double")) * p2)
      }) * lit(1000000.0), 0).cast("long").as("__lp6"))
    aggregateNll(scored, idCol)
  }

  /** Score candidate documents against a trained [[Model]]: returns
    * (id, n_tokens, nll) with nll = −mean per-token ln p, rounded to
    * 4 decimals (lower = more fluent under the training corpus; CCNet
    * buckets by this score's distribution). Deterministic and
    * oracle-reproducible — see the class doc for the rounding
    * discipline. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame =
    aggregateNll(
      pairRows(docs, idCol, textCol, par = true)
        .join(model.bigrams.withColumnRenamed("c_vw", "__cvw"),
          Seq("v", "w"), "left")
        .join(model.contexts, Seq("v"), "left")
        .join(model.unigrams, Seq("w"), "left")
        .crossJoin(broadcast(model.totals))
        .select(col(idCol), round(log(p2Expr) * lit(1000000.0), 0)
          .cast("long").as("__lp6")),
      idCol)

  /** Interpolated Kneser–Ney scoring (Kneser & Ney 1995; the smoothing
    * KenLM ships, i.e. what CCNet's 5-gram actually runs) — same
    * discounted bigram term as [[score]], but the backoff distribution
    * is the CONTINUATION probability instead of raw frequency:
    *
    *   p_KN(w|v) = max(c(v,w) − d, 0)/c(v) + d·n₁₊(v·)/c(v) · p_cont(w)
    *   p_cont(w) = (N₁₊(·w) + 1) / (N₁₊(··) + W + 1)
    *
    * where N₁₊(·w) counts the DISTINCT contexts w completes (its row
    * count in the bigram table), N₁₊(··) the bigram types, W the word
    * types — with the same add-one shared-OOV bucket as [[score]]'s
    * unigram, so the distribution stays proper for every context kind
    * (p_KN = p_cont when v was never seen). The KN signature: a word
    * frequent in ONE collocation ("Francisco") backs off LOW — raw
    * frequency would rank it high exactly where its context evidence
    * is useless (NgramLmSpec pins the inversion against [[score]]).
    *
    * No new artifact: both continuation tables are aggregations of the
    * SAME persisted (v, w, c_vw) sufficient statistic, so a stored
    * collection LM serves either smoothing. Same micro-nat rounding
    * discipline, output schema, and scale shape as [[score]]. */
  def scoreKn(docs: DataFrame, idCol: String, textCol: String,
              model: Model): DataFrame = {
    val d = lit(Discount)
    val contW = model.bigrams.groupBy("w").agg(count(lit(1)).as("__n1pw"))
    val contTot = model.bigrams.agg(count(lit(1)).as("__btypes"),
      countDistinct(col("w")).as("__wtypes"))
    val pCont = (coalesce(col("__n1pw"), lit(0L)).cast("double") + lit(1.0)) /
      (col("__btypes").cast("double") + col("__wtypes").cast("double") + lit(1.0))
    val pKn = when(col("c_v").isNull, pCont).otherwise(
      greatest(coalesce(col("__cvw"), lit(0L)).cast("double") - d, lit(0.0)) /
        col("c_v").cast("double") +
        (d * col("n1p").cast("double") / col("c_v").cast("double")) * pCont)
    aggregateNll(
      pairRows(docs, idCol, textCol, par = true)
        .join(model.bigrams.withColumnRenamed("c_vw", "__cvw"),
          Seq("v", "w"), "left")
        .join(model.contexts, Seq("v"), "left")
        .join(contW, Seq("w"), "left")
        .crossJoin(broadcast(contTot))
        .select(col(idCol), round(log(pKn) * lit(1000000.0), 0)
          .cast("long").as("__lp6")),
      idCol)
  }

  /** CCNet's head/middle/tail perplexity bucketing: within each domain
    * (CCNet buckets per language), the best-scoring third of documents
    * is `head`, the next third `middle`, the rest `tail` — the
    * published curation step downstream consumers mix by (train on
    * head+middle, hold tail for contrast). Input is a scored frame
    * carrying `idCol`, `domainCol` and an `nll` column (join
    * [[score]]'s output back to the corpus for the domain).
    *
    * Bucket boundaries are exact and engine-portable: thirds are
    * INTEGER thresholds (N DIV 3, (2·N) DIV 3 per domain) over ranks,
    * and a tie group of equal-nll documents buckets together where it
    * STARTS (its first rank) — documents never split across a
    * boundary by hash luck, and both engines evaluate the identical
    * integer rule. Domains with fewer than 3 documents degenerate
    * (head empty below N=3) by the same arithmetic on both sides.
    *
    * 100 TB shape: the rank window runs over the (domain, nll) GROUPED
    * table, not the corpus — nll is a 4-decimal value, so each
    * domain's partition is bounded by the VALUE SPACE of the score
    * (≈10⁴ rows per nll unit of range), independent of corpus size;
    * the assignment then joins back by (domain, nll). Two corpus
    * passes total: one groupBy, one equi-join — text never shuffles. */
  def buckets(scored: DataFrame, idCol: String, domainCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grp = scored.groupBy(col(domainCol), col("nll"))
      .agg(count(lit(1)).as("__c"))
    val byNll = Window.partitionBy(col(domainCol)).orderBy(col("nll"))
    val assign = grp
      .select(col(domainCol), col("nll"),
        (coalesce(sum("__c").over(
          byNll.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + lit(1L))
          .as("__start"),
        sum("__c").over(Window.partitionBy(col(domainCol))).as("__n"))
      .select(col(domainCol), col("nll"),
        when(expr("__start <= __n DIV 3"), lit("head"))
          .when(expr("__start <= (2 * __n) DIV 3"), lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"))
    scored.join(assign, Seq(domainCol, "nll"))
  }
}
