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
  * expression; the only libm call (ln) is rounded to 6 decimals per
  * token BEFORE the per-document sum, so the cross-engine oracle
  * (DuckDB) reproduces the score bit-for-bit at the emitted 4-decimal
  * rounding.
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
  private def pairRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), expr(
        s"filter(split($textCol, ' '), x -> x <> '')").as("__a"))
      .where(size(col("__a")) > 0)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(__a) - 1), " +
          "i -> struct(if(i = 0, '<s>', __a[i - 1]) AS v, __a[i] AS w))"))
        .as("__p"))
      .select(col(idCol), col("__p.v").as("v"), col("__p.w").as("w"))

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

  /** Score candidate documents against a trained [[Model]]: returns
    * (id, n_tokens, nll) with nll = −mean per-token ln p, rounded to
    * 4 decimals (lower = more fluent under the training corpus; CCNet
    * buckets by this score's distribution). Deterministic and
    * oracle-reproducible — see the class doc for the rounding
    * discipline. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame = {
    val d = lit(Discount)
    val scored = pairRows(docs, idCol, textCol)
      .join(model.bigrams.withColumnRenamed("c_vw", "__cvw"), Seq("v", "w"), "left")
      .join(model.contexts, Seq("v"), "left")
      .join(model.unigrams, Seq("w"), "left")
      .crossJoin(broadcast(model.totals))
      .select(col(idCol), round(log(
        {
          val pUni = (coalesce(col("c_w"), lit(0L)).cast("double") + lit(1.0)) /
            (col("t_tokens").cast("double") + col("vocab").cast("double") + lit(1.0))
          when(col("c_v").isNull, pUni).otherwise(
            greatest(coalesce(col("__cvw"), lit(0L)).cast("double") - d, lit(0.0)) /
              col("c_v").cast("double") +
              (d * col("n1p").cast("double") / col("c_v").cast("double")) * pUni)
        }), 6).as("__lp"))
    // the 6-decimal per-token logs sum as DECIMAL — exact regardless
    // of partition/combine order — so the only double steps are one
    // division and the final 4-decimal rounding
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(-sum(col("__lp").cast("decimal(20,6)")).cast("double") /
          count(lit(1)), 4).as("nll"))
  }
}
