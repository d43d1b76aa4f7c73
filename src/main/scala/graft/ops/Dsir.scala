package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick the raw-corpus documents that look most like a
  * trusted TARGET corpus (the published method behind domain-targeted
  * pretraining mixes). Features are hashed n-grams (unigrams +
  * bigrams, the paper's setting) bucketed into a fixed space `B`;
  * both corpora fit a bag-of-hashed-ngrams unigram distribution with
  * add-one smoothing,
  *
  *   p(b) = (c_target(b) + 1) / (T + B),   q(b) = (c_raw(b) + 1) / (R + B)
  *
  * and a candidate's importance weight is log w(z) = Σ_g log(p/q) over
  * its gram instances. Selection is Gumbel top-k (rank by
  * log w + Gumbel noise), which the paper shows equals sampling
  * without replacement proportionally to w — diversity the plain
  * top-k cut lacks.
  *
  * Engine-reproducible by the same discipline as [[graft.text.NgramLm]]:
  * gram buckets come from the engine-portable salted-md5 hash (the
  * row-82 device), each bucket's log-ratio is ONE pinned double
  * expression rounded to an integer MICRO-NAT (ln(p/q)·10⁶ → BIGINT)
  * in the B-row ratio table, so a document's weight is an exact
  * integer SUM of table entries — nothing order-dependent, nothing an
  * engine pair can disagree on. The Gumbel key is the same trick on
  * the selection side: u from a salted hash of the id (content-
  * addressed, reproducible across runs/engines/re-shards),
  * g = −ln(−ln u) rounded to micro-nats, key = logw6 + g6 in exact
  * BIGINT arithmetic.
  *
  * 100 TB shape: both fits are explode → groupBy(bucket) with map-side
  * combine onto AT MOST `B` keys (a kilobyte-scale shuffle regardless
  * of corpus size); the dense B-row ratio table broadcasts to the
  * candidate gram stream (one projection-side join, corpus text never
  * shuffles); per-doc weights are one groupBy(id) sum; top-k is a
  * distributed TakeOrderedAndProject. Every stage is linear in
  * candidate tokens.
  */
object Dsir {

  /** Default hashed-feature space (the paper uses 10k; 4096 keeps the
    * broadcast table trivially small while collisions stay rare at
    * any realistic vocabulary). */
  val DefaultBuckets = 4096

  /** The fitted importance model: the dense per-bucket log-ratio table
    * TOGETHER with the bucket space it was hashed into. Weights and
    * selection take the model, never a bare table — the table is dense,
    * so scoring against it with a different `nBuckets` would join
    * every (wrong) bucket successfully and return silently wrong
    * weights; carrying the count in the artifact makes the mismatch
    * unrepresentable. Persist `ratios` + record `nBuckets` alongside
    * (one meta entry) to reuse across sessions. */
  final case class Model(ratios: DataFrame, nBuckets: Int)

  /** Engine-portable gram bucket: [[Curation.saltedHash32]] of the
    * gram (the repo's ONE hash-width definition) mod `nBuckets`,
    * salted per-feature-space. */
  private def bucketOf(g: Column, nBuckets: Int): Column =
    pmod(Curation.saltedHash32(g, ":dsir"), lit(nBuckets.toLong))

  /** (id, b) — one row per gram INSTANCE (hashed unigrams + bigrams)
    * of every non-empty document. Only (id, bucket) leaves the
    * projection; the text column never shuffles. */
  private def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
                          nBuckets: Int): DataFrame =
    // Par.floor: the per-gram salted md5 below is the heavy stage of
    // every DSIR pass and runs pre-shuffle — a single-row-group input
    // file would otherwise pin it to one task
    graft.ops.Par.floor(
      docs
        .select(col(idCol), expr(
          s"filter(split($textCol, ' '), x -> x <> '')").as("__a"))
        .where(size(col("__a")) > 0),
      col(idCol))
      // ONE explode of unigrams ++ bigrams, so each corpus is scanned
      // once, not once per gram order (the size >= 2 guard matters:
      // sequence(1, 0) would count DOWN in Spark)
      .select(col(idCol), explode(expr(
        "concat(__a, CASE WHEN size(__a) >= 2 THEN " +
          "transform(sequence(1, size(__a) - 1), " +
          "i -> concat(__a[i - 1], ' ', __a[i])) " +
          "ELSE array() END)")).as("__g"))
      .select(col(idCol), bucketOf(col("__g"), nBuckets).as("b"))

  /** Fit the importance model: the DENSE (b, lr6) ratio table over all
    * `nBuckets` buckets, lr6 = round(ln(p(b)/q(b)) · 10⁶) as BIGINT —
    * the persistable artifact (one tiny table, like the LM's bigram
    * counts), wrapped with its bucket space as a [[Model]]. Dense so
    * the weight join needs no missing-bucket fallback: a gram unseen
    * in BOTH corpora still has a row (the smoothing mass ratio). */
  def fit(target: DataFrame, raw: DataFrame, idCol: String,
          textCol: String, nBuckets: Int = DefaultBuckets): Model =
    Model(logRatios(target, raw, idCol, textCol, nBuckets), nBuckets)

  private def logRatios(target: DataFrame, raw: DataFrame, idCol: String,
                        textCol: String, nBuckets: Int): DataFrame = {
    val bDouble = lit(nBuckets.toDouble)
    val ct = gramBuckets(target, idCol, textCol, nBuckets)
      .groupBy("b").agg(count(lit(1)).as("__ct"))
    val cr = gramBuckets(raw, idCol, textCol, nBuckets)
      .groupBy("b").agg(count(lit(1)).as("__cr"))
    val tTot = ct.agg(coalesce(sum("__ct"), lit(0L)).as("__tt"))
    val rTot = cr.agg(coalesce(sum("__cr"), lit(0L)).as("__rt"))
    target.sparkSession.range(nBuckets).toDF("b")
      .join(ct, Seq("b"), "left").join(cr, Seq("b"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("b"), round(log(
        ((coalesce(col("__ct"), lit(0L)).cast("double") + lit(1.0)) /
          (col("__tt").cast("double") + bDouble)) /
          ((coalesce(col("__cr"), lit(0L)).cast("double") + lit(1.0)) /
            (col("__rt").cast("double") + bDouble))) * lit(1000000.0), 0)
        .cast("long").as("lr6"))
  }

  /** (id, n_feats, logw6) with the weight kept as its exact micro-nat
    * integer — the internal form [[select]] ranks on. */
  private def weights6(candidates: DataFrame, idCol: String, textCol: String,
                       model: Model): DataFrame =
    gramBuckets(candidates, idCol, textCol, model.nBuckets)
      .join(broadcast(model.ratios), Seq("b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"), sum("lr6").as("__w6"))

  /** Per-candidate importance weights against a fitted [[Model]]:
    * (id, n_feats, logw) with logw = the exact integer micro-nat sum
    * ÷ 10⁶ (one IEEE division of identical integers on any engine).
    * Token-less documents have no features and no row — the same
    * contract as the LM scorer. */
  def weights(candidates: DataFrame, idCol: String, textCol: String,
              model: Model): DataFrame =
    weights6(candidates, idCol, textCol, model)
      .select(col(idCol), col("n_feats"),
        (col("__w6").cast("double") / lit(1000000.0)).as("logw"))

  /** Gumbel top-k selection — sampling without replacement
    * proportionally to the importance weights (the paper's resampling
    * step): key = logw6 + round(−ln(−ln u) · 10⁶) with u a salted-hash
    * uniform of the id, ranked by exact BIGINT key with an id
    * tie-break. Returns the k selected rows as (id, logw, gkey),
    * id-ordered. Reshuffle the draw = change nothing but the salt's
    * consumers' expectations: the draw is content-addressed and
    * reproduces bit-identically across engines. */
  def select(candidates: DataFrame, idCol: String, textCol: String,
             model: Model, k: Int): DataFrame = {
    // u in (0, 1): 32-bit salted hash + 0.5, over 2^32
    val u = (Curation.saltedHash32(col(idCol), ":gumbel").cast("double") +
      lit(0.5)) / lit(4294967296.0)
    val g6 = round(-log(-log(u)) * lit(1000000.0), 0).cast("long")
    weights6(candidates, idCol, textCol, model)
      .select(col(idCol), col("__w6"), (col("__w6") + g6).as("__k6"))
      .orderBy(col("__k6").desc, col(idCol)).limit(k)
      .select(col(idCol),
        (col("__w6").cast("double") / lit(1000000.0)).as("logw"),
        (col("__k6").cast("double") / lit(1000000.0)).as("gkey"))
      .orderBy(idCol)
  }
}
