package graft.ops

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF => MlHashingTF}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned document-quality classifier — the GPT-3-style quality
  * filter of pretraining pipelines (logistic regression over hashed
  * token counts, scoring every candidate document against a
  * known-good positive class; the learned complement of the heuristic
  * `TextAnalysis.quality` ratios).
  *
  * Train: MLlib LogisticRegression on HashingTF features (murmur3
  * hashed token counts, `numFeatures` buckets) — one distributed fit,
  * deterministic for a fixed input (L-BFGS over partition-wise
  * gradient sums; no sampling, no random init).
  * Score: the model collapses to (intercept, coef[numFeatures]) and
  * scoring is a PURE column expression — hashed counts via the same
  * HashingTF, then sigmoid(intercept + Σ feat·coef) as
  * zip_with/aggregate over the densified feature array. No UDF, no
  * RDD: at 100 TB the score is a projection at parquet-scan speed
  * (O(numFeatures) per row — keep numFeatures at the classifier scale,
  * 1–4k, not the hashing-trick-embedding scale).
  *
  * The standard bootstrap has no hand labels: `distill` trains against
  * a weak label (a heuristic score threshold, or domain membership à
  * la "reference corpus vs crawl"), which is exactly how production
  * quality classifiers are seeded.
  */
object QualityClassifier {

  /** The portable model: one intercept + one weight per hash bucket.
    * Persistable as [[modelDf]] (numFeatures tiny rows). */
  final case class Model(numFeatures: Int, intercept: Double, coef: Array[Double])

  private def withFeatures(docs: DataFrame, textCol: String,
                           numFeatures: Int): DataFrame = {
    val tf = new MlHashingTF().setInputCol("__toks").setOutputCol("__feat")
      .setNumFeatures(numFeatures)
    // EMPTY tokens filtered, exactly as scoreLogitMicro does: train,
    // float serving, and integer micro serving must all see the same
    // feature vector, or a double space near the decision boundary
    // flips the quantized `pass` relative to quality_prob >= 0.5 for
    // the same model (r14 review fix)
    tf.transform(docs.withColumn("__toks",
      filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= "")))
  }

  /** Fit on `labelCol` (0.0/1.0). */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1024, maxIter: Int = 50,
            regParam: Double = 0.01): Model = {
    val data = withFeatures(docs.select(col(textCol), col(labelCol)), textCol, numFeatures)
    val lr = new LogisticRegression().setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("__feat").setLabelCol(labelCol)
    val m = lr.fit(data)
    Model(numFeatures, m.intercept, m.coefficients.toArray)
  }

  /** Weak-label bootstrap: positives are the rows where `weakLabel`
    * holds (a heuristic-score threshold, a known-good domain, ...). */
  def distill(docs: DataFrame, textCol: String, weakLabel: Column,
              numFeatures: Int = 1024, maxIter: Int = 50,
              regParam: Double = 0.01): Model =
    train(docs.withColumn("__label", weakLabel.cast("double")),
      textCol, "__label", numFeatures, maxIter, regParam)

  /** Model → (idx, w) rows + the intercept at idx = -1 — the
    * persistable artifact form. */
  def modelDf(model: Model, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    ((-1, model.intercept) +: model.coef.toSeq.zipWithIndex.map(_.swap))
      .toDF("idx", "w")
  }

  def modelFromDf(df: DataFrame, numFeatures: Int): Model = {
    val coef = new Array[Double](numFeatures)
    var intercept = 0.0
    df.select(col("idx"), col("w")).collect().foreach { r =>
      val i = r.getInt(0)
      if (i < 0) intercept = r.getDouble(1) else coef(i) = r.getDouble(1)
    }
    Model(numFeatures, intercept, coef)
  }

  private val InternalCols = Seq("__toks", "__feat", "__fa", "__cf", "__qprob")

  /** `docs` with the probability appended under `outCol` — ONE scan,
    * all caller columns kept, pure column expressions end-to-end (see
    * object Scaladoc). The single-scan primitive behind [[score]] and
    * [[filterByQuality]] (a DataFrame-returning score + semi-join
    * would re-featurize the corpus twice for a row-local predicate).
    * Only the "__" working names are reserved (the repo-wide internal
    * prefix) — [[filterByQuality]] stages through `__qprob`, so a
    * caller frame already carrying a `quality_prob` column (e.g. a
    * persisted [[score]] output) passes through untouched. */
  private def withScoreAs(model: Model, docs: DataFrame, textCol: String,
                          outCol: String): DataFrame = {
    val clash = docs.columns.toSet.intersect(InternalCols.toSet + outCol)
    require(clash.isEmpty,
      s"input carries reserved scoring column name(s): ${clash.mkString(", ")}")
    val raw = lit(model.intercept) + expr(
      "aggregate(zip_with(__fa, __cf, (x, w) -> x * w), 0.0d, (acc, v) -> acc + v)")
    withFeatures(docs, textCol, model.numFeatures)
      .withColumn("__fa", vector_to_array(col("__feat")))
      .withColumn("__cf", typedLit(model.coef.toSeq))
      .withColumn(outCol, lit(1.0) / (lit(1.0) + exp(-raw)))
      .drop("__toks", "__feat", "__fa", "__cf")
  }

  /** `docs` + a public `quality_prob` column, one scan. */
  def withScore(model: Model, docs: DataFrame, textCol: String): DataFrame =
    withScoreAs(model, docs, textCol, "quality_prob")

  /** (id, quality_prob) for every doc — P(high quality). */
  def score(model: Model, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withScore(model, docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("quality_prob"))

  /** The apply step: docs scoring at or above `minProb` — a where()
    * over the single scored scan, never a self-join. All caller
    * columns pass through unchanged (including any `quality_prob`). */
  def filterByQuality(model: Model, docs: DataFrame,
                      textCol: String, minProb: Double): DataFrame =
    withScoreAs(model, docs, textCol, "__qprob")
      .where(col("__qprob") >= minProb)
      .drop("__qprob")

  // ------------------------------------------------ micro-logit serving

  /** The micro-quantized model: weights rounded once to integer MICRO
    * units (w6 = round(w·10⁶)), the NgramLm micro-nat discipline on
    * the classifier — scoring becomes pure INTEGER arithmetic
    * (logit6 = i6 + Σ count·w6, order-independent, cross-engine
    * exact), and the serving output stays in LOGIT domain (sign =
    * decision, monotone in probability) exactly as the LM rows serve
    * nll instead of perplexity: the one exp() never runs in the
    * certified path, only for display. An L-BFGS weight is never an
    * exact half-micro boundary, so the one rounding is safe. */
  final case class ModelMicro(numFeatures: Int, intercept6: Long, coef6: Array[Long])

  def quantize(model: Model): ModelMicro =
    ModelMicro(model.numFeatures, math.round(model.intercept * 1e6),
      model.coef.map(w => math.round(w * 1e6)))

  /** ModelMicro → (idx, w6) rows + the intercept at idx = -1 — the
    * persistable artifact form (the modelDf convention in micro). */
  def modelMicroDf(m: ModelMicro, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    ((-1, m.intercept6) +: m.coef6.toSeq.zipWithIndex.map(_.swap))
      .toDF("idx", "w6")
  }

  def modelMicroFromDf(df: DataFrame, numFeatures: Int): ModelMicro = {
    val coef = new Array[Long](numFeatures)
    var intercept = 0L
    df.select(col("idx"), col("w6")).collect().foreach { r =>
      val i = r.getInt(0)
      if (i < 0) intercept = r.getLong(1) else coef(i) = r.getLong(1)
    }
    ModelMicro(numFeatures, intercept, coef)
  }

  /** (id, logit_micro, pass) for every doc — integer-exact serving
    * from the micro artifact. Tokenization filters EMPTY tokens (so a
    * double space can never contribute a hash bucket the replaying
    * oracle does not see); counts cast to BIGINT exactly (they are
    * small integers), the dot product and intercept stay integers
    * end-to-end. `pass` is the logit's sign: P ≥ 0.5 ⇔ logit ≥ 0. */
  def scoreLogitMicro(m: ModelMicro, docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val tf = new MlHashingTF().setInputCol("__toks").setOutputCol("__feat")
      .setNumFeatures(m.numFeatures)
    val logit = lit(m.intercept6) + expr(
      "aggregate(zip_with(__fa6, __cf6, (x, w) -> x * w), 0L, (acc, v) -> acc + v)")
    tf.transform(docs.select(col(idCol), col(textCol))
        .withColumn("__toks",
          filter(split(coalesce(col(textCol), lit("")), " "), t => t =!= "")))
      .withColumn("__fa6", vector_to_array(col("__feat")).cast("array<bigint>"))
      .withColumn("__cf6", typedLit(m.coef6.toSeq))
      .withColumn("logit_micro", logit)
      .select(col(idCol), col("logit_micro"),
        (col("logit_micro") >= 0L).as("pass"))
  }
}
