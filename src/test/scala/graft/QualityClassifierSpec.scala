package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, QualityClassifier}
import graft.text.TextAnalysis

/** Learned quality filter: the distilled classifier must recover the
  * weak label on held-out docs, train deterministically, and round-trip
  * through the persisted model form. */
class QualityClassifierSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private lazy val labeled = TextAnalysis
    .quality(docs, "doc_id", "text", keep = Seq("text"))
    .select(col("doc_id"), col("text"),
      (col("quality") >= 0.45).cast("double").as("label"))
    .cache()

  test("distilled classifier recovers the heuristic label on held-out docs") {
    val split = Curation.hashSplit(labeled, "doc_id", trainPct = 80)
    val train = split.where(col("split") === "train")
    val eval = split.where(col("split") === "eval")
    val model = QualityClassifier.train(train, "text", "label")
    val scored = QualityClassifier.score(model, eval, "doc_id", "text")
      .join(eval.select("doc_id", "label"), "doc_id")
    val agg = scored.select(
      count(lit(1)).as("n"),
      sum(when((col("quality_prob") >= 0.5).cast("double") === col("label"), 1L)
        .otherwise(0L)).as("correct")).collect().head
    val acc = agg.getLong(1).toDouble / agg.getLong(0)
    assert(agg.getLong(0) > 50, s"eval split too small: ${agg.getLong(0)}")
    assert(acc >= 0.85, s"held-out accuracy = $acc")
  }

  test("classifier RANKS docs, not just agrees: held-out AUC and decile separation") {
    // accuracy-vs-weak-label can be neared by a constant-ish predictor
    // on a skewed corpus; Mann-Whitney AUC and top/bottom-decile
    // separation prove the learned gate actually ORDERS documents
    val split = Curation.hashSplit(labeled, "doc_id", trainPct = 80)
    val train = split.where(col("split") === "train")
    val eval = split.where(col("split") === "eval")
    val model = QualityClassifier.train(train, "text", "label")
    val scored = QualityClassifier.score(model, eval, "doc_id", "text")
      .join(eval.select("doc_id", "label"), "doc_id")
      .select(col("quality_prob"), col("label"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    assert(pos.length > 20 && neg.length > 20,
      s"degenerate eval split: ${pos.length} pos / ${neg.length} neg")
    // Mann-Whitney AUC via rank-sum (ties get average rank)
    val ranked = scored.map(_._1).sorted.zipWithIndex
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2 + 1.0).sum / g.length }
    val rankSum = pos.map(ranked).sum
    val auc = (rankSum - pos.length * (pos.length + 1.0) / 2.0) /
      (pos.length.toDouble * neg.length)
    assert(auc >= 0.95, s"held-out AUC = $auc")
    // decile separation on the continuous heuristic score: docs the
    // classifier puts in its top decile must be heuristically much
    // better than its bottom decile
    val evalQuality = TextAnalysis.quality(eval, "doc_id", "text")
      .select(col("doc_id"), col("quality"))
    val byProb = QualityClassifier.score(model, eval, "doc_id", "text")
      .join(evalQuality, "doc_id")
      .orderBy(col("quality_prob"), col("doc_id"))
      .select(col("quality")).collect().map(_.getDouble(0))
    val d = byProb.length / 10
    val bottom = byProb.take(d).sum / d
    val top = byProb.takeRight(d).sum / d
    assert(top - bottom >= 0.2,
      s"decile separation: top=$top bottom=$bottom")
  }

  test("training is deterministic: two fits give identical coefficients") {
    val m1 = QualityClassifier.distill(labeled, "text", col("label") === 1.0)
    val m2 = QualityClassifier.distill(labeled, "text", col("label") === 1.0)
    assert(m1.intercept == m2.intercept)
    assert(m1.coef.toSeq == m2.coef.toSeq)
  }

  test("model round-trips through the persisted (idx, w) form; scores unchanged") {
    val model = QualityClassifier.train(labeled, "text", "label")
    val back = QualityClassifier.modelFromDf(
      QualityClassifier.modelDf(model, spark), model.numFeatures)
    assert(back.intercept == model.intercept && back.coef.toSeq == model.coef.toSeq)
    val a = QualityClassifier.score(model, docs.limit(50), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = QualityClassifier.score(back, docs.limit(50), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("client: quality model persists, serves in a fresh client, survives upsert") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-qc").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("d")
    coll.upsert(docs.limit(200).select(col("doc_id").as("id"), col("text")))
    coll.trainQualityModel()
    val probs = coll.scoreQuality().collect()
    assert(probs.length == 200 &&
      probs.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))

    // a later session serves from the stored (idx, w) artifact
    val again = new graft.api.GraftClient(spark, root).database("db").collection("d")
    val kept = again.qualityFilter(0.5)
    assert(kept.count() == probs.count(_.getDouble(1) >= 0.5))

    // mutations do NOT invalidate the model (it is a snapshot, not a
    // row index): scoring covers the new row too
    again.upsert(Seq((999999L, "the quick spark table join")).toDF("id", "text"))
    val after = again.scoreQuality()
    assert(after.count() == 201 &&
      after.where(col("id") === 999999L).count() == 1)
  }

  test("streaming: curatedIngest gates micro-batches on the stored model") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-qc-stream").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("g")
    // seed corpus where the heuristic separates long/stopword docs from
    // one-token junk, then bootstrap the model from it
    val long = "the cat sat on the mat and the dog is here to stay in peace"
    val seed = ((0L until 15L).map(i => (i, long + s" v$i", "web")) ++
      (15L until 30L).map(i => (i, s"x$i", "web")))
      .toDF("doc_id", "text", "source")
    coll.upsert(graft.ops.Curation.curateBatch(seed, "doc_id", "text", "source"))
    coll.trainQualityModel()

    val ckpt = java.nio.file.Files.createTempDirectory("graft-qc-stream-ck").toString
    val in = MemoryStream[(Long, String, String)]
    // no heuristic floor — the LEARNED gate does the filtering
    val q = graft.streaming.Streams.curatedIngest(
      in.toDF().toDF("doc_id", "text", "source"), coll, ckpt,
      minClassifierProb = Some(0.5))
    try {
      val before = coll.count()
      in.addData((100L, long + " fresh arrival", "web"), (101L, "x999", "web"))
      q.processAllAvailable()
      assert(coll.count() == before + 1, "exactly the fluent doc passes the gate")
      assert(coll.df.where(col("text") === (long + " fresh arrival")).count() == 1)
      assert(coll.df.where(col("text") === "x999").count() == 0)
    } finally q.stop()
  }

  test("filterByQuality keeps only rows at or above the probability floor") {
    val model = QualityClassifier.train(labeled, "text", "label")
    val kept = QualityClassifier.filterByQuality(model, docs, "text", 0.5)
    val scores = QualityClassifier.score(model, docs, "doc_id", "text")
    val expected = scores.where(col("quality_prob") >= 0.5).count()
    assert(kept.count() == expected && expected > 0 && expected < docs.count())
  }
}
