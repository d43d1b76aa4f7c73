package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Curation
import graft.sources.Tables
import graft.text.TextAnalysis

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, total, and respects the train fraction") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val split = Curation.hashSplit(docs, "doc_id", trainPct = 90)
    val n = docs.count()
    assert(split.count() == n) // total: every doc gets an assignment
    // deterministic: a second evaluation assigns identically
    val again = Curation.hashSplit(docs, "doc_id", trainPct = 90)
    assert(split.as("a").join(again.as("b"), "doc_id")
      .where(col("a.split") =!= col("b.split")).isEmpty)
    val train = split.where(col("split") === "train").count()
    // md5 spreads uniformly: the train share lands near 90%
    assert(math.abs(train.toDouble / n - 0.9) < 0.1)
    // no shuffle: the plan is scan + project only
    val plan = split.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("sampleByWeights: rate 1 keeps all, rate 0 drops all, rates nest as subsets") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val n = docs.count()
    def kept(rate: Double) = Curation.sampleByWeights(
      docs, "doc_id", "source", Map.empty, defaultWeight = rate)
    assert(kept(1.0).count() == n)
    assert(kept(0.0).count() == 0)
    // monotone: a higher rate keeps a strict superset (stable ablations)
    val half = kept(0.5).select("doc_id")
    val quarter = kept(0.25).select("doc_id")
    assert(quarter.join(half, Seq("doc_id"), "left_anti").isEmpty)
    // the 50% rate lands near half the corpus (md5 spreads uniformly)
    assert(math.abs(half.count().toDouble / n - 0.5) < 0.1)
    // pure projection: no shuffle in the plan
    val plan = kept(0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("temperatureSample flattens head domains toward the tail, never upsamples") {
    import spark.implicits._
    // skewed corpus: domain a 8x domain b -> a keeps ~sqrt(1/8)=35%,
    // b (the smallest) keeps everything
    val docs = ((0L until 1600L).map(i => (i, "a")) ++
      (10000L until 10200L).map(i => (i, "b"))).toDF("doc_id", "source")
    val kept = Curation.temperatureSample(docs, "doc_id", "source")
    val byDomain = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("b") == 200L, s"smallest domain must keep all: $byDomain")
    val aRate = byDomain("a").toDouble / 1600.0
    assert(math.abs(aRate - math.sqrt(200.0 / 1600.0)) < 0.05,
      s"head domain keep rate $aRate should be ~sqrt(1/8)")
    // the filter is a pure projection: no corpus shuffle
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("sampleByWeights applies per-domain rates and does not correlate with hashSplit") {
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
    val mixed = Curation.sampleByWeights(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.0), defaultWeight = 0.5)
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == total("src0"))
    assert(!bySrc.contains("src1"))
    // decorrelated from the split hash: the kept set at rate .5 holds
    // ~50% of BOTH train and eval docs (same-hash sampling would keep
    // exactly the train prefix)
    val splitKept = Curation.hashSplit(
      Curation.sampleByWeights(docs, "doc_id", "source", Map.empty, 0.5),
      "doc_id")
    val evalShare = splitKept.where(col("split") === "eval").count().toDouble /
      splitKept.count()
    assert(evalShare > 0.02 && evalShare < 0.3) // ~10% eval survives sampling
  }

  test("curation op guards: bad weights and budgets are rejected, null domains sample at default") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      Curation.sampleByWeights(docs, "doc_id", "source", Map("a" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Curation.sampleByWeights(docs, "doc_id", "source", Map.empty, defaultWeight = -0.1)
    }
    intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "doc_id", lit(1), budget = 0)
    }
    intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "doc_id", lit(1), budget = 16, nShards = 0)
    }
    // a null domain never matches a listed rate: it samples at default
    val kept = Curation.sampleByWeights(docs, "doc_id", "source",
      Map("a" -> 0.0, "b" -> 0.0), defaultWeight = 1.0)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    val dropped = Curation.sampleByWeights(docs, "doc_id", "source",
      Map("a" -> 1.0, "b" -> 1.0), defaultWeight = 0.0)
    assert(dropped.count() == 2 && dropped.where(col("source").isNull).isEmpty)
  }

  test("repetitionStats: empty and NULL text are one empty token, never negative sizes") {
    import spark.implicits._
    val out = TextAnalysis.repetitionStats(
        Seq((1L, ""), (2L, "w"), (3L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    // split("", " ") yields [""] — one (empty) word, zero repetition;
    // NULL text coalesces to the same shape (size(NULL) would be -1)
    assert(out(0).getInt(1) == 1 && out(0).getDouble(3) == 0.0 &&
      out(0).getDouble(5) == 1.0)
    assert(out(1).getInt(1) == 1 && out(1).getInt(4) == 1)
    assert(out(2).getInt(1) == 1 && out(2).getDouble(3) == 0.0 &&
      out(2).getDouble(5) == 1.0)
  }

  test("packSequences clamps null/negative token counts so offsets never regress") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, null.asInstanceOf[String]), (3L, "c d e"))
      .toDF("doc_id", "text")
    val packed = Curation.packSequences(docs, "doc_id",
        size(split(col("text"), " ")), budget = 16, nShards = 1)
      .orderBy("doc_id").collect()
    // null text -> size = -1 -> clamped to 0: doc 2 occupies no tokens
    // and doc 3's offset is exactly doc 1's length
    assert(packed.map(_.getLong(2)).toSeq == Seq(2L, 0L, 3L))
    val byId = packed.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(byId(3L) == byId(2L) && byId(2L) == 2L)
  }

  test("packSequences: per-shard offsets are a contiguous token stream") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val packed = Curation.packSequences(docs, "doc_id",
      size(split($"text", " ")), budget = 256, nShards = 8)
    assert(packed.count() == docs.count()) // total
    // within each shard, ordered by id, start_tok is the running sum
    val rows = packed.orderBy("shard", "doc_id")
      .select("shard", "tokens", "start_tok", "pack", "pack_off").collect()
    var shard = -1; var cum = 0L
    rows.foreach { r =>
      if (r.getInt(0) != shard) { shard = r.getInt(0); cum = 0L }
      assert(r.getLong(2) == cum, s"offset gap in shard $shard")
      assert(r.getLong(3) == cum / 256)
      assert(r.getLong(4) == cum % 256)
      cum += r.getLong(1)
    }
    // every pack index up to the shard's last is populated by some doc
    // boundary or straddled by a long doc — spot-check density: packs
    // are consecutive integers per shard with no jump > max doc span
    val maxTokens = packed.agg(max("tokens")).head().getLong(0)
    val packs = packed.groupBy("shard").agg(max("pack").as("mx"),
      countDistinct("pack").as("nd")).collect()
    packs.foreach { r => // row = (shard, mx, nd)
      assert(r.getLong(2) >= (r.getLong(1) + 1) / (maxTokens / 256 + 1),
        "pack ids must cover the shard stream")
    }
  }

  test("packSequences is content-addressed: a re-sharded frame packs identically") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val a = Curation.packSequences(docs, "doc_id",
      size(split($"text", " ")), budget = 128, nShards = 4)
    val b = Curation.packSequences(docs.repartition(13).orderBy(rand(7)), "doc_id",
      size(split($"text", " ")), budget = 128, nShards = 4)
    assert(a.as("a").join(b.as("b"), "doc_id")
      .where(col("a.pack") =!= col("b.pack") ||
        col("a.start_tok") =!= col("b.start_tok")).isEmpty)
  }

  test("topQuantileByGroupApprox agrees with exact except at the boundary score, no Window") {
    val scored = TextAnalysis.quality(
        Tables.documents(spark, sf), "doc_id", "text", keep = Seq("lang"))
      .select("doc_id", "lang", "quality")
    val exact = Curation.topQuantileByGroup(scored, "lang", "quality", q = 0.75)
      .select("doc_id", "lang", "quality")
    val approx = Curation.topQuantileByGroupApprox(scored, "lang", "quality", q = 0.75)
      .select("doc_id", "lang", "quality")
    // at accuracy 10000 on small groups the sketch is exact, so any
    // disagreement is the boundary-value semantics difference only:
    // every disagreeing row carries its group's single boundary score
    val diff = exact.unionAll(approx)
      .groupBy("doc_id", "lang", "quality").count()
      .where(col("count") === 1)
    val perGroup = diff.groupBy("lang")
      .agg(countDistinct("quality").as("nv")).collect()
    perGroup.foreach(r => assert(r.getLong(1) <= 1,
      s"disagreements in ${r.getString(0)} must share one boundary score"))
    // both keep roughly the top quarter
    val n = scored.count().toDouble
    assert(math.abs(approx.count() / n - 0.25) < 0.15)
    // the sketch path has no Window over the corpus
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("writePacked materializes shard dirs whose contents equal the pack assignment") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-packed").toString
    Curation.writePacked(docs, "doc_id", "text", out, budget = 256, nShards = 8)
    val written = spark.read.parquet(out)
    val direct = Curation.packSequences(docs, "doc_id",
      size(split(col("text"), " ")), budget = 256, nShards = 8)
    // every doc lands in its assigned shard dir with its pack metadata
    assert(written.count() == direct.count())
    assert(written.as("w").join(direct.as("d"), "doc_id")
      .where(col("w.shard") =!= col("d.shard") ||
        col("w.pack") =!= col("d.pack") ||
        col("w.start_tok") =!= col("d.start_tok")).isEmpty)
    // the payload rides along, and shard is a partition DIRECTORY
    assert(written.columns.contains("text"))
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("shard=")))
    // within one shard file, rows are stored in pack (= id) order
    val aFile = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
      .head.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ids = spark.read.parquet(aFile.toString).select("doc_id").as[Long].collect()
    assert(ids.sameElements(ids.sorted))
  }

  test("buildTrainingSet: gates compose and duplicate content collapses to the lowest id") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
    val out = Curation.buildTrainingSet(docs, "doc_id", "text", "source",
      weights = Map("src4" -> 0.0), minQuality = 0.45, budget = 256, nShards = 8)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.nonEmpty)
    // sampled-out domain and eval-split docs never reach packing
    val src4 = docs.where(col("source") === "src4")
      .select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(src4).isEmpty)
    val evals = Curation.hashSplit(docs.select("doc_id"), "doc_id")
      .where(col("split") === "eval").select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(evals).isEmpty)
    // a duplicate of a surviving doc's TEXT under a fresh train-split id
    // collapses: the twin id is absent, the original id stays
    val origId = ids.min
    val origText = docs.where(col("doc_id") === origId).head().getString(1)
    val twinId = Curation.hashSplit(
        spark.range(99990000L, 99999999L).toDF("doc_id"), "doc_id")
      .where(col("split") === "train").select("doc_id").as[Long].head()
    val withTwin = docs.unionAll(
      Seq((twinId, origText, "src9")).toDF("doc_id", "text", "source"))
    val out2 = Curation.buildTrainingSet(withTwin, "doc_id", "text", "source",
      minQuality = 0.45, budget = 256, nShards = 8)
    val ids2 = out2.select("doc_id").as[Long].collect().toSet
    assert(!ids2.contains(twinId) && ids2.contains(origId))
  }

  test("buildTrainingSet near-dup stage keeps one representative per cluster") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
    val base = Curation.buildTrainingSet(docs, "doc_id", "text", "source",
      minQuality = 0.45, budget = 256, nShards = 8)
    val baseIds = base.select("doc_id").as[Long].collect().toSet
    // near-dup the two lowest surviving ids to each other: exactly one
    // of them must survive the collapse, everything else is untouched
    val sortedIds = baseIds.toSeq.sorted
    val (a, b) = (sortedIds(0), sortedIds(1))
    val pairs = Seq((a, b)).toDF("id_a", "id_b")
    val out = Curation.buildTrainingSet(docs, "doc_id", "text", "source",
      minQuality = 0.45, budget = 256, nShards = 8, nearDupPairs = Some(pairs))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert((baseIds -- ids).size == 1 && (baseIds -- ids).subsetOf(Set(a, b)))
    assert((ids -- baseIds).isEmpty)
  }

  test("corpusStats matches hand-computed per-domain counts") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x y x", "web"),     // 3 tokens, 5 chars
      ("b", "x y x", "web"),     // duplicate content
      ("c", "z  w", "web"),      // double space: 3 raw tokens incl "", 4 chars
      ("d", "p q r s", "book"),  // 4 tokens, 7 chars
      ("e", null, "nullsrc")     // pathological domain: must still report
    ).toDF("doc_id", "text", "source")
    val out = graft.ops.Curation.corpusStats(docs, "text", "source")
      .orderBy("domain").collect()
    val book = out(0); val nullsrc = out(1); val web = out(2)
    assert(web.getAs[Long]("n_docs") == 3 && web.getAs[Long]("distinct_texts") == 2)
    // token volume follows the raw split convention (q_token_count):
    // "z  w" is 3 tokens; the VOCABULARY excludes the empty token
    assert(web.getAs[Long]("total_tokens") == 9 && web.getAs[Long]("total_chars") == 14)
    assert(web.getAs[Long]("distinct_tokens") == 4) // x y z w, no ""
    assert(web.getAs[Double]("avg_doc_tokens") == 9.0 / 3)
    assert(book.getAs[Long]("n_docs") == 1 && book.getAs[Long]("distinct_tokens") == 4)
    // an all-null-text domain is reported, not dropped: doc count real,
    // vocabulary 0, volumes NULL (sum-skipped, never size(null) = -1)
    assert(nullsrc.getAs[Long]("n_docs") == 1)
    assert(nullsrc.getAs[Long]("distinct_texts") == 0)
    assert(nullsrc.getAs[Long]("distinct_tokens") == 0)
    assert(nullsrc.isNullAt(nullsrc.fieldIndex("total_tokens")))

    // the HLL++ scale path returns the exact value on tiny vocabularies
    val approx = graft.ops.Curation.corpusStats(docs, "text", "source",
      approxVocabulary = true).orderBy("domain").collect()
    assert(approx(2).getAs[Long]("distinct_tokens") == 4)
  }

  test("repetitionStats matches hand-computed duplicate and top-word fractions") {
    val docs = Seq(
      (1L, "a b a c a"),     // 5 words, 3 distinct, top 'a' ×3
      (2L, "x y z"),         // no repetition
      (3L, "q q q q")        // all one word
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 5 && out(0).getInt(2) == 3)
    assert(out(0).getDouble(3) == 2.0 / 5 && out(0).getInt(4) == 3)
    assert(out(0).getDouble(5) == 3.0 / 5)
    assert(out(1).getDouble(3) == 0.0 && out(1).getInt(4) == 1)
    assert(out(2).getDouble(3) == 0.75 && out(2).getDouble(5) == 1.0)
    // zero-shuffle projection
    val plan = TextAnalysis.repetitionStats(
      Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("hashSplit assignment is content-addressed, not positional") {
    // the same id must land in the same bucket regardless of which
    // frame it arrives in (re-shard safety)
    val a = Curation.hashSplit(Seq(7L, 8L, 9L).toDF("doc_id"), "doc_id")
    val b = Curation.hashSplit(Seq(9L, 7L).toDF("doc_id"), "doc_id")
    val joined = a.select(col("doc_id"), col("bucket").as("ba"))
      .join(b.select(col("doc_id"), col("bucket").as("bb")), "doc_id")
    assert(joined.where(col("ba") =!= col("bb")).isEmpty)
    assert(joined.count() == 2)
  }

  test("topQuantileByGroup matches the window percent_rank definition") {
    val scored = TextAnalysis.quality(
      Tables.documents(spark, sf), "doc_id", "text", keep = Seq("lang"))
      .select("doc_id", "lang", "quality")
    val got = Curation.topQuantileByGroup(scored, "lang", "quality", q = 0.75)
      .select("doc_id").as[Long].collect().toSet
    // oracle-by-definition: percent_rank window over the raw docs
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("quality")
    val want = scored.withColumn("pr", percent_rank().over(w))
      .where(col("pr") >= 0.75).select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("topQuantileByGroup: all-tied group keeps nothing (pr = 0 for all)") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0),
                 ("b", 4L, 1.0), ("b", 5L, 2.0)).toDF("g", "id", "s")
    val kept = Curation.topQuantileByGroup(df, "g", "s", q = 0.75)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(5L)) // b: pr(2.0) = 1.0 >= 0.75; a: all pr = 0
  }

  test("topQuantileByGroup: NULL group keys form their own partition") {
    // SQL percent_rank partitions nulls together; a plain equi-join
    // would silently drop every null-keyed doc
    val df = Seq((Some("a"), 1L, 1.0), (Some("a"), 2L, 2.0),
                 (None, 3L, 1.0), (None, 4L, 2.0), (None, 5L, 3.0))
      .toDF("g", "id", "s")
    val kept = Curation.topQuantileByGroup(df, "g", "s", q = 0.75)
      .select("id").as[Long].collect().toSet
    // a: pr(2.0)=1.0 -> keep 2; null group: pr(3.0)=1.0 -> keep 5
    assert(kept == Set(2L, 5L))
  }

  test("topQuantileByGroup: single-row group has pr 0 and is dropped") {
    val df = Seq(("a", 1L, 9.0), ("b", 2L, 1.0), ("b", 3L, 2.0)).toDF("g", "id", "s")
    val kept = Curation.topQuantileByGroup(df, "g", "s", q = 0.75)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("contamination: eval docs sharing train grams are flagged, clean docs are not") {
    // ids chosen so the md5 split puts them where the test needs them:
    // verify split membership first, then assert on overlap
    val docs = Tables.documents(spark, sf).limit(200)
    val out = Curation.contamination(docs, "doc_id", "text").collect()
    val split = Curation.hashSplit(docs.select("doc_id"), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every flagged doc is in the eval split with a sane share
    out.foreach { r =>
      assert(split(r.getLong(0)) == "eval")
      val share = r.getDouble(3)
      assert(share > 0.0 && share <= 1.0)
      assert(r.getLong(2) <= r.getLong(1)) // n_shared <= n_grams
    }
    assert(out.nonEmpty)
    // a synthetic doc with nonsense grams, in an id VERIFIED to land in
    // the eval split: present in the probe's input, absent from its
    // output (clean eval docs must not be flagged)
    val evalId = Curation.hashSplit(
        spark.range(1000000L, 1001000L).toDF("doc_id"), "doc_id")
      .where(col("split") === "eval").select("doc_id").as[Long].collect()
      .find(i => !split.contains(i)).get
    val withClean = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((evalId, "zzq qqx xqz zqx qzx xzq")).toDF("doc_id", "text"))
    val out2 = Curation.contamination(withClean, "doc_id", "text").collect()
    assert(!out2.exists(_.getLong(0) == evalId),
      "a clean eval doc must not be flagged as contaminated")
    // and a twin whose text copies a TRAIN doc must be flagged
    val trainText = docs.select(col("doc_id"), col("text")).collect()
      .find(r => split(r.getLong(0)) == "train").get.getString(1)
    val withDirty = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((evalId, trainText)).toDF("doc_id", "text"))
    val out3 = Curation.contamination(withDirty, "doc_id", "text").collect()
    assert(out3.exists(r => r.getLong(0) == evalId && r.getDouble(3) == 1.0),
      "an eval doc copying a train doc must be flagged with share 1.0")
  }

  test("minhashVerified equals the exact posting self-join at exhaustive bands") {
    val docs = Tables.documents(spark, sf)
    val ng = Dedup.ngrams(docs, "doc_id", "text", 3).cache()
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text").cache()
    val got = Dedup.minhashVerified(sig, ng, numPerms = 32, bands = 32, threshold = 0.5)
      .select("id_a", "id_b", "inter", "jaccard").collect().toSeq
    val want = Dedup.ngramJaccardFromPostings(ng, threshold = 0.5)
      .select("id_a", "id_b", "inter", "jaccard").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("shuffleShards: dense positions per shard, deterministic, salt reshuffles") {
    import spark.implicits._
    val docs = (1L to 200L).toDF("doc_id")
    val out = graft.ops.Curation.shuffleShards(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").cache()
    assert(out.count() == 200)
    // positions are dense 0..n_shard-1 within every shard
    val byShard = out.groupBy("shard")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("pos").as("mx"),
        org.apache.spark.sql.functions.min("pos").as("mn"))
      .collect()
    assert(byShard.length == 4)
    byShard.foreach { r =>
      assert(r.getInt(2) == r.getLong(1).toInt - 1 && r.getInt(3) == 0,
        s"shard ${r.getInt(0)} positions not dense") }
    // deterministic across runs; a different salt permutes
    val again = graft.ops.Curation.shuffleShards(docs, "doc_id", nShards = 4)
      .select("doc_id", "shard", "pos").collect().toSet
    assert(again == out.collect().toSet)
    val other = graft.ops.Curation.shuffleShards(docs, "doc_id", nShards = 4,
      salt = "v2").select("doc_id", "shard", "pos").collect().toSet
    assert(other != again, "changing the salt must reshuffle")
    out.unpersist()
  }

  test("lengthBatches: batches respect size and share a length band") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, ("w " * (i % 60 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val out = graft.ops.Curation.lengthBatches(docs, "doc_id", "text",
      batchSize = 8, bandTokens = 16, nShards = 2).cache()
    // no batch exceeds batchSize, and every batch is homogeneous in bucket
    val sizes = out.groupBy("bucket", "shard", "batch_id").count().collect()
    assert(sizes.forall(_.getLong(3) <= 8), "a batch exceeded batchSize")
    // bucket = ws_tokens div 16 everywhere
    assert(out.where(col("bucket") =!= (col("ws_tokens") / 16).cast("int")).isEmpty)
    // within a (bucket, shard) group, batch ids are dense from 0
    val dense = out.groupBy("bucket", "shard")
      .agg(org.apache.spark.sql.functions.countDistinct("batch_id").as("nb"),
        org.apache.spark.sql.functions.max("batch_id").as("mx"))
      .collect()
    dense.foreach(r => assert(r.getLong(2) == r.getInt(3) + 1L))
    out.unpersist()
  }

  test("scrubPii redacts emails, IPs, phone runs with matching counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to alice.smith+x@corp.example.org today"),
      (2L, "server at 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call 555-123-4567 or 555 1234 5678 now"),
      (4L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = graft.text.TextAnalysis.scrubPii(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "write to <EMAIL> today")
    assert(out(0).getInt(2) == 1 && out(0).getInt(3) == 0)
    assert(out(1).getString(1) == "server at <IP> and <IP> up")
    assert(out(1).getInt(3) == 2)
    assert(out(2).getString(1) == "call <PHONE> or <PHONE> now")
    assert(out(2).getInt(4) == 2)
    assert(out(3).getString(1) == "nothing sensitive here at all")
    assert(out(3).getInt(2) == 0 && out(3).getInt(3) == 0 && out(3).getInt(4) == 0)
  }

  test("curateBatch scrubPii keys content by the CLEAN text") {
    import spark.implicits._
    // two arrivals identical up to a rotated email: scrubbing BEFORE
    // content keying makes them byte-identical, so exact content dedup
    // collapses them (the reason the scrub must precede the md5 key)
    val docs = Seq(
      (1L, "the same body text here contact a@x.example.org and more words", "src0"),
      (2L, "the same body text here contact b@y.example.net and more words", "src0")
    ).toDF("doc_id", "text", "source")
    val out = Curation.curateBatch(docs, "doc_id", "text", "source",
      scrubPii = true).collect()
    assert(out.length == 1, s"rotated emails must collapse: ${out.toSeq}")
    assert(out.head.getAs[String]("text").contains("<EMAIL>"))
    assert(out.head.getAs[Long]("src_id") == 1L) // lowest source id wins
    // without the scrub they stay distinct documents
    assert(Curation.curateBatch(docs, "doc_id", "text", "source").count() == 2)
  }

  test("encodingNoise counts control and replacement characters, spares tab/newline") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text here"),
      (2L, "bad\u0007mid\u0001end"),
      (3L, "repl \ufffd\ufffd here"),
      (4L, "tabs\tand\nnewlines are fine")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.encodingNoise(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getInt(1) == 0 && out(0).getInt(2) == 0 &&
      out(0).getDouble(4) == 0.0)
    assert(out(1).getInt(1) == 2 && out(1).getInt(2) == 0)
    assert(out(2).getInt(1) == 0 && out(2).getInt(2) == 2)
    assert(out(3).getInt(1) == 0, "tab/newline must not count as noise")
    assert(out(1).getDouble(4) > 0 && out(1).getDouble(4) < 1)
  }

  test("minhashVerified candidates are bounded by banded collisions") {
    // selective banding (r=8) prunes: candidate count well below the
    // full pair-join population, and the verified output is a subset of
    // the exact answer (never a superset with false positives)
    val docs = Tables.documents(spark, sf)
    val ng = Dedup.ngrams(docs, "doc_id", "text", 3).cache()
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text").cache()
    val selective = Dedup.minhashVerified(sig, ng, numPerms = 32, bands = 4,
      threshold = 0.5).select("id_a", "id_b").collect().toSet
    val exact = Dedup.ngramJaccardFromPostings(ng, threshold = 0.5)
      .select("id_a", "id_b").collect().toSet
    assert(selective.subsetOf(exact))
  }

  test("concatChunks: slices tile every doc, every non-final block is exactly full") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(3 + (i % 17).toInt)("w" + i).mkString(" "))).toDF("doc_id", "text")
    val ctx = 16
    val out = graft.ops.Curation.concatChunks(docs, "doc_id", "text",
      ctxTokens = ctx, nShards = 4).cache()
    // tiling: per doc, slices sum to n_tokens + 1 (the EOD separator)
    val perDoc = out.groupBy("doc_id").agg(sum("slice_len").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0L until 60L)
      assert(perDoc(i) === 3 + (i % 17) + 1, s"doc $i must tile exactly")
    // fullness: within each shard every block except the last holds ctx
    val blocks = out.groupBy("shard", "block_id")
      .agg(sum("slice_len").as("s")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lastBlock = blocks.keys.groupBy(_._1)
      .map { case (sh, ks) => sh -> ks.map(_._2).max }
    for (((sh, b), s) <- blocks)
      if (b != lastBlock(sh)) assert(s === ctx.toLong,
        s"shard $sh block $b must be exactly full, got $s")
      else assert(s <= ctx.toLong)
    // a doc longer than ctx spans multiple blocks with contiguous slices
    val spans = out.where(col("doc_id") === 16L) // 3 + 16 tokens + EOD = 20 > 16
      .orderBy("block_id")
      .select("slice_start", "slice_len").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(spans.length >= 2)
    assert(spans.head._1 === 0L)
    for (Seq((s0, l0), (s1, _)) <- spans.toSeq.sliding(2))
      assert(s1 === s0 + l0, "slices must be contiguous in doc coordinates")
    // content-addressed determinism
    val again = graft.ops.Curation.concatChunks(docs.orderBy(rand(7)),
        "doc_id", "text", ctxTokens = ctx, nShards = 4)
      .collect().toSet
    assert(again === out.collect().toSet)
    out.unpersist()
  }

  test("lengthQuantiles: exact integer-rank quantiles, per-domain independence") {
    // domain a: lengths 1..10 (one doc each) — p50 = 5 (cum 5·100 >= 10·50),
    // p90 = 9, p99 = 10; domain b: all docs length 7
    val docs = ((1 to 10).map(i => (s"a$i", ("w " * i).trim, "a")) ++
      (1 to 4).map(i => (s"b$i", "x x x x x x x", "b")))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.Curation.lengthQuantiles(docs, "text", "source")
      .orderBy("domain").collect()
    val a = out(0); val b = out(1)
    assert(a.getString(0) == "a" && a.getLong(1) == 10)
    assert((a.getInt(2), a.getInt(3), a.getInt(4)) == ((5, 9, 10)), s"a: $a")
    assert((a.getInt(5), a.getInt(6)) == ((1, 10)))
    assert(a.getLong(7) == 55L)
    assert(b.getString(0) == "b" && b.getLong(1) == 4)
    assert((b.getInt(2), b.getInt(3), b.getInt(4)) == ((7, 7, 7)))
    assert(b.getLong(7) == 28L)
    // percentile bounds guard
    assertThrows[IllegalArgumentException] {
      graft.ops.Curation.lengthQuantiles(docs, "text", "source", Seq(0))
    }
  }
}

/** Winnowing fingerprints (Schleimer et al. 2003): the detection
  * guarantee (any >= w+k-1-token verbatim match shares a
  * fingerprint at ANY alignment), the density bound, selection
  * determinism, and the short-document degenerate. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.TextAnalysis

  test("any w+k-1-token verbatim match shares a fingerprint at every alignment") {
    val k = 4; val w = 4
    val passage = (1 to (w + k - 1)).map(i => s"p$i").mkString(" ") // 7 tokens
    // the passage embedded at different offsets inside different noise
    val docs = (0 to 5).map { off =>
      val pre = (1 to off).map(i => s"n${off}x$i").mkString(" ")
      val post = (1 to 3).map(i => s"m${off}y$i").mkString(" ")
      (off.toLong, Seq(pre, passage, post).filter(_.nonEmpty).mkString(" "))
    }.toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k, w)
      .select("doc_id", "fingerprint").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // pairwise: every pair of docs shares at least one fingerprint
    // (they share the 7-token passage => 4 shared grams => one full
    // window of shared hashes => the same minimum selected)
    for (a <- 0L to 5L; b <- (a + 1) to 5L)
      assert((fp(a) intersect fp(b)).nonEmpty,
        s"docs $a and $b embed the same passage but share no fingerprint")
  }

  test("density <= 2/(w+1) on random text; selections are deterministic") {
    val rnd = new scala.util.Random(61)
    val text = (1 to 400).map(_ => s"t${rnd.nextInt(5000)}").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val sel = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
    val n = sel.count()
    // positions available: 400 - 3 grams; expected density 2/(w+1) = 0.4
    assert(n <= (397 * 0.5).toInt, s"selected $n of 397 — density too high")
    assert(n >= (397 / 8), s"selected $n of 397 — implausibly sparse")
    val again = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
    assert(sel.collect().toSet == again.collect().toSet)
  }

  test("documents shorter than w+k-1 tokens emit nothing; empty text too") {
    val docs = Seq((1L, "a b c d e f"), (2L, ""), (3L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
    assert(out.where(col("doc_id") === 1L).count() == 0, "6 < 7 tokens")
    assert(out.where(col("doc_id") === 2L).count() == 0)
    assert(out.where(col("doc_id") === 3L).count() == 1, "exactly one window")
  }

  test("winnowMatches surfaces passage-sharing pairs; maxDf prunes boilerplate support") {
    val rnd = new scala.util.Random(67)
    def noise(n: Int) = (1 to n).map(_ => s"z${rnd.nextInt(100000)}").mkString(" ")
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val header = (1 to 12).map(i => s"h$i").mkString(" ")
    // docs 1,2 share a long unique passage; EVERY doc carries the
    // corpus-wide header
    val docs = Seq(
      (1L, s"$header ${noise(10)} $passage"),
      (2L, s"$header $passage ${noise(10)}"),
      (3L, s"$header ${noise(20)}"),
      (4L, s"$header ${noise(20)}")).toDF("doc_id", "text")
    val m = TextAnalysis.winnowMatches(docs, "doc_id", "text",
      minShared = 2, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m.contains((1L, 2L)), "the passage-sharing pair must surface")
    // with maxDf=3 the header's fingerprints (df=4) are pruned, so the
    // noise-only docs — whose ONLY common content is the header —
    // must not pair with anything
    assert(!m.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      s"header-only overlap must be pruned, got $m")
  }
}
