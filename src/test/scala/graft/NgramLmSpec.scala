package graft

import org.apache.spark.sql.functions._

import graft.text.NgramLm

/** The bigram LM behind q_lm_perplexity: interpolated absolute
  * discounting with an add-one unigram backoff and a single shared
  * OOV bucket. The tests pin the three properties the oracle equality
  * alone can't see: the model is a PROPER distribution (sums to 1
  * over vocab + OOV for every kind of context), the backoff paths
  * fire on genuinely unseen material, and the score orders fluent
  * before disfluent text.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("p(.|v) is a proper distribution: seen-vocab mass + OOV mass sums to 1") {
    val m = NgramLm.train(
      docs(0L -> "a b a c", 1L -> "b a b b", 2L -> "c a"), "doc_id", "text")
    val Seq(t, v) = m.totals.collect().head.toSeq.map(_.toString.toLong)
    val uni = m.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = uni.keySet
    def pUni(w: String): Double =
      (uni.getOrElse(w, 0L) + 1.0) / (t + v + 1.0)
    val bg = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctx = m.contexts.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (c <- vocab + "<s>") {
      val p: String => Double = ctx.get(c) match {
        case Some((cv, n1p)) => w =>
          math.max(bg.getOrElse((c, w), 0L) - NgramLm.Discount, 0.0) / cv +
            (NgramLm.Discount * n1p / cv) * pUni(w)
        case None => pUni  // context never seen (e.g. 'c' if sentence-final only)
      }
      // Σ_{w seen} p(w|c) + p(OOV|c); the OOV bucket's unigram mass is
      // 1/(T+V+1) and the bigram numerator is always 0 for it
      val total = vocab.toSeq.map(p).sum + p("__OOV__")
      assert(math.abs(total - 1.0) < 1e-9, s"context '$c' sums to $total")
    }
  }

  test("Kneser–Ney: p_KN(.|v) is proper and the continuation backoff inverts raw frequency") {
    // the KN motivation corpus: 'francisco' is FREQUENT (10 tokens)
    // but completes exactly ONE context ('san'); 'cat' is rare (2
    // tokens) but completes TWO contexts ('the', 'a')
    val corpus = docs(
      0L -> Seq.fill(10)("san francisco").mkString(" "),
      1L -> "the cat a cat the dog a dog")
    val m = NgramLm.train(corpus, "doc_id", "text")
    val bg = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctx = m.contexts.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val n1pw = bg.keySet.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val btypes = bg.size.toLong
    val wtypes = n1pw.size.toLong
    def pCont(w: String): Double =
      (n1pw.getOrElse(w, 0L) + 1.0) / (btypes + wtypes + 1.0)
    def pKn(w: String, c: String): Double = ctx.get(c) match {
      case Some((cv, n1p)) =>
        math.max(bg.getOrElse((c, w), 0L) - NgramLm.Discount, 0.0) / cv +
          (NgramLm.Discount * n1p / cv) * pCont(w)
      case None => pCont(w)
    }
    // proper for every context kind (seen + the never-seen 'zzz')
    val vocab = n1pw.keySet
    for (c <- vocab + "<s>" + "zzz") {
      val total = vocab.toSeq.map(pKn(_, c)).sum + pKn("__OOV__", c)
      assert(math.abs(total - 1.0) < 1e-9, s"context '$c' sums to $total")
    }
    // the signature inversion on an UNSEEN context: raw-frequency
    // backoff (score) ranks francisco (c_w=10) over cat (c_w=2);
    // continuation backoff (scoreKn) must invert — cat completes more
    // contexts
    assert(pCont("cat") > pCont("francisco"))
    val probe = docs(10L -> "zzz cat", 11L -> "zzz francisco")
    val kn = NgramLm.scoreKn(probe, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val abs = NgramLm.score(probe, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(kn(10L) < kn(11L),
      s"KN must score the many-context word as more likely: $kn")
    assert(abs(11L) < abs(10L),
      s"raw-frequency backoff favors the frequent word: $abs")
  }

  test("held-out backoff paths fire: unseen bigram, unseen context, unseen word") {
    val m = NgramLm.train(docs(0L -> "a b a b", 1L -> "b c"), "doc_id", "text")
    // "c a": context 'c' IS seen (c->sentence-end never counted; c
    // appears only as final token, so 'c' is an UNSEEN context and the
    // pair scores at pure unigram backoff); "z" is an unseen WORD
    val s = NgramLm.score(
        docs(10L -> "a b", 11L -> "c a", 12L -> "z z"), "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // seen bigram "a b" must be the most probable; unseen word pairs
    // the least — nll strictly orders them
    assert(s(10L) < s(11L), s"seen-bigram doc must beat unigram-backoff doc: $s")
    assert(s(11L) < s(12L), s"in-vocab doc must beat OOV doc: $s")
  }

  test("fluent in-distribution text scores below scrambled text on the testdata corpus") {
    val corpus = graft.sources.Tables.documents(spark, sf)
    val m = NgramLm.train(corpus.where(pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text")
    // candidates: held-out docs as-is vs the same docs with tokens
    // REVERSED (same unigram content, destroyed bigram structure) —
    // the LM must prefer the original on average
    val held = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
      .where(col("doc_id") < 200)
    val orig = NgramLm.score(held, "doc_id", "text", m)
      .agg(avg("nll")).collect().head.getDouble(0)
    val rev = NgramLm.score(
        held.select(col("doc_id"), expr(
          "array_join(reverse(filter(split(text, ' '), x -> x <> '')), ' ')")
          .as("text")),
        "doc_id", "text", m)
      .agg(avg("nll")).collect().head.getDouble(0)
    assert(orig < rev, s"original nll $orig must beat reversed $rev")
  }

  test("order-3: p(.|u,v) is a proper distribution for seen, unseen and start contexts") {
    val m = NgramLm.train3(
      docs(0L -> "a b a c", 1L -> "b a b b", 2L -> "c a"), "doc_id", "text")
    val Seq(t, v) = m.bigram.totals.collect().head.toSeq.map(_.toString.toLong)
    val uni = m.bigram.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = uni.keySet
    def pUni(w: String) = (uni.getOrElse(w, 0L) + 1.0) / (t + v + 1.0)
    val bg = m.bigram.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ctx = m.bigram.contexts.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def p2(c: String): String => Double = ctx.get(c) match {
      case Some((cv, n1p)) => w =>
        math.max(bg.getOrElse((c, w), 0L) - NgramLm.Discount, 0.0) / cv +
          (NgramLm.Discount * n1p / cv) * pUni(w)
      case None => pUni
    }
    val tg = m.trigrams.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    val bc = m.bicontexts.collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // every kind of (u, v): double-start, start+word, seen word pair,
    // unseen word pair (falls through to p2)
    for (uv <- Seq(("<s>", "<s>"), ("<s>", "a"), ("b", "a"), ("zz", "qq"))) {
      val p3: String => Double = bc.get(uv) match {
        case Some((cuv, n1p3)) => w =>
          math.max(tg.getOrElse((uv._1, uv._2, w), 0L) - NgramLm.Discount, 0.0) / cuv +
            (NgramLm.Discount * n1p3 / cuv) * p2(uv._2)(w)
        case None => p2(uv._2)
      }
      val total = vocab.toSeq.map(p3).sum + p3("__OOV__")
      assert(math.abs(total - 1.0) < 1e-9, s"context $uv sums to $total")
    }
  }

  test("the trigram table's (v,w) marginal IS the bigram model (sufficient statistic)") {
    val corpus = graft.sources.Tables.documents(spark, sf)
    val train = corpus.where(pmod(col("doc_id"), lit(2)) === 0)
    val held = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
      .where(col("doc_id") < 100)
    val viaTri = NgramLm.score(held, "doc_id", "text",
        NgramLm.train3(train, "doc_id", "text").bigram)
      .orderBy("doc_id").collect().toSeq
    val direct = NgramLm.score(held, "doc_id", "text",
        NgramLm.train(train, "doc_id", "text"))
      .orderBy("doc_id").collect().toSeq
    assert(viaTri == direct,
      "double-<s> padding must make the marginal land exactly on the order-2 convention")
  }

  test("order-3 separates what order-2 provably cannot") {
    // bigram-symmetric corpus: after 'b', c and d are equally likely
    // and every other count is mirrored — the order-2 scores of
    // 'a b c' and 'a b d' are IDENTICAL. The trigram (a,b,c) is seen
    // while (a,b,d) is not, so only the order-3 chain separates them.
    val train = docs(0L -> "a b c", 1L -> "x b d")
    val m2 = NgramLm.train(train, "doc_id", "text")
    val m3 = NgramLm.train3(train, "doc_id", "text")
    val cand = docs(10L -> "a b c", 11L -> "a b d")
    val s2 = NgramLm.score(cand, "doc_id", "text", m2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val s3 = NgramLm.score3(cand, "doc_id", "text", m3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s2(10L) == s2(11L), s"order-2 must tie the symmetric pair: $s2")
    assert(s3(10L) < s3(11L), s"order-3 must prefer the seen trigram: $s3")
  }

  test("collection round-trip at order 3: the stored order picks the chain") {
    val root = java.nio.file.Files.createTempDirectory("graft-lm3").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("trusted")
    coll.upsert(Seq((0L, "a b c"), (1L, "x b d")).toDF("id", "text"))
    coll.trainLmModel(order = 3)
    val again = new graft.api.GraftClient(spark, root)
      .database("db").collection("trusted")
    val served = again.scoreLmOf(
        Seq((10L, "a b c"), (11L, "a b d")).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val direct = NgramLm.score3(
        Seq((10L, "a b c"), (11L, "a b d")).toDF("id", "text"), "id", "text",
        NgramLm.train3(Seq((0L, "a b c"), (1L, "x b d")).toDF("id", "text"),
          "id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(served == direct, "stored order-3 counts must serve the order-3 chain")
    assert(served(10L) < served(11L))
  }

  test("fromBigrams rebuilds the identical model from the bigram sufficient statistic") {
    val corpus = graft.sources.Tables.documents(spark, sf)
    val m = NgramLm.train(corpus.where(pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text")
    val held = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
      .where(col("doc_id") < 100)
    val a = NgramLm.score(held, "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    val b = NgramLm.score(held, "doc_id", "text",
        NgramLm.fromBigrams(m.bigrams))
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "derived unigram/context/total tables must reproduce every score")
  }

  test("collection LM round-trip: trainLmModel persists, a later session gates on it") {
    val root = java.nio.file.Files.createTempDirectory("graft-lm").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("trusted")
    val fluent = "the cat sat on the mat and the dog is here to stay in peace"
    coll.upsert((0L until 20L).map(i => (i, fluent + s" v$i")).toDF("id", "text"))
    coll.trainLmModel()

    // a later session serves from the stored bigram table alone
    val again = new graft.api.GraftClient(spark, root)
      .database("db").collection("trusted")
    val scores = again.scoreLmOf(
      Seq((100L, fluent), (101L, "zq wv xk jj qqq"), (102L, "   "))
        .toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores.contains(100L) && scores.contains(101L) && !scores.contains(102L),
      "token-less docs are unscoreable")
    assert(scores(100L) < scores(101L), "in-distribution text must score lower")
    val ceil = (scores(100L) + scores(101L)) / 2
    val gated = again.lmGateOf(
      Seq((100L, fluent), (101L, "zq wv xk jj qqq"), (102L, "   "))
        .toDF("id", "text"), "id", "text", ceil)
    assert(gated.collect().map(_.getLong(0)).toSet == Set(100L),
      "the gate keeps the fluent row, drops junk AND token-less rows")
    // lmFilter over the stored docs themselves: everything the LM was
    // trained on is in-distribution at this ceiling
    assert(again.lmFilter(ceil).count() == 20)

    // Kneser–Ney serves from the SAME stored counts (no new artifact):
    // byte-equal to a direct scoreKn over the rebuilt model
    val probe = Seq((100L, fluent), (101L, "zq wv xk jj qqq")).toDF("id", "text")
    val knServed = again.scoreLmOf(probe, "id", "text", smoothing = "kn")
      .orderBy("id").collect().toSeq
    val storedCounts = new graft.api.GraftClient(spark, root)
      .database("db").collection("trusted__lm_bigrams").df
    val knDirect = graft.text.NgramLm.scoreKn(probe, "id", "text",
        graft.text.NgramLm.fromBigrams(storedCounts))
      .orderBy("id").collect().toSeq
    assert(knServed == knDirect)
    assertThrows[IllegalArgumentException] {
      again.scoreLmOf(probe, "id", "text", smoothing = "zzz")
    }
  }

  test("buildTrainingSet lmGate equals manually pre-filtering by the score") {
    val corpus = graft.sources.Tables.documents(spark, sf)
    val m = NgramLm.train(corpus.where(pmod(col("doc_id"), lit(2)) === 0),
      "doc_id", "text")
    val cand = corpus.where(pmod(col("doc_id"), lit(2)) === 1)
    val ceil = NgramLm.score(cand, "doc_id", "text", m)
      .agg(avg("nll")).collect().head.getDouble(0)
    val gated = graft.ops.Curation.buildTrainingSet(cand, "doc_id", "text",
        "source", lmGate = Some((m, ceil)))
      .orderBy("doc_id").collect().toSeq
    val manual = graft.ops.Curation.buildTrainingSet(
        cand.join(NgramLm.score(cand, "doc_id", "text", m)
          .where(col("nll") <= ceil).select("doc_id"), Seq("doc_id"), "left_semi"),
        "doc_id", "text", "source")
      .orderBy("doc_id").collect().toSeq
    assert(gated.nonEmpty && gated == manual)
  }

  test("streaming: curatedIngest perplexity gate drops junk at the door") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-lm-stream").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("g")
    val fluent = "the cat sat on the mat and the dog is here to stay in peace"
    val seed = (0L until 20L).map(i => (i, fluent + s" v$i", "web"))
      .toDF("doc_id", "text", "source")
    coll.upsert(graft.ops.Curation.curateBatch(seed, "doc_id", "text", "source"))
    coll.trainLmModel()
    val probe = coll.scoreLmOf(
      Seq((1L, fluent + " fresh"), (2L, "zq wv xk jj qqq"))
        .toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ceil = (probe(1L) + probe(2L)) / 2

    val ckpt = java.nio.file.Files.createTempDirectory("graft-lm-stream-ck").toString
    val in = MemoryStream[(Long, String, String)]
    val q = graft.streaming.Streams.curatedIngest(
      in.toDF().toDF("doc_id", "text", "source"), coll, ckpt,
      maxLmNll = Some(ceil))
    try {
      val before = coll.count()
      in.addData((100L, fluent + " fresh", "web"), (101L, "zq wv xk jj qqq", "web"))
      q.processAllAvailable()
      assert(coll.count() == before + 1, "exactly the fluent doc passes the gate")
      assert(coll.df.where(col("text") === (fluent + " fresh")).count() == 1)
      assert(coll.df.where(col("text") === "zq wv xk jj qqq").count() == 0)
    } finally q.stop()
  }

  test("score is deterministic and n_tokens matches the whitespace tokenization") {
    val m = NgramLm.train(docs(0L -> "a b c"), "doc_id", "text")
    val out = NgramLm.score(docs(1L -> "a  b   c", 2L -> ""), "doc_id", "text", m)
      .collect()
    // empty docs drop (no tokens to score); repeated whitespace
    // collapses through the empty-token filter
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.head.getLong(1) == 3L)
    val again = NgramLm.score(docs(1L -> "a  b   c"), "doc_id", "text", m)
      .collect().head.getDouble(2)
    assert(out.head.getDouble(2) == again)
  }

  test("updateLmModel: folding a batch equals retraining on the union, both orders") {
    val a = Seq((0L, "a b c a"), (1L, "b c d")).toDF("id", "text")
    val b = Seq((10L, "a b x"), (11L, "c d c d")).toDF("id", "text")
    val union = a.unionByName(b)
    val probe = Seq((100L, "a b c x q"), (101L, "d c b a")).toDF("id", "text")
    for (order <- Seq(2, 3)) {
      val root = java.nio.file.Files.createTempDirectory(s"graft-lmu$order").toString
      val coll = new graft.api.GraftClient(spark, root)
        .createDatabase("db").createCollection("c")
      coll.upsert(a)
      coll.trainLmModel(order = order)
      coll.updateLmModel(b, "id", "text")
      val folded = coll.scoreLmOf(probe, "id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val retrainRoot = java.nio.file.Files.createTempDirectory(s"graft-lmr$order").toString
      val retrain = new graft.api.GraftClient(spark, retrainRoot)
        .createDatabase("db").createCollection("c")
      retrain.upsert(union)
      retrain.trainLmModel(order = order)
      val full = retrain.scoreLmOf(probe, "id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(folded === full,
        s"order-$order fold must equal the union retrain exactly")
      // the stored count table itself is value-equal, not just scores —
      // aggregated over fold segments (the artifact is log-structured:
      // a fold APPENDS a batch-count segment; the logical table is the
      // per-key sum, which serving re-derives)
      val keys = if (order == 3) Seq("u", "v", "w") else Seq("v", "w")
      val cCol = if (order == 3) "c_uvw" else "c_vw"
      def counts(r: String) = spark.read
        .parquet(s"$r/db/c__lm_bigrams/data")
        .groupBy(keys.map(col): _*).agg(sum(cCol).as(cCol))
        .collect().map(x => keys.map(x.getAs[String]) -> x.getAs[Long](cCol)).toMap
      assert(counts(root) === counts(retrainRoot))
      // and the fold really was an append: the batch's counts landed in
      // their own segment, segment 0 untouched
      assert(spark.read.parquet(s"$root/db/c__lm_bigrams/data")
        .select(graft.sparse.Bm25.SegCol).distinct().count() == 2,
        "fold must append a new count segment, not rewrite the table")
    }
  }

  test("compactLmModel folds the segments back to one, scores unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft-lmc").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("c")
    coll.upsert(Seq((0L, "a b c a"), (1L, "b c d")).toDF("id", "text"))
    coll.trainLmModel()
    coll.updateLmModel(Seq((10L, "a b x")).toDF("id", "text"), "id", "text")
    coll.updateLmModel(Seq((11L, "c d c d")).toDF("id", "text"), "id", "text")
    val probe = Seq((100L, "a b c x q"), (101L, "d c b a")).toDF("id", "text")
    val before = coll.scoreLmOf(probe, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def segs() = spark.read.parquet(s"$root/db/c__lm_bigrams/data")
      .select(graft.sparse.Bm25.SegCol).distinct().count()
    assert(segs() == 3)
    coll.compactLmModel()
    assert(segs() == 1, "compaction must fold every count segment into one")
    val after = coll.scoreLmOf(probe, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after === before, "compaction changed LM scores")
    // a fold after compaction appends again from nextseg = 1
    coll.updateLmModel(Seq((12L, "x y z")).toDF("id", "text"), "id", "text")
    assert(segs() == 2)
  }

  test("streaming: curatedIngest maintainLm folds each admitted batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-lm-maint").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("c")
    val seed = "the cat sat on the mat"
    coll.upsert(graft.ops.Curation.curateBatch(
      Seq((0L, seed, "web")).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source"))
    coll.trainLmModel()
    val before = coll.scoreLmOf(
        Seq((50L, "fresh words here")).toDF("id", "text"), "id", "text")
      .collect().head.getDouble(2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lm-maint-ck").toString
    val in = MemoryStream[(Long, String, String)]
    val q = graft.streaming.Streams.curatedIngest(
      in.toDF().toDF("doc_id", "text", "source"), coll, ckpt,
      maintainLm = true)
    try {
      in.addData((1L, "fresh words here to stay", "web"))
      q.processAllAvailable()
      val after = coll.scoreLmOf(
          Seq((50L, "fresh words here")).toDF("id", "text"), "id", "text")
        .collect().head.getDouble(2)
      assert(after < before,
        s"folded counts must make the ingested vocabulary fluent: $before -> $after")
      // byte-identical re-arrival: an upsert no-op must NOT fold its
      // counts a second time (rows are content-keyed)
      in.addData((2L, "fresh words here to stay", "web"))
      q.processAllAvailable()
      val again = coll.scoreLmOf(
          Seq((50L, "fresh words here")).toDF("id", "text"), "id", "text")
        .collect().head.getDouble(2)
      assert(again === after,
        s"re-arrival must leave the counts untouched: $after -> $again")
    } finally q.stop()
  }

  // --- CCNet head/middle/tail bucketing (q_ppl_buckets) ---

  private def scoredOf(rows: (Long, String, Double)*) =
    rows.toDF("doc_id", "source", "nll")

  private def bucketMap(scored: org.apache.spark.sql.DataFrame) =
    NgramLm.buckets(scored, "doc_id", "source")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("ppl_bucket"))
      .toMap

  test("buckets: exact thirds per domain with distinct scores") {
    val b = bucketMap(scoredOf((1L to 9L).map(i => (i, "a", i.toDouble)): _*))
    assert((1L to 3L).forall(b(_) == "head"), b.toString)
    assert((4L to 6L).forall(b(_) == "middle"), b.toString)
    assert((7L to 9L).forall(b(_) == "tail"), b.toString)
  }

  test("buckets: a tie group buckets together where it STARTS") {
    // N=6 -> head <= rank 2, middle <= rank 4; the nll=1.0 group of 4
    // STARTS at rank 1, so all four are head — and the next group
    // starts at rank 5, past the middle threshold
    val b = bucketMap(scoredOf(
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0), (4L, "a", 1.0),
      (5L, "a", 2.0), (6L, "a", 3.0)))
    assert((1L to 4L).forall(b(_) == "head"), b.toString)
    assert(b(5L) == "tail" && b(6L) == "tail", b.toString)
    assert(!b.values.exists(_ == "middle"), b.toString)
  }

  test("buckets: domains are independent; N<3 degenerates without a head") {
    val b = bucketMap(scoredOf(
      (1L, "a", 5.0), (2L, "a", 6.0), (3L, "a", 7.0),
      (10L, "z", 1.0), (11L, "z", 2.0)))
    assert(b(1L) == "head" && b(2L) == "middle" && b(3L) == "tail")
    // N=2: head threshold 0, middle threshold 1
    assert(b(10L) == "middle" && b(11L) == "tail")
  }

  test("collection lmBuckets serves thirds from the stored LM") {
    val root = java.nio.file.Files.createTempDirectory("graft-lmb").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("c")
    // 9 docs per domain with increasing amounts of junk appended, so
    // nll strictly climbs within each domain
    val rows = for (d <- Seq("x", "y"); i <- 0 until 9) yield
      (d.hashCode.toLong * 100 + i,
        ("the cat sat on the mat " * 3) + Seq.fill(i)("zq" + i).mkString(" "),
        d)
    coll.upsert(rows.toDF("id", "text", "src"))
    coll.trainLmModel()
    val out = new graft.api.GraftClient(spark, root)
      .database("db").collection("c").lmBuckets("src")
    assert(out.columns.toSet ==
      Set("id", "src", "n_tokens", "nll", "ppl_bucket"))
    val perDomain = out.groupBy("src", "ppl_bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (d <- Seq("x", "y"); bkt <- Seq("head", "middle", "tail"))
      assert(perDomain.getOrElse((d, bkt), 0L) == 3L,
        s"expected exact thirds, got $perDomain")
  }
}
