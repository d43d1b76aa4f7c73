package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Cross-corpus bloom-gated dedup, repeated-passage detection, and the
  * decontamination apply step (SURVEY §2 rows 61–63). */
class CrossCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta epsilon zeta"),
    (3L, "alpha beta gamma"), // dup of reference text
    (4L, "eta theta iota"),
    (5L, null.asInstanceOf[String]), // null text must survive
    (6L, "unique kappa lambda")
  ).toDF("doc_id", "text")

  private def reference() = Seq(
    (100L, "alpha beta gamma"),
    (101L, "eta theta iota")
  ).toDF("doc_id", "text")

  test("crossCorpusExact drops rows whose text exists in the reference") {
    val out = Dedup.crossCorpusExact(corpus(), "text", reference(), "text")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 5L, 6L))
  }

  test("crossCorpusExact bloom gate matches the ungated anti-join") {
    val gated = Dedup.crossCorpusExact(corpus(), "text", reference(), "text",
      bloomExpectedItems = Some(1024L))
    val plain = Dedup.crossCorpusExact(corpus(), "text", reference(), "text",
      bloomExpectedItems = None)
    assert(gated.select("doc_id").as[Long].collect().sorted.toSeq ==
      plain.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("crossCorpusExact stays exact when the bloom is saturated with false positives") {
    // 64-item bloom (the clamp floor) at fpp 0.5 over 500 reference
    // texts: mightContain fires on most of the corpus, so survival
    // depends on the verifying anti-join, not the filter
    val big = spark.range(1000).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"))
    val ref = spark.range(500).select((col("id") * 2).as("doc_id"),
      concat(lit("doc "), col("id") * 2).as("text"))
    val gated = Dedup.crossCorpusExact(big, "text", ref, "text",
      bloomExpectedItems = Some(1L), bloomFpp = 0.5)
      .select("doc_id").as[Long].collect().sorted
    // survivors = odd ids (even-id texts are all in the reference)
    assert(gated.toSeq == (1L until 1000L by 2).toSeq)
  }

  test("crossCorpusExact keeps everything against an empty reference") {
    val out = Dedup.crossCorpusExact(corpus(), "text",
      reference().where(lit(false)), "text")
    assert(out.count() == 6)
  }

  test("passageRepeats finds windows shared across docs, honors stride and minDocs") {
    val w4 = "w1 w2 w3 w4"
    val docs = Seq(
      (1L, s"$w4 a b c d"), // window [w1..w4] at offset 0, [a b c d] at 4
      (2L, s"$w4 e f g h"), // shares [w1..w4] only
      (3L, s"x $w4 y z q"), // contains w1..w4 UNALIGNED: windows [x w1 w2 w3], [y z q ...]-short
      (4L, "short doc")     // under the window width: no windows at all
    ).toDF("doc_id", "text")
    val out = Dedup.passageRepeats(docs, "doc_id", "text",
      window = 4, stride = 4, minDocs = 2).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("w1 w2 w3 w4"))
    assert(out.head.getLong(1) == 2L) // docs 1 and 2; doc 3's copy is unaligned
    assert(out.head.getLong(2) == 2L)

    // stride 1 slides over doc 3's copy too
    val slid = Dedup.passageRepeats(docs, "doc_id", "text",
      window = 4, stride = 1, minDocs = 3).collect()
    assert(slid.map(_.getString(0)).toSeq == Seq("w1 w2 w3 w4"))
    assert(slid.head.getLong(1) == 3L)
  }

  test("stripBoilerplate drops repeated blocks, keeps tails and sub-window docs") {
    val boiler = "b1 b2 b3 b4"
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3 u4 tail1 tail2"), // boiler block + unique block + partial tail
      (2L, s"$boiler v1 v2 v3 v4"),             // boiler block + unique block, no tail
      (3L, s"$boiler"),                          // ONLY boilerplate -> empty after strip
      (4L, "tiny")                               // sub-window: untouched
    ).toDF("doc_id", "text")
    val m = Dedup.stripBoilerplate(docs, "doc_id", "text", window = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(m.size == 4)
    assert(m(1L) == ("u1 u2 u3 u4 tail1 tail2", 1))
    assert(m(2L) == ("v1 v2 v3 v4", 1))
    assert(m(3L) == ("", 1))
    assert(m(4L) == ("tiny", 0))
  }

  test("dedupRepeatedBlocks keeps first occurrences, tails, sub-window docs") {
    val docs = Seq(
      (1L, "a b c d a b e f a b"), // blocks: [a b][c d][a b][e f] + tail "a b"
      (2L, "x y x y"),             // [x y][x y] -> second dropped
      (3L, "q")                    // sub-window: untouched
    ).toDF("doc_id", "text")
    val m = Dedup.dedupRepeatedBlocks(docs, "doc_id", "text", window = 2)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // doc 1: block 2 ("a b") is a repeat of block 0 -> dropped; the
    // TAIL "a b" is a partial... no — 10 tokens = 5 full 2-blocks:
    // [a b][c d][a b][e f][a b] -> blocks 2 and 4 drop
    assert(m(1L) == ("a b c d e f", 2))
    assert(m(2L) == ("x y", 1))
    assert(m(3L) == ("q", 0))
  }

  test("passageRepeatsShifted finds passages duplicated at ANY alignment") {
    val p = "p1 p2 p3 p4"
    val docs = Seq(
      (1L, s"$p a b c d"),      // passage at offset 0
      (2L, s"x y $p e f"),      // same passage at offset 2
      (3L, s"u v w $p"),        // offset 3, at the very end
      (4L, "unrelated words entirely different here"),
      (5L, "tiny")              // sub-window
    ).toDF("doc_id", "text")
    // the block report is blind: no two copies share a 4-aligned block
    val blocks = Dedup.passageRepeats(docs, "doc_id", "text",
      window = 4, stride = 4, minDocs = 2).collect()
    assert(!blocks.map(_.getString(0)).contains(p))
    // the stride-1 report must surface it with all three carriers
    val out = Dedup.passageRepeatsShifted(docs, "doc_id", "text",
      window = 4, minDocs = 2).collect()
    val row = out.find(_.getString(0) == p)
    assert(row.isDefined, s"shifted report must contain '$p', got ${out.toSeq}")
    assert(row.get.getLong(1) == 3L && row.get.getLong(2) == 3L)
  }

  test("passageRepeatsShifted equals the unpruned stride-1 report") {
    // the hash-prune phase must be invisible: same rows as
    // passageRepeats(stride = 1) on the same input
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "z a b c d e q r"),
      (3L, "m n o p q r s t"), (4L, "c d e f x y z w")
    ).toDF("doc_id", "text")
    val pruned = Dedup.passageRepeatsShifted(docs, "doc_id", "text",
      window = 3, minDocs = 2).collect().toSeq
    val plain = Dedup.passageRepeats(docs, "doc_id", "text",
      window = 3, stride = 1, minDocs = 2).collect().toSeq
    assert(pruned == plain)
  }

  test("stripShiftedBoilerplate removes covered tokens at every offset") {
    val p = "p1 p2 p3 p4"
    val docs = Seq(
      (1L, s"$p a b c d"),   // offset 0: first 4 tokens drop
      (2L, s"x y $p e f"),   // offset 2: middle 4 drop
      (3L, s"$p"),           // fully covered -> empty
      (4L, "unrelated words entirely different here"),
      (5L, "tiny")
    ).toDF("doc_id", "text")
    val m = Dedup.stripShiftedBoilerplate(docs, "doc_id", "text",
      window = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(m(1L) == (("a b c d", 4)))
    assert(m(2L) == (("x y e f", 4)))
    assert(m(3L) == (("", 4)))
    assert(m(4L) == (("unrelated words entirely different here", 0)))
    assert(m(5L) == (("tiny", 0)))
  }

  test("stripShiftedBoilerplate covers a LONG duplicated passage as the union of its windows") {
    // a 6-token passage shared at different offsets: its 3 stride-1
    // 4-windows each clear minDocs, and their union covers all 6
    // tokens in both carriers — no block-boundary residue
    val long6 = "l1 l2 l3 l4 l5 l6"
    val docs = Seq(
      (1L, s"$long6 a b"),
      (2L, s"x $long6 y"),
      (3L, "filler text with nothing shared")
    ).toDF("doc_id", "text")
    val m = Dedup.stripShiftedBoilerplate(docs, "doc_id", "text",
      window = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(m(1L) == (("a b", 6)))
    assert(m(2L) == (("x y", 6)))
  }

  test("passageRepeats approx doc counting finds the same hot passage") {
    val docs = Seq(
      (1L, "p q r s"), (2L, "p q r s"), (3L, "different text here now")
    ).toDF("doc_id", "text")
    val out = Dedup.passageRepeats(docs, "doc_id", "text",
      window = 4, stride = 4, minDocs = 2, approxDocs = true).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("p q r s"))
  }

  test("decontaminate drops train docs contained in the eval gram set") {
    // every doc shares the same text => each train doc's gram set is
    // fully contained in eval's (share = 1.0) as soon as ANY eval doc
    // exists; unique-text docs have share 0 and survive
    val ids = (0L until 64L)
    val docs = ids.map(i => (i, "common text shared by all riders"))
      .toDF("doc_id", "text")
      .unionByName(Seq((1000L, "totally unique train only words here"))
        .toDF("doc_id", "text"))
    val split = graft.ops.Curation.hashSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val trainIds = (ids :+ 1000L).filter(split(_) == "train")
    val evalDupExists = ids.exists(split(_) == "eval")
    assert(evalDupExists, "fixture needs at least one eval doc in the duplicate group")

    val kept = graft.ops.Curation.decontaminate(docs, "doc_id", "text",
      maxShare = 0.8).select("doc_id").as[Long].collect().sorted
    val expected =
      if (split(1000L) == "train") Seq(1000L) else Seq.empty[Long]
    assert(kept.toSeq == expected)

    // and the report agrees with the apply step on gram-bearing docs
    val report = graft.ops.Curation.decontaminateFromGrams(
      graft.dedup.Dedup.ngrams(docs, "doc_id", "text", 3))
      .select("doc_id").as[Long].collect().sorted
    assert(report.toSeq == expected)
    assert(trainIds.nonEmpty)
  }

  test("decontaminateFromGrams reports shares and keeps sub-threshold docs") {
    // hand-built postings: train doc 10 shares 2/4 grams with eval,
    // train doc 11 shares 4/4; threshold 0.6 keeps only doc 10.
    // Bucket membership is md5-derived, so pick REAL train/eval ids:
    // find one eval id to host the shared grams.
    val probe = (0L until 50L).map(i => (i, "")).toDF("doc_id", "x")
    val evalId = graft.ops.Curation.hashSplit(probe, "doc_id")
      .where(col("split") === "eval").select("doc_id").as[Long].head()
    val trainId = graft.ops.Curation.hashSplit(probe, "doc_id")
      .where(col("split") === "train").select("doc_id").as[Long].head()
    val trainId2 = graft.ops.Curation.hashSplit(probe, "doc_id")
      .where(col("split") === "train").select("doc_id").as[Long]
      .collect().apply(1)
    val grams = Seq(
      (trainId, "g1"), (trainId, "g2"), (trainId, "g3"), (trainId, "g4"),
      (trainId2, "g1"), (trainId2, "g2"), (trainId2, "g3"), (trainId2, "g4"),
      (evalId, "g1"), (evalId, "g2")
    ).toDF("doc_id", "g")
    // trainId and trainId2 both share g1,g2 => share 0.5 < 0.6: kept
    val byId = graft.ops.Curation.decontaminateFromGrams(grams, maxShare = 0.6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byId.keySet == Set(trainId, trainId2))
    assert(byId(trainId) == ((4L, 2L, 0.5)))
    // tighten the threshold below their share: both drop
    val none = graft.ops.Curation.decontaminateFromGrams(grams, maxShare = 0.5)
    assert(none.count() == 0)
  }

  test("PQ and IVF_PQ exhaustive rerank equal exact KNN byte-for-byte") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val data = (0L until 80L).map(i =>
      (i, Array.fill(dim)(rnd.nextDouble().toFloat))).toDF("vec_id", "embedding")
    val queries = data.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = graft.vector.KnnSearch.topK(data, "vec_id", "embedding",
      queries, "qid", "qvec", "l2", 5).collect().toSeq

    val qLocal = data.where(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    val pq = graft.vector.PqIndex.train(data, "embedding", dim = dim, m = 4, k = 8)
    val enc = graft.vector.PqIndex.encode(pq, data, "vec_id", "embedding")
    val viaPq = graft.vector.PqIndex.searchRerank(pq, enc, data,
      "vec_id", "embedding", qLocal, k = 5, candMult = 16).collect().toSeq
    assert(viaPq == exact)

    val ivfpq = graft.vector.IvfPq.Model(
      graft.vector.IvfIndex.train(data, "embedding", nlist = 4, maxIter = 5), pq)
    val encI = graft.vector.IvfPq.encode(ivfpq, data, "vec_id", "embedding")
    val viaIvfPq = graft.vector.IvfPq.searchRerank(ivfpq, encI, data,
      "vec_id", "embedding", qLocal, kTop = 5, nprobe = 4, candMult = 16)
      .collect().toSeq
    assert(viaIvfPq == exact)
  }
}
