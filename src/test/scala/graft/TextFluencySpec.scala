package graft

import graft.text.TextAnalysis

/** Corpus-conditioned rare-bigram fluency signal: threshold semantics,
  * edge docs (empty / single-token / null text), and the counts
  * artifact round-trip. */
class TextFluencySpec extends SparkSpec {
  import spark.implicits._

  test("rare bigrams flag the disfluent doc and only it") {
    // 10 fluent docs share all their bigrams (c=10 or 20 each); one doc
    // carries a unique word pair. total = 51 bigram instances; at
    // invFreq=50 a bigram is rare iff c*50 <= 51, i.e. c=1.
    val docs = ((0L until 10L).map(i => (i, "a b a b a b")) :+ (99L, "q z"))
      .toDF("id", "text")
    val counts = TextAnalysis.bigramCounts(docs, "id", "text")
    val out = TextAnalysis.bigramNovelty(docs, "id", "text", counts, invFreq = 50L)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(out(99L) == ((1, 1L, Some(1.0))))
    (0L until 10L).foreach { i =>
      assert(out(i) == ((5, 0L, Some(0.0))), s"doc $i: ${out(i)}")
    }
  }

  test("a corpus-common bigram in a rare context still counts per position") {
    // the rare bigram occurs TWICE in one doc — both positions count
    val docs = ((0L until 20L).map(i => (i, "a b a b")) :+ (99L, "q z w q z"))
      .toDF("id", "text")
    val counts = TextAnalysis.bigramCounts(docs, "id", "text")
    // total = 20*3 + 4 = 64; "q z" has c=2: rare iff 2*inv <= 64 (inv <= 32)
    val out = TextAnalysis.bigramNovelty(docs, "id", "text", counts, invFreq = 16L)
      .where($"id" === 99L).collect().head
    // "q z"(x2), "z w", "w q" all rare at c<=4*16<=64: n_rare = 4 of 4
    assert(out.getInt(1) == 4 && out.getLong(2) == 4L)
  }

  test("edge docs: empty, single-token, and null texts get zero bigrams and null rate") {
    val docs = Seq((1L, "a b a b"), (2L, ""), (3L, "solo"), (4L, null))
      .toDF("id", "text")
    val counts = TextAnalysis.bigramCounts(docs, "id", "text")
    val out = TextAnalysis.bigramNovelty(docs, "id", "text", counts)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(out(2L) == ((0, 0L, None)))
    assert(out(3L) == ((0, 0L, None)))
    assert(out(4L) == ((0, 0L, None)))
    assert(out(1L)._1 == 3)
  }

  test("trigram generalization: windows, rarity, and sub-n docs") {
    // 10 fluent docs share their trigrams; one doc has unique ones.
    // total trigrams = 10*4 + 1 = 41; at invFreq=40 rare iff c*40<=41.
    val docs = ((0L until 10L).map(i => (i, "a b a b a b")) :+ (99L, "q z w"))
      .toDF("id", "text")
    val counts = TextAnalysis.ngramCounts(docs, "id", "text", n = 3)
    assert(counts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a b a" -> 20L, "b a b" -> 20L, "q z w" -> 1L))
    val out = TextAnalysis.ngramNovelty(docs, "id", "text", counts,
        invFreq = 40L, n = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out(99L) == ((1, 1L)))
    assert(out(0L) == ((4, 0L)))
    // a 2-token doc has no trigrams
    val tiny = Seq((1L, "a b")).toDF("id", "text")
    val out2 = TextAnalysis.ngramNovelty(tiny, "id", "text",
      TextAnalysis.ngramCounts(tiny, "id", "text", n = 3), n = 3).collect().head
    assert(out2.getInt(1) == 0 && out2.getLong(2) == 0L)
  }

  test("vocabDrift: one-sided tokens, shared tokens, and rates line up") {
    val a = Seq((1L, "x x y"), (2L, "x z")).toDF("id", "text")   // 5 toks
    val b = Seq((3L, "y y z z"), (4L, null)).toDF("id", "text")  // 4 toks
    val out = graft.ops.Curation.vocabDrift(a, b, "text").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet == Set("x", "y", "z"))
    assert(out("x") == ((3L, 0L, 3.0 / 5.0, 0.0)))
    assert(out("y") == ((1L, 2L, 1.0 / 5.0, 2.0 / 4.0)))
    assert(out("z") == ((1L, 2L, 1.0 / 5.0, 2.0 / 4.0)))
  }

  test("counts artifact: frequencies sum to the corpus bigram volume") {
    val docs = Seq((1L, "a b c"), (2L, "b c d"), (3L, "x")).toDF("id", "text")
    val counts = TextAnalysis.bigramCounts(docs, "id", "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a b" -> 1L, "b c" -> 2L, "c d" -> 1L))
  }
}
