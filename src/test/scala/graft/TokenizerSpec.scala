package graft

import org.apache.spark.sql.functions._

import graft.text.{Bpe, Tokenizer}

/** Tokenizer family: frequency vocabulary (rank determinism, OOV),
  * tokenize-to-ids (order, gaps), and the trained BPE (merge order,
  * encode determinism, round-trip, the distinct-word join path). */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("buildVocab ranks by count desc then token asc, cuts at vocabSize") {
    val docs = Seq((1L, "b b b a a c c d")).toDF("doc_id", "text")
    // counts: b=3, a=2, c=2, d=1 -> ids b=0, a=1 (tie a<c), c=2, d=3
    val v = Tokenizer.buildVocab(docs, "text", 3).orderBy("id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(v.toSeq == Seq(("b", 0, 3L), ("a", 1, 2L), ("c", 2, 2L)))
  }

  test("tokenizeIds maps OOV to UnkId and keeps positions") {
    val docs = Seq((1L, "b a zzz b")).toDF("doc_id", "text")
    val vocab = Seq(("b", 0), ("a", 1)).toDF("token", "id")
    val out = Tokenizer.tokenizeIds(docs, "doc_id", "text", vocab)
      .orderBy("pos").collect().map(r => (r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq((0, 0), (1, 1), (2, Tokenizer.UnkId), (3, 0)))
    val arr = Tokenizer.tokenizeIdArrays(docs, "doc_id", "text", vocab)
      .collect().head.getSeq[Int](1)
    assert(arr == Seq(0, 1, Tokenizer.UnkId, 0))
  }

  test("BPE training learns merges greedily with deterministic ties") {
    val wc = Array(("low", 5L), ("lower", 2L))
    val merges = Bpe.trainLocal(wc, 3).toSeq
    // (l,o)=7 ties (o,w)=7 -> lexicographic min (l,o); then (lo,w)=7;
    // then (low,</w>)=5
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("l", "o"), ("lo", "w"), ("low", Bpe.EndMark)))
    assert(merges.map(_.rank) == Seq(0, 1, 2))
  }

  test("encodeWord applies merges in rank order; unseen words split fine") {
    val ranks = Map(("l", "o") -> 0, ("lo", "w") -> 1, ("low", Bpe.EndMark) -> 2)
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("low" + Bpe.EndMark))
    assert(Bpe.encodeWord("lowest", ranks).toSeq ==
      Seq("low", "e", "s", "t", Bpe.EndMark))
    assert(Bpe.encodeWord("xy", ranks).toSeq == Seq("x", "y", Bpe.EndMark))
  }

  test("distributed train matches the local loop; encode round-trips") {
    val docs = Seq((1L, "low low low low low lower lower"),
      (2L, "lowest")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    val local = Bpe.trainLocal(
      Array(("low", 5L), ("lower", 2L), ("lowest", 1L)), 4)
    assert(merges.orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq ==
      local.toSeq.map(m => (m.rank, m.left, m.right)))
    // every encoded word's pieces concatenate back to word + </w>
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val bad = enc.join(toks, Seq("doc_id", "pos"))
      .where(concat_ws("", col("pieces")) =!= concat(col("w"), lit(Bpe.EndMark)))
    assert(bad.isEmpty, "BPE pieces must concatenate back to the word")
    // frequent word ends fully merged; encode is deterministic
    val lowPieces = enc.join(toks, Seq("doc_id", "pos"))
      .where(col("w") === "low").select("pieces")
      .collect().map(_.getSeq[String](0)).toSet
    assert(lowPieces == Set(Seq("low" + Bpe.EndMark)))
  }

  test("train maxWords caps the dictionary at the head word types") {
    val docs = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 5, maxWords = 1)
    val syms = merges.collect()
      .flatMap(r => Seq(r.getString(1), r.getString(2))).mkString
    assert(syms.nonEmpty && !syms.contains("b") && !syms.contains("c"),
      "only the top word type may reach the trainer")
  }

  test("train stops when no pair repeats; minCount drops hapax words") {
    assert(Bpe.trainLocal(Array(("ab", 1L)), 10).length == 0)
    // with minCount=2 the hapax never reaches the trainer
    val docs = Seq((1L, "aa aa zz")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 10, minCount = 2L)
    val pairs = merges.collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(!pairs.contains(("z", "z")))
  }
}
