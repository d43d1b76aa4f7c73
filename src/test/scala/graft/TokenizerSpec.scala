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

  test("piece ids derive from the merge artifact alone and round-trip to words") {
    val docs = Seq((1L, "low low low low low lower lower"),
      (2L, "lowest")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    val vocab = Bpe.pieceVocab(merges).collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    // EndMark = 0, base alphabet sorted from 1, products in rank order
    assert(vocab(Bpe.EndMark) == 0)
    val alphaIds = vocab.filter { case (p, _) =>
      p.length == 1 && p != Bpe.EndMark }.toSeq.sortBy(_._2)
    assert(alphaIds.map(_._1) == alphaIds.map(_._1).sorted,
      "base alphabet ids must follow sorted char order")
    val nAlpha = alphaIds.length
    val products = merges.orderBy("rank").collect()
      .map(r => r.getString(1) + r.getString(2))
    products.zipWithIndex.foreach { case (p, i) =>
      assert(vocab(p) == nAlpha + 1 + i, s"product $p id out of rank order")
    }
    // ids ≡ pieces under the vocab map, at every word position
    val pieces = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id", "pos").collect().map(_.getSeq[String](2))
    val ids = Bpe.encodeIds(docs, "doc_id", "text", merges)
      .orderBy("doc_id", "pos").collect().map(_.getSeq[Int](2))
    assert(pieces.length == ids.length)
    pieces.zip(ids).foreach { case (ps, is) =>
      assert(ps.map(p => vocab.getOrElse(p, Tokenizer.UnkId)) == is)
    }
    // round-trip: every fully-in-vocab id sequence inverts back to its
    // word (words with never-merged characters carry UnkId by contract
    // — the dedicated OOV test below)
    val inv = vocab.map(_.swap)
    val allWords =
      Seq("low", "low", "low", "low", "low", "lower", "lower", "lowest")
    val roundTripped = ids.zip(allWords).collect {
      case (is, w) if is.forall(_ >= 0) =>
        (is.map(inv).mkString.stripSuffix(Bpe.EndMark), w)
    }
    assert(roundTripped.nonEmpty && roundTripped.forall { case (got, w) => got == w },
      s"id round-trip failed: $roundTripped")
    // array form flattens in word order
    val arr = Bpe.encodeIdArrays(docs, "doc_id", "text", merges)
      .where(col("doc_id") === 1L).collect().head.getSeq[Int](1)
    assert(arr == ids.take(7).flatten.toSeq)
  }

  test("characters no merge touched encode as UnkId") {
    val docs = Seq((1L, "low low qqq")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 2, minCount = 2L)
    // 'q' appears in no merge symbol -> its pieces have no id
    val ids = Bpe.encodeIds(docs, "doc_id", "text", merges)
      .where(col("pos") === 2).collect().head.getSeq[Int](2)
    assert(ids.init.forall(_ == Tokenizer.UnkId),
      "untouched characters must map to UnkId")
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
