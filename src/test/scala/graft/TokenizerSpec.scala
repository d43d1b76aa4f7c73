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
  test("q_bpe_apply's pinned dictionary trains to EXACTLY the oracle's inlined merges") {
    // the q_bpe_apply oracle spells these 12 merges as SQL VALUES; if
    // the trainer's greedy/tie-break behavior ever drifts, THIS pin
    // fails before the oracle can mismatch (the artifact-as-fixture
    // contract of r12 verdict #6)
    val got = Bpe.trainLocal(SparkEntry.BpeApplyDict, numMerges = 12)
      .map(m => (m.rank, m.left, m.right)).toSeq
    val pinned = Seq(
      (0, "t", "a"), (1, "a", "n"), (2, "an", "</w>"), (3, "c", "an</w>"),
      (4, "s", "can</w>"), (5, "a", "r"), (6, "ar", "k"), (7, "ark", "</w>"),
      (8, "e", "</w>"), (9, "p", "ark</w>"), (10, "s", "park</w>"),
      (11, "o", "r"))
    assert(got == pinned,
      s"trainLocal(BpeApplyDict) drifted from the oracle's inlined merges: $got")

    // and the encode against those merges segments the corpus words
    // the way the oracle's recursive CTE replays them
    val docs = Seq((1L, "scan sort order table data spark"))
      .toDF("doc_id", "text")
    val merges = pinned.toDF("rank", "left", "right")
    val pieces = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("pos").collect().map(_.getSeq[String](2).mkString("|"))
    assert(pieces.toSeq == Seq(
      "scan</w>", "s|or|t|</w>", "or|d|e|r|</w>", "ta|b|l|e</w>",
      "d|a|ta|</w>", "spark</w>"))
  }
}

/** Unigram-LM tokenizer (Kudo 2018): seed→EM→prune training over the
  * bounded word dictionary, integer-micro-nat Viterbi encoding, id
  * derivation from the artifact alone, and the coverage/OOV
  * contracts. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.{Tokenizer, Unigram}

  private val dict: Array[(String, Long)] =
    Array(("lowlow", 20L), ("lower", 12L), ("low", 30L), ("west", 8L))

  test("training is deterministic and keeps frequent substrings as pieces") {
    val a = Unigram.trainLocal(dict, vocabSize = 12)
    val b = Unigram.trainLocal(dict, vocabSize = 12)
    assert(a.toSeq == b.toSeq, "two trainings over one dict must be identical")
    val pieces = a.map(_.piece).toSet
    assert(pieces.contains("low"),
      s"the dominant substring must survive pruning, got $pieces")
    // coverage floor: every training character is a piece
    val chars = dict.flatMap(_._1).map(_.toString).toSet
    assert(chars.subsetOf(pieces))
    // ids are the (logp DESC, piece ASC) dense rank
    assert(a.sortBy(_.pieceId).map(_.pieceId).toSeq == a.indices.toSeq)
    val sorted = a.sortBy(p => (-p.logpMicro, p.piece))
    assert(sorted.map(_.pieceId).toSeq == a.indices.toSeq)
  }

  test("vocabSize bounds the vocabulary (alphabet floor wins when smaller)") {
    val big = Unigram.trainLocal(dict, vocabSize = 30)
    assert(big.length <= 30)
    val tiny = Unigram.trainLocal(dict, vocabSize = 2)
    // cannot shrink below the alphabet: chars are the coverage floor
    assert(tiny.forall(_.piece.length == 1))
    assert(tiny.map(_.piece).toSet == dict.flatMap(_._1).map(_.toString).toSet)
  }

  test("Viterbi: integer max-sum, deterministic ties, UNK chars, empty word") {
    val lp = Map("ab" -> -1000000L, "a" -> -2000000L, "b" -> -2000000L)
    assert(Unigram.viterbi("ab", lp, 2).toSeq == Seq("ab"),
      "one piece at -1.0 beats two at -2.0 each")
    // equal score -> fewer pieces wins
    val tie = Map("ab" -> -4000000L, "a" -> -2000000L, "b" -> -2000000L)
    assert(Unigram.viterbi("ab", tie, 2).toSeq == Seq("ab"))
    // unknown char segments as a floor-scored single-char piece
    assert(Unigram.viterbi("aqb", lp, 2).toSeq == Seq("a", "q", "b"))
    assert(Unigram.viterbi("", lp, 2).isEmpty)
  }

  test("encode round-trips: pieces concatenate back to each word") {
    val docs = Seq((1L, "low lower lowlow west"),
      (2L, "low low lowlow")).toDF("doc_id", "text")
    val model = Unigram.train(docs, "text", vocabSize = 12)
    val out = Unigram.encode(docs, "doc_id", "text", model)
      .orderBy("doc_id", "pos").collect()
    val words = Seq("low", "lower", "lowlow", "west", "low", "low", "lowlow")
    assert(out.length == words.length)
    out.zip(words).foreach { case (r, w) =>
      assert(r.getSeq[String](2).mkString == w,
        s"pieces of '$w' must concatenate back, got ${r.getSeq[String](2)}")
    }
    // determinism across encode calls
    val again = Unigram.encode(docs, "doc_id", "text", model)
      .orderBy("doc_id", "pos").collect()
    assert(out.map(_.getSeq[String](2)).toSeq == again.map(_.getSeq[String](2)).toSeq)
  }

  test("encodeIds maps pieces through the artifact ids; unseen chars are UnkId") {
    val docs = Seq((1L, "low lower")).toDF("doc_id", "text")
    val model = Unigram.train(docs, "text", vocabSize = 12)
    val idOf = model.collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    val pieces = Unigram.encode(docs, "doc_id", "text", model)
      .orderBy("doc_id", "pos").collect().map(_.getSeq[String](2))
    val ids = Unigram.encodeIds(docs, "doc_id", "text", model)
      .orderBy("doc_id", "pos").collect().map(_.getSeq[Int](2))
    assert(pieces.zip(ids).forall { case (ps, is) =>
      ps.map(idOf) == is
    }, "ids must be exactly the pieces under the artifact map")
    // a word with a never-seen char: that char's id is UnkId
    val probe = Seq((9L, "loqw")).toDF("doc_id", "text")
    val probeIds = Unigram.encodeIds(probe, "doc_id", "text", model)
      .collect().head.getSeq[Int](2)
    assert(probeIds.contains(Tokenizer.UnkId))
    // array form flattens in word order
    val arr = Unigram.encodeIdArrays(docs, "doc_id", "text", model)
      .collect().head.getSeq[Int](1)
    assert(arr == ids.flatten.toSeq)
  }

  test("encoding against an empty artifact fails fast, not NPE") {
    val empty = Seq.empty[(String, Long, Int)]
      .toDF("piece", "logp_micro", "piece_id")
    val docs = Seq((1L, "low")).toDF("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      Unigram.encode(docs, "doc_id", "text", empty).collect()
    }
    assert(err.getMessage.contains("empty unigram model"))
  }

  test("distributed train equals local training over the same dictionary") {
    val docs = Seq((1L, "low lower lowlow west"),
      (2L, "low low lowlow")).toDF("doc_id", "text")
    val viaDf = Unigram.train(docs, "text", vocabSize = 12).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val localDict = Array(("low", 3L), ("lower", 1L), ("lowlow", 2L), ("west", 1L))
    val viaLocal = Unigram.trainLocal(localDict, vocabSize = 12)
      .map(p => (p.piece, p.logpMicro, p.pieceId)).toSeq.sorted
    assert(viaDf == viaLocal)
  }

  test("q_unigram_apply's pinned dictionary trains to EXACTLY the oracle's inlined pieces") {
    // the q_unigram_apply oracle spells these 20 (piece, logp_micro)
    // rows as SQL VALUES (and hard-codes maxPieceLen 6 = "stream");
    // trainer drift fails HERE before the oracle can mismatch — the
    // artifact-as-fixture contract, unigram arm
    val got = Unigram.trainLocal(SparkEntry.BpeApplyDict, vocabSize = 20)
      .map(p => (p.piece, p.logpMicro, p.pieceId)).toSeq
    val pinned = Seq(
      ("a", -1813266L, 0), ("l", -2058388L, 1), ("t", -2309703L, 2),
      ("s", -2550865L, 3), ("scan", -2646175L, 4), ("e", -2751535L, 5),
      ("h", -2751535L, 6), ("spark", -2751535L, 7), ("sort", -2869318L, 8),
      ("stream", -3002850L, 9), ("b", -3157000L, 10), ("d", -3339322L, 11),
      ("m", -3562466L, 12), ("o", -3562466L, 13), ("w", -3562466L, 14),
      ("c", -5641907L, 15), ("k", -5641907L, 16), ("n", -5641907L, 17),
      ("p", -5641907L, 18), ("r", -5641907L, 19))
    assert(got == pinned,
      s"trainLocal(BpeApplyDict) drifted from the oracle's inlined pieces: $got")
    assert(got.map(_._1.length).max == 6,
      "the oracle hard-codes maxPieceLen 6 — re-pin both together")
  }

}
