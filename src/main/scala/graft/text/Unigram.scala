package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the OTHER trainer SentencePiece ships next to BPE): pieces carry
  * probabilities, training alternates EM re-estimation with pruning of
  * low-contribution pieces, and encoding is Viterbi segmentation
  * (the max-probability split of each word). Complements [[Bpe]]:
  * merges grow a vocabulary bottom-up, unigram shrinks a rich seed
  * top-down — the trainer behind T5/ALBERT/XLNet vocabularies.
  *
  * Spark-first by the same boundedness as BPE: training never needs
  * the corpus, only the (word, count) dictionary (vocab-bounded by
  * Heaps' law, top-`maxWords` cut computed DISTRIBUTED via
  * TakeOrderedAndProject before the bounded driver collect); the
  * EM/prune loop runs driver-side over that dictionary exactly like
  * sentencepiece's trainer; encoding pays the Viterbi loop once per
  * DISTINCT word (mapPartitions over the word table with the broadcast
  * piece table) and documents equi-join the (word → pieces) map —
  * corpus-sized data never sees the loop.
  *
  * Determinism (the property every artifact here carries): the seed
  * is count-ranked with lexicographic tie-breaks; EM uses HARD
  * (Viterbi) counts, so expected counts are exact integers; piece
  * log-probabilities round ONCE to integer MICRO-NATS (the row-86 LM
  * discipline) and Viterbi maximizes an integer sum with a pinned
  * tie-break (fewer pieces, then the lexicographically smaller
  * candidate piece at each prefix — a deterministic LOCAL rule, see
  * [[viterbi]]) — two sessions, or two engines walking the same table
  * with the same rule, segment identically. Single characters are
  * never pruned, so any word over
  * the training alphabet is always segmentable; characters never seen
  * in training encode as [[Tokenizer.UnkId]] pieces.
  */
object Unigram {

  /** One vocabulary entry: the piece, its log-probability in
    * micro-nats (ln p × 10⁶, BIGINT), and its dense id (rank in
    * (logp DESC, piece ASC) order — derivable from the artifact
    * alone, byte-stable across sessions). */
  case class Piece(piece: String, logpMicro: Long, pieceId: Int)

  /** Train a unigram vocabulary of (at most) `vocabSize` pieces.
    * Returns the persistable artifact (piece, logp_micro, piece_id).
    *
    * `maxPieceLen` bounds seed substrings (sentencepiece's
    * max_sentencepiece_length, default 16 there, 8 here — whitespace
    * pre-tokens are short); `seedFactor` sizes the seed at
    * seedFactor × vocabSize before pruning (sentencepiece seeds big
    * and shrinks); `emRounds` EM sweeps between prunes. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            minCount: Long = 1L, maxWords: Int = 1000000,
            maxPieceLen: Int = 8, seedFactor: Int = 4,
            emRounds: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordCounts = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainLocal(wordCounts, vocabSize, maxPieceLen, seedFactor, emRounds)
      .toSeq.toDF("piece", "logp_micro", "piece_id")
  }

  /** The EM + prune loop over a (word, count) dictionary. */
  private[graft] def trainLocal(wordCounts: Array[(String, Long)],
                                vocabSize: Int, maxPieceLen: Int = 8,
                                seedFactor: Int = 4,
                                emRounds: Int = 2): Array[Piece] = {
    require(vocabSize >= 1, "vocabSize must be positive")
    // ---- seed: all substrings up to maxPieceLen, count-weighted ----
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    wordCounts.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val s = w.substring(i, j)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + n)
          j += 1
        }
        i += 1
      }
    }
    val chars = subCounts.keysIterator.filter(_.length == 1).toArray
    // seed = every single char (coverage floor) + the top multi-char
    // substrings by (count·(len−1)) — the sentencepiece seed heuristic:
    // long frequent substrings save the most encoding length
    val seedSize = math.max(vocabSize * seedFactor, chars.length + 1)
    val multi = subCounts.iterator.filter(_._1.length > 1).toArray
      .sortBy { case (s, n) => (-n * (s.length - 1), s) }
      .take(math.max(0, seedSize - chars.length)).map(_._1)
    var vocab: Array[String] = (chars ++ multi).distinct.sorted

    // ---- EM/prune alternation until the vocab fits ----
    var probs: Map[String, Double] = {
      val tot = vocab.map(subCounts(_)).sum.toDouble
      vocab.map(s => s -> subCounts(s) / tot).toMap
    }
    def emPass(): Map[String, Long] = {
      // HARD EM: Viterbi-segment each word under current probs, count
      // pieces weighted by word count — exact integer counts
      val micro = probs.map { case (s, p) =>
        s -> math.round(math.log(p) * 1e6)
      }
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      wordCounts.foreach { case (w, n) =>
        viterbi(w, micro, maxPieceLen).foreach { s =>
          counts.update(s, counts.getOrElse(s, 0L) + n)
        }
      }
      counts.toMap
    }
    var done = false
    while (!done) {
      var r = 0
      var counts = Map.empty[String, Long]
      while (r < emRounds) {
        counts = emPass()
        val tot = math.max(1L, counts.values.sum).toDouble
        // unused pieces keep an epsilon so a later round can revive
        // them only via pruning order, never by division by zero
        probs = vocab.map(s =>
          s -> math.max(counts.getOrElse(s, 0L).toDouble, 0.5) / tot).toMap
        r += 1
      }
      if (vocab.length <= vocabSize ||
          // nothing prunable left: chars are a coverage floor, so a
          // vocabSize below the alphabet size converges to the alphabet
          vocab.forall(_.length == 1)) done = true
      else {
        // prune: keep every single char + the best multi-char pieces
        // by Viterbi count (count DESC, piece ASC — deterministic);
        // shrink by at most 25% per round (the sentencepiece schedule)
        // so the EM re-converges between cuts
        val keepTarget = math.max(vocabSize,
          (vocab.length * 3) / 4)
        val keepChars = vocab.filter(_.length == 1)
        val keepMulti = vocab.filter(_.length > 1)
          .sortBy(s => (-counts.getOrElse(s, 0L), s))
          .take(math.max(0, keepTarget - keepChars.length))
        vocab = (keepChars ++ keepMulti).sorted
        val tot = math.max(1L, vocab.map(s => counts.getOrElse(s, 0L)).sum).toDouble
        probs = vocab.map(s =>
          s -> math.max(counts.getOrElse(s, 0L).toDouble, 0.5) / tot).toMap
      }
    }
    // ---- final artifact: micro-nat log-probs + dense ids ----
    val micro = vocab.map(s => (s, math.round(math.log(probs(s)) * 1e6)))
      .sortBy { case (s, lp) => (-lp, s) }
    micro.zipWithIndex.map { case ((s, lp), i) => Piece(s, lp, i) }
  }

  /** Viterbi segmentation of one word: the piece sequence maximizing
    * the INTEGER micro-nat sum, ties broken by fewer pieces, then by
    * the lexicographically smaller candidate piece at each prefix (a
    * deterministic local rule — all integer/string comparisons, no
    * float order anywhere). Characters absent from
    * the table segment as single-char UNKNOWN pieces with a floor
    * score, so segmentation is total. */
  private[graft] def viterbi(w: String, logpMicro: Map[String, Long],
                             maxPieceLen: Int): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    val UnkPenalty = -69000000L // ~ln(1e-30)·1e6, below any real piece
    // best(i) = (score, pieceCount, pieces-as-list) ending at i
    val bestScore = new Array[Long](n + 1)
    val bestLen = new Array[Int](n + 1)
    val bestPrev = new Array[Int](n + 1)
    val bestPiece = new Array[String](n + 1)
    java.util.Arrays.fill(bestScore, Long.MinValue / 4)
    bestScore(0) = 0L
    bestLen(0) = 0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - math.max(maxPieceLen, 1))
      while (j < i) {
        val cand = w.substring(j, i)
        val lpOpt = logpMicro.get(cand)
        val lp = lpOpt.getOrElse(
          if (cand.length == 1) UnkPenalty else Long.MinValue / 4)
        if (lp > Long.MinValue / 8 && bestScore(j) > Long.MinValue / 8) {
          val sc = bestScore(j) + lp
          val ln = bestLen(j) + 1
          val better = sc > bestScore(i) ||
            (sc == bestScore(i) && (ln < bestLen(i) ||
              (ln == bestLen(i) && bestPiece(i) != null &&
                cand < bestPiece(i))))
          if (better) {
            bestScore(i) = sc; bestLen(i) = ln
            bestPrev(i) = j; bestPiece(i) = cand
          }
        }
        j += 1
      }
      i += 1
    }
    // backtrack
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { out += bestPiece(k); k = bestPrev(k) }
    out.reverseIterator.toArray
  }

  /** The bounded artifact fetch the encode paths share:
    * piece → (logp_micro, piece_id). Fails fast on an empty artifact
    * (a trainer run over an empty corpus, or one where every word fell
    * below minCount) — encoding against no pieces would otherwise
    * surface as an NPE in the max-piece-length probe. */
  private def collectPieces(model: DataFrame): Map[String, (Long, Int)] = {
    val m = model.select(col("piece"), col("logp_micro"), col("piece_id"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    require(m.nonEmpty,
      "empty unigram model: train on a non-empty corpus (or lower minCount)")
    m
  }

  private def explodeWords(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = docs
    .select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    .where(col("w") =!= "")

  /** Encode documents to unigram pieces: (doc_id, pos, pieces), one
    * row per word position. The Viterbi loop runs once per DISTINCT
    * word (broadcast piece table); documents equi-join the
    * (word → pieces) map — [[Bpe.encode]]'s scale shape exactly. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             model: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      collectPieces(model).map { case (s, (lp, _)) => (s, lp) })
    val maxLen = math.max(1,
      model.agg(max(length(col("piece")))).collect()(0).getInt(0))
    val toks = explodeWords(docs, idCol, textCol)
    val pieces = toks.select(col("w")).distinct()
      .as[String]
      .mapPartitions { it =>
        val lp = bc.value
        it.map(w => (w, viterbi(w, lp, maxLen).toSeq))
      }.toDF("w", "pieces")
    toks.join(pieces, Seq("w"), "left")
      .select(col("doc_id"), col("pos"), col("pieces"))
  }

  /** Encode to LOADER IDS: (doc_id, pos, piece_ids); pieces outside
    * the table (unknown single characters) map to
    * [[Tokenizer.UnkId]]. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                model: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = collectPieces(model)
    val bcLp = spark.sparkContext.broadcast(
      table.map { case (s, (lp, _)) => (s, lp) })
    val bcId = spark.sparkContext.broadcast(
      table.map { case (s, (_, id)) => (s, id) })
    val maxLen = math.max(1,
      model.agg(max(length(col("piece")))).collect()(0).getInt(0))
    val toks = explodeWords(docs, idCol, textCol)
    val ids = toks.select(col("w")).distinct()
      .as[String]
      .mapPartitions { it =>
        val lp = bcLp.value
        val pid = bcId.value
        it.map(w => (w, viterbi(w, lp, maxLen).toSeq
          .map(pid.getOrElse(_, Tokenizer.UnkId))))
      }.toDF("w", "piece_ids")
    toks.join(ids, Seq("w"), "left")
      .select(col("doc_id"), col("pos"), col("piece_ids"))
  }

  /** The loader-facing array form, word-order-flattened — the unigram
    * analog of [[Bpe.encodeIdArrays]]. */
  def encodeIdArrays(docs: DataFrame, idCol: String, textCol: String,
                     model: DataFrame): DataFrame =
    encodeIds(docs, idCol, textCol, model)
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("piece_ids")))),
        p => p("piece_ids"))).as("token_ids"))
}
