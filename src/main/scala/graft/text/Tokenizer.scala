package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenization to TRAINING IDS — the materialization step between
  * text curation and a training loader. Row 36 counts tokens; a
  * loader needs the ids themselves. Two layers:
  *
  *  - a frequency VOCABULARY (top-K tokens by corpus count,
  *    deterministic tie-break) + whitespace tokenize-to-ids with an
  *    UNK fallback — fully SQL-expressible, DuckDB-oracled;
  *  - a trained BPE subword tokenizer ([[Bpe]]) for open-vocabulary
  *    encoding, the tokenizer family real pipelines train
  *    (GPT-2/RoBERTa-style merges without the byte-level alphabet —
  *    whitespace pre-tokenization like the rest of this repo).
  *
  * Scale shapes (100 TB): vocabulary building is one token groupBy
  * (partial-agg) + a top-K sort over the VOCAB (vocab-bounded, never
  * corpus-bounded); encoding joins the corpus' exploded tokens against
  * the vocab artifact on the token key (AQE broadcasts while the vocab
  * is small) — a pure equi-join, nothing per-row iterative. */
object Tokenizer {

  /** Top-`vocabSize` tokens by corpus frequency; `id` is the dense
    * rank in (count DESC, token ASC) order — deterministic across
    * engines and re-shards. Ids start at 0; `unkId` (callers use
    * [[UnkId]] = -1) never collides.
    *
    * Scale shape: the top-K cut is `orderBy(…).limit(K)`, which Spark
    * plans as a distributed `TakeOrderedAndProject` — every partition
    * contributes only its local top K, so no task ever holds more than
    * K rows. (A whitespace-token table at 100 TB is 10⁸–10⁹ distinct
    * rows — URLs, numbers, typos — so ranking it through one
    * unpartitioned Window would single-task-sort the whole thing; only
    * the K SURVIVORS are ranked here, by a monotonic-id projection
    * over the K-row result partition — no WindowExec at all.) */
  def buildVocab(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be positive")
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
    // rankTop = orderBy().limit(K) (TakeOrderedAndProject) + a
    // monotonic-id rank over the K survivors — no WindowExec anywhere
    graft.vector.Ranked.rankTop(counts, vocabSize, col("n").desc, col("token"))
      .select(col("token"), (col("rank") - 1).as("id"), col("n"))
  }

  /** Out-of-vocabulary id. */
  val UnkId: Int = -1

  /** Encode every document's tokens to vocabulary ids, one output row
    * per token position: (doc_id, pos, token_id) with `pos` 0-based and
    * OOV tokens mapped to [[UnkId]]. The exploded form is the
    * join-shaped one (vocab equi-join on the token key, order carried
    * by `pos`); [[tokenizeIdArrays]] re-gathers arrays for loaders. */
  def tokenizeIds(docs: DataFrame, idCol: String, textCol: String,
                  vocab: DataFrame): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
      .where(col("token") =!= "")
      .join(vocab.select(col("token"), col("id")), Seq("token"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("id"), lit(UnkId)).as("token_id"))

  /** The loader-facing array form: (doc_id, token_ids). The gather is
    * a per-document sort of per-document positions (bounded by doc
    * length), grouped on the id key — one shuffle, no global sort. */
  def tokenizeIdArrays(docs: DataFrame, idCol: String, textCol: String,
                       vocab: DataFrame): DataFrame =
    tokenizeIds(docs, idCol, textCol, vocab)
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("token_id")))),
        p => p("token_id")).as("token_ids"))
}

/** Byte-pair-encoding tokenizer, trained Spark-first:
  *
  *  1. WORD COUNTS are distributed (one groupBy over the corpus' only
  *     full scan) — the classic BPE trick is that training never needs
  *     the corpus, only the (word, count) dictionary, which is
  *     vocab-bounded (Heaps' law), not corpus-bounded.
  *  2. The MERGE LOOP runs on the driver over that dictionary (exactly
  *     how HF/sentencepiece train: greedy highest-count pair, ranked
  *     merge list; ties break on the pair's symbols for determinism).
  *  3. ENCODING re-uses the same boundedness: the corpus' DISTINCT
  *     words are encoded once (mapPartitions over the word table with
  *     the broadcast merge ranks — per-word iterative merging never
  *     touches corpus-sized data), and documents join their exploded
  *     tokens against that (word → pieces) table on the word key.
  *
  * Words are terminated with [[Bpe.EndMark]] (the GPT-2 "</w>"
  * convention) so "low" and "lower" share prefixes but not suffixes. */
object Bpe {
  val EndMark = "</w>"

  /** One merge: rank order, the two symbols joined, and the result. */
  case class Merge(rank: Int, left: String, right: String)

  /** Train `numMerges` BPE merges from the corpus. Returns the ranked
    * merge table (rank, left, right) — the persistable model artifact.
    * `minCount` drops hapax words from training (standard; keeps the
    * driver dictionary tight), and `maxWords` caps the driver-side
    * dictionary at the top-N word types by count (count DESC, word ASC
    * tie-break — deterministic): at 100 TB the distinct-word dictionary
    * itself grows past what one driver should hold, and training on
    * the head types is what real tokenizer trainers do — the dropped
    * tail is by construction the word mass that influences pair counts
    * least. The top-N cut is computed distributed (the same
    * vocab-bounded rank as [[Tokenizer.buildVocab]]); only the
    * surviving dictionary crosses to the driver. Deterministic: greedy
    * argmax with (left, right) lexicographic tie-break. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 1L, maxWords: Int = 1000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // orderBy().limit() plans as a distributed TakeOrderedAndProject:
    // each partition ships only its local top maxWords, so the cut is
    // bounded by maxWords per task — no single-partition sort of the
    // full distinct-word table (which is NOT small at 100 TB).
    val wordCounts = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = trainLocal(wordCounts, numMerges)
    merges.toSeq.toDF("rank", "left", "right")
  }

  /** The classic merge loop over a (word, count) dictionary. */
  private[graft] def trainLocal(wordCounts: Array[(String, Long)],
                               numMerges: Int): Array[Merge] = {
    // each word as its symbol sequence (chars + terminal EndMark)
    var seqs: Array[(Array[String], Long)] = wordCounts.map { case (w, n) =>
      (w.map(_.toString).toArray :+ EndMark, n)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.values.max
        // ties -> lexicographically SMALLEST pair wins (deterministic)
        val tied = pairCounts.collect { case (k, n) if n == best => k }.min
        if (best < 2) done = true // nothing left that repeats
        else {
          out += Merge(r, tied._1, tied._2)
          val merged = tied._1 + tied._2
          seqs = seqs.map { case (syms, n) =>
            val b = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == tied._1 && syms(i + 1) == tied._2) {
                b += merged; i += 2
              } else { b += syms(i); i += 1 }
            }
            (b.toArray, n)
          }
          r += 1
        }
      }
    }
    out.toArray
  }

  /** Encode one word against ranked merges (lowest rank first — the
    * canonical BPE inference order). */
  private[graft] def encodeWord(w: String,
                               ranks: Map[(String, String), Int]): Array[String] = {
    var syms = w.map(_.toString).toArray :+ EndMark
    var go = true
    while (go && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) go = false
      else {
        val b = new scala.collection.mutable.ArrayBuffer[String](syms.length - 1)
        var j = 0
        while (j < syms.length) {
          if (j == bestAt) { b += (syms(j) + syms(j + 1)); j += 2 }
          else { b += syms(j); j += 1 }
        }
        syms = b.toArray
      }
    }
    syms
  }

  /** Encode documents to subword pieces: (doc_id, pos, pieces) — one
    * row per WORD position, `pieces` the word's subword strings. The
    * per-word iterative merge runs ONCE PER DISTINCT WORD
    * (mapPartitions over the distinct-word table, merge ranks
    * broadcast), then documents equi-join their exploded tokens
    * against the (word → pieces) table — corpus-sized data never sees
    * the loop. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = collectRanks(merges)
    val bc = spark.sparkContext.broadcast(ranks)
    val toks = explodeWords(docs, idCol, textCol)
    val pieces = toks.select(col("w")).distinct()
      .as[String]
      .mapPartitions { it =>
        val rk = bc.value
        it.map(w => (w, encodeWord(w, rk).toSeq))
      }.toDF("w", "pieces")
    toks.join(pieces, Seq("w"), "left")
      .select(col("doc_id"), col("pos"), col("pieces"))
  }

  /** The bounded (numMerges rows) artifact fetch both encode paths
    * share. */
  private def collectRanks(merges: DataFrame): Map[(String, String), Int] =
    merges.select(col("rank"), col("left"), col("right"))
      .collect().map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap

  private def explodeWords(docs: DataFrame, idCol: String,
                           textCol: String): DataFrame = docs
    .select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    .where(col("w") =!= "")

  /** Decompose a merge symbol into its unit symbols: single characters,
    * with a trailing [[EndMark]] kept whole. */
  private[graft] def unitSymbols(s: String): Seq[String] =
    if (s.endsWith(EndMark) && s.length > EndMark.length)
      s.dropRight(EndMark.length).map(_.toString) :+ EndMark
    else if (s == EndMark) Seq(EndMark)
    else s.map(_.toString)

  /** Piece → id map derived from the MERGE ARTIFACT ALONE — no new
    * ranking pass, byte-stable across sessions that share the
    * persisted merge table (the property a training loader needs):
    * id 0 = [[EndMark]], ids 1..A = the base alphabet (the distinct
    * single characters of the merge symbols, sorted), then one id per
    * merge PRODUCT in rank order (the GPT-2 vocab discipline: base
    * alphabet first, merges append). A piece outside the map — a
    * character no merge ever touched — encodes as [[Tokenizer.UnkId]],
    * the same OOV contract as the frequency vocabulary. */
  private[graft] def pieceIds(merges: DataFrame): Map[String, Int] = {
    val ms = merges.select(col("rank"), col("left"), col("right"))
      .collect().map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank)
    val alphabet = ms.flatMap(m => Seq(m.left, m.right))
      .flatMap(unitSymbols).filterNot(_ == EndMark).distinct.sorted
    val base = (EndMark -> 0) +: alphabet.zipWithIndex.map { case (c, i) => (c, i + 1) }
    val products = ms.map(m => m.left + m.right)
      .zipWithIndex.map { case (p, i) => (p, alphabet.length + 1 + i) }
    // first-wins on any collision keeps the map deterministic
    (base ++ products).foldLeft(Map.empty[String, Int]) {
      case (acc, (p, i)) => if (acc.contains(p)) acc else acc + (p -> i)
    }
  }

  /** The id-valued vocabulary as a frame (piece, piece_id) — the
    * persistable/inspectable form of [[pieceIds]]. */
  def pieceVocab(merges: DataFrame): DataFrame = {
    val spark = merges.sparkSession
    import spark.implicits._
    pieceIds(merges).toSeq.sortBy(_._2).toDF("piece", "piece_id")
  }

  /** Encode documents to LOADER IDS: (doc_id, pos, piece_ids) — one
    * row per word position, `piece_ids` the word's subword ids under
    * [[pieceIds]] (OOV pieces → [[Tokenizer.UnkId]]). Same scale shape
    * as [[encode]]: the merge loop runs once per DISTINCT word with
    * the ranks and the id map broadcast; documents equi-join the
    * (word → ids) table on the word key. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bcRanks = spark.sparkContext.broadcast(collectRanks(merges))
    val bcIds = spark.sparkContext.broadcast(pieceIds(merges))
    val toks = explodeWords(docs, idCol, textCol)
    val ids = toks.select(col("w")).distinct()
      .as[String]
      .mapPartitions { it =>
        val rk = bcRanks.value
        val pid = bcIds.value
        it.map(w => (w,
          encodeWord(w, rk).toSeq.map(pid.getOrElse(_, Tokenizer.UnkId))))
      }.toDF("w", "piece_ids")
    toks.join(ids, Seq("w"), "left")
      .select(col("doc_id"), col("pos"), col("piece_ids"))
  }

  /** The loader-facing array form: (doc_id, token_ids) with every
    * word's piece ids flattened in word order — the BPE analog of
    * [[Tokenizer.tokenizeIdArrays]] (same one-shuffle per-document
    * gather, bounded by document length). */
  def encodeIdArrays(docs: DataFrame, idCol: String, textCol: String,
                     merges: DataFrame): DataFrame =
    encodeIds(docs, idCol, textCol, merges)
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("piece_ids")))),
        p => p("piece_ids"))).as("token_ids"))
}
