package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-pipeline layer: language ID,
  * quality scoring, token counting, document fingerprinting and the
  * chunk splitter (the reference's CollectionView SplitterProcess,
  * /root/reference/aiotcvectordb/model/ai_database.py /
  * collection_view.py: chunk_splitter with chunk size/overlap and
  * append_title_to_chunk).
  *
  * Everything here is built from codegen'd `functions._` expressions
  * over the raw text column — one narrow projection per operator, no
  * shuffle, no UDF — so each op streams at parquet-scan speed
  * regardless of corpus size.
  */
object TextAnalysis {

  private def toks(textCol: Column): Column = split(textCol, " ")

  /** Per-language stopword hit counts; prediction = argmax with
    * alphabetical tie-break. Heuristic n-gram/stopword language ID. */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "en", "que"),
    "fr" -> Seq("le", "la", "de", "et", "est", "une"))

  private def hitCount(textColName: String, words: Seq[String]): Column = {
    val list = words.map(w => s"'$w'").mkString(", ")
    expr(s"size(filter(split($textColName, ' '), x -> x IN ($list)))")
  }

  /** The four-way stopword argmax (ties resolve in de/en/es/fr scan
    * order) — ONE definition shared by the per-doc classifier
    * ([[langId]]) and the per-line composition
    * ([[langLineComposition]]), so the rule cannot diverge between the
    * two (nor between their mirrored oracles). */
  private def langArgmax(textColName: String): Column = {
    val de = hitCount(textColName, stopwords("de"))
    val en = hitCount(textColName, stopwords("en"))
    val es = hitCount(textColName, stopwords("es"))
    val fr = hitCount(textColName, stopwords("fr"))
    when(de >= en && de >= es && de >= fr, "de")
      .when(en >= es && en >= fr, "en")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      hitCount(textCol, stopwords("de")).as("s_de"),
      hitCount(textCol, stopwords("en")).as("s_en"),
      hitCount(textCol, stopwords("es")).as("s_es"),
      hitCount(textCol, stopwords("fr")).as("s_fr"),
      langArgmax(textCol).as("predicted"))

  /** Per-LINE language composition — mixed-language page detection
    * (the page-level companion of [[langId]]: CCNet classifies per
    * paragraph and real web pages mix languages; a page whose lines
    * disagree with its majority language is navigation chrome,
    * bilingual boilerplate, or a scrape artifact, and monolingual
    * corpora drop or segment it). Each line classifies under the SAME
    * stopword rule as [[langId]]; the report gives per doc the line
    * count, the majority language (ties break to the alphabetically
    * first — all-zero stopword lines classify 'de' by the same rule on
    * both engines), the majority's line count, and the agreement
    * ratio (one long/long IEEE division, unrounded — the row-35
    * discipline). Threshold `agreement` to drop mixed pages.
    *
    * Scale shape: one line explode, one (doc, lang) groupBy, one
    * struct-min per doc — map-side-combinable aggregations only, the
    * text never shuffles (lines collapse to counts before any
    * exchange). */
  def langLineComposition(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val lines = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), "\n")).as("__line"))
    val scored = lines.select(col("doc_id"), langArgmax("__line").as("lang"))
    val counts = scored.groupBy("doc_id", "lang").agg(count(lit(1)).as("__c"))
    counts.groupBy("doc_id")
      .agg(sum("__c").as("n_lines"),
        // min over (−count, lang): highest count, then alphabetically
        // first language — deterministic struct ordering on both engines
        min(struct((-col("__c")).as("nc"), col("lang"))).as("__m"))
      .select(col("doc_id"), col("n_lines"),
        col("__m.lang").as("major_lang"),
        (-col("__m.nc")).as("n_major"),
        ((-col("__m.nc")).cast("double") / col("n_lines")).as("agreement"))
  }

  /** Quality score from length / repetition / stopword ratios. `keep`
    * columns pass through unchanged (e.g. a group key for downstream
    * per-group curation — cheaper than joining them back by id). */
  def quality(docs: DataFrame, idCol: String, textCol: String,
              keep: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val nTokens = size(toks(t))
    val nDistinct = size(array_distinct(toks(t)))
    val stopHits = hitCount(textCol, stopwords("en"))
    // Ratios are left unrounded: both engines evaluate the identical
    // IEEE expression tree over exact integer inputs, so raw doubles are
    // bit-equal — while round(x, 4) can disagree on exact .00005
    // boundaries (BigDecimal HALF_UP vs scaled std::round).
    docs.select((col(idCol) +: keep.map(col)) ++ Seq(
      nTokens.as("n_tokens"),
      nDistinct.as("n_distinct"),
      ((length(t) - (nTokens - lit(1))) / nTokens.cast("double")).as("avg_token_len"),
      (nDistinct / nTokens.cast("double")).as("distinct_ratio"),
      (stopHits / nTokens.cast("double")).as("stopword_ratio"),
      (lit(0.4) * least(lit(1.0), nTokens / lit(100.0)) +
        lit(0.3) * (nDistinct / nTokens.cast("double")) +
        lit(0.3) * least(lit(1.0), (stopHits / nTokens.cast("double")) * lit(5.0)))
        .as("quality")): _*)
  }

  /** Unicode text normalization — the cleanup pass every web-scale
    * pipeline runs before tokenization/dedup (C4 and Gopher both
    * normalize before filtering; a dedup over unnormalized text misses
    * byte-different-but-visually-identical twins):
    *
    *  - curly quotes → straight (‘ ’ → ', “ ” → "),
    *    en/em dash → '-', NBSP → space  (1:1 `translate` — equal-length
    *    from/to so no silent deletion)
    *  - zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) and C0 controls
    *    except \n\t stripped
    *  - runs of spaces/tabs collapsed to one space, outer whitespace
    *    trimmed
    *
    * Every rule is an engine-portable translate/regexp_replace, so a
    * DuckDB oracle evaluates the identical normalization. NULL text
    * folds to '' (the c4Clean totality contract). Pure projection at
    * scan speed; returns (id, text_norm, changed). */
  def normalizeText(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val folded = translate(t,
      "\u2018\u2019\u201C\u201D\u2013\u2014\u00A0",
      "''\"\"-- ")
    val stripped = regexp_replace(folded,
      "[\u200B\u200C\u200D\uFEFF\u0000-\u0008\u000B\u000C\u000E-\u001F]", "")
    val collapsed = trim(regexp_replace(stripped, "[ \t]+", " "))
    docs.select(
      col(idCol),
      collapsed.as("text_norm"),
      (collapsed =!= coalesce(col(textCol), lit(""))).as("changed"))
  }

  /** Whitespace token count + BPE-ish regex token count + char count. */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      size(toks(t)).as("ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
        .as("bpe_tokens"),
      length(t).as("n_chars"))
  }

  /** TF-IDF keyword extraction — the top-k most characteristic terms
    * per document (classic Salton-style tf·idf with the smoothed idf
    * every IR stack ships: idf = ln((N+1)/(df+1)) + 1, strictly
    * positive so single-doc corpora still rank). The per-corpus idf
    * table doubles as a corpus-profiling artifact; the per-doc top
    * terms feed topic tagging, mixture labelling, and the keyword arms
    * of hybrid search.
    *
    * Engine-reproducible by the repo's micro-unit discipline: the one
    * libm call (ln) is rounded ONCE to an integer micro-nat idf per
    * TERM, scores are `tf × idf_micro` — pure BIGINT products — and
    * ranking is (score_micro DESC, term ASC), so no double summation
    * or half-boundary round exists for two engines to disagree on.
    *
    * Scale shape: tf is one hash aggregation over exploded
    * (doc, term) pairs with map-side combine; df aggregates the tf
    * table (already one row per (doc, term)); N is one bounded scalar
    * count; the rank window partitions by doc_id (per-doc term counts
    * are document-bounded). The text column never shuffles — only
    * (id, term, count) slivers move. */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count()
    // Par.floor: the term explode + (doc, term) partial aggregation is
    // the heavy pre-shuffle stage
    val tf = graft.ops.Par.floor(
        docs.select(col(idCol), toks(col(textCol)).as("__t")), col(idCol))
      .select(col(idCol), explode(col("__t")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idfMicro = round(log((lit(n) + lit(1.0)) / (col("df") + lit(1.0))) *
        lit(1000000.0) + lit(1000000.0), 0).cast("long")
    val scored = tf.join(df.select(col("term"), idfMicro.as("idf_micro")), "term")
      .withColumn("score_micro", col("tf") * col("idf_micro"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score_micro").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("tf"), col("score_micro"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS scheme): hash every k-token gram, slide a window of `w`
    * consecutive hashes, select each window's minimum (leftmost on
    * ties — deterministic; the paper's robust variant picks rightmost,
    * the guarantee below holds for either). The selected (position,
    * hash) set is the document's fingerprint sketch with TWO provable
    * properties row 37's single rolling hash lacks: any cross-document
    * verbatim match of ≥ w+k−1 tokens shares at least one fingerprint
    * (detection guarantee at ANY alignment), and the sketch density is
    * ≤ 2/(w+1) of positions (size guarantee) — the principled sweet
    * spot between stride-16 blocks (row 62, alignment-blind) and
    * stride-1 windows (row 87, k× the tokens).
    *
    * Gram hashes are the engine-portable salted-md5 32-bit device
    * (rows 49/82/89 — a DuckDB oracle writes the identical integers),
    * and the whole computation is per-row higher-order-function
    * arithmetic: one projection, NO shuffle, nothing leaves the row
    * until the final distinct-explode of the (pos, hash) selections.
    * Join two corpora's outputs on `fingerprint` for candidate match
    * detection — a posting-list join like every dedup family here. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 4,
                         salt: String = "winnow"): DataFrame =
    winnowSelections(docs, idCol, textCol, k, w, salt).distinct()

  /** The raw per-window selections BEFORE the distinct — shared by
    * [[winnowFingerprints]] (distinct over (doc, pos, hash)) and
    * [[winnowMatches]] (which only needs distinct (doc, hash), so
    * distincting the wider key first would be a wasted corpus-sized
    * exchange). */
  private def winnowSelections(docs: DataFrame, idCol: String,
                               textCol: String, k: Int, w: Int,
                               salt: String): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val toksC = filter(split(col(textCol), " "), x => x =!= "")
    // The eligibility filter tests the TOKEN COUNT (a doc yields >= w
    // windows iff it has >= k+w-1 tokens — size(__h) = ntok-k+1), so
    // the predicate Catalyst pushes toward the scan costs one
    // split+count per row; filtering on size(__h) instead duplicated
    // the ENTIRE per-gram md5 expression into the pushed filter
    // (hashing every gram twice — guide §4.4's duplication, reproduced
    // with built-in expressions; the r14 before-plan shows it).
    // Par.floor then (a) spreads the per-gram hashing across cores —
    // this stage is the corpus-heaviest pure projection in the bench —
    // and (b) acts as the projection barrier that materializes the
    // token array: CollapseProject would otherwise inline
    // filter(split(text)) into every gram's slice() lambda,
    // O(grams·tokens) splitting per document.
    val toks = graft.ops.Par.floor(
      docs
        .select(col(idCol).as("doc_id"), toksC.as("__t"))
        .where(size(col("__t")) >= k + w - 1),
      col("doc_id"))
    // k-gram strings, then the 32-bit salted-md5 hash of each (the
    // salt binds as a lit — never interpolated into SQL text, the
    // saltedHash32 discipline). The hash array MATERIALIZES as its own
    // column before the window pass: element_at inside a lambda does
    // not share subexpressions with the enclosing projection, so
    // referencing the transform expression there would recompute EVERY
    // gram's md5 per element access — O(grams²·w) hashing per document
    // instead of O(grams)
    val hashesC =
      transform(
        transform(sequence(lit(0), size(col("__t")) - k),
          i => array_join(slice(col("__t"), i + 1, lit(k)), " ")),
        g => conv(substring(md5(concat(g, lit(salt))), 1, 8), 16, 10)
          .cast("long"))
    // per window j (0-based): leftmost argmin of __h[j .. j+w-1]
    val sels =
      s"""transform(sequence(0, size(__h) - $w), j ->
         |  aggregate(sequence(j, j + $w - 1),
         |    struct(CAST(NULL AS BIGINT) AS mh, CAST(-1 AS INT) AS mp),
         |    (acc, i) -> CASE WHEN acc.mh IS NULL
         |                       OR element_at(__h, i + 1) < acc.mh
         |                  THEN struct(element_at(__h, i + 1) AS mh,
         |                              CAST(i AS INT) AS mp)
         |                  ELSE acc END))""".stripMargin
    toks
      .select(col("doc_id"), hashesC.as("__h"))
      .select(col("doc_id"), explode(expr(sels)).as("__s"))
      .select(col("doc_id"), col("__s.mp").as("pos"),
        col("__s.mh").as("fingerprint"))
  }

  /** Cross-document match candidates from the winnowing sketch: pairs
    * of documents sharing ≥ `minShared` distinct fingerprints, with
    * the shared count (MOSS's candidate stage). By the winnowing
    * guarantee, any pair sharing a verbatim passage of ≥ w+k−1 tokens
    * appears here — at any alignment — while the join is over the
    * ≤ 2/(w+1)-density sketch, not the text.
    *
    * Scale shape: one (fingerprint → doc) posting self-join, the same
    * geometry as every dedup family; `maxDf` drops fingerprints
    * present in more than that many documents BEFORE the join (the
    * boilerplate guard row 62/87 carry — a corpus-wide header's
    * fingerprint would otherwise quadratically explode its posting
    * group; matches supported only by such mass-repeated content are
    * boilerplate, not document similarity). */
  def winnowMatches(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 4, w: Int = 4, minShared: Int = 2,
                    maxDf: Int = 1000,
                    salt: String = "winnow"): DataFrame =
    winnowMatchesFromPostings(
      winnowPostings(docs, idCol, textCol, k, w, salt), minShared, maxDf)

  /** The distinct (doc_id, fingerprint) posting form of the sketch —
    * the persistable match-index artifact ([[winnowMatchesFromPostings]]
    * serves from it). One distinct on exactly the key the join needs
    * (position-free), never the wider (doc, pos, hash) one. */
  def winnowPostings(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 4, w: Int = 4,
                     salt: String = "winnow"): DataFrame =
    winnowSelections(docs, idCol, textCol, k, w, salt)
      .select(col("doc_id"), col("fingerprint")).distinct()

  /** [[winnowMatches]] over a PERSISTED distinct (doc_id, fingerprint)
    * posting table — the serving form: the sketch is an ingest
    * artifact (like every dedup family's signatures), match queries
    * pay only the posting join. */
  def winnowMatchesFromPostings(fp: DataFrame, minShared: Int = 2,
                                maxDf: Int = 1000): DataFrame = {
    val rare = fp.groupBy("fingerprint").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("fingerprint")
    val pruned = fp.join(rare, Seq("fingerprint"), "left_semi")
    val b = pruned.select(col("fingerprint"), col("doc_id").as("id_b"))
    // Par.floor on the probe side only — the ngramJaccardFromPostings
    // rationale (pair fanout + partial agg run pre-shuffle)
    graft.ops.Par.floor(pruned, col("doc_id"))
      .select(col("fingerprint"), col("doc_id").as("id_a"))
      .join(b, "fingerprint")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** PII pattern constants — ONE definition shared by the scrub and
    * its counters (see [[scrubPii]] for the count-vs-span overlap
    * contract on nested matches). RE2-safe
    * subset only (character classes + bounded quantifiers + \b): the
    * same pattern text must run identically on Spark (Java regex) and
    * a DuckDB oracle (RE2). */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[graft] val PhoneRe = "\\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\\b"

  /** PII scrubbing — the redaction pass every public-web training
    * pipeline runs before materialization: emails, IPv4 addresses, and
    * phone-shaped digit runs are replaced with typed placeholder
    * tokens (`<EMAIL>`/`<IP>`/`<PHONE>`), with per-document match
    * counts for pipeline monitoring. Counts run over the ORIGINAL
    * text while the replacements chain, so a phone- or IP-shaped run
    * INSIDE an email address is counted under its own pattern yet
    * redacted as part of `<EMAIL>` — counts may overlap email spans
    * and can exceed the placeholders actually emitted (the oracle
    * counts the same way, so parity holds).
    *
    * Order matters and is fixed: emails first (an address can embed
    * digit runs), then IPs (dot-joined digits), then phones. Pure
    * per-row projection — a regexp_replace chain at parquet-scan
    * speed; nothing shuffles at any corpus size. */
  def scrubPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      scrubExpr(t).as("text_clean"),
      regexp_count(t, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(t, lit(Ipv4Re)).cast("int").as("n_ips"),
      regexp_count(t, lit(PhoneRe)).cast("int").as("n_phones"))
  }

  /** The redaction chain as a standalone expression — composable into
    * any projection (the streaming curation gate scrubs in place with
    * it, no join). Same fixed order as [[scrubPii]]. */
  def scrubExpr(t: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(t,
      EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")

  /** C4's line-level cleaning rules (Raffel et al. 2020, §2.2 — the
    * filters behind the C4 corpus, run verbatim by most public
    * pretraining pipelines since): keep only lines that END in a
    * terminal punctuation mark (`.` `!` `?` `"`) AND carry at least
    * `minLineWords` words; drop any page mentioning "lorem ipsum" or
    * containing a curly brace (code/template residue); a page must
    * retain at least `minSentences` sentences (terminal-mark count
    * over the KEPT text) to survive.
    *
    * Returns (id, text_clean, n_lines, n_lines_kept, n_sentences,
    * keep) — the cleaned page is always materialized so callers can
    * audit what the rules removed; `keep` is the page-level verdict.
    * Every predicate is an engine-portable string operation
    * (left/right/instr — no regex beyond a character class), so a
    * DuckDB oracle evaluates the identical rules. Pure per-row
    * projection; nothing shuffles at any corpus size. */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
              minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    // NULL text folds to '' so the verdict is TOTAL (the gopherRules /
    // encodingNoise degenerate-input contract): split(NULL) would give
    // keep = NULL and n_lines = -1, making where(keep) vs where(!keep)
    // silently disagree on such rows
    val tc = s"coalesce($textCol, '')"
    val t = coalesce(col(textCol), lit(""))
    val keptArr = expr(
      s"""filter(split($tc, '\n'), x ->
         |  right(x, 1) IN ('.', '!', '?', '"')
         |  AND size(filter(split(x, ' '), w -> w <> '')) >= $minLineWords)"""
        .stripMargin)
    val clean = array_join(keptArr, "\n")
    val nSentences = regexp_count(clean, lit("[.!?]")).cast("int")
    docs.select(
        col(idCol),
        clean.as("text_clean"),
        size(expr(s"split($tc, '\n')")).as("n_lines"),
        size(keptArr).as("n_lines_kept"),
        nSentences.as("n_sentences"),
        (nSentences >= minSentences &&
          !instr(lower(t), "lorem ipsum").gt(0) &&
          !instr(t, "{").gt(0) && !instr(t, "}").gt(0)).as("keep"))
  }

  /** Gopher's document-quality rules (Rae et al. 2021, Appendix A1.1
    * — the hard filter set MassiveWeb ran, reused by most subsequent
    * corpora): word count in [50, 100k], mean word length in [3, 10],
    * symbol-to-word ratio (# or "...") ≤ 0.1, ≤ 90% of lines starting
    * with a bullet, ≤ 30% ending with an ellipsis, ≥ 80% of words
    * with an alphabetic character, and ≥ 2 hits in the 8-stopword
    * probe list (the,be,to,of,and,that,have,with).
    *
    * Emits every per-rule statistic plus the conjunction `keep`, so a
    * pipeline can both filter and report WHICH rule failed. Ratios
    * stay unrounded int/int divisions (the [[quality]] discipline);
    * line predicates use left/right string ops, words come from the
    * whitespace convention with newlines folded to spaces — all
    * engine-portable, DuckDB-oracled. Pure projection at scan
    * speed. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val words = expr(
      s"filter(split(replace($textCol, '\n', ' '), ' '), x -> x <> '')")
    val lines = expr(s"split($textCol, '\n')")
    val nWords = size(words)
    // word denominators floored at 1: a token-less doc reports 0.0
    // ratios (and fails the word-count rule) instead of NULLs that
    // would make `keep` NULL — the encodingNoise degenerate-input
    // contract, mirrored in the oracle. Lines never need the floor:
    // split('') is [''], so nLines >= 1 always.
    val wDen = greatest(nWords, lit(1)).cast("double")
    val nLines = size(lines)
    val meanLen = expr(
      s"""aggregate(filter(split(replace($textCol, '\n', ' '), ' '),
         |  x -> x <> ''), 0, (a, x) -> a + length(x))""".stripMargin)
      .cast("double") / wDen
    val alphaRatio = expr(
      s"""size(filter(filter(split(replace($textCol, '\n', ' '), ' '),
         |  x -> x <> ''), x -> x RLIKE '[A-Za-z]'))""".stripMargin)
      .cast("double") / wDen
    // both ellipsis spellings count as symbols — the ASCII triple dot
    // and U+2026, the same pair the ellipsis LINE rule below accepts
    val symbolRatio =
      (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")) +
        regexp_count(t, lit("…")))
        .cast("double") / wDen
    val bulletRatio = expr(
      s"size(filter(split($textCol, '\n'), x -> left(x, 1) IN ('-', '*', '•')))")
      .cast("double") / nLines.cast("double")
    val ellipsisRatio = expr(
      s"size(filter(split($textCol, '\n'), x -> right(x, 3) = '...' OR right(x, 1) = '…'))")
      .cast("double") / nLines.cast("double")
    val stopHits = GopherStopwords.map(w =>
      when(array_contains(words, w), 1).otherwise(0)).reduce(_ + _)
    docs.select(
        col(idCol),
        nWords.as("n_words"),
        meanLen.as("mean_word_len"),
        alphaRatio.as("alpha_ratio"),
        symbolRatio.as("symbol_ratio"),
        bulletRatio.as("bullet_ratio"),
        ellipsisRatio.as("ellipsis_ratio"),
        stopHits.as("stop_hits"))
      .withColumn("keep",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_ratio") <= 0.1 &&
          col("bullet_ratio") <= 0.9 &&
          col("ellipsis_ratio") <= 0.3 &&
          col("alpha_ratio") >= 0.8 &&
          col("stop_hits") >= 2)
  }

  /** Gopher's "contains at least two of" stopword probe list. */
  private[graft] val GopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Control characters (minus tab/newline/CR, which are legitimate
    * text) — written as regex hex ESCAPES so the identical ASCII
    * pattern text parses on Java regex and RE2. */
  private[graft] val CtrlRe = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"

  /** Encoding-noise scoring — the mojibake/corruption cleaning signal
    * (RefinedWeb/CCNet drop documents whose bytes survived a wrong
    * decode): counts of control characters (excluding tab/newline/CR)
    * and U+FFFD replacement characters — the residue a lossy decode
    * leaves — plus their ratio to document length. Pure per-row
    * projection at scan speed; threshold the ratio to drop corrupted
    * documents. The denominator is floored at 1 so an empty document
    * scores 0.0 (clean), not NULL — a NULL ratio would pass a
    * `> t` drop-filter yet fail a `<= t` keep-filter, silently
    * diverging at the one degenerate input (the oracle mirrors the
    * floor). */
  def encodingNoise(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nCtrl = regexp_count(t, lit(CtrlRe)).cast("int")
    val nRepl = regexp_count(t, lit("�")).cast("int")
    docs.select(
      col(idCol),
      nCtrl.as("n_ctrl"),
      nRepl.as("n_repl"),
      length(t).as("n_chars"),
      ((nCtrl + nRepl) / greatest(length(t), lit(1)).cast("double"))
        .as("noise_ratio"))
  }

  /** Per-document repetition statistics — the Gopher-style repetition
    * quality signal (machine-generated and boilerplate text repeats
    * itself; heavy repetition is the canonical pretraining drop rule):
    * duplicate-word fraction and the share of the single most frequent
    * word.
    *
    * Returns (id, n_words, n_distinct, dup_frac, top_cnt, top_share)
    * with dup_frac = (n_words - n_distinct) / n_words and top_share =
    * top_cnt / n_words (unrounded int/int divisions, identical in any
    * engine).
    *
    * Pure per-row array expressions: no explode, no shuffle — at 100 TB
    * this is a projection at parquet-scan speed. The top-count scan is
    * O(distinct × words) per row, bounded by document length, not by
    * corpus size. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // tokenize ONCE into a projected column: HOF lambda bodies get no
    // common-subexpression elimination, so a split() reference inside a
    // lambda would re-tokenize the document per element
    val nW = size(col("__toks"))
    val nD = size(array_distinct(col("__toks")))
    // top multiplicity as the longest run of a sorted copy: O(n log n)
    // per row vs the naive per-distinct-word count's O(distinct × n) —
    // at 8M synthetic docs (CurationProbe) this is the difference
    // between 7s and 40s, and the gap widens with document length
    // top_cnt is projected ONCE, like __toks: it contains lambda
    // expressions, which Spark's subexpression elimination skips — two
    // references would run the O(n log n) sort+scan twice per row
    val topCnt = expr(
      """aggregate(array_sort(__toks),
        |  named_struct('run', 0, 'best', 0, 'prev', cast(null as string)),
        |  (acc, x) -> named_struct(
        |    'run',  if(acc.prev <=> x, acc.run + 1, 1),
        |    'best', greatest(acc.best, if(acc.prev <=> x, acc.run + 1, 1)),
        |    'prev', x),
        |  acc -> acc.best)""".stripMargin)
    // coalesce: a NULL text behaves as the empty document ([""], one
    // empty token) — without it size() yields -1 and the stats row
    // silently reads as "negative-length, zero repetition".
    // Project down to (idCol, textCol) BEFORE adding internal columns:
    // this operator takes arbitrary caller frames, and withColumn on
    // the full frame would silently clobber a pre-existing __toks /
    // top_cnt column (the __ prefix is only reserved at the
    // collection-ingest boundary, not here).
    docs.select(col(idCol), col(textCol))
      .withColumn("__toks", toks(coalesce(col(textCol), lit(""))))
      .withColumn("top_cnt", topCnt)
      .select(col(idCol),
        nW.as("n_words"), nD.as("n_distinct"),
        ((nW - nD).cast("double") / nW.cast("double")).as("dup_frac"),
        col("top_cnt"),
        (col("top_cnt").cast("double") / nW.cast("double")).as("top_share"))
  }

  /** Rolling polynomial hash over characters:
    * h = fold(chars, 0, (acc, c) => (acc*31 + ascii(c)) mod 1e9+7).
    * Order-sensitive (a true rolling hash, not a bag-of-chars sum). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprintCol(textCol).as("fingerprint"))

  /** The [[fingerprint]] hash as a reusable column expression (content
    * identity for dedup-at-ingest keys). */
  def fingerprintCol(textCol: String): Column =
    expr(s"aggregate(filter(split($textCol, ''), c -> c <> ''), 0L, " +
      "(acc, c) -> (acc * 31 + ascii(c)) % 1000000007)")

  /** SplitterProcess: fixed-size character chunks with overlap, title
    * (source field) prepended to each chunk. stride = size - overlap. */
  def chunkSplit(docs: DataFrame, idCol: String, textCol: String, titleCol: String,
                 chunkSize: Int = 80, overlap: Int = 20): DataFrame = {
    val stride = chunkSize - overlap
    require(stride > 0, "overlap must be smaller than chunkSize")
    // greatest(0, ...): for empty text Spark's sequence(0, -1) DESCENDS
    // ([0, -1]) instead of returning empty — clamp so an empty doc
    // yields exactly one empty chunk (mirrored in the SQL oracle)
    val chunks = expr(
      s"transform(sequence(0, greatest(0, cast(floor((length($textCol) - 1) / $stride.0) as int))), " +
      s"i -> substring($textCol, i * $stride + 1, $chunkSize))")
    docs.select(col(idCol), col(titleCol), posexplode(chunks).as(Seq("chunk_id", "chunk")))
      .select(col(idCol), col("chunk_id"),
        concat(col(titleCol), lit(": "), col("chunk")).as("chunk"))
  }

  /** Adjacent-token n-gram array of `textCol` — the shared projection
    * of the corpus-LM fluency ops below. The `when` guard keeps
    * sub-n-token (and empty) docs at an empty array — without it
    * `sequence(0, negative)` DESCENDS instead of returning empty. The
    * token array is projected ONCE (`__tk`): lambda bodies get no
    * common-subexpression elimination, so inline `split()` references
    * would re-tokenize per use. */
  private def withNgrams(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    require(n >= 2, s"n-gram order must be >= 2, got $n")
    docs.select(col(idCol), split(coalesce(col(textCol), lit("")), " ").as("__tk"))
      .select(col(idCol),
        when(size(col("__tk")) >= n, expr(
          s"transform(sequence(0, size(__tk) - $n), i -> array_join(slice(__tk, i + 1, $n), ' '))"))
          .otherwise(array().cast("array<string>")).as("__bg"))
  }

  /** Corpus n-gram frequency table (bg, c) — the trained "language
    * model" of [[ngramNovelty]], and an ingest artifact at scale: one
    * explode + one groupBy over the corpus, paid once, served forever. */
  def ngramCounts(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 2): DataFrame =
    withNgrams(docs, idCol, textCol, n)
      .select(explode(col("__bg")).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c"))

  /** The bigram (n = 2) form of [[ngramCounts]]. */
  def bigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    ngramCounts(docs, idCol, textCol, n = 2)

  /** Corpus-conditioned fluency signal — the n-gram-LM quality proxy
    * of pretraining pipelines (a KenLM-style perplexity filter without
    * the float log-probs, so the result is integer-exact and
    * engine-reproducible): a doc's rate of RARE bigrams, where rare
    * means corpus probability ≤ 1/invFreq (count · invFreq ≤ total —
    * pure integer arithmetic; a relative threshold, so the semantics
    * survive corpus growth where any absolute count cutoff goes
    * vacuous). High rare_rate = disfluent/novel word sequences; the
    * canonical use is a drop-or-downweight rule next to the Gopher
    * repetition stats.
    *
    * Returns (id, n_bigrams, n_rare, rare_rate) with rare_rate =
    * n_rare / n_bigrams (one int/int double division, identical IEEE
    * in any engine; null for sub-2-token docs).
    *
    * 100 TB shape: `counts` is the persisted artifact; the rare set is
    * a filter over it (the heavy tail — large in a real corpus, so it
    * is NOT broadcast-hinted: the probe is a plain equi-join on the
    * bigram key that AQE broadcasts only when it fits); n_bigrams is a
    * per-row size() projection, so only rare-set membership ever
    * joins. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   counts: DataFrame, invFreq: Long = 20000L,
                   n: Int = 2): DataFrame = {
    // one bounded driver scalar (the corpus n-gram volume), same
    // contract as centroid/codebook collects; coalesce: a corpus of
    // sub-n-token docs has ZERO count rows and sum(empty) is null
    val total = counts.agg(coalesce(sum(col("c")), lit(0L)))
      .collect()(0).getLong(0)
    val rare = counts.where(col("c") * lit(invFreq) <= lit(total)).select("bg")
    val base = withNgrams(docs, idCol, textCol, n)
    val hits = base.select(col(idCol), explode(col("__bg")).as("bg"))
      .join(rare, "bg")
      .groupBy(idCol).agg(count(lit(1)).as("n_rare"))
    base.select(col(idCol), size(col("__bg")).as("n_bigrams"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        when(col("n_bigrams") > 0,
          coalesce(col("n_rare"), lit(0L)).cast("double") /
            col("n_bigrams").cast("double")).as("rare_rate"))
  }

  /** The bigram (n = 2) form of [[ngramNovelty]] — the oracled
    * q_rare_bigrams path. */
  def bigramNovelty(docs: DataFrame, idCol: String, textCol: String,
                    counts: DataFrame, invFreq: Long = 20000L): DataFrame =
    ngramNovelty(docs, idCol, textCol, counts, invFreq, n = 2)
}
