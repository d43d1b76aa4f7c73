package graft.sparse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 sparse encoding + fulltext search — the reference's sparse-vector
  * / fulltext surface (/root/reference/aiotcvectordb/model/document.py
  * KeywordSearch + the BM25 sparse-vector encoding the server applies to
  * `text` fields; `terminate_after` / `cutoff_frequency` params on
  * fulltext search in client/stub.py).
  *
  * Model: a posting-list DataFrame (doc_id, term, tf, weight) instead of
  * per-row sparse maps — joins and aggregations over postings are what
  * Spark shuffles well, and the tiny per-term statistics (df, idf) are
  * broadcast so the corpus-side explode never reshuffles.
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Tokenized postings (doc_id, term, tf) plus doc length (doc_id, dl).
    * dl comes from a narrow `size(split(...))` projection — same value
    * as counting exploded tokens, without a second explode+groupBy+join
    * pipeline over the corpus. */
  private def postings(docs: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term")).where(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // zero-token docs are excluded from corpus stats (they have no
    // postings), keeping n_docs/avgdl identical to a postings-derived
    // count — and to the oracle's toks-based CTEs
    val dl = docs.select(col(idCol).as("doc_id"),
      size(filter(split(col(textCol), " "), t => t =!= "")).cast("long").as("dl"))
      .where(col("dl") > 0)
    (tf, dl)
  }

  /** BM25-encode a corpus: (doc_id, term, tf, weight).
    *
    * weight = idf(term) * tf*(k1+1) / (tf + k1*(1-b + b*dl/avgdl)),
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
    *
    * Corpus stats (N, avgdl) and per-term df are small aggregates that
    * get BROADCAST back onto the postings — the only wide shuffle is the
    * (doc_id, term) tf groupBy.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val (tf, dl) = postings(docs, idCol, textCol)
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sum_dl") / col("n_docs")
    val weight = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    tf.join(dl, "doc_id")
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("term"), col("tf"), weight.as("weight"))
  }

  /** A materializable sparse/fulltext index: RAW `postings`
    * (doc_id, term, tf, dl [, __seg]) and per-term `terms` stats
    * (term, df, n_docs, sum_dl — corpus stats denormalized onto each row
    * so the stats table is self-contained). Both are plain DataFrames,
    * so the index persists as two parquet collections (see
    * [[graft.api.GraftCollection.rebuildFulltextIndex]]) and queries
    * read ONLY the posting lists of their terms instead of re-encoding
    * the corpus — the reference server's persistent-inverted-index
    * behavior (client/stub.py fulltext_search).
    *
    * Postings store (tf, dl), NOT the final BM25 weight: the weight
    * depends on global corpus stats (df, N, avgdl), so persisting it
    * would invalidate every posting row on any mutation. With raw
    * postings, an upsert appends ONLY the batch's postings (a new
    * `__seg` partition) and rewrites the small stats table — the weight
    * is a query-time expression over the joined stats, bit-identical to
    * computing it at build time.
    *
    * `ledger` + `baseSeg` implement last-wins masking for incrementally
    * maintained indexes: a posting row in segment s is live iff
    * s == greatest(baseSeg, ledger(doc_id)) — re-upserted docs serve
    * from their newest segment, base docs from the rebuild segment,
    * absent ids from nowhere. */
  final case class SparseIndex(postings: DataFrame, terms: DataFrame,
                               ledger: Option[DataFrame] = None, baseSeg: Int = 0)

  /** Segment partition column of incrementally maintained postings
    * (shared with every other segment-maintained artifact). */
  val SegCol: String = graft.catalog.SegMask.SegCol

  /** Raw postings (doc_id, term, tf, dl) — the persistable, appendable
    * form of the inverted index. */
  def rawPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (tf, dl) = postings(docs, idCol, textCol)
    tf.join(dl, "doc_id").select("doc_id", "term", "tf", "dl")
  }

  /** Per-term + corpus stats from a raw postings frame:
    * (term, df, n_docs, sum_dl). n_docs counts docs with >= 1 posting —
    * identical to encode's corpus count (zero-token docs excluded), so
    * cutoff eligibility matches the oracle even when the postings come
    * back from parquet. */
  def statsFromPostings(raw: DataFrame): DataFrame = {
    val perDoc = raw.groupBy("doc_id").agg(first(col("dl")).as("dl"))
    val corpus = perDoc.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    raw.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(corpus))
  }

  /** The BM25 weight as a query-time expression over a postings row
    * joined with its term's stats — the SAME expression tree [[encode]]
    * applies at build time, so scores are bit-identical either way. */
  private def weightCol(k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sum_dl") / col("n_docs")
    idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
  }

  /** Apply the last-wins segment mask to a (term-filtered) postings
    * frame — delegates to the shared [[graft.catalog.SegMask]] so the
    * fulltext mask can never diverge from the other families'. */
  private def liveRows(index: SparseIndex, filtered: DataFrame): DataFrame =
    graft.catalog.SegMask.live(filtered, "doc_id", index.ledger, index.baseSeg)

  /** Build the index from a corpus (one tokenize + one term aggregate —
    * paid once at rebuild time, not per query). */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): SparseIndex = {
    val raw = rawPostings(docs, idCol, textCol)
    SparseIndex(raw, statsFromPostings(raw))
  }

  /** Weighted postings (doc_id, term, tf, weight) materialized from a
    * raw index — for consumers that need the full BM25 encoding of every
    * live row (e.g. packing stored sparse vectors). */
  def weightedPostings(index: SparseIndex,
                       k1: Double = DefaultK1, b: Double = DefaultB): DataFrame =
    liveRows(index, index.postings)
      .join(broadcast(index.terms), "term")
      .select(col("doc_id"), col("term"), col("tf"), weightCol(k1, b).as("weight"))

  /** Fulltext search over a (possibly persisted) [[SparseIndex]]: rank
    * documents by summed BM25 weight of the query terms they contain.
    *
    * `cutoffFrequency`: terms whose document frequency exceeds this
    * fraction of the corpus are dropped before scoring (the reference's
    * `cutoff_frequency`) — at scale this is the stop-word guard that
    * keeps the hottest posting lists out of the join entirely.
    *
    * `terminateAfter`: cap on candidate documents examined per term
    * (the reference's `terminate_after` early-termination knob),
    * deterministic (lowest doc_id first). Trades recall for a hard
    * bound on posting-list work.
    */
  def fulltextIndexed(index: SparseIndex, queryTerms: Seq[String], k: Int,
                      cutoffFrequency: Double = 1.0,
                      terminateAfter: Option[Int] = None,
                      k1: Double = DefaultK1, b: Double = DefaultB,
                      docFilter: Option[DataFrame] = None): DataFrame = {
    // the term filter sits directly on the postings scan: against a
    // persisted index this is a parquet In-pushdown that reads only the
    // query terms' posting lists (term-clustered rowgroups skip), which
    // is the whole point of materializing the index. The segment mask
    // applies AFTER the term filter, so it only ever touches the query
    // terms' postings.
    // `docFilter` (a one-column doc_id frame): restrict scoring to the
    // filtered document set BEFORE ranking — a post-filter on the
    // already-truncated top-k would silently empty the list under
    // selective filters and keep pre-filter rank gaps. The semi-join
    // sits on the term-pruned postings sliver, not the corpus.
    val encAll = liveRows(index, index.postings.where(col("term").isin(queryTerms: _*)))
    val enc0 = docFilter.fold(encAll)(f =>
      encAll.join(f.select(col(f.columns.head).as("doc_id")), Seq("doc_id"), "left_semi"))
    val enc = terminateAfter match {
      case None => enc0
      case Some(n) =>
        // bounded-heap per term: smallest n doc_ids, never a full sort.
        // The heap is keyed on the id itself via a CONSTANT score (the
        // buffer's id tie-break is the whole ordering) — a doc_id→double
        // cast would NULL string ids (silently empty results) and lose
        // precision past 2^53 for long ids.
        val heapId = index.postings.schema("doc_id").dataType match {
          case org.apache.spark.sql.types.StringType => col("doc_id")
          case _ => col("doc_id").cast("long")
        }
        enc0.groupBy("term")
          .agg(graft.vector.TopKAgg.topk(lit(0.0), heapId, n, asc = true).as("__t"))
          .select(col("term"), explode(col("__t.id")).as("doc_id"))
          .join(enc0, Seq("term", "doc_id"))
    }
    val wanted = index.terms
      .where(col("term").isin(queryTerms: _*))
      .where(col("df") <= lit(cutoffFrequency) * col("n_docs"))
    // Per-term weights are rounded to 4 decimals and summed as DECIMAL:
    // exact arithmetic makes the doc score independent of Spark's
    // aggregation order, so ranking is bit-stable vs the oracle.
    val scored = enc.join(broadcast(wanted), "term")
      .groupBy("doc_id")
      .agg(sum(round(weightCol(k1, b), 4).cast("decimal(18,4)")).cast("double").as("score"),
        count(lit(1)).as("n_terms"))
    // top-k via TakeOrderedAndProject (distributed k-merge, no global
    // sort); rank is the row's position in that order (zip-with-index
    // over the k survivors — no WindowExec).
    graft.vector.Ranked.rankTop(scored, k, col("score").desc, col("doc_id"))
      .select(col("rank"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy("rank")
  }

  /** Batched per-query fulltext over the index: `queryTerms` is a
    * (query_id, term) frame — each query carries its OWN keyword list,
    * the reference's per-AnnSearch KeywordSearch pairing
    * (model/document.py). One postings pass scores every query: the
    * union of query terms prunes the postings scan (parquet In
    * pushdown, the term lists are a driver-known batch), the per-query
    * term lists broadcast onto the surviving postings, and a bounded
    * heap ranks each query without a global sort. */
  def fulltextBatch(index: SparseIndex, queryTerms: DataFrame, k: Int,
                    cutoffFrequency: Double = 1.0,
                    k1: Double = DefaultK1, b: Double = DefaultB,
                    docFilter: Option[DataFrame] = None): DataFrame = {
    val allTerms = queryTerms.select("term").distinct()
      .collect().map(_.getString(0)).toSeq
    val elig = index.terms
      .where(col("term").isin(allTerms: _*))
      .where(col("df") <= lit(cutoffFrequency) * col("n_docs"))
    // the broadcast rider carries each term's stats alongside its query
    // ids, so the weight is computable per posting row with no extra join
    val q = broadcast(queryTerms.select(col("query_id"), col("term")).join(elig, "term"))
    val base = liveRows(index, index.postings.where(col("term").isin(allTerms: _*)))
    val scored = docFilter.fold(base)(f =>
        base.join(f.select(col(f.columns.head).as("doc_id")), Seq("doc_id"), "left_semi"))
      .join(q, "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(round(weightCol(k1, b), 4).cast("decimal(18,4)")).cast("double").as("score"))
    graft.vector.Ranked.topK(
      scored.select(col("query_id"), col("score").as("__s"), col("doc_id").as("id")),
      k, asc = false)
      .withColumnRenamed("id", "doc_id")
  }

  /** Index-free fulltext (builds the index inline — per-query O(corpus)
    * encode; use [[buildIndex]] + [[fulltextIndexed]] when serving many
    * queries over one corpus). */
  def fulltext(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               cutoffFrequency: Double = 1.0,
               terminateAfter: Option[Int] = None,
               k1: Double = DefaultK1, b: Double = DefaultB,
               docFilter: Option[DataFrame] = None): DataFrame =
    fulltextIndexed(buildIndex(docs, idCol, textCol), queryTerms, k,
      cutoffFrequency, terminateAfter, k1, b, docFilter)
}
