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

  /** Fulltext search: rank documents by summed BM25 weight of the query
    * terms they contain.
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
  def fulltext(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               cutoffFrequency: Double = 1.0,
               terminateAfter: Option[Int] = None,
               k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    val enc0 = encode(docs, idCol, textCol, k1, b)
    // corpus size for the cutoff must match encode's n_docs (zero-token
    // docs excluded) or eligibility thresholds drift from the oracle
    val (_, dlStats) = postings(docs, idCol, textCol)
    val enc = terminateAfter match {
      case None => enc0
      case Some(n) =>
        // bounded-heap per term: smallest n doc_ids, never a full sort
        enc0.where(col("term").isin(queryTerms: _*))
          .groupBy("term")
          .agg(graft.vector.TopKAgg.topk(col("doc_id").cast("double"), col("doc_id"),
            n, asc = true).as("__t"))
          .select(col("term"), explode(col("__t.id")).as("doc_id"))
          .join(enc0, Seq("term", "doc_id"))
    }
    val corpusN = dlStats.agg(count(lit(1)).as("n_docs"))
    val dfreq = enc0.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(corpusN))
      .where(col("df") <= lit(cutoffFrequency) * col("n_docs"))
      .select("term")
    val wanted = dfreq.where(col("term").isin(queryTerms: _*))
    // Per-term weights are rounded to 4 decimals and summed as DECIMAL:
    // exact arithmetic makes the doc score independent of Spark's
    // aggregation order, so ranking is bit-stable vs the oracle.
    val scored = enc.join(broadcast(wanted), "term")
      .groupBy("doc_id")
      .agg(sum(round(col("weight"), 4).cast("decimal(18,4)")).cast("double").as("score"),
        count(lit(1)).as("n_terms"))
    // top-k via TakeOrderedAndProject (distributed k-merge, no global
    // sort), then a rank column over the k survivors only.
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy("rank")
  }
}
