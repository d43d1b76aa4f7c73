package graft.sparse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search over a caller-supplied STORED sparse-vector field — the
  * reference's `fulltext_search(data=SparseVector,
  * field_name="sparse_vector")` path (/root/reference/aiotcvectordb/
  * model/collection.py:403): documents carry a pre-encoded term→weight
  * list (the client encodes with its own BM25 vocabulary), the query
  * supplies its own sparse vector, and the score is their dot product.
  *
  * Column shape: `array<struct<term, weight: double>>`. Terms are the
  * sparse dimension keys (the reference uses integer vocabulary ids;
  * any equality-comparable key works — the engine never interprets
  * them).
  *
  * Scale shape, two serving tiers:
  *  - [[dotTopK]] scans the stored column inline: explode only the
  *    MATCHING terms of each stored vector (the query-term In filter
  *    sits before the join and pushes into the scan). Correct at any
  *    size, but every query still READS every document's vector — the
  *    index-less fallback.
  *  - [[dotTopKIndexed]] serves from a persisted inverted POSTINGS
  *    artifact (doc_id, term, weight) clustered by term: the query's
  *    In(terms) filter prunes at parquet rowgroup/file level, so a
  *    query touches only its own terms' posting slivers — the same
  *    geometry as [[Bm25]]'s fulltext index, which is how this stays
  *    flat as the corpus grows 100×. Unlike BM25 there are NO global
  *    stats (weights are stored, the dot product needs nothing else),
  *    so maintenance is a pure per-doc projection append.
  *
  * Both tiers share one decimal-exact scoring tail, so indexed ≡
  * inline bit-for-bit.
  */
object SparseSearch {

  /** The shared scoring tail over matched (doc_id, weight, qw) rows:
    * per-term contributions in DECIMAL — round(w,4)·qw is an exact
    * ≤8-decimal rational, so the doc score is independent of Spark's
    * aggregation order and bit-stable vs the oracle. */
  private def scoreTail(matched: DataFrame, k: Int): DataFrame = {
    val scored = matched
      .groupBy("doc_id")
      .agg(sum(round(col("weight"), 4).cast("decimal(18,4)") *
          // (18,4) for the query side too: a caller weight >= 1e4 would
          // overflow a (8,4) cast to NULL under non-ANSI semantics and
          // silently drop that term from every document's score
          col("qw").cast("decimal(18,4)")).cast("double").as("score"))
    graft.vector.Ranked.rankTop(scored, k, col("score").desc, col("doc_id"))
      .select(col("rank"), col("doc_id"), col("score"))
      .orderBy("rank")
  }

  /** Top-k documents by sparse dot product with `query` term→weight
    * pairs, scanning the stored column inline. Returns
    * (rank, doc_id, score). */
  def dotTopK(docs: DataFrame, idCol: String, svCol: String,
              query: Seq[(String, Double)], k: Int,
              filter: Option[Column] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = broadcast(query.toDF("term", "qw"))
    val terms = query.map(_._1)
    val filtered = filter.fold(docs)(docs.where)
    scoreTail(
      filtered
        .select(col(idCol).as("doc_id"), explode(col(svCol)).as("__e"))
        .select(col("doc_id"), col("__e.term").as("term"),
          col("__e.weight").as("weight"))
        .where(col("term").isin(terms: _*))
        .join(qdf, "term"),
      k)
  }

  /** Top-k from an inverted postings artifact (doc_id, term, weight) —
    * the indexed serving tier. `docFilter` (a one-column doc_id frame)
    * restricts candidates BEFORE scoring via a semi-join on the
    * term-pruned sliver, the same pre-filter contract as the BM25
    * path. Bit-identical to [[dotTopK]] over the vectors the postings
    * were derived from. */
  def dotTopKIndexed(postings: DataFrame, query: Seq[(String, Double)],
                     k: Int, docFilter: Option[DataFrame] = None): DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val qdf = broadcast(query.toDF("term", "qw"))
    val terms = query.map(_._1)
    val pruned = postings
      .select(col("doc_id"), col("term"), col("weight"))
      .where(col("term").isin(terms: _*))
    val filtered = docFilter.fold(pruned)(f =>
      pruned.join(f.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi"))
    scoreTail(filtered.join(qdf, "term"), k)
  }

  /** Explode a stored sparse-vector column into the (doc_id, term,
    * weight) postings form — the artifact builder and the maintenance
    * append share this one projection (null/empty vectors contribute
    * nothing, exactly as they score nothing). */
  def sparsePostings(docs: DataFrame, idCol: String, svCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(col(svCol)).as("__e"))
      .select(col("doc_id"), col("__e.term").as("term"),
        col("__e.weight").as("weight"))

  /** Package a postings frame (doc_id, term, weight) into the stored
    * per-document sparse-vector column (doc_id, sparse_vector) — how a
    * client-side encoder's output lands in a collection. */
  def packSparse(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("weight"))))
        .as("sparse_vector"))
}
