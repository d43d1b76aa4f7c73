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
  * Scale shape: explode only the MATCHING terms of each stored vector
  * (the query-term In filter sits before the join and pushes into the
  * scan), one groupBy(doc) with decimal-exact accumulation, bounded
  * top-k postlude — the same posting-list geometry as [[Bm25]].
  */
object SparseSearch {

  /** Top-k documents by sparse dot product with `query` term→weight
    * pairs. Returns (rank, doc_id, score). */
  def dotTopK(docs: DataFrame, idCol: String, svCol: String,
              query: Seq[(String, Double)], k: Int,
              filter: Option[Column] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = broadcast(query.toDF("term", "qw"))
    val terms = query.map(_._1)
    val filtered = filter.fold(docs)(docs.where)
    // per-term contributions in DECIMAL: round(w,4)·qw is an exact
    // ≤8-decimal rational, so the doc score is independent of Spark's
    // aggregation order and bit-stable vs the oracle
    val scored = filtered
      .select(col(idCol).as("doc_id"), explode(col(svCol)).as("__e"))
      .select(col("doc_id"), col("__e.term").as("term"), col("__e.weight").as("weight"))
      .where(col("term").isin(terms: _*))
      .join(qdf, "term")
      .groupBy("doc_id")
      .agg(sum(round(col("weight"), 4).cast("decimal(18,4)") *
          col("qw").cast("decimal(8,4)")).cast("double").as("score"))
    graft.vector.Ranked.rankTop(scored, k, col("score").desc, col("doc_id"))
      .select(col("rank"), col("doc_id"), col("score"))
      .orderBy("rank")
  }

  /** Package a postings frame (doc_id, term, weight) into the stored
    * per-document sparse-vector column (doc_id, sparse_vector) — how a
    * client-side encoder's output lands in a collection. */
  def packSparse(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("term"), col("weight"))))
        .as("sparse_vector"))
}
