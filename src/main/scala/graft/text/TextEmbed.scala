package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic hashing-trick text embedder — the stand-in for the
  * reference's server-side embedding model behind `search_by_text`
  * (/root/reference/aiotcvectordb/model/collection.py search_by_text /
  * embedding.py). Real models are out of scope (SURVEY.md §6); the
  * Spark plumbing (tokenize → feature-hash → L2-normalize → KNN) is the
  * real production shape.
  *
  * Each token hashes to a dimension (xxhash64 mod dim) with weight 1;
  * the doc vector is the L2-normalized histogram. Built entirely from
  * relational ops + higher-order functions — distributable at any
  * corpus size (one groupBy on (id, dim), one on id).
  */
object TextEmbed {

  /** (idCol, vec: array<double>) — unit-normalized hashed embedding. */
  def hashEmbed(docs: DataFrame, idCol: String, textCol: String, dim: Int = 64): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      explode(split(col(textCol), " ")).as("term")).where(col("term") =!= "")
    val counts = toks
      .select(col("__id"), pmod(xxhash64(col("term")), lit(dim)).cast("int").as("d"))
      .groupBy("__id", "d").agg(count(lit(1)).cast("double").as("w"))
    counts
      .groupBy("__id")
      .agg(map_from_entries(collect_list(struct(col("d"), col("w")))).as("m"))
      .select(col("__id"),
        expr(s"transform(sequence(0, ${dim - 1}), d -> coalesce(element_at(m, d), 0.0D))").as("__raw"))
      // hoist the norm into its own column: a lambda-body aggregate
      // would be re-evaluated per element (O(dim^2) interpreted)
      .select(col("__id"), col("__raw"),
        sqrt(expr("aggregate(__raw, 0.0D, (a, v) -> a + v * v)")).as("__norm"))
      .select(col("__id"),
        expr("transform(__raw, x -> x / __norm)").as("vec"))
      .withColumnRenamed("__id", idCol)
  }

  /** search_by_text against an ALREADY-embedded corpus (idCol, vec) —
    * the scale path: the corpus is embedded once at ingest/rebuild and
    * persisted; each query embeds only its few strings. */
  def searchEmbedded(corpus: DataFrame, idCol: String,
                     queryTexts: Seq[String], k: Int, dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = hashEmbed(
      queryTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("qid", "qtext"),
      "qid", "qtext", dim)
    graft.vector.KnnSearch.topK(corpus, idCol, "vec", qdf, "qid", "vec", "cosine", k)
  }

  /** search_by_text with an inline corpus embed (per-query O(corpus) —
    * use [[searchEmbedded]] over a persisted embedding at scale). */
  def searchByText(docs: DataFrame, idCol: String, textCol: String,
                   queryTexts: Seq[String], k: Int, dim: Int = 64): DataFrame =
    searchEmbedded(hashEmbed(docs, idCol, textCol, dim), idCol, queryTexts, k, dim)
}
