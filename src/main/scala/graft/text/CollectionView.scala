package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.filter.FilterParser
import graft.vector.KnnSearch

/** The reference's AI-document layer (collection_view.py): document
  * upload → split into chunks → embed chunks → search chunks by
  * content, with `expand_chunk` neighbor expansion and scalar filters.
  * Parsing/embedding are the deterministic stubs ([[TextAnalysis]] /
  * [[TextEmbed]]); the dataflow is the production shape.
  *
  * Chunk index schema: (doc_id-ish key, chunk_id, chunk, vec). The key
  * column keeps whatever type the source id has (string document-set
  * names in the reference).
  */
object CollectionView {

  /** Split + embed a corpus into a searchable chunk index. With
    * `vocab` (a trained Word2Vec word-vector table — the collections
    * family's `embedding.model=word2vec` artifact, routed through the
    * AI-doc layer) chunks embed as the mean of their word vectors; an
    * all-OOV chunk KEEPS its row with a null vec — present for
    * get_chunks, unmatchable in search (the embedWithVocab totality
    * contract). Without it, the deterministic hashing-trick embed. */
  def buildChunkIndex(docs: DataFrame, idCol: String, textCol: String, titleCol: String,
                      chunkSize: Int = 80, overlap: Int = 20, dim: Int = 64,
                      vocab: Option[DataFrame] = None): DataFrame = {
    val chunks = TextAnalysis.chunkSplit(docs, idCol, textCol, titleCol, chunkSize, overlap)
      .withColumn("__cid", concat(col(idCol).cast("string"), lit("#"), col("chunk_id")))
    val embedded = vocab match {
      case Some(v) => TextEmbed.embedWithVocab(
        chunks.select(col("__cid"), col("chunk")), "__cid", "chunk", v)
      case None => TextEmbed.hashEmbed(
        chunks.select(col("__cid"), col("chunk")), "__cid", "chunk", dim)
    }
    chunks.join(embedded, "__cid")
      .select(col(idCol), col("chunk_id"), col("chunk"), col("vec"))
  }

  /** The numeric surrogate key the HNSW arm traverses by: chunk keys
    * are strings ("docset#chunkid") but graph nodes need longs, so the
    * graph is built over xxhash64 of the composite key (deterministic;
    * a 64-bit collision would only merge two chunks' candidacy — it
    * cannot corrupt results because the final rank runs over the REAL
    * chunk rows). */
  private[graft] def cid64(idCol: String) =
    xxhash64(concat(col(idCol).cast("string"), lit("#"), col("chunk_id")))

  /** Per-segment HNSW graph over the chunk index — the reference's
    * collection_view default index is the same HNSW as collections
    * (collection_view.py indexes chunks with the collection's vector
    * index). Persistable like every graph artifact; serve via
    * [[search]]'s `graph` arm. */
  def buildChunkGraph(chunkIndex: DataFrame, idCol: String, m: Int = 8,
                      efConstruction: Int = 64, numSegments: Int = 4,
                      seed: Long = 42L): DataFrame =
    graft.vector.HnswIndex.build(
      chunkIndex.withColumn("__cid64", cid64(idCol)),
      "__cid64", "vec", m, efConstruction, numSegments, seed)

  /** search(content, limit, expand_chunk, filter): embed the query
    * text, cosine top-k over chunk vectors, join chunk text back, and
    * optionally splice in `(before, after)` neighboring chunks of each
    * hit (the reference's expand_chunk) as `expanded`.
    *
    * `graph` + `ef`: the ANN arm — HNSW traversal narrows the chunk
    * index to the candidate sliver FIRST, then the IDENTICAL
    * KnnSearch.topK pipeline ranks the sliver (same string-key
    * tie-breaks, same rounding). ef ≥ chunk count makes the sliver the
    * whole index, so results are byte-equal to the FLAT path — the
    * family's exhaustive-twin certificate, at the chunk layer. */
  def search(chunkIndex: DataFrame, idCol: String, content: String, limit: Int,
             expandChunk: (Int, Int) = (0, 0), filter: String = "",
             dim: Int = 64, graph: Option[DataFrame] = None,
             ef: Int = 10, graphPrepared: Boolean = false,
             vocab: Option[DataFrame] = None): DataFrame = {
    val spark = chunkIndex.sparkSession
    import spark.implicits._
    val flat = chunkIndex
      .where(FilterParser.parse(filter))
      // null-vec chunks (all-OOV under a trained vocab) are present in
      // the index but unmatchable — same rule as collections' stored
      // embeddings
      .where(col("vec").isNotNull)
      .withColumn("__key", concat(col(idCol).cast("string"), lit("#"), col("chunk_id")))
    // embed the query text ONCE — through the SAME model the chunks
    // were embedded with (vocab when trained, hash otherwise; mixing
    // models would rank hash query vectors against w2v chunk vectors).
    // An all-OOV query under the vocab embeds to null ⇒ zero hits.
    // The graph arm collects the 1-row result for the traversal and
    // the ranking below reuses the collected literal instead of
    // re-running the embed job in its lineage; the FLAT arm keeps the
    // lazy single-evaluation frame
    val qRaw = Seq((0L, content)).toDF("qid", "qtext")
    val qEmbed = (vocab match {
      case Some(v) => TextEmbed.embedWithVocab(qRaw, "qid", "qtext", v)
      case None => TextEmbed.hashEmbed(qRaw, "qid", "qtext", dim)
    }).where(col("vec").isNotNull)
    val (indexed, qdf) = graph match {
      case Some(g) =>
        // an all-stopword query has no vector and no hits on either arm
        qEmbed.select("vec").collect().headOption match {
          case Some(r) =>
            val qvec = r.getSeq[Double](0)
            val cand = graft.vector.HnswIndex.candidates(
                g, Array((0L, qvec.toArray)), math.max(ef, limit),
                prepared = graphPrepared)
              .select(col("id").as("__cid64"))
            // post-filter ANN semantics: the scalar filter applies to
            // the candidate sliver (the collections family's contract)
            (flat.withColumn("__cid64", cid64(idCol))
              .join(cand, Seq("__cid64"), "left_semi").drop("__cid64"),
              Seq((0L, qvec)).toDF("qid", "vec"))
          case None => (flat, qEmbed)
        }
      case None => (flat, qEmbed)
    }
    val hits = KnnSearch.topK(indexed, "__key", "vec", qdf, "qid", "vec", "cosine", limit)
      .select(col("rank"), col("id").as("__key"), col("score"))
    val annotated = hits.join(indexed.select(col("__key"), col(idCol), col("chunk_id")), "__key")

    val (before, after) = expandChunk
    if (before == 0 && after == 0) {
      annotated.join(chunkIndex.select(col(idCol), col("chunk_id"), col("chunk")),
          Seq(idCol.replace("`", ""), "chunk_id"))
        .select(col("rank"), col(idCol), col("chunk_id"), col("score"), col("chunk"))
        .orderBy("rank")
    } else {
      // hit list is tiny -> broadcast; neighbors found by an equi-join
      // on the doc key plus a bounded chunk_id range
      val h = annotated.alias("h")
      val c = chunkIndex.alias("c")
      broadcast(h).join(c,
          col(s"h.$idCol") === col(s"c.$idCol") &&
            col("c.chunk_id") >= col("h.chunk_id") - before &&
            col("c.chunk_id") <= col("h.chunk_id") + after)
        .groupBy(col("h.rank").as("rank"), col(s"h.$idCol").as(idCol),
          col("h.chunk_id").as("chunk_id"), col("h.score").as("score"))
        .agg(concat_ws(" ", sort_array(collect_list(
          struct(col("c.chunk_id").as("i"), col("c.chunk").as("t")))).getField("t"))
          .as("expanded"))
        .orderBy("rank")
    }
  }
}
