package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.filter.FilterParser
import graft.text.CollectionView

/** The reference's AI-document (collection view) surface as a
  * catalog-backed store (/root/reference/aiotcvectordb/model/
  * collection_view.py: load_and_split_text :60, search :144, query
  * :173, get_document_set :216, delete :244, update :272, get_chunks
  * :304). A document set = one uploaded text, split + embedded at load
  * time into a PERSISTED chunk index; every later search/get_chunks
  * call reads the index — never re-splits or re-embeds.
  *
  * Storage: two sibling collections per view —
  * `<view>__cv_sets` (doc_set, title, text, n_chars, n_chunks) the
  * registry — the raw uploaded body is STORED, so get_text can return
  * the user's document (document_set.py:47) —
  * `<view>__cv_chunks` (doc_set, chunk_id, chunk, vec) the chunk index.
  */
final class GraftCollectionView(spark: SparkSession, catalog: Catalog,
                                db: String, view: String) {
  import GraftCollectionView._

  private def setsColl = view + SetsSuffix
  private def chunksColl = view + ChunksSuffix
  private def graphColl = view + GraphSuffix

  private[api] def create(): this.type = {
    catalog.createCollectionIfNotExists(db, setsColl)
    catalog.createCollectionIfNotExists(db, chunksColl)
    this
  }

  /** Reads on a never-loaded view must behave like empty collections
    * (the round-2 "schemaless empty reads" invariant): a raw
    * catalog.read before the first load has NO columns, so pin the
    * expected schema. */
  private def withViewSchema(df: DataFrame,
                             schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (df.columns.nonEmpty) df
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Chunk schema derived from the REAL pipeline over an empty input
    * (analysis only, no job) — it can never drift from what
    * buildChunkIndex actually writes. */
  private lazy val chunksSchema: org.apache.spark.sql.types.StructType = {
    import spark.implicits._
    CollectionView.buildChunkIndex(
      Seq.empty[(String, String, String)].toDF("doc_set", "text", "title"),
      "doc_set", "text", "title").schema
  }

  def sets: DataFrame = withViewSchema(catalog.read(db, setsColl),
    GraftCollectionView.SetsSchema)
  def chunks: DataFrame = withViewSchema(catalog.read(db, chunksColl), chunksSchema)

  /** load_and_split_text: register the document set and persist its
    * split + embedded chunks (replacing any previous upload of the same
    * name — the reference's re-upload semantics). */
  def loadAndSplitText(documentSetName: String, text: String, title: String = "",
                       chunkSize: Int = 80, overlap: Int = 20): Unit = {
    import spark.implicits._
    require(text.nonEmpty, s"$documentSetName: empty document denied")
    val t = if (title.isEmpty) documentSetName else title
    val doc = Seq((documentSetName, text, t)).toDF("doc_set", "text", "title")
    val newChunks = CollectionView.buildChunkIndex(doc, "doc_set", "text", "title",
      chunkSize, overlap)
    replaceIn(chunksColl, documentSetName, newChunks)
    // a live graph absorbs the upload as an appended segment (the
    // collections discipline — claim → write → publish) instead of
    // paying a full chunk-graph rebuild per upload; superseded chunk
    // nodes of a re-uploaded set stay in older segments but the
    // serving semi-join only admits candidates present in the CURRENT
    // chunk index, so they are masked until compaction folds them out
    // feed the graph from the chunks as WRITTEN (a parquet scan) —
    // the lazy split+embed plan would re-execute inside append (its
    // row count and graph build each run their input)
    appendChunkSegment(catalog.read(db, chunksColl)
      .where(col("doc_set") === documentSetName))
    // count the chunks as WRITTEN (a parquet scan) rather than re-running
    // the split+embed pipeline a second time
    val nChunks = catalog.read(db, chunksColl)
      .where(col("doc_set") === documentSetName).count()
    val row = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        documentSetName, t, text, text.length.toLong, nChunks)),
      GraftCollectionView.SetsSchema)
    replaceIn(setsColl, documentSetName, row)
  }

  /** get_document_set(name): the registry row — INCLUDING the stored
    * raw body (collection_view.py:216 returns the document text). */
  def getDocumentSet(name: String): DataFrame =
    sets.where(col("doc_set") === name)

  /** get_text(name): the uploaded document body round-tripped back to
    * the caller (document_set.py:47). One named set — a bounded
    * single-row collect by design. */
  def getText(name: String): Option[String] =
    getDocumentSet(name).select("text").collect().headOption.map(_.getString(0))

  /** query(filter, limit, offset): list document sets (metadata only —
    * the raw body is column-pruned out; fetch it per set via
    * [[getText]] / [[getDocumentSet]], the reference's lazy
    * DocumentSet.get_text split). */
  def query(filter: String = "", limit: Option[Int] = None, offset: Int = 0): DataFrame = {
    var out = sets.drop("text").where(FilterParser.parse(filter)).orderBy("doc_set")
    if (offset > 0) out = out.offset(offset)
    limit.fold(out)(out.limit)
  }

  /** get_chunks(name, limit, offset): the stored chunks in order. */
  def getChunks(name: String, limit: Option[Int] = None, offset: Int = 0): DataFrame = {
    var out = chunks.where(col("doc_set") === name)
      .select(col("chunk_id"), col("chunk")).orderBy("chunk_id")
    if (offset > 0) out = out.offset(offset)
    limit.fold(out)(out.limit)
  }

  /** delete(document_set_name | filter over the registry). The doomed
    * set is a FRAME anti-joined against both backing collections — the
    * matched names never land on the driver, so a filter matching
    * millions of document sets costs a join, not a driver OOM. */
  def delete(names: Seq[String] = Nil, filter: String = ""): Unit = {
    require(names.nonEmpty || filter.nonEmpty,
      "please provide document_set_name or filter")
    val doomed = (if (names.nonEmpty) sets.where(col("doc_set").isin(names: _*))
                  else sets.where(FilterParser.parse(filter)))
      .select("doc_set")
    if (!doomed.isEmpty) {
      // chunks first: its anti-join reads the still-unmodified registry
      catalog.overwriteFromSelf(db, chunksColl,
        chunks.join(doomed, Seq("doc_set"), "left_anti"))
      catalog.overwriteFromSelf(db, setsColl,
        sets.join(doomed, Seq("doc_set"), "left_anti"))
      // the graph is NOT dropped: deleted chunks' nodes go stale but
      // the serving semi-join only admits candidates present in the
      // current chunk index, so results stay exact; compaction folds
      // the staleness out ([[compactChunkGraph]])
    }
  }

  /** update(data, names | filter): set registry fields (title etc.) on
    * matching document sets; chunk content is immutable — re-upload via
    * [[loadAndSplitText]] to change it (mirrors the reference, which
    * updates metadata only). */
  def update(set: Map[String, Column], names: Seq[String] = Nil, filter: String = ""): Unit = {
    require(set.nonEmpty, "please provide update data")
    require(names.nonEmpty || filter.nonEmpty,
      "please provide document_set_name or filter")
    val pred = if (names.nonEmpty) col("doc_set").isin(names: _*)
               else FilterParser.parse(filter)
    val projections = sets.columns.map { c =>
      set.get(c).map(v => when(pred, v).otherwise(col(c)).as(c)).getOrElse(col(c))
    }
    catalog.overwriteFromSelf(db, setsColl, sets.select(projections.toSeq: _*))
  }

  /** Build + persist the chunk index's HNSW graph (the reference's
    * collection_view default indexes chunks with the same HNSW as
    * collections). Once built, the graph is maintained INCREMENTALLY:
    * uploads append per-batch segments and deletes leave masked stale
    * nodes ([[HnswMaintain]], the collections discipline), so a
    * re-uploaded document costs O(its chunks), not a full rebuild;
    * [[compactChunkGraph]] folds accumulated mini-segments and
    * staleness.
    *
    * `defaultEf` is the beam [[search]] uses when the caller passes no
    * `ef` — persisted in the graph meta so the serving default is a
    * property of the index, not a hard-coded constant. */
  def rebuildChunkGraph(m: Int = 8, efConstruction: Int = 64,
                        numSegments: Int = 4, defaultEf: Int = 10): Unit = {
    catalog.createCollectionIfNotExists(db, graphColl)
    catalog.write(db, graphColl,
      CollectionView.buildChunkGraph(chunks, "doc_set", m, efConstruction,
        numSegments),
      partitionBy = Seq("seg"))
    // gen nonce keys the serving cache, exactly like collections; the
    // build params ride along so appends/compaction reproduce them
    graphStore.update(Map(
      "index.hnsw.m" -> m.toString,
      "index.hnsw.efc" -> efConstruction.toString,
      "index.hnsw.segments" -> numSegments.toString,
      "index.hnsw.nextseg" -> numSegments.toString,
      "index.hnsw.default_ef" -> defaultEf.toString,
      "index.hnsw.pending" -> null,
      "index.hnsw.merge_pending" -> null,
      "index.hnsw.appends" -> "0",
      "index.hnsw.gen" -> GraftCollection.freshGen()))
  }

  private def graphStore: HnswStore =
    HnswStore(catalog, db, metaColl = graphColl, graphColl = graphColl)

  /** Test/ops visibility: current chunk-graph segment count. */
  private[graft] def chunkGraphSegments: Int =
    catalog.read(db, graphColl).select("seg").distinct().count().toInt

  /** The current chunk index keyed for the graph: node id = xxhash64
    * of the composite chunk key (the string-PK surrogate device). */
  private def chunkNodes(rows: DataFrame): DataFrame =
    rows.select(graft.text.CollectionView.cid64("doc_set").as("id"), col("vec"))

  /** Append an upload's chunks to the live graph as fresh segments —
    * no-op when no graph exists (or one predates the incremental meta,
    * in which case it is dropped: rebuild to re-arm). */
  private def appendChunkSegment(newChunks: DataFrame): Unit =
    if (catalog.collectionExists(db, graphColl)) {
      val meta = graphStore.meta
      if (meta.contains("index.hnsw.m")) {
        HnswMaintain.append(graphStore, chunkNodes(newChunks), "id", "vec", meta)
        // collections auto-fold after mutations (maybeAutoCompact); the
        // chunk graph needs the same policy or per-upload mini-segments
        // and re-upload staleness accumulate unboundedly — every search
        // runs one beam per segment, so serving cost would grow
        // linearly in upload count until someone discovers the manual
        // compactChunkGraph. Debt = appends since the last fold (a
        // meta-only counter: the view has no mutation ledger, and
        // nextseg keeps climbing across tiered folds so it cannot
        // measure debt).
        val appends =
          meta.get("index.hnsw.appends").map(_.toInt).getOrElse(0) + 1
        graphStore.update(Map("index.hnsw.appends" -> appends.toString))
        if (appends >= GraftCollection.DefaultAutoCompactSegments)
          compactChunkGraph()
      }
      else dropChunkGraph()
    }

  /** Tiered chunk-graph compaction — folds the per-upload
    * mini-segments and garbage-collects nodes of deleted / re-uploaded
    * chunks, rebuilding only fold-worthy segments from the CURRENT
    * chunk index (O(merged), base tiers untouched; see
    * [[HnswMaintain.compact]]). No-op without a live incremental
    * graph. */
  def compactChunkGraph(): Unit =
    if (catalog.collectionExists(db, graphColl)) {
      val meta = graphStore.meta
      if (meta.contains("index.hnsw.m")) {
        HnswMaintain.compact(graphStore, chunkNodes(chunks), "vec", meta)
        graphStore.update(Map("index.hnsw.appends" -> "0"))
      }
    }

  private def dropChunkGraph(): Unit =
    if (catalog.collectionExists(db, graphColl)) {
      catalog.dropCollection(db, graphColl)
      GraftCollection.evictHnswServing(catalog.rootPath, db, graphColl)
    }

  /** Serving handle for the chunk graph: the seg-whole arrangement
    * (HnswIndex.prepare) paid once per artifact generation and cached
    * process-wide in the same nonce-keyed map as collections — a
    * per-query re-read would re-shuffle the whole graph every search,
    * erasing the ANN arm's point. */
  /** Returns the prepared graph together with the meta snapshot it was
    * resolved from, so callers read meta.json once per search — not a
    * second time for serving params like default_ef. */
  private def preparedChunkGraph(): Option[(org.apache.spark.sql.DataFrame, Map[String, String])] =
    if (!catalog.collectionExists(db, graphColl)) None
    else {
      val meta = graphStore.meta
      val version = meta.getOrElse("index.hnsw.gen", "")
      // orphan mask, as on collections: segments at/above the claimed
      // nextseg can only be leftovers of a crashed append
      val nextSeg = meta.get("index.hnsw.nextseg").map(_.toInt)
      val key = GraftCollection.servingKey(catalog.rootPath, db, graphColl)
      Some((GraftCollection.hnswServing.compute(key, (_, old) => {
        if (old != null && old._1 == version && (old._2.sparkSession eq spark)) old
        else {
          if (old != null)
            try old._2.unpersist(blocking = false)
            catch { case _: Throwable => () }
          val raw = catalog.read(db, graphColl)
          (version, graft.vector.HnswIndex.prepare(
            nextSeg.fold(raw)(ns => raw.where(col("seg") < ns))))
        }
      })._2, meta))
    }

  /** search(content, limit, expand_chunk, filter): content search over
    * the persisted chunk index (filter applies to chunk rows). Served
    * through the HNSW chunk graph when one is live — `ef` tunes the
    * candidate sliver (ef ≥ chunk count is byte-equal to the FLAT
    * scan: the sliver degenerates to the whole index and the SAME
    * string-key ranking pipeline runs either way); FLAT otherwise.
    * An explicit `ef` without a live graph is an error, not a silent
    * exact scan — the same contract as hybridSearch's ef.
    *
    * NOTE the behavior switch: once [[rebuildChunkGraph]] has run, a
    * no-`ef` call serves ANN at the graph's configured `defaultEf`
    * (recall < 1 is possible) instead of the exact FLAT scan — the
    * reference's HNSW-default collection_view semantics. Callers that
    * need exact results after a rebuild must pass
    * `ef = Some(Int.MaxValue)` (or never build the graph). */
  def search(content: String, limit: Int = 10, expandChunk: (Int, Int) = (0, 0),
             filter: String = "", ef: Option[Int] = None): DataFrame = {
    val prepared = preparedChunkGraph()
    val graph = prepared.map(_._1)
    require(ef.isEmpty || graph.nonEmpty,
      "chunk search ef param requires a live chunk graph: run rebuildChunkGraph first")
    val servingEf = ef.getOrElse(prepared.fold(10)(
      _._2.getOrElse("index.hnsw.default_ef", "10").toInt))
    CollectionView.search(chunks, "doc_set", content, limit, expandChunk, filter,
      graph = graph, ef = servingEf, graphPrepared = true)
  }

  /** Drop the whole view (all backing collections). */
  def drop(): Unit = {
    catalog.dropCollection(db, setsColl)
    catalog.dropCollection(db, chunksColl)
    dropChunkGraph()
  }

  /** Replace `name`'s rows in a backing collection with `rows`. */
  private def replaceIn(coll: String, name: String, rows: DataFrame): Unit = {
    val existing = catalog.read(db, coll)
    if (existing.isEmpty) catalog.write(db, coll, rows)
    else catalog.overwriteFromSelf(db, coll,
      existing.where(col("doc_set") =!= name).unionByName(rows))
  }
}

object GraftCollectionView {
  val SetsSuffix = "__cv_sets"
  val ChunksSuffix = "__cv_chunks"
  val GraphSuffix = "__cv_graph"
  /** Registry schema — the single definition both the row writer and
    * the empty-read path use. */
  val SetsSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_set STRING, title STRING, text STRING, n_chars BIGINT, n_chunks BIGINT")
}
