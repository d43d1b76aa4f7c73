package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog
import graft.filter.FilterParser
import graft.hybrid.Fusion
import graft.ops.DocumentOps
import graft.sparse.Bm25
import graft.vector.KnnSearch

/** Reference-shaped client facade: the ergonomics of the
  * aiotcvectordb surface (client → database → collection →
  * upsert/query/search/hybrid_search/delete/update/count,
  * /root/reference/aiotcvectordb/client/client.py + model/database.py +
  * model/collection.py) over graft's batch engine.
  *
  * A "collection" is a parquet-backed table managed by [[Catalog]];
  * mutation ops compute the new snapshot and persist it. A user of the
  * reference maps their calls 1:1 onto this API.
  */
final class GraftClient(val spark: SparkSession, root: String) {
  private val catalog = new Catalog(spark, root)

  def createDatabase(name: String): GraftDatabase = {
    catalog.createDatabase(name); database(name)
  }
  def database(name: String): GraftDatabase = new GraftDatabase(this, catalog, name)
  def listDatabases(): Seq[String] = catalog.listDatabases()
  def dropDatabase(name: String): Unit = catalog.dropDatabase(name)
}

final class GraftDatabase(client: GraftClient, catalog: Catalog, val name: String) {
  def createCollection(coll: String, meta: Map[String, String] = Map.empty): GraftCollection = {
    catalog.createCollection(name, coll, meta); collection(coll)
  }
  def collection(coll: String): GraftCollection =
    new GraftCollection(client.spark, catalog, name, catalog.resolve(name, coll))
  def listCollections(): Seq[String] = catalog.listCollections(name)
  def dropCollection(coll: String): Unit = catalog.dropCollection(name, coll)
  def truncateCollection(coll: String): Unit = catalog.truncateCollection(name, coll)
  def setAlias(alias: String, coll: String): Unit = catalog.setAlias(name, alias, coll)
  def deleteAlias(alias: String): Unit = catalog.deleteAlias(name, alias)
}

/** Collection ops. `idCol`/`vecCol` default to the reference's `id` /
  * `vector` field names; configure via collection meta if different. */
final class GraftCollection(spark: SparkSession, catalog: Catalog,
                            db: String, coll: String,
                            idCol: String = "id", vecCol: String = "vector") {

  def df: DataFrame = catalog.read(db, coll)

  def describe: Map[String, String] = catalog.describeCollection(db, coll)

  /** upsert(documents): last-wins merge by id, persisted. */
  def upsert(docs: DataFrame): Unit = {
    val current = df
    if (current.isEmpty) catalog.write(db, coll, docs)
    else catalog.overwriteFromSelf(db, coll, DocumentOps.upsert(current, docs, idCol))
  }

  def query(filter: String = "", sort: Seq[(String, Boolean)] = Nil,
            limit: Option[Int] = None, offset: Int = 0,
            outputFields: Seq[String] = Nil): DataFrame =
    DocumentOps.query(df, filter, sort, limit, offset, outputFields)

  def queryByIds(ids: Seq[Any], outputFields: Seq[String] = Nil): DataFrame =
    DocumentOps.byIds(df, idCol, ids, outputFields)

  def count(filter: String = ""): Long =
    DocumentOps.countRows(df, filter).head().getLong(0)

  /** search(vectors, limit, filter, output_fields, retrieve_vector):
    * batch exact KNN; requested document fields are joined back by id
    * (the small hit-list broadcasts, the collection never shuffles). */
  def search(queries: DataFrame, qIdCol: String, qVecCol: String,
             metric: String = "cosine", limit: Int = 10,
             filter: String = "", outputFields: Seq[String] = Nil,
             retrieveVector: Boolean = false): DataFrame = {
    val hits = KnnSearch.topK(df, idCol, vecCol, queries, qIdCol, qVecCol, metric, limit,
      if (filter.isEmpty) None else Some(FilterParser.parse(filter)))
    withOutputFields(hits, outputFields, retrieveVector)
  }

  def searchById(ids: Seq[Any], metric: String = "cosine", limit: Int = 10,
                 filter: String = "", outputFields: Seq[String] = Nil,
                 retrieveVector: Boolean = false): DataFrame =
    withOutputFields(
      KnnSearch.byId(df, idCol, vecCol, ids, metric, limit,
        if (filter.isEmpty) None else Some(FilterParser.parse(filter))),
      outputFields, retrieveVector)

  private def withOutputFields(hits: DataFrame, outputFields: Seq[String],
                               retrieveVector: Boolean): DataFrame = {
    val extra = outputFields ++ (if (retrieveVector) Seq(vecCol) else Nil)
    if (extra.isEmpty) hits
    else {
      val fields = df.select(col(idCol).as("id") +: extra.distinct.map(col): _*)
      hits.join(fields, "id")
        .select((hits.columns.map(col) ++ extra.distinct.map(col)).toSeq: _*)
        .orderBy("query_id", "rank")
    }
  }

  /** search_by_text: embed the query strings with the collection's
    * (stub) embedder and KNN against embeddings derived from `textCol`
    * — the reference's server-side-embedding search. */
  def searchByText(texts: Seq[String], textCol: String = "text",
                   limit: Int = 10): DataFrame = {
    val corpus = graft.text.TextEmbed.hashEmbed(df, idCol, textCol)
    import spark.implicits._
    val qdf = graft.text.TextEmbed.hashEmbed(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("qid", "qtext"),
      "qid", "qtext")
    KnnSearch.topK(corpus, idCol, "vec", qdf, "qid", "vec", "cosine", limit)
  }

  /** rebuild_index / modify_vector_index: retrain IVF cells and rewrite
    * the collection PARTITIONED BY cell, so subsequent nprobe searches
    * prune whole partitions. Index params land in collection meta. */
  def rebuildIndex(nlist: Int = 16, metric: String = "l2"): Unit = {
    val model = graft.vector.IvfIndex.train(df, vecCol, nlist)
    val assigned = graft.vector.IvfIndex.assign(model, df, vecCol)
    catalog.overwriteFromSelf(db, coll, assigned, partitionBy = Seq("cell"))
  }

  /** hybrid_search: dense ANN + BM25 keyword lists fused with RRF. */
  def hybridSearch(queries: DataFrame, qIdCol: String, qVecCol: String,
                   keywords: Seq[String], textCol: String = "text",
                   rrfK: Int = 60, limit: Int = 10): DataFrame = {
    val dense = search(queries, qIdCol, qVecCol, "cosine", limit * 2)
    val sparse = Bm25.fulltext(df, idCol, textCol, keywords, limit * 2)
    // same id normalization as the dense side: string query ids stay
    // strings (a long cast would NULL them and orphan sparse scores)
    val qids = queries.select(KnnSearch.idNorm(queries, qIdCol).as("query_id")).distinct()
    val sparseQ = qids.crossJoin(broadcast(
      sparse.select(col("doc_id").as("id"), col("rank"))))
    Fusion.rrf(Seq(dense.select("query_id", "id", "rank"),
      sparseQ.select("query_id", "id", "rank")),
      Seq("query_id"), "id", "rank", rrfK, limit)
  }

  def delete(filter: String, limit: Option[Int] = None): Unit =
    catalog.overwriteFromSelf(db, coll, DocumentOps.delete(df, idCol, filter, limit))

  /** delete(document_ids=...) — reference's by-ids deletion. */
  def deleteByIds(ids: Seq[Any]): Unit =
    catalog.overwriteFromSelf(db, coll, df.where(!col(idCol).isin(ids: _*)))

  def update(filter: String, set: Map[String, Column]): Unit =
    catalog.overwriteFromSelf(db, coll, DocumentOps.update(df, filter, set))

  /** update(document_ids=..., data=...) — reference's by-ids update. */
  def updateByIds(ids: Seq[Any], set: Map[String, Column]): Unit = {
    val pred = col(idCol).isin(ids: _*)
    val projections = df.columns.map { c =>
      set.get(c).map(v => when(pred, v).otherwise(col(c)).as(c)).getOrElse(col(c))
    }
    catalog.overwriteFromSelf(db, coll, df.select(projections.toSeq: _*))
  }

  def truncate(): Unit = catalog.truncateCollection(db, coll)
}
