package graft.catalog

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Databases / collections as parquet directories with JSON metadata —
  * the reference's catalog surface (/root/reference/aiotcvectordb/
  * client/stub.py + model/database.py: create_database, list_databases,
  * drop_database, create_collection, list_collections,
  * describe_collection, drop_collection, truncate_collection,
  * set_alias / delete_alias).
  *
  * Layout: parquet files under `<root>/<db>/<collection>/data/` +
  * `<root>/<db>/<collection>/meta.json`; aliases live in
  * `<root>/<db>/_aliases.json`. On a cluster `root` is an object-store
  * prefix; collections big enough to care are written partitioned (e.g.
  * by IVF cell) so scans prune.
  */
final class Catalog(spark: SparkSession, root: String) {

  /** The catalog's filesystem root — cache keys for per-artifact
    * serving handles need it (two catalogs may hold same-named
    * collections). */
  private[graft] def rootPath: String = root

  /** Database/collection/alias names become filesystem path segments;
    * restrict them so "../x" can never escape the catalog root (and an
    * alias can never resolve outside it). Leading '_' is reserved for
    * catalog-internal files (_aliases.json). */
  private def validName(name: String): String = {
    require(name.matches("[A-Za-z0-9][A-Za-z0-9_.-]*"),
      s"invalid catalog name '$name' (allowed: [A-Za-z0-9][A-Za-z0-9_.-]*)")
    require(!name.contains(".."), s"invalid catalog name '$name'")
    name
  }

  private def dbPath(db: String): Path = Paths.get(root, validName(db))
  private def collPath(db: String, coll: String): Path = dbPath(db).resolve(validName(coll))

  // ------------------------------------------------------------ databases
  def createDatabase(db: String): Unit = Files.createDirectories(dbPath(db))

  /** create_database_if_not_exists (reference client/stub.py). */
  def createDatabaseIfNotExists(db: String): Unit =
    if (!databaseExists(db)) createDatabase(db)

  def dropDatabase(db: String): Unit = deleteRecursively(dbPath(db))

  def listDatabases(): Seq[String] =
    listDirs(Paths.get(root))

  def databaseExists(db: String): Boolean = Files.isDirectory(dbPath(db))

  // ---------------------------------------------------------- collections
  def createCollection(db: String, coll: String, meta: Map[String, String] = Map.empty): Unit = {
    require(databaseExists(db), s"database $db does not exist")
    val p = collPath(db, coll)
    require(!Files.exists(p), s"collection $db.$coll already exists")
    Files.createDirectories(p.resolve("data"))
    Files.writeString(p.resolve("meta.json"), Json.render(meta))
  }

  /** create_collection_if_not_exists (reference client/stub.py). */
  def createCollectionIfNotExists(db: String, coll: String,
                                  meta: Map[String, String] = Map.empty): Unit =
    if (!collectionExists(db, coll)) createCollection(db, coll, meta)

  def listCollections(db: String): Seq[String] =
    listDirs(dbPath(db))

  def collectionExists(db: String, coll: String): Boolean =
    Files.isDirectory(collPath(db, coll))

  def describeCollection(db: String, coll: String): Map[String, String] =
    Json.parse(Files.readString(collPath(db, coll).resolve("meta.json")))

  /** Merge entries into a collection's metadata (a null value removes
    * the key). Used by index lifecycle ops to record index state. */
  def updateMeta(db: String, coll: String, entries: Map[String, String]): Unit = {
    val merged = entries.foldLeft(describeCollection(db, coll)) {
      case (m, (k, null)) => m - k
      case (m, (k, v)) => m + (k -> v)
    }
    Files.writeString(collPath(db, coll).resolve("meta.json"), Json.render(merged))
  }

  def dropCollection(db: String, coll: String): Unit =
    deleteRecursively(collPath(db, coll))

  /** Drop all rows, keep the collection + metadata (reference
    * truncate_collection). */
  def truncateCollection(db: String, coll: String): Unit = {
    val data = collPath(db, coll).resolve("data")
    deleteRecursively(data)
    Files.createDirectories(data)
  }

  // ---------------------------------------------------------------- data
  def write(db: String, coll: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(collPath(db, coll).resolve("data").toString)
    saveSchema(db, coll, df)
  }

  /** Dynamic-partition overwrite: replace ONLY the partition directories
    * present in `df`, leaving every other partition's files untouched
    * (and unread). This is the merge-on-write path for bucketed
    * collections: an upsert touching 1% of buckets rewrites 1% of the
    * data. The staged write is fully distributed; the swap is a per-
    * partition directory move. */
  def overwritePartitions(db: String, coll: String, df: DataFrame, partitionCol: String): Unit =
    overwritePartitions(db, coll, df, Seq(partitionCol))

  /** Multi-level variant: rows are laid out under nested
    * `c1=v1/c2=v2/...` directories and the swap replaces the TOP-level
    * (`partitionCols.head`) directories present in `df` — e.g. a
    * segment append partitioned `(__seg, cell)` lands one new `__seg=N`
    * tree with cell pruning intact inside it. */
  def overwritePartitions(db: String, coll: String, df: DataFrame,
                          partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val partitionCol = partitionCols.head
    val base = collPath(db, coll)
    val staging = base.resolve("data_staging")
    deleteRecursively(staging)
    df.write.partitionBy(partitionCols: _*).parquet(staging.toString)
    val data = base.resolve("data")
    Files.createDirectories(data)
    // list directly (not listDirs: internal partition columns may start
    // with "_", which listDirs reserves for catalog files)
    val s = Files.list(staging)
    val parts = try s.iterator().asScala
      .filter(p => Files.isDirectory(p) &&
        p.getFileName.toString.startsWith(s"$partitionCol="))
      .map(_.getFileName.toString).toSeq
    finally s.close()
    parts.foreach { p =>
      val target = data.resolve(p)
      deleteRecursively(target)
      Files.move(staging.resolve(p), target)
    }
    deleteRecursively(staging)
  }

  /** Delete specific top-level partition directories of a collection
    * (tiered compaction: segment dirs folded into a merged segment go
    * away; every other partition's files are untouched and unread). */
  def dropPartitions(db: String, coll: String, partitionCol: String,
                     values: Seq[String]): Unit = {
    val data = collPath(db, coll).resolve("data")
    values.foreach(v => deleteRecursively(data.resolve(s"$partitionCol=$v")))
  }

  /** Last-written schema, so empty/truncated collections still resolve
    * columns (the reference returns empty results, not errors). */
  private def saveSchema(db: String, coll: String, df: DataFrame): Unit =
    Files.writeString(collPath(db, coll).resolve("schema.json"), df.schema.json)

  /** Overwrite a collection with a plan that READS the same collection
    * (upsert/delete/update snapshots): stage to a sibling dir fully
    * distributed, then swap — never a driver-side collect. */
  def overwriteFromSelf(db: String, coll: String, df: DataFrame,
                        partitionBy: Seq[String] = Nil): Unit = {
    val base = collPath(db, coll)
    val staging = base.resolve("data_staging")
    deleteRecursively(staging)
    val writer = df.write
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(staging.toString)
    val data = base.resolve("data")
    deleteRecursively(data)
    Files.move(staging, data)
    saveSchema(db, coll, df)
  }

  def read(db: String, coll: String): DataFrame = {
    val data = collPath(db, coll).resolve("data")
    // walk: partitioned collections keep files under key=value subdirs
    val walk = Files.walk(data)
    val hasFiles = try walk.iterator().asScala.exists(_.toString.endsWith(".parquet"))
                   finally walk.close()
    if (hasFiles) normalizeToSavedSchema(db, coll, spark.read.parquet(data.toString))
    else {
      val schemaFile = collPath(db, coll).resolve("schema.json")
      if (Files.exists(schemaFile)) {
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(Files.readString(schemaFile))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      } else spark.emptyDataFrame
    }
  }

  /** Partition-column values are directory names, so Spark re-infers
    * their type on read (a partitioned bigint comes back int) and moves
    * them to the end of the schema. Cast + reorder back to the schema
    * the collection was WRITTEN with, so a partitioned layout (scalar
    * index, IVF cell) is invisible to readers. Columns absent from the
    * saved schema (none in practice) are preserved at the end. */
  private def normalizeToSavedSchema(db: String, coll: String, df: DataFrame): DataFrame = {
    val schemaFile = collPath(db, coll).resolve("schema.json")
    if (!Files.exists(schemaFile)) df
    else {
      val saved = org.apache.spark.sql.types.DataType
        .fromJson(Files.readString(schemaFile))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val have = df.schema.map(f => f.name -> f.dataType).toMap
      val savedCols = saved.fields.toSeq.filter(f => have.contains(f.name)).map { f =>
        // catalogString ignores nullability: only cast on REAL drift (a
        // partition-inferred int where a bigint was written), never on
        // containsNull differences (such casts are rejected anyway)
        if (have(f.name).catalogString == f.dataType.catalogString)
          org.apache.spark.sql.functions.col(f.name)
        else org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)
      }
      val extras = df.columns.filterNot(saved.fieldNames.contains)
        .map(org.apache.spark.sql.functions.col).toSeq
      df.select(savedCols ++ extras: _*)
    }
  }

  // -------------------------------------------------------------- aliases
  private def aliasFile(db: String): Path = dbPath(db).resolve("_aliases.json")

  private def aliases(db: String): Map[String, String] =
    if (Files.exists(aliasFile(db))) Json.parse(Files.readString(aliasFile(db)))
    else Map.empty

  def setAlias(db: String, alias: String, coll: String): Unit = {
    require(collectionExists(db, coll), s"collection $db.$coll does not exist")
    Files.writeString(aliasFile(db), Json.render(aliases(db) + (validName(alias) -> coll)))
  }

  def deleteAlias(db: String, alias: String): Unit =
    Files.writeString(aliasFile(db), Json.render(aliases(db) - alias))

  /** Resolve a name that may be an alias to the collection name. */
  def resolve(db: String, name: String): String = aliases(db).getOrElse(name, name)

  // -------------------------------------------------------------- helpers
  private def listDirs(p: Path): Seq[String] =
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filterNot(_.startsWith("_"))
        .toSeq.sorted
      finally s.close()
    }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
    }
}

/** Minimal flat string-map JSON (catalog metadata needs nothing more). */
private[catalog] object Json {
  def render(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ", ", "}")

  /** Proper scanner for the flat {"k": "v", ...} shape — split-based
    * parsing corrupts keys/values containing `",` or `:`. */
  def parse(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def readString(): String = {
      require(i < s.length && s.charAt(i) == '"', s"expected string at $i in: $s")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          require(i + 1 < s.length, s"dangling escape at $i in: $s")
          sb.append(s.charAt(i + 1)); i += 2
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      require(i < s.length, s"unterminated string in: $s")
      i += 1
      sb.toString
    }
    skipWs()
    require(i < s.length && s.charAt(i) == '{', s"expected '{' in: $s")
    i += 1
    skipWs()
    while (i < s.length && s.charAt(i) != '}') {
      val k = readString()
      skipWs()
      require(i < s.length && s.charAt(i) == ':', s"expected ':' at $i in: $s"); i += 1
      skipWs()
      val v = readString()
      out += (k -> v)
      skipWs()
      if (i < s.length && s.charAt(i) == ',') { i += 1; skipWs() }
    }
    out.result()
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
