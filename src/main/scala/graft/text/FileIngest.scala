package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's file-upload family, batch-first
  * (/root/reference/aiotcvectordb/model/collection_view.py:342
  * upload_file, :437 query_file_details, :425 get_image_url). The
  * reference uploads one file per HTTP call to an object store and the
  * server parses it into searchable chunks; at 100 TB the ingest is a
  * BATCH of binary payloads, so the core here is a DataFrame→DataFrame
  * pipeline — decode → chunk → register — and the per-file client API
  * ([[graft.api.GraftCollectionView.uploadFile]]) is a width-1 batch
  * over the same plan. Text/markdown payloads parse for real; PDF /
  * office formats stay declared out of scope alongside image decode
  * (SURVEY §6) — the reference's own client never parses either, it
  * only ships bytes.
  */
object FileIngest {

  /** Parseable payload types (extension, lowercased). */
  val SupportedTypes: Set[String] = Set("md", "markdown", "txt")

  /** The file's lowercased extension ("" when the name has none). */
  def fileTypeOf(fileName: String): String = {
    val i = fileName.lastIndexOf('.')
    if (i < 0 || i == fileName.length - 1) ""
    else fileName.substring(i + 1).toLowerCase
  }

  /** Decode a binary-payload batch: (file_name, text, byte_length,
    * file_type). Zero-byte payloads and unparseable types are DROPPED
    * (the batch reading of the reference's per-file "0 bytes file
    * denied" / splitter-type errors — the strict per-file API
    * validates before it ever builds a batch). Pure projection +
    * filter: pushes to the scan, no shuffle. */
  def parse(files: DataFrame, nameCol: String, contentCol: String): DataFrame =
    files.select(col(nameCol).as("file_name"),
        decode(col(contentCol), "UTF-8").as("text"),
        length(col(contentCol)).cast("long").as("byte_length"),
        // a DOTLESS name has no extension — without the size guard,
        // split's single element would make "md" its own type and the
        // batch path would admit names the per-file fileTypeOf rejects
        // (review finding)
        when(size(split(col(nameCol), "\\.")) > 1,
          lower(element_at(split(col(nameCol), "\\."), -1)))
          .otherwise(lit("")).as("file_type"))
      .where(col("byte_length") > 0 &&
        col("file_type").isin(SupportedTypes.toSeq: _*))

  /** Markdown image references of each parsed file — the asset
    * registry behind get_image_url (collection_view.py:425; the server
    * extracts images at parse time and serves them by URL). `url` is a
    * deterministic catalog-relative locator (`files/<file>/<image>`)
    * — there is no object store to presign against. One distinct row
    * per (file, image target). */
  def imageRefs(parsed: DataFrame): DataFrame =
    parsed.select(col("file_name"),
        explode(regexp_extract_all(col("text"),
          lit("""!\[[^\]]*\]\(([^)]+)\)"""), lit(1))).as("image_name"))
      .distinct()
      .select(col("file_name"), col("image_name"),
        concat(lit("files/"), col("file_name"), lit("/"), col("image_name"))
          .as("url"))

  /** File-detail registry rows for a parsed batch: (file_name,
    * byte_length, file_type, n_chunks) — `n_chunks` counts the REAL
    * chunker's output ([[TextAnalysis.chunkSplit]], the q_chunk_split
    * contract), so the registry always agrees with what a search will
    * traverse. One narrow groupBy on file_name; the chunk text itself
    * is never shuffled (count only). */
  def details(files: DataFrame, nameCol: String, contentCol: String,
              chunkSize: Int = 80, overlap: Int = 20): DataFrame = {
    val parsed = parse(files, nameCol, contentCol)
    val n = TextAnalysis.chunkSplit(
        parsed.withColumn("__title", col("file_name")),
        "file_name", "text", "__title", chunkSize, overlap)
      .groupBy("file_name").agg(count(lit(1)).as("n_chunks"))
    parsed.select("file_name", "byte_length", "file_type")
      .join(n, Seq("file_name"), "left")
      .select(col("file_name"), col("byte_length"), col("file_type"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"))
  }
}
