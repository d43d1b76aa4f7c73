package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams
import graft.streaming.Streams.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("streaming upsert keeps latest version per key") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.streamingUpsert(in.toDS())
      .writeStream.format("memory").queryName("ups").outputMode(OutputMode.Update).start()
    try {
      in.addData(Event(1, ts(1), 10, "click", 1.0), Event(2, ts(2), 10, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(3, ts(5), 10, "purchase", 9.0), Event(4, ts(1), 20, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from ups").as[Streams.KeyedLatest].collect()
      val latest10 = rows.filter(_.user_id == 10).maxBy(_.n_versions)
      assert(latest10.event_type == "purchase" && latest10.value == 9.0 && latest10.n_versions == 3)
      assert(rows.exists(r => r.user_id == 20 && r.n_versions == 1))
    } finally q.stop()
  }

  test("streaming ingest into a persisted collection upserts per micro-batch") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-ingest").toString
    val client = new graft.api.GraftClient(spark, root)
    val coll = client.createDatabase("db").createCollection("live")
    val in = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = Streams.ingestInto(in.toDF().toDF("id", "payload"), coll, ckpt)
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(coll.count() == 2)
      // second batch replaces id 2 and adds id 3 (last-wins across batches)
      in.addData((2L, "b2"), (3L, "c"))
      q.processAllAvailable()
      assert(coll.count() == 3)
      assert(coll.queryByIds(Seq(2L)).head().getString(1) == "b2")
    } finally q.stop()
  }

  test("curatedIngest filters, samples, and collapses duplicate content across batches") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-curated").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("curated")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-curated-ck").toString
    val in = MemoryStream[(Long, String, String)]
    // 'the of and is to in' maximizes the stopword term; one-word docs
    // score low on the length term — threshold between them
    val good = "the cat sat on the mat and the dog is here to stay in peace"
    val q = Streams.curatedIngest(in.toDF().toDF("doc_id", "text", "source"),
      // 0.35: above a one-word doc's floor (distinct_ratio alone = 0.3)
      coll, ckpt, weights = Map("drop_me" -> 0.0), minQuality = 0.35)
    try {
      in.addData((1L, good, "web"), (2L, "x", "web"), (3L, good, "drop_me"))
      q.processAllAvailable()
      // low-quality doc 2 filtered, doc 3's domain sampled out, doc 1 stored
      assert(coll.count() == 1)
      val row = coll.df.collect().head
      assert(row.getAs[Long]("src_id") == 1L)
      // the same CONTENT re-arrives under a new doc_id in a later batch:
      // it overwrites (content-keyed upsert), never duplicates
      in.addData((9L, good, "web"), (10L, "another long doc here with the and is to in it", "web"))
      q.processAllAvailable()
      assert(coll.count() == 2)
      assert(coll.df.where(col("text") === good).count() == 1)
      assert(coll.df.where(col("text") === good).head().getAs[Long]("src_id") == 9L)
    } finally q.stop()
  }

  test("curatedIngest keeps a live fulltext index serving only curated docs") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-curated-idx").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("ci")
    // seed one curated row so the index can be built before the stream
    coll.upsert(graft.ops.Curation.curateBatch(
      Seq((1L, "the seed doc is here to stay in the corpus and rest", "web"))
        .toDF("doc_id", "text", "source"), "doc_id", "text", "source"))
    coll.rebuildFulltextIndex()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-curated-idx-ck").toString
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.curatedIngest(in.toDF().toDF("doc_id", "text", "source"),
      coll, ckpt, minQuality = 0.35)
    try {
      in.addData(
        (2L, "the spark engine is here to win and the scan is fast", "web"),
        (3L, "junk", "web")) // below the quality floor — never indexed
      q.processAllAvailable()
      assert(coll.describe.contains("index.ft.text_col")) // index stayed live
      val hits = coll.fulltext(Seq("spark"), k = 5).collect()
      assert(hits.length == 1) // the curated streamed doc serves
      assert(coll.fulltext(Seq("junk"), k = 5).isEmpty) // the filtered doc does not
    } finally q.stop()
  }

  test("streaming ingest keeps a live fulltext index maintained per micro-batch") {
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-idx").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("t")
    coll.upsert(Seq((1L, "spark join fast"), (2L, "slow scan table")).toDF("id", "text"))
    coll.rebuildFulltextIndex()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-idx-ck").toString
    val in = MemoryStream[(Long, String)]
    val q = Streams.ingestInto(in.toDF().toDF("id", "text"), coll, ckpt)
    try {
      in.addData((3L, "spark stream lands"), (1L, "rewritten no keywords"))
      q.processAllAvailable()
      in.addData((4L, "another spark doc"))
      q.processAllAvailable()
      // the index stayed live across both micro-batches...
      assert(coll.describe.contains("index.ft.text_col"))
      val served = coll.fulltext(Seq("spark"), k = 5).collect().toSeq
      // ...streamed docs are searchable, the re-upserted doc serves its
      // newest text only, and results equal a from-scratch rebuild
      val ids = served.map(_.getLong(1)).toSet
      assert(ids == Set(3L, 4L), s"got $ids")
      coll.rebuildFulltextIndex()
      val rebuilt = coll.fulltext(Seq("spark"), k = 5).collect().toSeq
      assert(served == rebuilt)
    } finally q.stop()
  }

  test("windowed aggregation with watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.windowedCounts(in.toDF(), watermark = "10 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("win").outputMode(OutputMode.Update).start()
    try {
      in.addData(
        Event(1, ts(1), 1, "click", 10.0), Event(2, ts(2), 2, "click", 5.0),
        Event(3, ts(7), 3, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from win").collect()
      val clicks = rows.find(_.getString(2) == "click").get
      assert(clicks.getLong(3) == 2 && clicks.getDouble(4) == 15.0)
      assert(rows.find(_.getString(2) == "view").get.getLong(3) == 1)
    } finally q.stop()
  }
}
