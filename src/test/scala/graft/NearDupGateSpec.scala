package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.api.GraftClient
import graft.streaming.Streams

/** The near-dup ingest gate: GraftCollection.nearDupFilter semantics
  * and its streaming wiring through curatedIngest(nearDupThreshold). */
class NearDupGateSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again"

  test("nearDupFilter drops near-dups of live docs, keeps distinct and same-id rows") {
    val root = Files.createTempDirectory("graft-ndf").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq(
      (1L, base), (2L, "completely different words entirely here now"))
      .toDF("id", "text"))
    coll.rebuildMinhashIndex()

    val batch = Seq(
      (10L, base),                       // identical text, new id -> suppressed
      (1L, base + " with a tweak"),      // SAME id -> an update, never suppressed
      (11L, "utterly unrelated content about engines and columnar files"),
      (20L, "some shared sentence repeated across the pair of rows exactly"),
      (21L, "some shared sentence repeated across the pair of rows exactly")
    ).toDF("id", "text")
    val kept = coll.nearDupFilter(batch, threshold = 0.8)
      .select("id").as[Long].collect().sorted.toSeq
    // 10 dropped vs corpus doc 1; 21 dropped within-batch (20 is the
    // lower id); 1, 11, 20 survive
    assert(kept == Seq(1L, 11L, 20L))
  }

  test("fallback join path (inCap exceeded) returns exactly the In-pushdown fast path's rows") {
    // a backfill-sized batch overflows the In(...)-literal caps and
    // takes the plain-join fallback; results must be identical — only
    // the scan shape differs. Drive BOTH paths over a corpus with
    // cross-corpus dups, a same-id update, and within-batch dup pairs,
    // with inCap = 0 forcing every fallback branch.
    val root = Files.createTempDirectory("graft-ndf-fb").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert((0L until 20L).map(i =>
        (i, s"corpus document number $i carrying some shared boilerplate text " + base))
      .toDF("id", "text"))
    coll.rebuildMinhashIndex()

    val batch = ((100L until 110L).map(i => (i, s"corpus document number ${i - 100} " +
        s"carrying some shared boilerplate text " + base)) ++   // near-dups of corpus
      Seq((3L, base + " same id update"),                        // never suppressed
          (200L, "utterly unrelated content about engines and columnar files"),
          (201L, "another fully distinct row with its own words and phrasing")))
      .toDF("id", "text")
    val fast = coll.nearDupFilter(batch, 0.8, None, None, inCap = 100000)
      .select("id").as[Long].collect().sorted.toSeq
    val fallback = coll.nearDupFilter(batch, 0.8, None, None, inCap = 0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(fast == fallback, s"paths disagree: fast=$fast fallback=$fallback")
    assert(fast.contains(3L) && fast.contains(200L) && fast.contains(201L))
    assert(!fast.exists(id => id >= 100L && id < 110L),
      "near-dup backfill rows must be suppressed on both paths")
  }

  test("nearDupFilter probes segments appended by upsert, and survives compaction") {
    val root = Files.createTempDirectory("graft-ndf-seg").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq((1L, base)).toDF("id", "text"))
    coll.rebuildMinhashIndex()

    // doc 5 arrives AFTER the rebuild: only incremental maintenance has
    // its signature + band buckets
    val newText = "fresh content that arrived after the index was first built"
    coll.upsert(Seq((5L, newText)).toDF("id", "text"))
    val vsNew = coll.nearDupFilter(Seq((30L, newText)).toDF("id", "text"),
      threshold = 0.8)
    assert(vsNew.isEmpty, "gate must see incrementally-indexed docs")

    // a replaced doc's OLD signature must not suppress anything
    coll.upsert(Seq((5L, "entirely new body with zero overlap now here")).toDF("id", "text"))
    val vsOld = coll.nearDupFilter(Seq((31L, newText)).toDF("id", "text"),
      threshold = 0.8)
    assert(vsOld.count() == 1, "ledger-retired signature must not suppress")

    coll.compactIndexes()
    val vsCompacted = coll.nearDupFilter(Seq((32L, base)).toDF("id", "text"),
      threshold = 0.8)
    assert(vsCompacted.isEmpty, "gate must serve from the compacted base segment")
  }

  test("curatedIngest near-dup gate suppresses near-identical content across batches") {
    implicit val sq = spark.sqlContext
    val root = Files.createTempDirectory("graft-ndf-stream").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("ci")
    // seed one curated row so the index exists before the stream starts
    // (same bootstrap as the live-fulltext streaming test)
    val textA = "the cat sat on the mat and the dog is here to stay in peace"
    coll.upsert(graft.ops.Curation.curateBatch(
      Seq((1L, textA, "web")).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source"))
    coll.rebuildMinhashIndex()
    val ckpt = Files.createTempDirectory("graft-ndf-stream-ck").toString
    val in = MemoryStream[(Long, String, String)]
    val q = Streams.curatedIngest(in.toDF().toDF("doc_id", "text", "source"),
      coll, ckpt, nearDupThreshold = Some(0.7))
    try {
      // identical content under a new doc_id -> same md5 key -> UPDATE
      // (count stays 1, src_id advances); distinct doc -> inserted
      in.addData((2L, textA, "web"),
        (3L, "a totally different document about streams and windows here", "web"))
      q.processAllAvailable()
      assert(coll.count() == 2)
      assert(coll.df.where(col("text") === textA).head().getAs[Long]("src_id") == 2L)
      // near-identical (one word changed => different md5, est_jaccard
      // ~1) -> suppressed at the door: never stored, count unchanged
      val nearA = textA.replace("peace", "quiet")
      in.addData((4L, nearA, "web"))
      q.processAllAvailable()
      assert(coll.count() == 2)
      assert(coll.df.where(col("text") === nearA).isEmpty)
    } finally q.stop()
  }
}
