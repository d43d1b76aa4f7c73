package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** Incremental HNSW maintenance: every mutation type keeps the graph
  * serving, and the exhaustive certificate (ef >= segment size =>
  * byte-equal exact KNN) holds across upserts, vector-replacing
  * updates, and deletes — the same incremental == from-scratch
  * equality the segment-maintained families pin, adapted to a graph:
  * batches append as independent segment graphs, stale nodes are
  * masked by the rerank join against the current data snapshot, and
  * compaction folds the mini-segments back to the configured count. */
class HnswMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vector"))
  private lazy val queries = spark.read.parquet(s"$sf/embeddings.parquet")
    .where(col("vec_id") < 4)
    .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))

  private def freshColl(tag: String) = {
    val root = Files.createTempDirectory(s"graft-hnsw-$tag").toString
    val db = new GraftClient(spark, root).createDatabase("db")
    val coll = db.createCollection("v")
    coll.upsert(embs.limit(80))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    coll
  }

  private def exhaustive(coll: graft.api.GraftCollection) =
    coll.searchHnsw(queries, "qid", "qv", limit = 5, ef = Int.MaxValue)
      .select("query_id", "id", "score").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2))).toSet

  private def exact(coll: graft.api.GraftCollection) =
    coll.search(queries, "qid", "qv", metric = "cosine", limit = 5)
      .select("query_id", "id", "score").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2))).toSet

  test("vector-replacing upsert: stale nodes lose to the rerank, no duplicate ranks") {
    val coll = freshColl("replace")
    // replace ids 10..19 with DIFFERENT vectors (their old graph nodes
    // keep routing by the stale position; the new segment carries the
    // new position — both surface the id, the rerank scores it once,
    // against the new vector)
    val replaced = embs.where(col("id").between(10, 19))
      .select(col("id"), transform(col("vector"), x => -x).as("vector"))
    coll.upsert(replaced)
    assert(exhaustive(coll) == exact(coll),
      "post-replace exhaustive HNSW must equal exact KNN on the new vectors")
    // production path must not emit an id twice for one query
    val prod = coll.searchHnsw(queries, "qid", "qv", limit = 5, ef = 16)
      .groupBy("query_id", "id").count().where(col("count") > 1)
    assert(prod.isEmpty, "duplicate (query, id) in production HNSW results")
  }

  test("delete keeps serving at zero graph cost; doomed ids drop at the rerank") {
    val coll = freshColl("delete")
    coll.delete("id >= 60")
    assert(coll.describe.contains("index.hnsw.m"),
      "HNSW must survive a delete")
    val res = exhaustive(coll)
    assert(res == exact(coll), "post-delete exhaustive HNSW must equal exact KNN")
    assert(!res.exists(_._2.toLong >= 60), "a deleted id surfaced")
  }

  test("update by filter re-indexes the post-image rows") {
    val coll = freshColl("update")
    coll.update("id < 5", Map("vector" -> transform(col("vector"), x => x * lit(2.0))))
    assert(coll.describe.contains("index.hnsw.m"),
      "HNSW must survive an update")
    assert(exhaustive(coll) == exact(coll),
      "post-update exhaustive HNSW must equal exact KNN on the post-image")
  }

  test("mutation chain: upsert + delete + update, then compaction folds segments") {
    val coll = freshColl("chain")
    coll.upsert(embs.where(col("id").between(80, 99)))          // 20 new
    coll.delete("id >= 90")                                     // 10 gone
    coll.update("id < 3", Map("vector" -> transform(col("vector"), x => x + lit(0.5))))
    assert(exhaustive(coll) == exact(coll),
      "exhaustive HNSW must track the corpus through a mutation chain")
    // the chain accumulated per-batch mini-segments above the base 2
    val segsBefore = coll.hnswGraphSegments
    assert(segsBefore > 2, s"expected appended segments, got $segsBefore")
    val baseSegs = coll.hnswGraphRows.where(col("seg") < 2)
      .select("seg", "id", "vec", "level", "nbrs").collect().toSet
    coll.compactIndexes()
    // TIERED merge: the mini-segments fold into ONE merged segment
    // (O(merged) work); the two base graphs are byte-untouched
    assert(coll.hnswGraphSegments == 3,
      s"tiered compaction must fold minis into one merged segment, " +
        s"got ${coll.hnswGraphSegments}")
    assert(coll.hnswGraphRows.where(col("seg") < 2)
      .select("seg", "id", "vec", "level", "nbrs").collect().toSet == baseSegs,
      "tiered compaction must not touch base-tier graphs")
    assert(exhaustive(coll) == exact(coll),
      "compaction must preserve exhaustive == exact")
    // merged tier == a from-scratch build over the same live rows at
    // the same segment offset (build is deterministic) — the per-tier
    // equality pin; column order aligned (partition reads append seg)
    val gCols = Seq("seg", "id", "vec", "level", "nbrs").map(col)
    val mergedSeg = coll.hnswGraphRows.select("seg").distinct()
      .collect().map(_.getInt(0)).max
    val merged = coll.hnswGraphRows.where(col("seg") === mergedSeg).select(gCols: _*)
    val mergedIds = merged.select("id").collect().map(_.getLong(0)).toSeq
    val rebuilt = graft.vector.HnswIndex.build(
      coll.df.where(col("id").isin(mergedIds: _*)).select("id", "vector"),
      "id", "vector", m = 4, efConstruction = 16, numSegments = 1,
      segOffset = mergedSeg).select(gCols: _*)
    assert(merged.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(merged).isEmpty,
      "merged tier must be byte-identical to a from-scratch build of its rows")
  }

  test("streaming ingest keeps a live HNSW index maintained per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val coll = freshColl("stream")
    val ckpt = Files.createTempDirectory("graft-hnsw-stream-ck").toString
    val in = MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.Streams.ingestInto(
      in.toDF().toDF("id", "vector"), coll, ckpt)
    try {
      val batch1 = embs.where(col("id").between(200, 209))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      in.addData(batch1.toIndexedSeq)
      q.processAllAvailable()
      in.addData(embs.where(col("id").between(210, 214))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toIndexedSeq)
      q.processAllAvailable()
      assert(coll.describe.contains("index.hnsw.m"),
        "HNSW must stay live across micro-batches")
      // streamed docs are graph-searchable; exhaustive == exact over
      // the grown corpus
      val res = exhaustive(coll)
      assert(res == exact(coll))
      assert(coll.searchHnsw(
          embs.where(col("id") === 212).select(col("id").as("qid"),
            col("vector").as("qv")), "qid", "qv", limit = 1, ef = Int.MaxValue)
        .select("id").collect().head.get(0).toString == "212",
        "a streamed doc must be its own nearest neighbor")
    } finally q.stop()
  }

  test("drop + recreate under the same name must not serve the old graph") {
    // the serving cache is keyed by artifact path; counters
    // (base_seg/nextseg/mut.seg) REPEAT across drop-recreate cycles,
    // so only a non-repeating generation nonce prevents the cache from
    // handing back the dropped corpus's graph (whose ids are absent
    // from the new data — the rerank join would return EMPTY results
    // with no error)
    val root = Files.createTempDirectory("graft-hnsw-gen").toString
    val db = new GraftClient(spark, root).createDatabase("db")
    val c1 = db.createCollection("v")
    c1.upsert(embs.where(col("id") < 50))
    c1.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    assert(c1.searchHnsw(queries, "qid", "qv", limit = 5,
      ef = Int.MaxValue).count() > 0) // warms the cache
    db.dropCollection("v")
    val c2 = db.createCollection("v")
    c2.upsert(embs.where(col("id").between(100, 149)))
    c2.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    val qs2 = embs.where(col("id").between(100, 103))
      .select(col("id").as("qid"), col("vector").as("qv"))
    val hits = c2.searchHnsw(qs2, "qid", "qv", limit = 5, ef = Int.MaxValue)
      .select("query_id", "id", "score").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2))).toSet
    assert(hits.nonEmpty, "stale cached graph served: empty results")
    val ex = c2.search(qs2, "qid", "qv", metric = "cosine", limit = 5)
      .select("query_id", "id", "score").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getDouble(2))).toSet
    assert(hits == ex, "recreated collection must serve its own graph")
  }

  test("a crashed append's unindexed ids are swept back in by compaction") {
    val root = Files.createTempDirectory("graft-hnsw-crash").toString
    val db = new GraftClient(spark, root).createDatabase("db")
    val coll = db.createCollection("v")
    coll.upsert(embs.limit(80))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    coll.upsert(embs.where(col("id").between(80, 99)))
    // simulate the crash window appendHnswSegment's claim-first
    // ordering leaves behind: the claimed segment's partitions never
    // landed, the `pending` marker survived
    val cat = new graft.catalog.Catalog(spark, root)
    cat.dropPartitions("db", "v__hnsw_graph", "seg", Seq("2"))
    cat.updateMeta("db", "v", Map("index.hnsw.pending" -> "2"))
    // a LATER successful append must not disarm the sweep: the
    // surviving marker is the only evidence batch A's ids are missing
    // from the graph, so append B keeps it set instead of clearing it
    coll.upsert(embs.where(col("id").between(100, 109)))
    assert(coll.describe.contains("index.hnsw.pending"),
      "a later append must not clear a foreign crash marker")
    // the batch is temporarily unindexed (exactly the documented
    // failure mode); the sweep in the next compaction restores it
    coll.compactIndexes()
    assert(exhaustive(coll) == exact(coll),
      "post-sweep exhaustive HNSW must cover the crashed batch again")
    assert(!coll.describe.contains("index.hnsw.pending"),
      "compaction must clear the crash marker")
  }

  test("a crashed tiered merge drops the dead output range and re-arms the sweep") {
    val root = Files.createTempDirectory("graft-hnsw-mergecrash").toString
    val db = new GraftClient(spark, root).createDatabase("db")
    val coll = db.createCollection("v")
    coll.upsert(embs.limit(80))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    coll.upsert(embs.where(col("id").between(80, 84)))  // seg 2
    coll.upsert(embs.where(col("id").between(85, 89)))  // seg 3
    coll.upsert(embs.where(col("id").between(90, 94)))  // seg 4
    // simulate the merge crash window: a fold of segs 2,3 into output
    // range [4,5) died after (partially) writing seg 4 but before the
    // drops — the marker records exactly that attempt; seg 4's rows
    // (ids 90-94 here) are by definition suspect and must be dropped
    // as dead output, then swept back from the data snapshot
    val cat = new graft.catalog.Catalog(spark, root)
    cat.updateMeta("db", "v", Map("index.hnsw.merge_pending" -> "4:1:2,3"))
    coll.compactIndexes()
    assert(!coll.describe.contains("index.hnsw.merge_pending"),
      "compaction must clear the merge marker after repairing")
    assert(!coll.describe.contains("index.hnsw.pending"),
      "the re-armed sweep must complete within the same compaction")
    assert(exhaustive(coll) == exact(coll),
      "post-recovery exhaustive HNSW must cover the dropped range's ids again")

    // publish-lost flavor: every listed small segment is already gone,
    // so the attempt actually completed — recovery only clears the
    // marker, no partitions move
    cat.updateMeta("db", "v", Map("index.hnsw.merge_pending" -> "9:1:7"))
    coll.compactIndexes()
    assert(!coll.describe.contains("index.hnsw.merge_pending"))
    assert(exhaustive(coll) == exact(coll))
  }

  test("crash markers die with the graph: rebuild clears stale pending/merge_pending") {
    val root = Files.createTempDirectory("graft-hnsw-stalemark").toString
    val db = new GraftClient(spark, root).createDatabase("db")
    val coll = db.createCollection("v")
    coll.upsert(embs.limit(60))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    // a merge crashed under the OLD graph, then the user rebuilds: the
    // marker describes segments of a graph that no longer exists — were
    // it to survive, the next compaction's recovery would treat live
    // segments of the NEW graph (same id range) as the dead attempt's
    // output and drop them
    val cat = new graft.catalog.Catalog(spark, root)
    cat.updateMeta("db", "v", Map("index.hnsw.merge_pending" -> "1:1:0"))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    assert(!coll.describe.contains("index.hnsw.merge_pending"),
      "rebuild must clear a stale merge marker")
    assert(!coll.describe.contains("index.hnsw.pending"))
    coll.compactIndexes()
    assert(exhaustive(coll) == exact(coll),
      "compaction after rebuild must not drop live segments")
  }

  test("auto-compaction fires on an HNSW-only collection") {
    val coll = freshColl("auto")
    coll.setAutoCompact(3)
    for (b <- 0 until 4)
      coll.upsert(embs.where(col("id").between(100 + b * 5, 104 + b * 5)))
    // 4 mutations against threshold 3: at least one fold must have
    // fired, keeping the segment debt bounded
    assert(coll.segmentDebt < 4, s"debt ${coll.segmentDebt} never compacted")
    assert(exhaustive(coll) == exact(coll),
      "auto-compacted HNSW must stay exhaustive-exact")
  }
}
