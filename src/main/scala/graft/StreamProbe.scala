package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Sustained micro-batch throughput for the streaming curation front
  * door ([[graft.streaming.Streams.curatedIngest]]) with LIVE indexes —
  * the streaming counterpart of CurationProbe's batch evidence and of
  * the m_upsert_live_index_* bench pair.
  *
  * For a 1x and an 8x base corpus, the probe feeds `nBatches`
  * micro-batches of `batchSize` fresh docs through curatedIngest into a
  * bucketed collection with a live fulltext + minhash index (the first
  * batch is an untimed warmup), and reports sustained docs/sec. The
  * flat-cost claim this measures: per-batch cost is O(batch) —
  * curation is per-doc, the data merge touches only the batch's hash
  * buckets, each index appends its own segment — so docs/sec must NOT
  * fall as the standing corpus grows 8x. Auto-compaction (default
  * threshold 16 segments) runs inside the measured window whenever the
  * batch count crosses it — steady-state throughput includes the folds
  * a real stream would pay.
  *
  * With a 5th arg `gate`, each batch additionally passes the near-dup
  * ingest gate ([[graft.api.GraftCollection.nearDupFilter]] via
  * curatedIngest's nearDupThreshold) — measuring that the gate's
  * per-batch probe cost is also flat in corpus size (pushed In(h)
  * bucket pruning, O(batch) candidates), i.e. suppression does not
  * break the front door's O(batch) claim.
  *
  * Usage: runMain graft.StreamProbe [nBase] [mult] [nBatches] [batchSize] [gate|all]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(20000L)
    val mult = if (args.length > 1) args(1).toInt else 8
    val nBatches = if (args.length > 2) args(2).toInt else 6
    val batchSize = if (args.length > 3) args(3).toInt else 1000
    val gated = args.length > 4 && args(4) == "gate"
    // "all": the FULLY composed front door — heuristic floor, learned
    // classifier, LM perplexity ceiling, DSIR importance floor, the
    // near-dup gate, and per-batch LM count folding. Thresholds are
    // permissive (the probe measures the gates' scoring/join WORK per
    // batch, not their suppression): each batch still pays classifier
    // scoring, LM token-key joins, the DSIR broadcast join, the banded
    // near-dup probe, and the count fold against the standing corpus.
    val allGates = args.length > 4 && args(4) == "all"

    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    // deterministic synthetic docs (same generator family as
    // CurationProbe) with the doc_id itself as the leading token — the
    // mod-pattern words alone repeat with period 51000, and the
    // content-keyed upsert would silently collapse a "bigger" corpus
    // back to 51k stored rows
    def corpus(k: Long) = spark.range(k).toDF("doc_id").select(
      col("doc_id"),
      expr("concat_ws(' ', conv(doc_id, 10, 36), " +
        "transform(sequence(0, cast(pmod(doc_id, 51) as int) + 9), " +
        "i -> conv(pmod(doc_id * 31 + i * 7, 1000), 10, 36)))").as("text"),
      concat(lit("src"), pmod(col("doc_id"), lit(16L))).as("source"))
    // streamed docs use token step 11 where the corpus uses step 7: the
    // corpus generator's content repeats with period 51000, so at the
    // 8x corpus (160k > 51000) a same-step stream would near-dup ~3
    // corpus docs per streamed doc while the 1x corpus (20k) holds no
    // twin — the two runs would measure different suppression work. A
    // different step means NO streamed doc near-dups the standing
    // corpus at either scale; the near-dup gate's suppression work
    // (within-stream progression-aligned pairs) is identical across
    // scales by construction, so the 1x-vs-8x comparison isolates
    // corpus-size effects only.
    def mkText(id: Long): String = {
      val n = (id % 51).toInt + 10
      (java.lang.Long.toString(id, 36) +: (0 until n).map(i =>
        java.lang.Long.toString(Math.floorMod(id * 31 + i * 11L, 1000), 36))).mkString(" ")
    }

    Seq(("1x", nBase), (s"${mult}x", nBase * mult)).foreach { case (tag, k) =>
      val root = java.nio.file.Files.createTempDirectory(s"graft-streamprobe-$tag").toString
      val coll = new graft.api.GraftClient(spark, root)
        .createDatabase("probe").createCollection("docs", Map("buckets" -> "32"))
      coll.upsert(graft.ops.Curation.curateBatch(corpus(k), "doc_id", "text", "source"))
      coll.rebuildFulltextIndex()
      coll.rebuildMinhashIndex()
      if (allGates) {
        coll.trainQualityModel()
        coll.trainLmModel()
        coll.trainDsirModel(corpus(k).where(col("source") === "src0"),
          "doc_id", "text")
      }
      val stored = coll.count()

      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-streamprobe-ck-$tag").toString
      val in = MemoryStream[(Long, String, String)]
      val q = graft.streaming.Streams.curatedIngest(
        in.toDF().toDF("doc_id", "text", "source"), coll, ckpt,
        nearDupThreshold = if (gated || allGates) Some(0.8) else None,
        minClassifierProb = if (allGates) Some(0.01) else None,
        maxLmNll = if (allGates) Some(1e6) else None,
        minDsirLogw = if (allGates) Some(-1e12) else None,
        maintainLm = allGates)
      try {
        def feed(b: Int): Unit = {
          // fresh ids & fresh content per batch, disjoint from the corpus
          val lo = 1000000000L + b.toLong * batchSize
          in.addData((lo until lo + batchSize).map(i =>
            (i, mkText(i), s"src${i % 16}")))
          q.processAllAvailable()
        }
        feed(0) // untimed warmup batch (JIT + first-touch artifacts)
        val t0 = System.nanoTime()
        (1 until nBatches).foreach(feed)
        val sec = (System.nanoTime() - t0) / 1e9
        val ingested = coll.count() - stored
        val rate = (nBatches - 1).toLong * batchSize / sec
        val label = if (allGates) s"curated_ingest_allgates_$tag"
          else if (gated) s"curated_ingest_gated_$tag"
          else s"curated_ingest_$tag"
        println(f"""{"probe":"$label","corpus":$stored,"batches":${nBatches - 1},""" +
          f""""batch_size":$batchSize,"sec":$sec%.2f,"docs_per_sec":$rate%.0f,""" +
          f""""ingested":$ingested,"segment_debt":${coll.segmentDebt}}""")
      } finally q.stop()
    }
    spark.stop()
  }
}
