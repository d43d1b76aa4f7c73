package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sparse.Bm25
import graft.streaming.Streams
import graft.streaming.Streams.Event

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation matches direct aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedAgg(df, col("k"), 8, sum, col("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted join matches plain join") {
    val fact = (1 to 500).map(i => (i % 3, i.toLong)).toDF("key", "v")
    val dim = Seq((0, "a"), (1, "b"), (2, "c")).toDF("key", "name")
    val plain = fact.join(dim, "key").groupBy("name").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "key", 4).groupBy("name").agg(sum("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    // Lowered thresholds so local[4]-sized partitions trigger the same
    // OptimizeSkewedJoin rewrite a 100 TB hot key would: one partition
    // >> median x factor is split into advisory-sized reads, and the
    // join node reports skew=true in the final adaptive plan.
    val tuned = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      // keep AQE from converting the SMJ to broadcast (which would
      // sidestep skew handling entirely for this demonstration)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(0, 120000).select(
        when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 16).as("k"),
        concat(lit("padding-padding-padding-padding-"), $"id").as("payload"))
      val dim = spark.range(0, 16).select($"id".as("k"), concat(lit("d"), $"id").as("name"))
      val joined = fact.join(dim, "k")
      val n = joined.collect().length
      assert(n == 120000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"expected a runtime skew-join split, got:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("streaming dedup drops replayed event ids") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.dedupEvents(in.toDF())
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      in.addData(Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(Event(1, ts(1), 1, "click", 1.0), Event(3, ts(3), 2, "click", 3.0)) // replay of 1
      q.processAllAvailable()
      val ids = spark.sql("select event_id from dedup").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("session windows merge events within the gap") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.sessionize(in.toDF(), gap = "5 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    try {
      // user 1: events at 00,02,04 (one session) and 20 (a second one)
      in.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(2), 1, "a", 2.0),
        Event(3, ts(4), 1, "a", 3.0), Event(4, ts(20), 1, "a", 4.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from sess where user_id = 1").collect()
      assert(rows.length == 2)
      val big = rows.maxBy(_.getLong(3))
      assert(big.getLong(3) == 3 && big.getDouble(4) == 6.0)
    } finally q.stop()
  }
}

class TerminateAfterSpec extends SparkSpec {
  import spark.implicits._

  test("terminate_after caps per-term candidates deterministically") {
    val docs = Seq(
      (1L, "apple pie"), (2L, "apple cake"), (3L, "apple tart"), (4L, "banana split")
    ).toDF("doc_id", "text")
    val unlimited = Bm25.fulltext(docs, "doc_id", "text", Seq("apple"), 10)
    assert(unlimited.count() == 3)
    val capped = Bm25.fulltext(docs, "doc_id", "text", Seq("apple"), 10,
      terminateAfter = Some(2))
    // lowest two doc_ids survive
    assert(capped.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }
}
