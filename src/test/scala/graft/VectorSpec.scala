package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.{KnnSearch, TopKBuffer, VectorScore}

class TopKBufferSpec extends AnyFunSuite {
  test("keeps k best descending with id tie-break") {
    val b = new TopKBuffer(3, asc = false)
    Seq((1.0, 10L), (3.0, 5L), (2.0, 7L), (3.0, 2L), (0.5, 1L))
      .foreach { case (s, i) => b.insert(s, i) }
    assert(b.sortedPairs.toSeq == Seq((3.0, 2L), (3.0, 5L), (2.0, 7L)))
  }

  test("ascending keeps smallest") {
    val b = new TopKBuffer(2, asc = true)
    Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (1.0, 0L)).foreach { case (s, i) => b.insert(s, i) }
    assert(b.sortedPairs.toSeq == Seq((1.0, 0L), (1.0, 2L)))
  }

  test("merge equals bulk insert") {
    val a = new TopKBuffer(4, asc = false)
    val b = new TopKBuffer(4, asc = false)
    val all = (1 to 20).map(i => (i * 0.5, i.toLong))
    all.take(10).foreach { case (s, i) => a.insert(s, i) }
    all.drop(10).foreach { case (s, i) => b.insert(s, i) }
    val c = new TopKBuffer(4, asc = false)
    all.foreach { case (s, i) => c.insert(s, i) }
    assert(a.mergeFrom(b).sortedPairs.toSeq == c.sortedPairs.toSeq)
  }
}

class VectorScoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = Seq(
    (Array(1.0f, 2.0f, 0.0f), Array(2.0f, 3.0f, 0.0f)),
    (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
  ).toDF("a", "b")

  test("cosine / ip / l2 match hand computation") {
    val row = pairs.select(
      VectorScore.cosine($"a", $"b").as("c"),
      VectorScore.ip($"a", $"b").as("i"),
      VectorScore.l2($"a", $"b").as("l")).collect()
    assert(math.abs(row(0).getDouble(0) - 8.0 / math.sqrt(5 * 13)) < 1e-12)
    assert(row(0).getDouble(1) == 8.0)
    assert(math.abs(row(0).getDouble(2) - math.sqrt(2.0)) < 1e-12)
    assert(row(1).getDouble(0) == 0.0)
  }

  test("knn top-1 of search_by_id is the query itself") {
    val res = KnnSearch.byId(
      spark.read.parquet(s"$sf/embeddings.parquet"), "vec_id", "embedding",
      Seq(3L, 7L), "cosine", 3).collect()
    val top1 = res.filter(_.getInt(1) == 1).map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(top1 == Map(3L -> 3L, 7L -> 7L))
    assert(res.filter(_.getInt(1) == 1).forall(_.getDouble(3) == 1.0))
  }

  test("radius returns only rows above threshold") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = embs.where($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val res = KnnSearch.radius(embs, "vec_id", "embedding", q, "qid", "qvec", "cosine", 0.99)
    // only the query itself has cosine ~1 with itself
    assert(res.collect().map(_.getLong(1)).toSeq == Seq(0L))
  }
}
