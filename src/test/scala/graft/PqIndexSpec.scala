package graft

import org.apache.spark.sql.functions._

import graft.vector.{KnnSearch, PqIndex}

class PqIndexSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("codes are within [0, k) and one per subquantizer") {
    val model = PqIndex.train(embs, "embedding", dim = 64, m = 8, k = 16)
    val enc = PqIndex.encode(model, embs, "vec_id", "embedding")
    val rows = enc.collect()
    assert(rows.length == embs.count())
    assert(rows.forall(_.getSeq[Int](1).length == 8))
    assert(rows.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
  }

  test("ADC search recall@10 vs exact L2 is reasonable and self is found") {
    val model = PqIndex.train(embs, "embedding", dim = 64, m = 16, k = 32)
    val enc = PqIndex.encode(model, embs, "vec_id", "embedding").cache()
    val qLocal = embs.where(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val pq = PqIndex.search(model, enc, qLocal, k = 10).collect()
    val exact = KnnSearch.topK(embs, "vec_id", "embedding",
      embs.where(col("vec_id") < 8).select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      "qid", "qvec", "l2", 10).collect()

    def sets(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val (p, e) = (sets(pq), sets(exact))
    val recall = p.keys.map(q => (p(q) intersect e(q)).size.toDouble / 10).sum / p.size
    // the synthetic embeddings are near-random (distance concentration),
    // the hardest case for PQ; production pairs PQ with exact reranking.
    // 0.15 floors well above chance (10/500 = 0.02).
    assert(recall >= 0.15, s"recall@10 = $recall")
    // the query vector itself (quantization distance is minimal for it)
    // should appear in its own top-10
    assert(p.forall { case (q, ids) => ids.contains(q) })
  }
}
