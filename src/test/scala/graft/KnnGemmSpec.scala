package graft

import org.apache.spark.sql.functions._

import graft.vector.{KnnGemm, KnnSearch}

class KnnGemmSpec extends SparkSpec {

  test("gemm path equals expression path on real embeddings") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = embs.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    for (metric <- Seq("cosine", "l2", "ip")) {
      val expr = KnnSearch.topK(embs, "vec_id", "embedding",
        queries, "qid", "qvec", metric, 5).collect().toSeq
      val qLocal = embs.where(col("vec_id") < 20)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val gemm = KnnGemm.topKGemm(embs, "vec_id", "embedding", qLocal, metric, 5)
        .collect().toSeq
      assert(gemm == expr, s"metric=$metric")
    }
  }

  test("gemm path handles partitions smaller than a block and partial blocks") {
    import spark.implicits._
    val tiny = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.7f, 0.7f))).toDF("id", "v").repartition(8)
    val res = KnnGemm.topKGemm(tiny, "id", "v",
      Array((9L, Array(1.0, 0.0))), "cosine", 2, blockSize = 2).collect()
    assert(res.map(_.getLong(2)).toSeq == Seq(1L, 3L))
  }
}
