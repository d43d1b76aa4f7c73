package graft

import org.apache.spark.sql.functions._

import graft.vector.{IvfPq, PqIndex}

class IvfPqSpec extends SparkSpec {

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val qLocal = embs.where(col("vec_id") < 6)
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  test("nprobe = nlist degenerates to plain PQ search") {
    val model = IvfPq.train(embs, "embedding", dim = 64, nlist = 8)
    val enc = IvfPq.encode(model, embs, "vec_id", "embedding").cache()
    val full = IvfPq.search(model, enc, qLocal, kTop = 10, nprobe = 8).collect().toSeq
    val plain = PqIndex.search(model.pq,
      enc.select("id", "codes"), qLocal, k = 10).collect().toSeq
    assert(full == plain)
  }

  test("small nprobe prunes candidates but still finds the query's own cell") {
    val model = IvfPq.train(embs, "embedding", dim = 64, nlist = 8)
    val enc = IvfPq.encode(model, embs, "vec_id", "embedding").cache()
    val res = IvfPq.search(model, enc, qLocal, kTop = 10, nprobe = 2)
    val rows = res.collect()
    assert(rows.nonEmpty && rows.length <= qLocal.length * 10)
    // every query's result set comes from <= 2 cells worth of candidates
    val cellsPerQuery = enc.join(
        res.select(col("query_id"), col("id")), "id")
      .groupBy("query_id").agg(countDistinct("cell").as("nc")).collect()
    assert(cellsPerQuery.forall(_.getLong(1) <= 2))
  }
}
