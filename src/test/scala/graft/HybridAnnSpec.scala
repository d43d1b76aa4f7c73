package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** Hybrid search serves its dense arm from the collection's LIVE HNSW
  * index (the reference's hybrid_search runs against the collection's
  * configured index with the same `ef` search param,
  * collection.py:161–209) — pinned by the family's verified-twin
  * discipline: at exhaustive ef (>= segment size, the
  * chain-connectivity certificate) the ANN-armed hybrid is byte-equal
  * to the FLAT-armed one, because the dense candidate set degenerates
  * to the whole corpus and both arms rerank through the same
  * VectorScore + Ranked.topK pipeline. */
class HybridAnnSpec extends SparkSpec {

  private lazy val corpus = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("vector"))
    docs.join(embs, "id").where(col("id") < 100)
  }
  private lazy val queries = spark.read.parquet(s"$sf/embeddings.parquet")
    .where(col("vec_id") < 4)
    .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
  private val kw = Seq("spark", "data", "query")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.get(1).toString, r.getInt(2),
      r.getDouble(3))).sortBy(t => (t._1, t._3))

  private def freshColl(tag: String) = {
    val root = Files.createTempDirectory(s"graft-hybann-$tag").toString
    val db = new GraftClient(spark, root).createDatabase("db")
    val coll = db.createCollection("v")
    coll.upsert(corpus)
    coll
  }

  test("ANN-armed hybrid equals FLAT-armed hybrid at exhaustive ef") {
    val coll = freshColl("eq")
    val pick = Seq("query_id", "id", "rank", "rrf").map(col)
    // FLAT arm: no index exists yet, hybridDense falls back to the scan
    val flat = collect(coll.hybridSearch(queries, "qid", "qv", kw).select(pick: _*))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    val ann = collect(coll.hybridSearch(queries, "qid", "qv", kw,
      ef = Some(Int.MaxValue)).select(pick: _*))
    assert(ann.toSeq == flat.toSeq,
      "exhaustive-ef ANN hybrid must be byte-equal to the FLAT hybrid")
    // default ef (the reference's 10) still fills every fused rank
    val prod = coll.hybridSearch(queries, "qid", "qv", kw, limit = 5)
    assert(prod.groupBy("query_id").count().collect().forall(_.getLong(1) == 5L),
      "index-armed hybrid must fill `limit` ranks per query")
  }

  test("batch (per-query keyword) hybrid serves the ANN arm too") {
    import spark.implicits._
    val coll = freshColl("batch")
    val kwDf = Seq((0L, "spark"), (0L, "data"), (1L, "query"), (2L, "spark"),
      (3L, "data")).toDF("query_id", "term")
    val pick = Seq("query_id", "id", "rank", "rrf").map(col)
    val flat = collect(coll.hybridSearchBatch(queries, "qid", "qv", kwDf).select(pick: _*))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    val ann = collect(coll.hybridSearchBatch(queries, "qid", "qv", kwDf,
      ef = Some(Int.MaxValue)).select(pick: _*))
    assert(ann.toSeq == flat.toSeq)
  }

  test("weighted rerank, filter, and output_fields cover the reference surface") {
    val coll = freshColl("surface")
    // WeightedRerank: decimal-exact fused score, descending per query
    val w = coll.hybridSearch(queries, "qid", "qv", kw, limit = 5,
      rerank = "weighted", weights = (0.7, 0.3)).collect()
    assert(w.nonEmpty)
    w.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.sameElements(scores.sortBy(-_)), "weighted scores not descending")
    }
    intercept[IllegalArgumentException] {
      coll.hybridSearch(queries, "qid", "qv", kw, rerank = "nope")
    }
    // filter restricts matched documents on BOTH arms
    val f = coll.hybridSearch(queries, "qid", "qv", kw, limit = 5,
      filter = "id < 50").collect()
    assert(f.nonEmpty && f.forall(_.get(2).toString.toLong < 50))
    // output_fields joins document fields back onto fused hits
    val of = coll.hybridSearch(queries, "qid", "qv", kw, limit = 3,
      outputFields = Seq("text"))
    assert(of.columns.contains("text"))
    assert(of.collect().forall(r => r.getAs[String]("text") != null))
    // HNSW arm + filter: post-filter candidates, still only matching ids
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    val fAnn = coll.hybridSearch(queries, "qid", "qv", kw, limit = 5,
      ef = Some(Int.MaxValue), filter = "id < 50").collect()
    assert(fAnn.toSeq == f.toSeq,
      "exhaustive-ef filtered hybrid must equal the FLAT filtered hybrid")
  }

  test("nprobe selects the IVF arm; full-probe nprobe equals FLAT") {
    val coll = freshColl("ivf")
    val pick = Seq("query_id", "id", "rank", "rrf").map(col)
    val flat = collect(coll.hybridSearch(queries, "qid", "qv", kw).select(pick: _*))
    // nprobe without a live IVF index is an error, not a silent scan
    intercept[IllegalArgumentException] {
      coll.hybridSearch(queries, "qid", "qv", kw, nprobe = Some(4))
    }
    coll.rebuildIndex(nlist = 4, metric = "cosine")
    val ivf = collect(coll.hybridSearch(queries, "qid", "qv", kw,
      nprobe = Some(4)).select(pick: _*))
    assert(ivf.toSeq == flat.toSeq, "nprobe = nlist must equal the FLAT hybrid")
    // ef and nprobe are mutually exclusive index params
    intercept[IllegalArgumentException] {
      coll.hybridSearch(queries, "qid", "qv", kw, ef = Some(4), nprobe = Some(4))
    }
  }

  test("explicit ef without a servable index is an error, not a silent scan") {
    val coll = freshColl("err")
    val e = intercept[IllegalArgumentException] {
      coll.hybridSearch(queries, "qid", "qv", kw, ef = Some(8))
    }
    assert(e.getMessage.contains("ef"))
  }
}
