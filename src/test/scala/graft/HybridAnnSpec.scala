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
    // default ef still fills every fused rank
    val prod = coll.hybridSearch(queries, "qid", "qv", kw, limit = 5)
    assert(prod.groupBy("query_id").count().collect().forall(_.getLong(1) == 5L),
      "index-armed hybrid must fill `limit` ranks per query")
  }

  test("no-ef hybrid serves the dense arm at the STORED derived default beam") {
    // the r13 recall-floor contract (index.hnsw.ef_default) propagated
    // to hybrid's unfiltered live-graph arm: a no-ef call must be
    // byte-equal to an explicit ef at the stored derived default —
    // NOT to the historical fixed 10 the route used to hard-code
    val coll = freshColl("defef")
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    val stored = coll.describe.get("index.hnsw.ef_default").map(_.toInt)
    assert(stored.nonEmpty && stored.get >= 16,
      s"rebuild must persist a derived ef_default >= the floor, got $stored")
    val pick = Seq("query_id", "id", "rank", "rrf").map(col)
    val auto = collect(coll.hybridSearch(queries, "qid", "qv", kw).select(pick: _*))
    val explicit = collect(coll.hybridSearch(queries, "qid", "qv", kw,
      ef = Some(stored.get)).select(pick: _*))
    assert(auto.toSeq == explicit.toSeq,
      "no-ef hybrid must serve at the stored derived default beam")
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

  test("string-PK hybrid serves the live HNSW arm (no silent FLAT downgrade)") {
    // the reference's most common configuration: string document ids
    // (conftest keys everything "0001"-style) + the default HNSW index
    val root = Files.createTempDirectory("graft-hybann-sid").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(corpus.select(
      concat(lit("doc-"), col("id").cast("string")).as("id"),
      col("text"), col("vector")))
    val sq = queries.select(concat(lit("q-"), col("qid").cast("string")).as("qid"),
      col("qv"))
    val pick = Seq("query_id", "id", "rank", "rrf").map(col)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getDouble(3))).toSeq.sortBy(t => (t._1, t._3))
    val strFilter =
      "id in (" + (0 until 50).map(i => s""""doc-$i"""").mkString(",") + ")"
    // FLAT baselines BEFORE the index exists (once the graph is live,
    // a no-param hybrid correctly serves the ANN arm at default ef)
    val flat = rows(coll.hybridSearch(sq, "qid", "qv", kw).select(pick: _*))
    val fFlat = rows(coll.hybridSearch(sq, "qid", "qv", kw, limit = 5,
      filter = strFilter).select(pick: _*))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    // explicit ef on a string-PK collection must SERVE, not error and
    // not silently scan — exhaustive ef pins equality with FLAT
    val ann = rows(coll.hybridSearch(sq, "qid", "qv", kw,
      ef = Some(Int.MaxValue)).select(pick: _*))
    assert(ann == flat,
      "string-PK exhaustive-ef hybrid must be byte-equal to the FLAT hybrid")
    // filtered ANN arm over string keys
    val fAnn = rows(coll.hybridSearch(sq, "qid", "qv", kw, limit = 5,
      ef = Some(Int.MaxValue), filter = strFilter).select(pick: _*))
    assert(fAnn == fFlat,
      "string-PK exhaustive-ef filtered hybrid must equal the FLAT filtered hybrid")
  }

  test("IVF arm carries the filter contract at full probe, single and batch") {
    import spark.implicits._
    val coll = freshColl("ivffilter")
    val pick = Seq("query_id", "id", "rank", "rrf").map(col)
    // the (index, filter, rerank) matrix row the HNSW arm already pins,
    // for nprobe: full-probe IVF + filter must equal FLAT + filter on
    // both rerank types and on the per-query-keyword batch form
    val fFlat = collect(coll.hybridSearch(queries, "qid", "qv", kw, limit = 5,
      filter = "id < 50").select(pick: _*))
    val wFlat = coll.hybridSearch(queries, "qid", "qv", kw, limit = 5,
      rerank = "weighted", weights = (0.7, 0.3), filter = "id < 50")
      .collect().map(_.toString).sorted.toSeq
    val kwDf = Seq((0L, "spark"), (1L, "query"), (2L, "spark"), (3L, "data"))
      .toDF("query_id", "term")
    val bFlat = collect(coll.hybridSearchBatch(queries, "qid", "qv", kwDf,
      limit = 5, filter = "id < 50").select(pick: _*))
    coll.rebuildIndex(nlist = 4, metric = "cosine")
    val fIvf = collect(coll.hybridSearch(queries, "qid", "qv", kw, limit = 5,
      nprobe = Some(4), filter = "id < 50").select(pick: _*))
    assert(fIvf.toSeq == fFlat.toSeq,
      "full-probe IVF filtered hybrid must equal the FLAT filtered hybrid")
    val wIvf = coll.hybridSearch(queries, "qid", "qv", kw, limit = 5,
      rerank = "weighted", weights = (0.7, 0.3), nprobe = Some(4),
      filter = "id < 50").collect().map(_.toString).sorted.toSeq
    assert(wIvf == wFlat, "weighted rerank must carry the IVF filter contract")
    val bIvf = collect(coll.hybridSearchBatch(queries, "qid", "qv", kwDf,
      limit = 5, nprobe = Some(4), filter = "id < 50").select(pick: _*))
    assert(bIvf.toSeq == bFlat.toSeq,
      "batch hybrid must carry the IVF filter contract")
  }
}
