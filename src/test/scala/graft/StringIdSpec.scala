package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** The reference's own test scenarios, string primary keys included
  * (tests/test_documents/test_documents_api.py + _search.py use ids
  * like "0001", "u1"). */
class StringIdSpec extends SparkSpec {
  import spark.implicits._

  test("reference workflow with string ids: upsert, query, update, delete, search") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-sid").toString)
    val coll = client.createDatabase("db").createCollection("docs")

    coll.upsert(Seq(
      ("0001", Seq(0.11, 0.22, 0.33), 1L),
      ("0002", Seq(0.12, 0.21, 0.31), 2L),
      ("0003", Seq(0.13, 0.20, 0.30), 3L)
    ).toDF("id", "vector", "page"))

    // query by ids with output_fields
    val out = coll.queryByIds(Seq("0001", "0002", "0003"), Seq("id", "page"))
    assert(out.columns.toSeq == Seq("id", "page") && out.count() == 3)

    // update by ids: page -> 99 for 0001 (reference test_update_by_ids)
    coll.updateByIds(Seq("0001"), Map("page" -> lit(99L)))
    assert(coll.queryByIds(Seq("0001")).head().getLong(2) == 99L)

    // search_by_id returns self top-1 (reference test_search_by_id_returns_self_top1)
    val hits = coll.searchById(Seq("0001"), limit = 1).collect()
    assert(hits.length == 1 && hits.head.getString(2) == "0001")

    // batch search shape: one group per query vector, limit rows each
    val q = Seq(("qa", Seq(0.1, 0.2, 0.3)), ("qb", Seq(0.9, 0.0, 0.0)))
      .toDF("qid", "qvec")
    val res = coll.search(q, "qid", "qvec", limit = 2,
      outputFields = Seq("page"), retrieveVector = true)
    assert(res.count() == 4)
    assert(res.columns.toSeq == Seq("query_id", "rank", "id", "score", "page", "vector"))
    val top = res.where(col("query_id") === "qa" && col("rank") === 1).head()
    assert(Set("0001", "0002").contains(top.getString(2)))

    // delete by ids (reference test_delete_by_ids)
    coll.deleteByIds(Seq("0003"))
    assert(coll.count() == 2 && coll.queryByIds(Seq("0003")).isEmpty)
  }

  // ------------------------------------------------------------------
  // String-PK ANN serving: the reference's document id is ALWAYS a
  // string (collection.py:135 document_ids: List[str]) and its default
  // index is HNSW (tests/conftest.py) — so string PK + every index
  // family must serve, through the xxhash64 surrogate + real-id rerank
  // (the chunk layer's device, CollectionView.cid64).

  private lazy val svCorpus = {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("vec_id") < 200)
      .select(concat(lit("doc-"), col("vec_id").cast("string")).as("id"),
        col("embedding").cast("array<double>").as("vector"))
    embs
  }
  // string QUERY ids too — the reference's searches key results by the
  // caller's own string ids
  private lazy val svQueries = spark.read.parquet(s"$sf/embeddings.parquet")
    .where(col("vec_id") < 4)
    .select(concat(lit("q-"), col("vec_id").cast("string")).as("qid"),
      col("embedding").cast("array<double>").as("qv"))

  private def svColl(tag: String) = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-sv-$tag").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("sv")
    coll.upsert(svCorpus)
    coll
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, String, Double)] =
    df.select(col("query_id").cast("string"), col("rank"),
        col("id").cast("string"), col("score"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getDouble(3))).toSeq.sortBy(t => (t._1, t._2))

  test("string-PK HNSW: exhaustive ef is byte-equal to the FLAT scan; ids stay strings") {
    val coll = svColl("hnsw")
    val flatCos = rows(coll.search(svQueries, "qid", "qv", "cosine", limit = 5))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    val ann = rows(coll.searchHnsw(svQueries, "qid", "qv", limit = 5, ef = Int.MaxValue))
    assert(ann == flatCos,
      "string-PK exhaustive-ef HNSW must equal exact KNN byte-for-byte")
    assert(ann.forall(t => t._3.startsWith("doc-") && t._1.startsWith("q-")),
      "result ids must be the REAL string keys, not surrogates")
    // production ef still fills k ranks per query
    val prod = coll.searchHnsw(svQueries, "qid", "qv", limit = 5, ef = 10)
    assert(prod.groupBy("query_id").count().collect().forall(_.getLong(1) == 5L))
  }

  test("string-PK HNSW maintenance: upsert appends a surrogate segment; search stays exact") {
    val coll = svColl("hnswmut")
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    // move one doc onto the first query vector and add a brand-new doc:
    // both must surface through the LIVE index without a rebuild
    val qv = svQueries.orderBy("qid").select("qv").head().getSeq[Double](0)
    coll.upsert(Seq(("doc-7", qv), ("doc-new", qv)).toDF("id", "vector"))
    val ann = rows(coll.searchHnsw(svQueries, "qid", "qv", limit = 5, ef = Int.MaxValue))
    val flat = rows(coll.search(svQueries, "qid", "qv", "cosine", limit = 5))
    assert(ann == flat,
      "post-upsert exhaustive-ef HNSW must equal exact KNN over the new snapshot")
    // q-0's vector now matches doc-0 (its own corpus twin), the moved
    // doc-7, and the new doc-new exactly — all three must lead
    val firstQ = ann.filter(_._1 == "q-0").sortBy(_._2).map(_._3).take(3)
    assert(firstQ.toSet == Set("doc-0", "doc-7", "doc-new"),
      s"the re-upserted and new docs must rank with the exact match, got $firstQ")
    // delete-correctness: candidates rerank against the current snapshot
    coll.deleteByIds(Seq("doc-new"))
    val afterDel = rows(coll.searchHnsw(svQueries, "qid", "qv", limit = 5, ef = Int.MaxValue))
    assert(!afterDel.exists(_._3 == "doc-new"), "deleted ids must not surface")
  }

  test("string-PK PQ / IVF_PQ / IVF_SQ8: exhaustive twins equal the FLAT L2 scan") {
    val n = svCorpus.count().toInt
    val flatL2 = {
      val coll = svColl("flat")
      rows(coll.search(svQueries, "qid", "qv", "l2", limit = 5))
    }
    locally {
      val coll = svColl("pq")
      coll.rebuildPqIndex(m = 8, k = 16)
      // candMult large enough that the ADC cut keeps every row: the
      // rerank then IS the exact scan (the family's twin certificate)
      val pq = rows(coll.searchPq(svQueries, "qid", "qv", limit = 5, candMult = n))
      assert(pq == flatL2, "string-PK exhaustive PQ must equal exact L2 KNN")
    }
    locally {
      val coll = svColl("ivfpq")
      coll.rebuildIvfPqIndex(nlist = 4, m = 8, k = 16)
      val r = rows(coll.searchIvfPq(svQueries, "qid", "qv", limit = 5,
        nprobe = 4, candMult = Some(n)))
      assert(r == flatL2, "string-PK exhaustive IVF_PQ must equal exact L2 KNN")
      // the code-only arm (reference native behavior) serves real ids too
      val codeOnly = rows(coll.searchIvfPq(svQueries, "qid", "qv", limit = 5, nprobe = 4))
      assert(codeOnly.nonEmpty && codeOnly.forall(_._3.startsWith("doc-")))
    }
    locally {
      val coll = svColl("ivfsq")
      coll.rebuildIvfSqIndex(nlist = 4)
      val r = rows(coll.searchIvfSq(svQueries, "qid", "qv", limit = 5,
        nprobe = 4, candMult = Some(n)))
      assert(r == flatL2, "string-PK exhaustive IVF_SQ8 must equal exact L2 KNN")
    }
  }

  test("string-PK BQ: corpus-covering shortlist equals the FLAT cosine scan; maintenance") {
    val coll = svColl("bq")
    coll.rebuildBqIndex()
    val n = svCorpus.count().toInt
    val flat = rows(coll.search(svQueries, "qid", "qv", "cosine", limit = 5))
    val bq = rows(coll.searchBq(svQueries, "qid", "qv", limit = 5, candMult = n))
    assert(bq == flat, "string-PK corpus-covering BQ must equal exact cosine KNN")
    // maintenance: replace doc-3's vector with q-1's — the stale words
    // must be masked and the fresh segment must serve
    val qv = svQueries.where(col("qid") === "q-1").select("qv").head().getSeq[Double](0)
    coll.upsert(Seq(("doc-3", qv)).toDF("id", "vector"))
    assert(coll.describe.contains("index.bq.dim"),
      "upsert must keep the BQ index live")
    val res = rows(coll.searchBq(svQueries, "qid", "qv", limit = 5, candMult = n + 1))
    val flat2 = rows(coll.search(svQueries, "qid", "qv", "cosine", limit = 5))
    assert(res == flat2,
      "post-upsert corpus-covering BQ must equal exact cosine KNN over the new snapshot")
    val top = res.filter(_._1 == "q-1").sortBy(_._2).map(_._3).take(2)
    assert(top.contains("doc-3"), s"the re-packed doc must rank at the top, got $top")
  }

  test("string-PK BQ radius + filtered arms: surrogates resolve, ids stay strings") {
    val coll = svColl("bqrad")
    coll.rebuildBqIndex()
    val n = svCorpus.count().toInt
    // radius = dim covers the whole corpus: every query returns all n
    // rows, ids resolved back from the xxhash64 surrogate to strings
    val ball = coll.searchBqRadius(svQueries, "qid", "qv", radius = 64, limit = n)
    assert(ball.schema("id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(ball.count() == 4L * n)
    assert(ball.select("id").distinct().count() == n.toLong)
    // radius 0: each query (a corpus member) finds its own document
    val self = coll.searchBqRadius(svQueries, "qid", "qv", radius = 0, limit = n)
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(Set("q-0", "q-1", "q-2", "q-3").subsetOf(
      self.filter { case (q, d) => d == q.replace("q-", "doc-") }.map(_._1).toSet))
    // filtered top-k at corpus candMult ≡ the FLAT filtered scan
    val f = """id in ("doc-3", "doc-7", "doc-11", "doc-42", "doc-99")"""
    val flat = rows(coll.search(svQueries, "qid", "qv", "cosine", limit = 3,
      filter = f))
    val bqf = rows(coll.searchBqFiltered(svQueries, "qid", "qv", f, limit = 3,
      candMult = n))
    assert(bqf == flat,
      "string-PK corpus-covering filtered BQ must equal exact filtered KNN")
  }

  test("string-PK PQ maintenance: the surrogate ledger masks replaced codes") {
    val coll = svColl("pqmut")
    coll.rebuildPqIndex(m = 8, k = 16)
    // replace doc-3's vector with the q-1 query vector: the old codes
    // must be masked (not rank under their stale position) and the new
    // segment's codes must serve
    val qv = svQueries.where(col("qid") === "q-1").select("qv").head().getSeq[Double](0)
    coll.upsert(Seq(("doc-3", qv)).toDF("id", "vector"))
    val n = svCorpus.count().toInt
    val res = rows(coll.searchPq(svQueries, "qid", "qv", limit = 5, candMult = n + 1))
    val flat = rows(coll.search(svQueries, "qid", "qv", "l2", limit = 5))
    assert(res == flat,
      "post-upsert exhaustive PQ must equal exact L2 KNN over the new snapshot")
    // q-1's vector matches doc-1 (its corpus twin) and the re-coded
    // doc-3 exactly — both must lead
    val top = res.filter(_._1 == "q-1").sortBy(_._2).map(_._3).take(2)
    assert(top.toSet == Set("doc-1", "doc-3"),
      s"the re-coded doc must rank with the exact match, got $top")
  }
}
