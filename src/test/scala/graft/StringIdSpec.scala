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
}
