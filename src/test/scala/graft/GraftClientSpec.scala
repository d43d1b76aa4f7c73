package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** End-to-end workflow through the reference-shaped facade: the call
  * sequence a reference user would port 1:1. */
class GraftClientSpec extends SparkSpec {
  import spark.implicits._

  test("full client workflow: create, upsert, search, query, update, delete, count") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-client").toString)
    val db = client.createDatabase("db")
    val coll = db.createCollection("docs", Map("metric" -> "cosine"))

    def vec(xs: Double*): Seq[Double] = xs
    val docs = Seq(
      (1L, vec(1.0, 0.0), "news", 3L),
      (2L, vec(0.9, 0.1), "news", 7L),
      (3L, vec(0.0, 1.0), "blog", 9L)
    ).toDF("id", "vector", "tag", "page")
    coll.upsert(docs)
    assert(coll.count() == 3)

    // upsert again: replace id=2, add id=4 (last-wins)
    coll.upsert(Seq((2L, vec(0.5, 0.5), "edit", 8L), (4L, vec(0.2, 0.8), "blog", 1L))
      .toDF("id", "vector", "tag", "page"))
    assert(coll.count() == 4)
    assert(coll.queryByIds(Seq(2L)).head().getString(2) == "edit")

    // filtered search: only news docs are candidates
    val q = Seq((100L, vec(1.0, 0.0))).toDF("qid", "qvec")
    val hits = coll.search(q, "qid", "qvec", "cosine", limit = 2, filter = """tag = "news"""")
      .collect()
    assert(hits.map(_.getLong(2)).toSeq == Seq(1L))

    // search_by_id: top-1 is itself
    val self = coll.searchById(Seq(3L), limit = 2).collect()
    assert(self.head.getLong(2) == 3L && self.head.getDouble(3) == 1.0)

    // query with filter language + sort + projection
    val blogs = coll.query(filter = """tag = "blog" and page > 0""",
      sort = Seq(("page", false)), outputFields = Seq("id", "page")).collect()
    assert(blogs.map(_.getLong(0)).toSeq == Seq(3L, 4L))

    // update + delete + count
    coll.update("""tag = "edit"""", Map("tag" -> lit("news")))
    assert(coll.count("""tag = "news"""") == 2) // ids 1 and 2
    coll.delete("""tag = "news"""", limit = Some(1)) // deletes smallest matching id (1)
    assert(coll.count() == 3 && coll.queryByIds(Seq(1L)).isEmpty)

    // hybrid search: dense + keyword lists fused (doc ids overlap via text col)
    val textColl = db.createCollection("texts")
    textColl.upsert(Seq(
      (10L, vec(1.0, 0.0), "spark join fast"),
      (11L, vec(0.0, 1.0), "slow scan table"),
      (12L, vec(0.9, 0.1), "spark window agg")
    ).toDF("id", "vector", "text"))
    val hq = Seq((0L, vec(1.0, 0.0))).toDF("qid", "qvec")
    val fused = textColl.hybridSearch(hq, "qid", "qvec", Seq("spark"), limit = 3).collect()
    assert(fused.nonEmpty)
    // 10 is both dense-closest and keyword-matching -> top fused hit
    assert(fused.head.getLong(2) == 10L)

    // search_by_text via the stub embedder: identical text ranks first
    val byText = textColl.searchByText(Seq("spark join fast"), limit = 2).collect()
    assert(byText.head.getLong(2) == 10L && byText.head.getDouble(3) == 1.0)

    // rebuild_index: collection rewritten partitioned by IVF cell —
    // the layout column stays internal, readers see document schema only
    textColl.rebuildIndex(nlist = 2)
    val rebuilt = textColl.df
    assert(!rebuilt.columns.contains("cell") && rebuilt.count() == 3)
    // data survives the partitioned rewrite and is still searchable
    assert(textColl.searchById(Seq(10L), limit = 1).collect().head.getLong(2) == 10L)

    // aliases + truncate
    db.setAlias("prod", "docs")
    assert(db.collection("prod").count() == 3)
    coll.truncate()
    assert(coll.count() == 0)
  }
}
