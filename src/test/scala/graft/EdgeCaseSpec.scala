package graft

import org.apache.spark.sql.functions._

import graft.filter.FilterParser
import graft.text.TextAnalysis
import graft.vector.KnnSearch

class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("knn with k larger than the corpus returns all rows ranked") {
    val data = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("id", "v")
    val q = Seq((9L, Array(1.0f, 1.0f))).toDF("qid", "qv")
    val res = KnnSearch.topK(data, "id", "v", q, "qid", "qv", "cosine", 100).collect()
    assert(res.length == 2 && res.map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  test("knn over an empty (fully filtered) corpus returns no rows") {
    val data = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v")
    val q = Seq((9L, Array(1.0f, 1.0f))).toDF("qid", "qv")
    val res = KnnSearch.topK(data, "id", "v", q, "qid", "qv", "cosine", 5,
      filter = Some(col("id") < 0))
    assert(res.count() == 0)
  }

  test("filter parser handles escapes, unicode and numeric types") {
    val df = Seq((1L, """say "hi"""", 1.5), (2L, "naïve café", -2.0)).toDF("id", "s", "x")
    assert(df.where(FilterParser.parse("""s = "say \"hi\""""")).count() == 1)
    assert(df.where(FilterParser.parse("""s = "naïve café"""")).count() == 1)
    assert(df.where(FilterParser.parse("x >= -2.0 and x < 1.5")).count() == 1)
    assert(df.where(FilterParser.parse("x in (1.5, 99)")).count() == 1)
  }

  test("chunk splitter on text shorter than one chunk yields a single chunk") {
    val docs = Seq((1L, "tiny", "t")).toDF("doc_id", "text", "source")
    val chunks = TextAnalysis.chunkSplit(docs, "doc_id", "text", "source", 80, 20).collect()
    assert(chunks.length == 1 && chunks.head.getString(2) == "t: tiny")
  }

  test("connected components on an empty pair set returns empty, not NPE") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.dedup.Dedup.connectedComponents(pairs, "id_a", "id_b").count() == 0)
  }

  test("delete keeps rows where the predicate is NULL") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(100L)))
      .toDF("id", "n")
    val out = graft.ops.DocumentOps.delete(df, "id", "n < 50")
      .select("id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 3L)) // id=2 (NULL n) did not match -> kept
  }

  test("chunk splitter on empty text yields one empty chunk, not phantoms") {
    val docs = Seq((1L, "", "t")).toDF("doc_id", "text", "source")
    val chunks = TextAnalysis.chunkSplit(docs, "doc_id", "text", "source", 80, 20).collect()
    assert(chunks.length == 1 && chunks.head.getString(2) == "t: ")
  }

  test("catalog meta round-trips hostile strings; empty collections keep schema") {
    val cat = new graft.catalog.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft-edge").toString)
    cat.createDatabase("db")
    val hostile = Map("a:b" -> """x",y""", "k" -> """esc\"quote""")
    cat.createCollection("db", "c", hostile)
    assert(cat.describeCollection("db", "c") == hostile)
    cat.write("db", "c", Seq((1L, "x")).toDF("id", "v"))
    cat.truncateCollection("db", "c")
    val empty = cat.read("db", "c")
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "v"))
  }

  test("hashSplit works on string primary keys (the reference id type)") {
    val df = Seq("a", "b", "naïve café", """qu"ote""").toDF("id")
    val out = graft.ops.Curation.hashSplit(df, "id").collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 100))
    assert(out.forall(r => Set("train", "eval")(r.getString(2))))
  }

  test("curation ops on empty frames return empty, not errors") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.Curation.hashSplit(docs.select("doc_id"), "doc_id").count() == 0)
    assert(graft.ops.Curation.contamination(docs, "doc_id", "text").count() == 0)
    val scored = Seq.empty[(String, Long, Double)].toDF("g", "id", "s")
    assert(graft.ops.Curation.topQuantileByGroup(scored, "g", "s").count() == 0)
    assert(graft.ops.Curation.topQuantileByGroupApprox(scored, "g", "s").count() == 0)
    val full = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(graft.ops.Curation.buildTrainingSet(full, "doc_id", "text", "source").count() == 0)
    assert(graft.ops.Curation.curateBatch(full, "doc_id", "text", "source").count() == 0)
    assert(graft.ops.Curation.sampleByWeights(full, "doc_id", "source", Map.empty).count() == 0)
    assert(graft.ops.Curation.packSequences(full, "doc_id",
      org.apache.spark.sql.functions.lit(1), budget = 16).count() == 0)
    assert(graft.text.TextAnalysis.repetitionStats(docs, "doc_id", "text").count() == 0)
  }

  test("curation pipeline accepts string primary keys (the reference id type)") {
    val docs = Seq(
      ("doc-a", "the cat sat on the mat and the dog is here to stay", "web"),
      ("doc-b", "the cat sat on the mat and the dog is here to stay", "web"),
      ("doc-c", "an entirely different text with the and is to in words", "web"))
      .toDF("doc_id", "text", "source")
    val packed = graft.ops.Curation.packSequences(docs, "doc_id",
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")), budget = 16)
    assert(packed.count() == 3)
    // content dedup keeps the lexicographically lowest string id
    val out = graft.ops.Curation.buildTrainingSet(docs, "doc_id", "text", "source",
      trainPct = 100) // all-train so only the dedup gate filters
    val kept = out.select("doc_id").collect().map(_.getString(0)).toSet
    assert(!kept.contains("doc-b"))
    assert(kept.contains("doc-a") || kept.contains("doc-c"))
    assert(graft.ops.Curation.sampleByWeights(
      docs, "doc_id", "source", Map.empty).count() == 3)
  }

  test("minhashVerified on a corpus with no qualifying pairs is empty") {
    val docs = Seq((1L, "one two three four"), (2L, "five six seven eight"))
      .toDF("doc_id", "text")
    val ng = graft.dedup.Dedup.ngrams(docs, "doc_id", "text", 3)
    val sig = graft.dedup.Dedup.minhashSignatures(docs, "doc_id", "text")
    assert(graft.dedup.Dedup.minhashVerified(sig, ng, 32, 32, 0.5).count() == 0)
  }

  test("fingerprint of empty-ish and single-char strings") {
    val docs = Seq((1L, "a"), (2L, "aa")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .orderBy("doc_id").select("fingerprint").as[Long].collect()
    assert(fp(0) == 97L && fp(1) == (97L * 31 + 97) % 1000000007)
  }

  test("BQ train rejects an empty corpus; winnow rejects non-positive k/w") {
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val err = intercept[IllegalArgumentException] {
      graft.vector.BqIndex.train(empty, "v")
    }
    assert(err.getMessage.contains("empty corpus"))
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 0, w = 4)
    }
    assertThrows[IllegalArgumentException] {
      TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 0)
    }
  }

  test("softDedupWeights on an empty pair list: every doc is its own loner") {
    val docs = Seq(1L, 2L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = graft.dedup.Dedup.softDedupWeights(docs, "doc_id", pairs)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L, 1000000L), (2L, 2L, 1L, 1000000L)))
  }

  test("lengthQuantiles skips null-text docs entirely (no null len group)") {
    val docs = Seq((1L, Some("a b c"), "x"), (2L, None, "x"))
      .toDF("doc_id", "text", "source")
    val out = graft.ops.Curation.lengthQuantiles(docs, "text", "source").collect()
    assert(out.length == 1 && out.head.getLong(1) == 1,
      "the null-text doc must not count toward n_docs or any quantile")
  }
}
