package graft

import org.apache.spark.sql.functions._

/** Round-5 regression coverage: null-score quantile exclusion,
  * repetitionStats operating on frames that already carry its internal
  * column names, and the window-free rank postlude. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  test("topQuantileByGroup excludes null scores from ranking and output") {
    val docs = Seq(
      ("a", "g1", Some(1.0)), ("b", "g1", Some(2.0)),
      ("c", "g1", Some(3.0)), ("d", "g1", Some(4.0)),
      ("e", "g1", None), ("f", "g1", None)
    ).toDF("id", "grp", "score")
    // Without the exclusion the two nulls inflate the group size to 6
    // and shift the q=0.5 threshold; with it the threshold is computed
    // over {1,2,3,4} alone: percent_rank >= 0.5 keeps scores >= 3.
    val kept = graft.ops.Curation
      .topQuantileByGroup(docs, "grp", "score", q = 0.5)
      .select("id").as[String].collect().sorted
    assert(kept.toSeq == Seq("c", "d"))

    // q = 0 keeps every scored row but still never a null-score row
    val keptAll = graft.ops.Curation
      .topQuantileByGroup(docs, "grp", "score", q = 0.0)
      .select("id").as[String].collect().sorted
    assert(keptAll.toSeq == Seq("a", "b", "c", "d"))
  }

  test("repetitionStats ignores pre-existing __toks / top_cnt columns") {
    val docs = Seq(
      ("d1", "x x x y", "poison", 99),
      ("d2", "a b c d", "poison", 99)
    ).toDF("id", "text", "__toks", "top_cnt")
    val out = graft.text.TextAnalysis.repetitionStats(docs, "id", "text")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Int]("top_cnt")).toSeq == Seq(3, 1))
    assert(out.map(_.getAs[Int]("n_words")).toSeq == Seq(4, 4))
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("id", "n_words", "n_distinct", "dup_frac", "top_cnt", "top_share"))
  }

  test("simhashVerified equals the exhaustive posting-join jaccard at 8 blocks") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val sig = graft.dedup.Dedup.simhashSignatures(docs, "doc_id", "text")
    val ng = graft.dedup.Dedup.ngrams(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val got = graft.dedup.Dedup.simhashVerified(sig, ng, blocks = 8, threshold = 0.5)
      .collect().toSeq
    val want = graft.dedup.Dedup.ngramJaccardFromPostings(ng, threshold = 0.5)
      .collect().toSeq
    ng.unpersist()
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("auto-compaction bounds segment history under sustained ingest") {
    val root = java.nio.file.Files.createTempDirectory("graft-autocompact").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("ac")
    val rnd = new scala.util.Random(11)
    def batch(lo: Long, n: Int) = (lo until lo + n)
      .map(i => (i, s"alpha doc$i beta", Seq.fill(6)(rnd.nextGaussian())))
      .toDF("id", "text", "vector")
    coll.upsert(batch(0, 30))
    coll.rebuildFulltextIndex()
    coll.rebuildLshIndex(nBits = 8, bands = 2)
    coll.setAutoCompact(4)

    var sawFold = false
    for (b <- 1 to 10) {
      coll.upsert(batch(b * 100L, 5))
      val debt = coll.segmentDebt
      assert(debt < 4, s"segment debt must stay below the threshold, got $debt after batch $b")
      if (debt == 0) sawFold = true
    }
    assert(sawFold, "10 batches past threshold 4 must have triggered at least one compaction")
    assert(coll.count() == 80)

    // compacted history serves the same results as a from-scratch rebuild
    val served = coll.fulltext(Seq("alpha"), k = 7).collect().toSeq
    val q = Seq((0L, Seq.fill(6)(rnd.nextGaussian()))).toDF("qid", "qvec")
    val lshServed = coll.searchLsh(q, "qid", "qvec", limit = 5).collect().toSeq
    coll.rebuildFulltextIndex()
    coll.rebuildLshIndex(nBits = 8, bands = 2)
    assert(coll.fulltext(Seq("alpha"), k = 7).collect().toSeq == served)
    assert(coll.searchLsh(q, "qid", "qvec", limit = 5).collect().toSeq == lshServed)
  }

  test("IVF_PQ exact rerank with full coverage equals exact KNN") {
    // nprobe = nlist (every cell probed) and candMult covering the whole
    // corpus make the rerank path EXACTLY exhaustive KNN: the ADC stage
    // may misrank, but every row reaches the exact re-scoring
    val embs = graft.sources.Tables.embeddings(spark, sf)
    val queries = embs.where(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val qLocal = queries.select(col("qid"), col("qvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val model = graft.vector.IvfPq.train(embs, "embedding", dim = 64, nlist = 4, m = 4, k = 16)
    val enc = graft.vector.IvfPq.encode(model, embs, "vec_id", "embedding")
    val got = graft.vector.IvfPq.searchRerank(model, enc, embs, "vec_id", "embedding",
        qLocal, kTop = 5, nprobe = 4, candMult = 1000)
      .select("query_id", "rank", "id").collect().toSeq
    val want = graft.vector.KnnSearch.topK(embs, "vec_id", "embedding",
        queries, "qid", "qvec", "l2", 5)
      .select("query_id", "rank", "id").collect().toSeq
    assert(got.sortBy(r => (r.getLong(0), r.getInt(1))) ==
      want.sortBy(r => (r.getLong(0), r.getInt(1))))
  }

  test("client searchIvfPq with candMult reranks to exact order; None keeps ADC ranking") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-rr").toString
    val rnd = new scala.util.Random(29)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIvfPqIndex(nlist = 4, m = 4, k = 16)
    val q = Seq((0L, rows(42)._2)).toDF("qid", "qvec")
    // full coverage (nprobe = nlist, candMult spanning the corpus) must
    // equal the exact KNN serving path, row for row
    val rr = coll.searchIvfPq(q, "qid", "qvec", limit = 5, nprobe = 4,
        candMult = Some(100))
      .select("query_id", "rank", "id").collect().toSeq
    val exact = coll.search(q, "qid", "qvec", metric = "l2", limit = 5)
      .select("query_id", "rank", "id").collect().toSeq
    assert(rr == exact)
    // the reference-faithful default stays code-only (may misrank, but
    // still returns limit rows and is served from the same artifacts)
    val adc = coll.searchIvfPq(q, "qid", "qvec", limit = 5, nprobe = 4)
    assert(adc.count() == 5)
  }

  test("verified twins serve identically from postings or the persisted gram-set artifact") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val ng = graft.dedup.Dedup.ngrams(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sets = graft.dedup.Dedup.gramSets(ng)
    val sig = graft.dedup.Dedup.simhashSignatures(docs, "doc_id", "text")
    val fromPost = graft.dedup.Dedup.simhashVerified(sig, ng, 8, 0.5).collect().toSeq
    val fromSets = graft.dedup.Dedup.simhashVerifiedFromSets(sig, sets, 8, 0.5).collect().toSeq
    ng.unpersist()
    assert(fromSets == fromPost)
    assert(fromSets.nonEmpty)
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted sets") {
    // Random distinct-sorted long arrays through a parquet round-trip so
    // the expression runs inside real codegen, not a LocalTableScan fold.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val a = rnd.shuffle((0L until 60L).toList).take(rnd.nextInt(30) + 1).sorted
      val b = rnd.shuffle((0L until 60L).toList).take(rnd.nextInt(30) + 1).sorted
      (i, a, b)
    }
    val dir = java.nio.file.Files.createTempDirectory("sic").toString
    rows.toDF("i", "a", "b").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val mismatches = df.select(
        graft.dedup.SortedIntersectCount(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("want"))
      .where(col("got") =!= col("want")).count()
    assert(mismatches == 0)
    // null input -> null out (BinaryExpression null-safety)
    val n = df.limit(1)
      .select(graft.dedup.SortedIntersectCount(lit(null).cast("array<bigint>"),
        col("b")).as("got")).collect()
    assert(n.head.isNullAt(0))
    // disjoint and identical edges
    val edge = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L)), (Seq(1L, 2L), Seq(1L, 2L)))
      .toDF("a", "b")
      .select(graft.dedup.SortedIntersectCount(col("a"), col("b")).as("c"))
      .as[Long].collect().toSeq
    assert(edge == Seq(0L, 2L))
  }

  test("clusterRepresentatives keeps the best-score doc per cluster, loners pass through") {
    val docs = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (4L, 0.7))
      .toDF("doc_id", "score")
    // one component {1,2,3} via 1-2, 2-3; doc 4 in no pair
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = graft.dedup.Dedup
      .clusterRepresentatives(docs, "doc_id", "score", pairs)
      .orderBy("doc_id").collect()
    // survivor of {1,2,3} is doc 2 (highest score), labeled min-id 1;
    // loner 4 survives as its own cluster
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toSeq
      == Seq((2L, 1L), (4L, 4L)))

    // score ties break to the lowest id
    val tied = Seq((5L, 1.0), (6L, 1.0)).toDF("doc_id", "score")
    val tp = Seq((5L, 6L)).toDF("id_a", "id_b")
    val rep = graft.dedup.Dedup
      .clusterRepresentatives(tied, "doc_id", "score", tp)
      .select("doc_id").as[Long].collect().toSeq
    assert(rep == Seq(5L))
  }

  test("rankTop matches an unpartitioned row_number over the same order") {
    val scored = spark.range(100)
      .select(col("id").cast("string").as("doc_id"),
        (col("id") % 7).cast("double").as("score"))
    val got = graft.vector.Ranked
      .rankTop(scored, 10, col("score").desc, col("doc_id"))
      .select("rank", "doc_id", "score").collect()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    val want = scored.orderBy(col("score").desc, col("doc_id")).limit(10)
      .withColumn("rank", row_number().over(w))
      .select("rank", "doc_id", "score").collect()
    assert(got.toSeq == want.toSeq)
  }
}
