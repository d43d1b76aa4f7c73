package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.GraftClient
import graft.vector.{GroupedSearch, KnnSearch, Mmr, VectorScore}

/** Grouped search (SURVEY §2 row 119) and MMR diversified retrieval
  * (row 120): the two serving-side answers to "one near-dup cluster
  * monopolizes the result page". Grouped search is exact and
  * SQL-oracled (q_grouped_search); MMR's greedy is not SQL-expressible,
  * so its contract is pinned here — lambda=1 ≡ plain top-k
  * byte-for-byte, diversity on a two-cluster geometry, determinism. */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val qdf = embs.where(col("vec_id") < 6)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("groupedTopK equals the window-rank reference (heap form ≡ window form)") {
    val got = GroupedSearch.groupedTopK(embs, "vec_id", "embedding", "label",
      qdf, "qid", "qvec", "cosine", limitGroups = 3, groupSize = 4)
      .collect().toSeq

    // independent reference: same scoring expression, ranked through
    // two explicit windows instead of the bounded heaps
    val scored = embs
      .select(col("vec_id").cast("long").as("id"),
        col("label").cast("long").as("grp"), col("embedding").as("__v"))
      .crossJoin(broadcast(qdf.select(col("qid").cast("long").as("query_id"),
        col("qvec").as("__qv"))))
      .select(col("query_id"), col("grp"), col("id"),
        VectorScore.cosine(col("__v"), col("__qv")).as("__s"))
    val withBest = scored.withColumn("__gbest",
      max("__s").over(Window.partitionBy("query_id", "grp")))
    val grpRank = withBest.select("query_id", "grp", "__gbest").distinct()
      .withColumn("grp_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("__gbest"), asc("grp"))))
    val want = withBest
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id", "grp").orderBy(desc("__s"), asc("id"))))
      .join(grpRank.select("query_id", "grp", "grp_rank"), Seq("query_id", "grp"))
      .where(col("grp_rank") <= 3 && col("rank") <= 4)
      .select(col("query_id"), col("grp_rank").cast("int"), col("grp"),
        col("rank").cast("int"), col("id"), round(col("__s"), 4).as("score"))
      .orderBy("query_id", "grp_rank", "rank")
      .collect().toSeq

    assert(got.nonEmpty && got == want)
  }

  test("groupedTopK: limitGroups beyond the group count returns every group once") {
    val nGroups = embs.select(countDistinct("label")).head.getLong(0).toInt
    val got = GroupedSearch.groupedTopK(embs, "vec_id", "embedding", "label",
      qdf.limit(1), "qid", "qvec", "l2", limitGroups = nGroups + 5, groupSize = 1)
    val rows = got.collect()
    assert(rows.length == nGroups)
    assert(rows.map(_.getLong(2)).distinct.length == nGroups)
    // groupSize=1 keeps exactly the best member per group: each row's
    // score is that group's true best (checked against a plain min)
    val bestByGrp = embs
      .select(col("label").cast("long").as("grp"), col("embedding").as("__v"))
      .crossJoin(broadcast(qdf.limit(1).select(col("qvec").as("__qv"))))
      .groupBy("grp").agg(round(min(VectorScore.l2(col("__v"), col("__qv"))), 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getDouble(5) == bestByGrp(r.getLong(2))))
  }

  test("MMR at lambda=1 equals plain exact top-k byte-for-byte (cosine and l2)") {
    for (metric <- Seq("cosine", "l2")) {
      val got = Mmr.topKDiverse(embs, "vec_id", "embedding", qdf, "qid", "qvec",
        metric, k = 10, lambda = 1.0, poolMult = 4).collect().toSeq
      val want = KnnSearch.topK(embs, "vec_id", "embedding", qdf, "qid", "qvec",
        metric, 10).collect().toSeq
      assert(got == want, s"lambda=1 must reduce to exact top-k under $metric")
    }
  }

  test("MMR diversifies: two-cluster geometry, one pick per cluster") {
    val rnd = new scala.util.Random(5)
    // cluster A hugs the query direction (high relevance, near-copies);
    // cluster B is moderately relevant but genuinely different
    def jitter(base: Seq[Double]) = base.map(_ + rnd.nextGaussian() * 0.005)
    val dirA = Seq(1.0, 0.0, 0.0, 0.0)
    val dirB = Seq(0.6, 0.8, 0.0, 0.0)
    val rows = (0L until 5L).map(i => (i, jitter(dirA))) ++
      (5L until 10L).map(i => (i, jitter(dirB)))
    val data = rows.toDF("vec_id", "embedding")
    val q = Seq((0L, dirA)).toDF("qid", "qvec")

    val plain = KnnSearch.topK(data, "vec_id", "embedding", q, "qid", "qvec",
      "cosine", 2).collect().map(_.getLong(2)).toSet
    assert(plain.subsetOf((0L until 5L).toSet),
      "plain top-2 drowns in cluster A by construction")

    val div = Mmr.topKDiverse(data, "vec_id", "embedding", q, "qid", "qvec",
      "cosine", k = 2, lambda = 0.5, poolMult = 5).collect()
    val ids = div.map(_.getLong(2)).toSet
    assert(ids.exists(_ < 5) && ids.exists(_ >= 5),
      s"lambda=0.5 must pick one per cluster, got $ids")
    // rank 1 is still the most relevant doc (the first greedy pick is
    // pure relevance)
    assert(div.head.getInt(1) == 1 && plain.contains(div.head.getLong(2)))
  }

  test("lambda-sweep tie-degeneracy detector: 0.5 with corpus-member queries is inside fp noise, the production 0.7 is not") {
    // the r12 lesson institutionalized (r12 verdict #7): the q_mmr
    // oracle replays an EXACT argmax, so its (λ, corpus) operating
    // point must keep round-2 objective gaps far above ulp scale. At
    // λ=0.5 with corpus-member queries, round 2's penalty equals
    // relevance for every candidate sharing the query's pick — the
    // objectives tie at exactly 0 and the detector must FIRE; at the
    // production λ=0.7 the gaps are generic (~1e-3). A future λ or
    // corpus change that silently re-enters the noise regime fails
    // HERE before the oracle can flake.
    val pool = {
      // q_mmr's own pool shape: corpus-member queries, top-40 cosine
      val q = embs.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val scored = embs
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("__v"))
        .crossJoin(broadcast(q.select(col("qid").cast("long").as("query_id"),
          col("qvec").as("__qv"))))
        .select(col("query_id"), col("id"), col("__v"),
          VectorScore.cosine(col("__v"), col("__qv")).as("__s"))
      val top = scored.withColumn("rn", row_number().over(
          Window.partitionBy("query_id").orderBy(desc("__s"), asc("id"))))
        .where(col("rn") <= 40)
      top.select(col("query_id"), col("id"), col("__s"), col("__v"))
    }.cache()
    try {
      val degenerate = Mmr.round2ObjectiveGap(pool, "cosine", lambda = 0.5)
      assert(degenerate < 1e-9,
        f"lambda=0.5 must sit in the tie-degenerate regime here (gap $degenerate%.3e)")
      val production = Mmr.round2ObjectiveGap(pool, "cosine", lambda = 0.7)
      assert(production > 1e-6,
        f"q_mmr's operating point must stay clear of fp noise (gap $production%.3e)")
    } finally pool.unpersist(blocking = false)
  }

  test("MMR is deterministic and rank covers min(k, pool)") {
    val a = Mmr.topKDiverse(embs, "vec_id", "embedding", qdf, "qid", "qvec",
      "cosine", k = 8, lambda = 0.3, poolMult = 3).collect().toSeq
    val b = Mmr.topKDiverse(embs, "vec_id", "embedding", qdf, "qid", "qvec",
      "cosine", k = 8, lambda = 0.3, poolMult = 3).collect().toSeq
    assert(a == b && a.nonEmpty)
    val perQ = a.groupBy(_.getLong(0)).values
    assert(perQ.forall(rows => rows.map(_.getInt(1)).sorted == (1 to 8)))
  }

  test("grouped-HNSW ladder: fill guarantee, exhaustive ≡ exact scan, unfillable page escalates") {
    val root = Files.createTempDirectory("graft-ghnsw").toString
    val rnd = new scala.util.Random(47)
    val rows = (0 until 400).map { i =>
      (i.toLong, i % 10L, Seq.fill(8)(rnd.nextGaussian()))
    }
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "bucket", "vector"))
    coll.rebuildHnswIndex(m = 8, efConstruction = 32, numSegments = 2,
      metric = "cosine")
    val q = Seq((0L, rows(3)._3), (1L, rows(250)._3)).toDF("qid", "qvec")

    // exhaustive beam ≡ the exact scan byte-for-byte (the chain-
    // connectivity certificate through the grouped pipeline)
    val exact = coll.searchGrouped(q, "qid", "qvec", groupBy = "bucket",
      metric = "cosine", limit = 4, groupSize = 3).collect().toSeq
    val exh = coll.searchGroupedHnsw(q, "qid", "qvec", groupBy = "bucket",
      limit = 4, groupSize = 3, ef = Int.MaxValue).collect().toSeq
    assert(exh == exact && exact.nonEmpty)

    // tiny starting beam: the fill ladder must still return a FULL
    // page (10 groups of 40 members each exist), and the telemetry
    // shows the start clamped to the page size
    val small = coll.searchGroupedHnsw(q, "qid", "qvec", groupBy = "bucket",
      limit = 4, groupSize = 3, ef = 1).collect()
    val perQ = small.groupBy(_.getLong(0))
    assert(perQ.size == 2 && perQ.values.forall { rs =>
      rs.length == 12 && rs.map(_.getLong(2)).distinct.length == 4
    }, "every query's page must be full: 4 groups x 3 members")
    assert(coll.lastLadderRungs.nonEmpty && coll.lastLadderRungs.head._1 == 12,
      s"start clamps to limit*groupSize, got ${coll.lastLadderRungs}")

    // a page the corpus CANNOT fill (limit > distinct groups): the
    // ladder escalates to the exhaustive rung and returns the exact
    // answer for what exists
    val unfillable = coll.searchGroupedHnsw(q, "qid", "qvec",
      groupBy = "bucket", limit = 15, groupSize = 2, ef = 4).collect().toSeq
    val exactU = coll.searchGrouped(q, "qid", "qvec", groupBy = "bucket",
      metric = "cosine", limit = 15, groupSize = 2).collect().toSeq
    assert(unfillable == exactU)
    assert(coll.lastLadderRungs.last._1 >= 400,
      s"unfillable page must reach the exhaustive rung: ${coll.lastLadderRungs}")
  }

  test("MMR-HNSW: exhaustive beam ≡ exact searchMmr; grouped-HNSW filter arm exact at exhaustion") {
    val root = Files.createTempDirectory("graft-mmrhnsw").toString
    val rnd = new scala.util.Random(53)
    val rows = (0 until 300).map { i =>
      (i.toLong, i % 5L, Seq.fill(8)(rnd.nextGaussian()))
    }
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "bucket", "vector"))
    coll.rebuildHnswIndex(m = 8, efConstruction = 32, numSegments = 2,
      metric = "cosine")
    val q = Seq((0L, rows(9)._3), (1L, rows(150)._3)).toDF("qid", "qvec")

    // exhaustive beam: the pool equals the exact route's, the greedy is
    // shared — output byte-identical (stored metric on both sides)
    val exact = coll.searchMmr(q, "qid", "qvec", metric = "cosine",
      limit = 6, lambda = 0.5, poolMult = 4).collect().toSeq
    val ann = coll.searchMmrHnsw(q, "qid", "qvec", limit = 6, lambda = 0.5,
      poolMult = 4, ef = Int.MaxValue).collect().toSeq
    assert(ann == exact && exact.nonEmpty)
    // and with a filter on both arms
    val exactF = coll.searchMmr(q, "qid", "qvec", metric = "cosine",
      limit = 6, lambda = 0.5, poolMult = 4, filter = "bucket != 2")
      .collect().toSeq
    val annF = coll.searchMmrHnsw(q, "qid", "qvec", limit = 6, lambda = 0.5,
      poolMult = 4, ef = Int.MaxValue, filter = "bucket != 2").collect().toSeq
    assert(annF == exactF && !annF.exists(r => rows(r.getLong(2).toInt)._2 == 2L))

    // grouped-HNSW filter arm: a filtered page still fills through the
    // ladder, and the exhaustive rung is exact-among-eligible
    val gotG = coll.searchGroupedHnsw(q, "qid", "qvec", groupBy = "bucket",
      limit = 3, groupSize = 2, ef = 1, filter = "bucket != 2").collect().toSeq
    val wantG = coll.searchGrouped(q, "qid", "qvec", groupBy = "bucket",
      metric = "cosine", limit = 3, groupSize = 2, filter = "bucket != 2")
      .collect().toSeq
    // the fill ladder guarantees a full page here (4 eligible groups of
    // 60 docs each ≥ 3×2), and a full page from the exhaustive-capable
    // ladder on this corpus matches the exact route
    assert(gotG.groupBy(_.getLong(0)).values.forall(_.length == 6))
    assert(gotG.map(_.getLong(2)).distinct.sorted.forall(_ != 2L))
    val exhG = coll.searchGroupedHnsw(q, "qid", "qvec", groupBy = "bucket",
      limit = 3, groupSize = 2, ef = Int.MaxValue, filter = "bucket != 2")
      .collect().toSeq
    assert(exhG == wantG)
  }

  test("MMR-HNSW pool-fill ladder: selective filter escalates to a full pool; unfillable pool reaches the exhaustive rung") {
    val root = Files.createTempDirectory("graft-mmrladder").toString
    val rnd = new scala.util.Random(59)
    val rows = (0 until 300).map { i =>
      (i.toLong, i % 5L, Seq.fill(8)(rnd.nextGaussian()))
    }
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "bucket", "vector"))
    coll.rebuildHnswIndex(m = 8, efConstruction = 32, numSegments = 2,
      metric = "cosine")
    val q = Seq((0L, rows(9)._3), (1L, rows(150)._3)).toDF("qid", "qvec")

    // bucket = 2 keeps 60 of 300 rows — a 1-in-5 filter the
    // filter-blind traversal cannot see. With a TINY starting beam the
    // ladder must still deliver the exact filtered answer: pool fill
    // (limit·poolMult = 24 ≤ 60 eligible) is checked per rung, starved
    // queries escalate (r11 verdict #4 — the single-shot arm silently
    // shrank the pool here and told the user to raise ef)
    val exact = coll.searchMmr(q, "qid", "qvec", metric = "cosine",
      limit = 6, lambda = 0.5, poolMult = 4, filter = "bucket = 2")
      .collect().toSeq
    val got = coll.searchMmrHnsw(q, "qid", "qvec", limit = 6, lambda = 0.5,
      poolMult = 4, ef = 1, filter = "bucket = 2").collect().toSeq
    assert(got.nonEmpty && got.forall(r => rows(r.getLong(2).toInt)._2 == 2L))
    // a full pool from the exhaustive-capable ladder on this corpus
    // matches the exact filtered route (the pool saw every eligible row
    // by the time it filled, or escalated until it did)
    assert(got == exact, s"ladder result must equal exact-among-eligible")
    // telemetry: the start clamps to the pool size (rungs below it
    // cannot fill), and escalation actually happened
    assert(coll.lastLadderRungs.head._1 == 24,
      s"start clamps to limit*poolMult, got ${coll.lastLadderRungs}")
    assert(coll.lastLadderRungs.length > 1,
      s"a 1-in-5 filter at beam 24 must escalate: ${coll.lastLadderRungs}")

    // a pool the eligible rows CANNOT fill (120 wanted, 60 exist): the
    // ladder escalates to the exhaustive rung and the answer is exact
    // among eligible — the grouped arm's unfillable-page contract
    val gotU = coll.searchMmrHnsw(q, "qid", "qvec", limit = 30, lambda = 0.5,
      poolMult = 4, ef = 4, filter = "bucket = 2").collect().toSeq
    val exactU = coll.searchMmr(q, "qid", "qvec", metric = "cosine",
      limit = 30, lambda = 0.5, poolMult = 4, filter = "bucket = 2")
      .collect().toSeq
    assert(gotU == exactU)
    assert(coll.lastLadderRungs.last._1 >= 300,
      s"unfillable pool must reach the exhaustive rung: ${coll.lastLadderRungs}")
  }

  test("guards: duplicate query ids rejected; lossy group types rejected; null groups dropped") {
    val dupQ = Seq((1L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("qid", "qvec")
    val data = Seq((1L, 0L, Seq(1.0, 0.0)), (2L, 1L, Seq(0.0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    intercept[IllegalArgumentException] {
      GroupedSearch.groupedTopK(data, "vec_id", "embedding", "label",
        dupQ, "qid", "qvec", "cosine", 2, 2).collect()
    }
    intercept[IllegalArgumentException] {
      Mmr.topKDiverse(data, "vec_id", "embedding", dupQ, "qid", "qvec",
        "cosine", 2, 0.5).collect()
    }
    // the ANN arms carry the same rejection (r12 review pass: two
    // colliding NORMALIZED qids would silently merge two queries'
    // candidates into one page/pool where the exact twins raise)
    locally {
      val root = Files.createTempDirectory("graft-dupq").toString
      val coll = new GraftClient(spark, root).createDatabase("db")
        .createCollection("v")
      coll.upsert(Seq((1L, 0L, Seq(1.0, 0.0)), (2L, 1L, Seq(0.0, 1.0)))
        .toDF("id", "bucket", "vector"))
      coll.rebuildHnswIndex(m = 4, efConstruction = 8, numSegments = 1,
        metric = "cosine")
      intercept[IllegalArgumentException] {
        coll.searchMmrHnsw(dupQ, "qid", "qvec", limit = 2)
      }
      intercept[IllegalArgumentException] {
        coll.searchGroupedHnsw(dupQ, "qid", "qvec", groupBy = "bucket",
          limit = 2, groupSize = 1)
      }
    }
    // a double group column would truncate 1.2 and 1.7 onto one group —
    // rejected instead of silently merged
    val dbl = Seq((1L, 1.2, Seq(1.0, 0.0)), (2L, 1.7, Seq(0.0, 1.0)))
      .toDF("vec_id", "grp", "embedding")
    val err = intercept[IllegalArgumentException] {
      GroupedSearch.groupedTopK(dbl, "vec_id", "embedding", "grp",
        Seq((0L, Seq(1.0, 0.0))).toDF("qid", "qvec"), "qid", "qvec",
        "cosine", 2, 2)
    }
    assert(err.getMessage.contains("integral"))
    // null group keys = unsearchable-by-group (the null-vector
    // contract): those documents are dropped before scoring, the rest
    // rank normally
    val withNull = Seq((1L, Some(0L), Seq(1.0, 0.0)), (2L, None, Seq(1.0, 0.1)),
      (3L, Some(1L), Seq(0.0, 1.0))).toDF("vec_id", "label", "embedding")
    val got = GroupedSearch.groupedTopK(withNull, "vec_id", "embedding", "label",
      Seq((0L, Seq(1.0, 0.0))).toDF("qid", "qvec"), "qid", "qvec",
      "cosine", 5, 5).collect()
    assert(got.map(_.getLong(4)).toSet == Set(1L, 3L),
      s"null-group doc 2 must be absent, groups 0/1 present: ${got.toSeq}")
  }

  test("client routes: grouped + MMR over a filtered string-PK collection") {
    val root = Files.createTempDirectory("graft-diversity").toString
    val rnd = new scala.util.Random(23)
    val rows = (0 until 120).map { i =>
      (s"doc-$i", s"grp-${i % 6}", Seq.fill(8)(rnd.nextGaussian()))
    }
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "bucket", "vector"))
    val q = Seq(("q0", rows(9)._3)).toDF("qid", "qvec")

    val grouped = coll.searchGrouped(q, "qid", "qvec", groupBy = "bucket",
      metric = "l2", limit = 3, groupSize = 2, filter = "bucket != \"grp-3\"")
      .collect()
    assert(grouped.nonEmpty && grouped.length <= 6)
    assert(!grouped.exists(_.getString(2) == "grp-3"))
    // grp_rank 1's first member is the global (filtered) nearest doc
    val nearest = KnnSearch.topK(
      rows.filterNot(_._2 == "grp-3").toDF("id", "bucket", "vector"),
      "id", "vector", q, "qid", "qvec", "l2", 1).head
    assert(grouped.head.getString(4) == nearest.getString(2))

    val mmr = coll.searchMmr(q, "qid", "qvec", metric = "l2", limit = 5,
      lambda = 1.0, filter = "bucket != \"grp-3\"").collect()
    val plain = coll.search(q, "qid", "qvec", metric = "l2", limit = 5,
      filter = "bucket != \"grp-3\"").collect()
    assert(mmr.map(r => (r.getString(2), r.getDouble(3))).toSeq ==
      plain.map(r => (r.getString(2), r.getDouble(3))).toSeq)
  }
}
