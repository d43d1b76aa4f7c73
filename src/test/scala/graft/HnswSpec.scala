package graft

import org.apache.spark.sql.functions._

import graft.vector.{HnswIndex, KnnSearch, Recall}

/** HNSW (the reference's default index): build determinism, the
  * layer-0 connectivity certificate, exhaustive-grade equality to
  * exact KNN (the oracled-twin contract), production-ef recall, and
  * the input guards every family carries. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val queries = embs.where(col("vec_id") < 6)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val qLocal = embs.where(col("vec_id") < 6)
    .select(col("vec_id"), col("embedding").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
  private lazy val graph =
    HnswIndex.build(embs, "vec_id", "embedding", m = 8, efConstruction = 64,
      numSegments = 4).cache()

  test("build is deterministic across rebuilds") {
    val again = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
      efConstruction = 64, numSegments = 4)
    assert(graph.count() == embs.count())
    assert(graph.exceptAll(again).isEmpty && again.exceptAll(graph).isEmpty)
  }

  test("chain edges certify layer-0 connectivity in every segment") {
    // consecutive ids within a segment (insertion order) must be
    // layer-0 neighbors — the exemption from pruning is the point
    val rows = graph.select("seg", "id", "nbrs").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[scala.collection.Seq[Long]](2)))
      .groupBy(_._1)
    rows.foreach { case (seg, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, a, nbrsA), (_, b, nbrsB)) =>
          assert(nbrsA.head.contains(b) && nbrsB.head.contains(a),
            s"seg $seg: chain edge $a <-> $b missing at layer 0")
        case _ => ()
      }
    }
  }

  test("ef >= segment size visits every node (exhaustive certificate)") {
    val n = embs.count()
    val cand = HnswIndex.candidates(graph, qLocal.take(2), ef = Int.MaxValue)
    // every (query, corpus row) pair surfaces exactly once
    assert(cand.count() == 2 * n)
    assert(cand.distinct().count() == 2 * n)
  }

  test("exhaustive-grade search equals exact KNN (cosine and l2)") {
    for (metric <- Seq("cosine", "l2")) {
      val exact = KnnSearch.topK(embs, "vec_id", "embedding",
        queries, "qid", "qvec", metric, 10).collect()
      val hnsw = HnswIndex.search(graph, embs, "vec_id", "embedding",
        qLocal, metric, k = 10, ef = Int.MaxValue).collect()
      assert(hnsw.sameElements(exact), s"metric $metric diverges from exact KNN")
    }
  }

  test("production ef recall floor: recall@10 >= 0.9 at ef=48") {
    val gt = KnnSearch.topK(embs, "vec_id", "embedding",
      queries, "qid", "qvec", "cosine", 10)
    val approx = HnswIndex.search(graph, embs, "vec_id", "embedding",
      qLocal, "cosine", k = 10, ef = 48)
    val r = Recall.atK(approx, gt)
    assert(r >= 0.9, s"recall@10 = $r at ef=48")
  }

  test("raising ef never loses candidate coverage") {
    val lo = HnswIndex.candidates(graph, qLocal.take(2), ef = 8)
    val hi = HnswIndex.candidates(graph, qLocal.take(2), ef = 32)
    assert(lo.join(hi, Seq("query_id", "id"), "left_anti").isEmpty,
      "an ef=8 candidate vanished at ef=32")
  }

  test("Algorithm-4 neighbor selection: exhaustive certificate holds, degree caps hold") {
    // the chain-edge connectivity certificate is independent of the
    // selection rule, so the diverse-edge graph must ALSO be byte-equal
    // to exact KNN at exhaustive ef
    val gh = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
      efConstruction = 64, numSegments = 4, heuristic = true).cache()
    val exact = KnnSearch.topK(embs, "vec_id", "embedding",
      queries, "qid", "qvec", "cosine", 10).collect()
    val hnsw = HnswIndex.search(gh, embs, "vec_id", "embedding",
      qLocal, "cosine", k = 10, ef = Int.MaxValue).collect()
    assert(hnsw.sameElements(exact), "heuristic graph diverges from exact KNN")
    // deterministic build, like the simple rule
    val again = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
      efConstruction = 64, numSegments = 4, heuristic = true)
    assert(gh.exceptAll(again).isEmpty && again.exceptAll(gh).isEmpty)
    // degree caps: <= 2m at layer 0 (+2 chain-edge exemption), <= m above
    val over = gh.select("id", "nbrs").collect().exists { r =>
      val layers = r.getSeq[scala.collection.Seq[Long]](1)
      layers.head.length > 2 * 8 + 2 ||
        layers.tail.exists(_.length > 8 + 1)
    }
    assert(!over, "degree cap violated in heuristic graph")
    // production recall floor holds under the diverse rule too
    val gt = KnnSearch.topK(embs, "vec_id", "embedding",
      queries, "qid", "qvec", "cosine", 10)
    val r = Recall.atK(HnswIndex.search(gh, embs, "vec_id", "embedding",
      qLocal, "cosine", k = 10, ef = 48), gt)
    assert(r >= 0.9, s"recall@10 = $r at ef=48 with heuristic selection")
    gh.unpersist()
  }

  test("input guards: duplicate query ids, ragged vectors, null vectors") {
    intercept[IllegalArgumentException] {
      HnswIndex.candidates(graph, Array((1L, Array(0.0)), (1L, Array(1.0))), 4)
    }
    val ragged = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f))).toDF("id", "v")
    val err = intercept[org.apache.spark.SparkException] {
      HnswIndex.build(ragged, "id", "v", m = 2, efConstruction = 4,
        numSegments = 1).count()
    }
    assert(err.getMessage.contains("ragged") ||
      Option(err.getCause).exists(_.getMessage.contains("ragged")))
    // null vectors are unsearchable, not an error
    val withNull = Seq((1L, Some(Seq(1.0f, 2.0f))), (2L, None),
      (3L, Some(Seq(2.0f, 1.0f)))).toDF("id", "v")
    val g = HnswIndex.build(withNull, "id", "v", m = 2, efConstruction = 4,
      numSegments = 1)
    assert(g.count() == 2)
  }

  // ---------------------------------------- filtered search, adaptive

  private def filteredColl() = {
    import graft.api.GraftClient
    val root = java.nio.file.Files.createTempDirectory("graft-hnswfilt").toString
    val rnd = new scala.util.Random(53)
    val rows: Seq[(Long, Seq[Double], Long, Long)] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian()), i % 100, i % 2))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector", "grp", "par"))
    coll.rebuildHnswIndex(m = 8, efConstruction = 32, numSegments = 2)
    (coll, rows)
  }

  test("filtered search: tiny selectivity routes to the exact FLAT scan") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    // grp = 7 matches 3 of 300 docs — far under the √(2·k·n) ≈ 77 cost
    // threshold, so the route is the pushed-down exact scan: equality
    // with the FLAT path is byte-for-byte, and the count is |filtered|
    val got = coll.searchHnswFiltered(q, "qid", "qvec", "grp = 7", limit = 10)
      .collect().toSeq
    val flat = coll.search(q, "qid", "qvec", "cosine", limit = 10,
      filter = "grp = 7").collect().toSeq
    assert(got == flat)
    assert(got.length == 3 && got.forall(_.getLong(2) % 100 == 7))
  }

  test("filtered search: adaptive escalation always fills min(limit, |filtered|)") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2), (1L, rows(8)._2)).toDF("qid", "qvec")
    // par = 0 matches 150 docs — above the cost threshold, so the
    // GRAPH route serves; the adaptive guarantee is a full result set
    // for every query, which a small fixed beam cannot promise
    val got = coll.searchHnswFiltered(q, "qid", "qvec", "par = 0",
      limit = 10, ef = 1).collect()
    assert(got.length == 20, s"adaptive must fill 10 rows per query, got ${got.length}")
    assert(got.forall(_.getLong(2) % 2 == 0), "every hit must satisfy the filter")
    // adaptive recall vs exact is at least the single-shot fixed-beam's
    val exact = coll.search(q, "qid", "qvec", "cosine", limit = 10,
        filter = "par = 0").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val fixed = coll.searchHnswFiltered(q, "qid", "qvec", "par = 0",
        limit = 10, ef = 1, adaptive = false).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val adap = got.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    def recall(m: Map[Long, Set[Long]]) = exact.map { case (qid, ids) =>
      (ids intersect m.getOrElse(qid, Set.empty)).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall(adap) >= recall(fixed),
      s"adaptive recall ${recall(adap)} < fixed ${recall(fixed)}")
  }

  test("filtered search: empty filter match returns empty, not an error") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    assert(coll.searchHnswFiltered(q, "qid", "qvec", "grp = 777", limit = 5)
      .isEmpty)
  }

  test("search(ef=...) is the reference surface: routes to the graph, composes with filter") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    val n = 300
    // unfiltered: search(ef) == searchHnsw at the same beam
    val viaSearch = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      ef = Some(n)).collect().toSeq
    val direct = coll.searchHnsw(q, "qid", "qvec", limit = 5, ef = n,
      metric = Some("cosine")).collect().toSeq
    assert(viaSearch == direct)
    // filtered: search(ef, filter) == fixed-beam searchHnswFiltered
    val viaSearchF = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      filter = "par = 0", ef = Some(n)).collect().toSeq
    val directF = coll.searchHnswFiltered(q, "qid", "qvec", "par = 0",
      limit = 5, ef = n, adaptive = false, metric = Some("cosine"))
      .collect().toSeq
    assert(viaSearchF == directF)
    assert(viaSearchF.forall(_.getLong(2) % 2 == 0))
    // exhaustive ef + filter == the FLAT filtered scan (the twin rule)
    val flatF = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      filter = "par = 0").collect().toSeq
    assert(viaSearchF == flatF)
    // the ef route ranks in the index's STORED metric — an l2-built
    // graph must not silently serve cosine neighbors just because the
    // metric param defaults to "cosine" (the hybridDense rule)
    locally {
      val root = java.nio.file.Files.createTempDirectory("graft-efl2").toString
      val l2coll = new graft.api.GraftClient(spark, root)
        .createDatabase("db").createCollection("v")
      l2coll.upsert(rows.take(100).map(r => (r._1, r._2)).toDF("id", "vector"))
      l2coll.rebuildHnswIndex(m = 8, efConstruction = 32, numSegments = 1,
        metric = "l2")
      val viaEf = l2coll.search(q, "qid", "qvec", limit = 5, ef = Some(100))
        .collect().toSeq
      val l2direct = l2coll.searchHnsw(q, "qid", "qvec", limit = 5, ef = 100)
        .collect().toSeq
      assert(viaEf == l2direct, "search(ef) must rank in the stored l2 metric")
      val cosDirect = l2coll.searchHnsw(q, "qid", "qvec", limit = 5, ef = 100,
        metric = Some("cosine")).collect().toSeq
      assert(viaEf != cosDirect,
        "l2 and cosine rankings differ on this corpus — the pin is non-vacuous")
    }
    // param exclusivity + error-not-silent-scan (radius + ef is now a
    // SUPPORTED pair — the reference's SearchParams shape — and has
    // its own tests below; nprobe + ef stays exclusive)
    assertThrows[IllegalArgumentException] {
      coll.search(q, "qid", "qvec", limit = 5, ef = Some(4), nprobe = Some(2))
    }
    val root2 = java.nio.file.Files.createTempDirectory("graft-noidx").toString
    val bare = new graft.api.GraftClient(spark, root2)
      .createDatabase("db").createCollection("v")
    bare.upsert(Seq((1L, Seq(1.0, 2.0))).toDF("id", "vector"))
    assertThrows[IllegalArgumentException] {
      bare.search(Seq((0L, Seq(1.0, 2.0))).toDF("qid", "qvec"),
        "qid", "qvec", limit = 5, ef = Some(4))
    }
  }

  test("filtered search: empty QUERY batch returns empty, not a reduce crash") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec").where(col("qid") < 0)
    // par = 0 keeps the graph route (above the cost threshold) — the
    // escalation loop must not reduce over zero parts
    assert(coll.searchHnswFiltered(q, "qid", "qvec", "par = 0", limit = 5)
      .isEmpty)
  }

  test("filtered search: null-vector docs never inflate the fill target") {
    import graft.api.GraftClient
    val root = java.nio.file.Files.createTempDirectory("graft-hnswnull").toString
    val rnd = new scala.util.Random(59)
    // 150 filter-matching docs but only 40 searchable (the rest have
    // null vectors): the target must be min(limit, SEARCHABLE), not
    // min(limit, filtered) — otherwise every query climbs the whole ef
    // ladder to exhaustion chasing unreachable rows. limit=50 > 40
    // makes the distinction observable: exactly 40 rows, loop exits.
    val rows: Seq[(Long, Option[Seq[Double]], Long)] = (0L until 150L).map(i =>
      (i, if (i < 40) Some(Seq.fill(8)(rnd.nextGaussian())) else None, 0L))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    // the rebuild guard rejects null vectors, so build on the
    // searchable 40 and UPSERT the null-vector docs after (the append
    // path skips them — the reachable real-world shape)
    coll.upsert(rows.take(40).toDF("id", "vector", "par"))
    coll.rebuildHnswIndex(m = 4, efConstruction = 16, numSegments = 2)
    coll.upsert(rows.drop(40).toDF("id", "vector", "par"))
    val q = Seq((0L, rows(3)._2.get)).toDF("qid", "qvec")
    val got = coll.searchHnswFiltered(q, "qid", "qvec", "par = 0", limit = 50,
      ef = 1).collect()
    assert(got.length == 40,
      s"must fill exactly the searchable filtered count, got ${got.length}")
  }

  // ---------------------------------------- radius through the graph

  test("graph radius at the exhaustive bound equals FLAT radius+limit byte-for-byte") {
    // pick each metric's ball from the exact top-k so it is non-empty
    // by construction; any r gives byte-equality (both sides gate the
    // RAW score with the same rule), a populated ball makes it
    // non-vacuous
    for (metric <- Seq("cosine", "l2")) {
      val gt = KnnSearch.topK(embs, "vec_id", "embedding",
        queries, "qid", "qvec", metric, 10).collect()
      val r = gt.filter(_.getInt(1) == 5).map(_.getDouble(3)).head
      val flat = KnnSearch.radiusTopK(embs, "vec_id", "embedding",
        queries, "qid", "qvec", metric, r, 5).collect()
      val viaGraph = HnswIndex.searchRadius(graph, embs, "vec_id", "embedding",
        qLocal, metric, r, k = 5, ef = Int.MaxValue).collect()
      assert(flat.nonEmpty, s"metric $metric: empty ball makes the pin vacuous")
      assert(viaGraph.sameElements(flat),
        s"metric $metric: graph radius diverges from FLAT")
    }
  }

  test("search(radius, ef): served from the graph, exhaustive beam equals FLAT, composes with filter") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2), (1L, rows(8)._2)).toDF("qid", "qvec")
    // ball radius from the exact scan's rank-7 score for query 0: both
    // queries get a populated, sub-corpus ball
    val r = coll.search(q, "qid", "qvec", "cosine", limit = 10)
      .where(col("query_id") === 0 && col("rank") === 7).head().getDouble(3)
    val flat = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      radius = Some(r)).collect().toSeq
    assert(flat.nonEmpty)
    // beam >= corpus: one exhaustive round, byte-equal to FLAT
    val viaGraph = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      radius = Some(r), ef = Some(300)).collect().toSeq
    assert(viaGraph == flat, "exhaustive-beam graph radius must equal FLAT")
    // single-shot pin (adaptive = false) at the exhaustive beam too
    val single = coll.searchHnswRadius(q, "qid", "qvec", r, limit = 5,
      ef = 300, adaptive = false).collect().toSeq
    assert(single == flat)
    // filter composes: exhaustive graph radius+filter == FLAT radius+filter
    val flatF = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      radius = Some(r), filter = "par = 0").collect().toSeq
    val viaGraphF = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      radius = Some(r), filter = "par = 0", ef = Some(300)).collect().toSeq
    assert(viaGraphF == flatF)
    assert(flatF.nonEmpty)
  }

  test("search(radius, ef): adaptive escalation from a tiny beam stays inside the ball") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2), (1L, rows(8)._2)).toDF("qid", "qvec")
    val r = coll.search(q, "qid", "qvec", "cosine", limit = 10)
      .where(col("query_id") === 0 && col("rank") === 7).head().getDouble(3)
    // the full ball per query (limit >= corpus), the reference answer set
    val ball = coll.search(q, "qid", "qvec", "cosine", limit = 300,
        radius = Some(r)).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val got = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      radius = Some(r), ef = Some(1)).collect()
    // contract: every row in-ball (raw-score gate; rounded output gets
    // the 1e-4 tolerance), ranks contiguous from 1 per query, never
    // more than limit rows, and ids a subset of the true ball
    assert(got.forall(_.getDouble(3) >= r - 1e-4))
    got.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length),
        s"query $qid: ranks not contiguous")
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(2)).toSet.subsetOf(ball.getOrElse(qid, Set.empty)),
        s"query $qid: a returned id is outside the true ball")
    }
  }

  test("auto-ef recall-floor contract: the derived default rides graph meta, serves by default, re-derives at compaction; explicit ef overrides") {
    val rnd = new scala.util.Random(163)
    val n = 400
    val rows: Seq[(Long, Seq[Double])] =
      (0L until n.toLong).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val root = java.nio.file.Files.createTempDirectory("graft-autoef").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildHnswIndex(m = 8, efConstruction = 32, numSegments = 4)

    // the derivation: ef₀ = max(16, 2·⌈√(N/segments)⌉) — here
    // 2·⌈√100⌉ = 20 — persisted like the auto-√N nlist precedent
    assert(coll.describe("index.hnsw.ef_default") == "20")

    // the default-beam serve IS the derived beam (same bytes as an
    // explicit ef at that value), and an explicit ef still overrides
    val q = Seq((0L, rows(7)._2), (1L, rows(333)._2)).toDF("qid", "qvec")
    val byDefault = coll.searchHnsw(q, "qid", "qvec", limit = 5).collect().toSeq
    assert(byDefault == coll.searchHnsw(q, "qid", "qvec", limit = 5, ef = 20)
      .collect().toSeq)
    val exhaustive = coll.searchHnsw(q, "qid", "qvec", limit = 5,
      ef = Int.MaxValue).collect().toSeq
    // recall floor: the derived default recovers ≥ 0.9 of the exact
    // page on this corpus (RecallProbe publishes the tri-SF curve)
    val hit = byDefault.map(r => (r.getLong(0), r.getLong(2))).toSet
    val want = exhaustive.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(hit.intersect(want).size >= math.ceil(0.9 * want.size).toInt,
      s"derived-default recall floor: got ${hit.intersect(want).size}/${want.size}")

    // an appended segment LARGER than the stored basis max-folds the
    // derived default immediately (it must not serve under-beamed
    // until compaction): 1000 appended rows land as one 1000-row
    // segment ⇒ autoEfSeg(1000) = 64 > the rebuild's 20
    coll.upsert((1000L until 2000L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian()))).toDF("id", "vector"))
    assert(coll.describe("index.hnsw.ef_default") ==
      graft.api.GraftCollection.autoEfSeg(1000L).toString,
      "an oversized appended segment must widen the stored default beam")

    // compaction re-derives from the FOLDED graph's ACTUAL largest
    // segment (ef is a per-segment beam — tiered merges produce shard
    // sizes the configured-count division doesn't predict)
    coll.compactIndexes()
    val maxSeg = coll.hnswGraphRows.groupBy("seg").count()
      .agg(max("count")).head.getLong(0)
    assert(coll.describe("index.hnsw.ef_default") ==
      graft.api.GraftCollection.autoEfSeg(maxSeg).toString,
      "compaction must re-derive the default beam from the folded graph's largest segment")

    // an ALL-DELETED collection folds to an empty graph: the
    // re-derivation must land on the floor (16), not NPE on a null
    // max over zero segments (review finding — the old n=0 path's
    // behavior, restored)
    coll.deleteByIds(coll.df.select("id").collect().map(_.getLong(0)).toSeq)
    coll.compactIndexes()
    assert(coll.describe("index.hnsw.ef_default") == "16",
      "empty folded graph must derive the floor default, not crash")
  }
}
