package graft

import org.apache.spark.sql.functions._

/** Cost-routed adaptive FILTERED IVF search — the IVF arm of the
  * filtered-search contract searchHnswFiltered pins: FLAT route below
  * the √(2kn) threshold (exact), nprobe escalation with the full-probe
  * EXACT backstop above it, so fixed-nprobe silent starvation is
  * unrepresentable. */
class IvfFilteredSpec extends SparkSpec {
  import spark.implicits._

  private def filteredColl() = {
    import graft.api.GraftClient
    val root = java.nio.file.Files.createTempDirectory("graft-ivffilt").toString
    val rnd = new scala.util.Random(53)
    val rows: Seq[(Long, Seq[Double], Long, Long)] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian()), i % 100, i % 2))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector", "grp", "par"))
    coll.rebuildIndex(nlist = 8, metric = "l2")
    (coll, rows)
  }

  test("tiny selectivity routes to the exact FLAT scan") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    // grp = 7 matches 3 of 300 — far under √(2·k·n) ≈ 77, so the route
    // is the pushed-down exact scan: byte-for-byte FLAT, |filtered| rows
    val got = coll.searchIvfFiltered(q, "qid", "qvec", "grp = 7", limit = 10)
      .collect().toSeq
    val flat = coll.search(q, "qid", "qvec", "l2", limit = 10,
      filter = "grp = 7").collect().toSeq
    assert(got == flat)
    assert(got.length == 3 && got.forall(_.getLong(2) % 100 == 7))
  }

  test("adaptive escalation always fills min(limit, |filtered|); full probe is the exact backstop") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2), (1L, rows(8)._2)).toDF("qid", "qvec")
    // par = 0 matches 150 — above the cost threshold, so the INDEX
    // route serves; nprobe=1 starts starved, the ladder must fill
    val got = coll.searchIvfFiltered(q, "qid", "qvec", "par = 0",
      limit = 10, nprobe = 1).collect()
    assert(got.length == 20, s"adaptive must fill 10 rows per query, got ${got.length}")
    assert(got.forall(_.getLong(2) % 2 == 0), "every hit must satisfy the filter")
    // the single-shot fixed-nprobe route may starve — that is exactly
    // what adaptive repairs; recall(adaptive) >= recall(fixed)
    val exact = coll.search(q, "qid", "qvec", "l2", limit = 10,
        filter = "par = 0").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val fixed = coll.searchIvfFiltered(q, "qid", "qvec", "par = 0",
        limit = 10, nprobe = 1, adaptive = false).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val adap = got.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap
    def recall(m: Map[Long, Set[Long]]) = exact.map { case (qid, ids) =>
      (ids intersect m.getOrElse(qid, Set.empty)).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall(adap) >= recall(fixed),
      s"adaptive recall ${recall(adap)} < fixed ${recall(fixed)}")
    // full probe == exact filtered KNN byte-for-byte (the backstop that
    // makes the fill guarantee a guarantee)
    val full = coll.searchIvfFiltered(q, "qid", "qvec", "par = 0",
      limit = 10, nprobe = 8, adaptive = false).collect().toSeq
    val flatF = coll.search(q, "qid", "qvec", "l2", limit = 10,
      filter = "par = 0").collect().toSeq
    assert(full == flatF, "full-probe filtered IVF must equal the FLAT scan")
  }

  test("empty filter match and empty query batch return empty, not an error") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    assert(coll.searchIvfFiltered(q, "qid", "qvec", "grp = 777", limit = 5)
      .isEmpty)
    val qEmpty = q.where(col("qid") < 0)
    assert(coll.searchIvfFiltered(qEmpty, "qid", "qvec", "par = 0", limit = 5)
      .isEmpty)
  }

  test("null-vector docs never inflate the fill target") {
    import graft.api.GraftClient
    val root = java.nio.file.Files.createTempDirectory("graft-ivfnull").toString
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Option[Seq[Double]], Long)] = (0L until 60L).map(i =>
      (i, if (i < 40) Some(Seq.fill(8)(rnd.nextGaussian())) else None, 0L))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.take(40).toDF("id", "vector", "par"))
    coll.rebuildIndex(nlist = 4, metric = "l2")
    coll.upsert(rows.drop(40).toDF("id", "vector", "par"))
    val q = Seq((0L, rows(3)._2.get)).toDF("qid", "qvec")
    val got = coll.searchIvfFiltered(q, "qid", "qvec", "par = 0", limit = 50,
      nprobe = 1).collect()
    assert(got.length == 40,
      s"must fill exactly the searchable filtered count, got ${got.length}")
  }

  test("search(radius, nprobe): served from the cells, full probe equals FLAT, tiny probe stays in the ball") {
    val (coll, rows) = filteredColl()
    val q = Seq((0L, rows(7)._2), (1L, rows(8)._2)).toDF("qid", "qvec")
    // l2 index: the ball keeps distance <= r; take r from the exact
    // scan's rank-7 distance so both queries have a populated ball
    val r = coll.search(q, "qid", "qvec", "l2", limit = 10)
      .where(col("query_id") === 0 && col("rank") === 7).head().getDouble(3)
    val flat = coll.search(q, "qid", "qvec", "l2", limit = 5,
      radius = Some(r)).collect().toSeq
    assert(flat.nonEmpty)
    // full probe (nprobe = nlist): one exhaustive round, byte-equal
    val full = coll.search(q, "qid", "qvec", "l2", limit = 5,
      radius = Some(r), nprobe = Some(8)).collect().toSeq
    assert(full == flat, "full-probe cell radius must equal FLAT")
    // single-shot pin at the full probe too
    val single = coll.searchIvfRadius(q, "qid", "qvec", r, limit = 5,
      nprobe = 8, adaptive = false).collect().toSeq
    assert(single == flat)
    // adaptive from nprobe = 1: every row in-ball (distance <= r up to
    // output rounding), ranks contiguous, ids inside the true ball
    val ball = coll.search(q, "qid", "qvec", "l2", limit = 300,
        radius = Some(r)).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val got = coll.search(q, "qid", "qvec", "l2", limit = 5,
      radius = Some(r), nprobe = Some(1)).collect()
    assert(got.forall(_.getDouble(3) <= r + 1e-4))
    // FILL guarantee: query 0's ball holds >= 7 docs (r = its rank-7
    // distance) and they can span cells the first probe misses — the
    // ball-filled-only done-rule must escalate until 5 rows land (the
    // rule an out-of-ball "boundary" signal would break: probed cells
    // always contain out-of-ball rows, so that signal never escalates)
    assert(got.count(_.getLong(0) == 0L) == 5,
      "adaptive cell-radius must fill min(limit, |ball|) for query 0")
    got.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
      assert(rs.map(_.getLong(2)).toSet.subsetOf(ball.getOrElse(qid, Set.empty)),
        s"query $qid: a returned id is outside the true ball")
    }
    // filter composes on the radius route too
    val flatF = coll.search(q, "qid", "qvec", "l2", limit = 5,
      radius = Some(r), filter = "par = 0").collect().toSeq
    val fullF = coll.search(q, "qid", "qvec", "l2", limit = 5,
      radius = Some(r), filter = "par = 0", nprobe = Some(8)).collect().toSeq
    assert(fullF == flatF)
    assert(flatF.nonEmpty)
  }

  test("radius on a cosine-built index gates score >= r (the largerIsBetter branch)") {
    // the l2 test above exercises distance <= r; a sign flip in the
    // similarity branch of the gate / fill count would otherwise pass
    // the whole suite unnoticed (review finding)
    import graft.api.GraftClient
    val root = java.nio.file.Files.createTempDirectory("graft-ivfradcos").toString
    val rnd = new scala.util.Random(29)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIndex(nlist = 4, metric = "cosine")
    val q = Seq((0L, rows(7)._2), (1L, rows(8)._2)).toDF("qid", "qvec")
    val r = coll.search(q, "qid", "qvec", "cosine", limit = 10)
      .where(col("query_id") === 0 && col("rank") === 7).head().getDouble(3)
    val flat = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      radius = Some(r)).collect().toSeq
    assert(flat.nonEmpty)
    // full probe equals FLAT in the similarity metric too
    val full = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      radius = Some(r), nprobe = Some(4)).collect().toSeq
    assert(full == flat, "full-probe cosine radius must equal FLAT")
    // adaptive from nprobe = 1: in-ball means score >= r here, and the
    // ball-filled rule must still fill query 0 (ball >= 7 > limit)
    val got = coll.search(q, "qid", "qvec", "cosine", limit = 5,
      radius = Some(r), nprobe = Some(1)).collect()
    assert(got.forall(_.getDouble(3) >= r - 1e-4))
    assert(got.count(_.getLong(0) == 0L) == 5)
  }

  test("stored-metric discipline: a cosine-built index serves cosine unless overridden") {
    import graft.api.GraftClient
    val root = java.nio.file.Files.createTempDirectory("graft-ivfmet").toString
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Seq[Double], Long)] =
      (0L until 200L).map(i => (i, Seq.fill(16)(rnd.nextGaussian()), i % 2))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector", "par"))
    coll.rebuildIndex(nlist = 4, metric = "cosine")
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    val viaStored = coll.searchIvfFiltered(q, "qid", "qvec", "par = 0",
      limit = 5, nprobe = 4, adaptive = false).collect().toSeq
    val viaCos = coll.searchIvfFiltered(q, "qid", "qvec", "par = 0",
      limit = 5, nprobe = 4, adaptive = false, metric = Some("cosine"))
      .collect().toSeq
    assert(viaStored == viaCos, "default must rank in the stored metric")
    val viaL2 = coll.searchIvfFiltered(q, "qid", "qvec", "par = 0",
      limit = 5, nprobe = 4, adaptive = false, metric = Some("l2"))
      .collect().toSeq
    assert(viaStored != viaL2,
      "cosine and l2 rankings differ on this corpus — the pin is non-vacuous")
  }
}
