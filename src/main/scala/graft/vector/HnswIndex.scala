package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** HNSW — the reference's DEFAULT vector index
  * (/root/reference/aiotcvectordb/model/collection.py:179 search `ef`
  * param; tests/conftest.py builds every collection with
  * IndexType.HNSW, params {"M", "efConstruction"}), re-expressed for
  * Spark's execution model.
  *
  * A monolithic HNSW graph is a single pointer-chasing structure — the
  * one shape a shared-nothing cluster cannot host. The Spark-native
  * form is the one every distributed HNSW serving system uses
  * (Lucene/Elasticsearch per-segment graphs, Milvus per-segment
  * indexes): SHARD the corpus into segments, build an independent
  * in-memory HNSW graph per segment inside `mapPartitions`, persist
  * the graphs as a parquet artifact, and serve a query by traversing
  * every segment's graph in parallel (embarrassingly so — one task per
  * segment, queries broadcast) and exact-reranking the union of the
  * per-segment candidates. Per-query work is O(segments · ef · log n)
  * distance evaluations instead of O(corpus); the only shuffle is the
  * final k-merge of `ef` candidate rows per (segment, query).
  *
  * At 100 TB the segment count scales with the corpus while segment
  * size stays pinned to what an executor comfortably holds (tens of
  * millions of vectors — the same budget Lucene runs per shard), so
  * build memory, search latency, and recall per segment are all
  * corpus-size-independent knobs.
  *
  * Correctness certificate (the family's oracled-twin pattern): the
  * build appends sequential CHAIN edges (node i ↔ node i−1 in
  * insertion order) to layer 0 after neighbor pruning, making every
  * segment graph connected BY CONSTRUCTION — not just in expectation.
  * A search with ef ≥ segment size therefore visits every node (the
  * best-first frontier never triggers its early-exit while the result
  * heap is unfilled), the candidate set degenerates to the whole
  * corpus, and the exact rerank — the SAME VectorScore + Ranked.topK
  * pipeline FLAT search uses — equals exact KNN byte-for-byte. The
  * production path runs the same machinery at small ef; RecallProbe
  * measures what that ef buys.
  */
object HnswIndex {

  /** Persisted graph row: segment id, vector id, the vector (float —
    * the compact stored form; traversal math widens to double), the
    * node's top layer, and its adjacency (neighbor VECTOR IDS per
    * layer, layer 0 first). */
  private type GraphRow = (Int, Long, Array[Float], Int, Seq[Seq[Long]])
  private val graphCols = Seq("seg", "id", "vec", "level", "nbrs")

  /** ONE best-first beam search shared by construction and serving —
    * the termination rule (stop when the nearest frontier candidate is
    * farther than the worst of a full result heap) and the
    * (dist, node-index) tie-break are subtle enough that two copies
    * would silently diverge under maintenance. Subclasses provide
    * distance and adjacency access: build-time over the growing
    * ArrayBuffer adjacency, serve-time over the frozen decoded
    * arrays. */
  private abstract class Beam(n: Int) {
    def dist(q: Array[Float], node: Int): Double
    /** Neighbor count at (node, layer); 0 when the node has no such
      * layer. */
    def degree(node: Int, layer: Int): Int
    def neighbor(node: Int, layer: Int, i: Int): Int

    /** Up to `ef` closest (dist, node) pairs from `eps`, ascending;
      * deterministic (ties break on node index). */
    final def searchLayer(q: Array[Float], eps: Seq[Int], ef: Int,
                          lc: Int): Array[(Double, Int)] = {
      val visited = new java.util.BitSet(n)
      implicit val ord: Ordering[(Double, Int)] = Ordering.Tuple2
      // candidates: nearest first; result: farthest first (bounded at ef)
      val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord.reverse)
      val res = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord)
      eps.foreach { ep =>
        if (!visited.get(ep)) {
          visited.set(ep)
          val d = dist(q, ep)
          cand.enqueue((d, ep)); res.enqueue((d, ep))
        }
      }
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (dc > res.head._1 && res.size >= ef) { cand.clear() }
        else {
          val deg = degree(c, lc)
          var i = 0
          while (i < deg) {
            val e = neighbor(c, lc, i)
            if (!visited.get(e)) {
              visited.set(e)
              val d = dist(q, e)
              if (res.size < ef || d < res.head._1) {
                cand.enqueue((d, e)); res.enqueue((d, e))
                if (res.size > ef) res.dequeue()
              }
            }
            i += 1
          }
        }
      }
      res.dequeueAll.toArray.reverse // ascending by (dist, node)
    }
  }

  /** Squared L2 over float vectors, widened to double — the one
    * traversal metric (graphs are built and navigated in L2 space;
    * the caller's metric applies at the exact rerank). */
  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  /** Deterministic level assignment: the standard geometric ladder
    * `floor(-ln(u) · mL)` with `u` drawn from a splitmix64 of the
    * vector id — identical across rebuilds, executors, and partition
    * counts. */
  private def levelOf(id: Long, seed: Long, mL: Double): Int = {
    var z = id ^ seed
    z = (z + 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // 53 high bits → u in [0, 1); 1−u in (0, 1] keeps ln finite
    val u = (z >>> 11) * (1.0 / (1L << 53))
    math.floor(-math.log(1.0 - u) * mL).toInt
  }

  /** Build per-segment HNSW graphs over `data` and return the
    * persistable graph frame (seg, id, vec, level, nbrs).
    *
    * Deterministic end-to-end: segments are hash(id) partitions,
    * insertion order is id order within each segment, levels are
    * seeded by id, and every heap tie-breaks on node index. Null
    * vectors are excluded (unsearchable, not an error — the same
    * contract as the IVF family's null cell); ragged vectors fail
    * fast.
    *
    * @param m              max neighbors per node per layer (layer 0
    *                       keeps 2·m — the standard HNSW setting);
    *                       reference param "M"
    * @param efConstruction beam width during insertion; reference
    *                       param "efConstruction"
    * @param numSegments    graph shards (one in-memory graph each)
    * @param segOffset      first segment number (incremental appends
    *                       build a batch's graphs under fresh segment
    *                       ids ABOVE the existing ones — segment graphs
    *                       are independent, so appending is the natural
    *                       incremental maintenance for a graph index)
    * @param heuristic      neighbor selection rule: false = keep the M
    *                       closest (the paper's Algorithm 3 — simple,
    *                       the historical default here); true = Malkov
    *                       & Yashunin Algorithm 4 (keep a candidate
    *                       only if it is closer to the new node than to
    *                       any already-kept neighbor), which spends
    *                       edges on DIRECTION diversity instead of raw
    *                       proximity — the rule known to improve recall
    *                       on clustered and low-structure distributions
    *                       (HnswProbe measures the delta on the
    *                       iid-uniform hard case) */
  def build(data: DataFrame, idCol: String, vecCol: String,
            m: Int = 16, efConstruction: Int = 80,
            numSegments: Int = 4, seed: Long = 42L,
            segOffset: Int = 0, heuristic: Boolean = false): DataFrame = {
    require(m >= 2, s"M must be >= 2, got $m")
    require(efConstruction >= m, s"efConstruction ($efConstruction) must be >= M ($m)")
    require(numSegments >= 1, s"numSegments must be >= 1, got $numSegments")
    require(data.schema(idCol).dataType != org.apache.spark.sql.types.StringType,
      "HNSW graph nodes are numeric: string-PK collections build over a " +
        "numeric surrogate column (the client derives xxhash64(id))")
    // seg is derived FROM THE DATA (not from task/partition ids, which
    // are scheduler labels AQE may re-map between runs) so the graph is
    // byte-identical across rebuilds, partition counts, and planners
    val base = data
      .select((pmod(xxhash64(col(idCol).cast("long")), lit(numSegments)).cast("int")
          + lit(segOffset)).as("seg"),
        col(idCol).cast("long").as("id"), col(vecCol).cast("array<float>").as("v"))
      .where(col("v").isNotNull)
      .repartition(numSegments, col("seg"))
      .sortWithinPartitions("seg", "id")
    base.as(Encoders.product[(Int, Long, Array[Float])])
      .mapPartitions { it =>
        // a hash partition may hold several segments; rows arrive
        // seg-contiguous and id-ascending (deterministic insertion order)
        val bySeg = it.toArray.groupBy(_._1).toSeq.sortBy(_._1)
        bySeg.iterator.flatMap { case (seg, segRows) =>
          val rows = segRows.map(r => (r._2, r._3))
          val dim = rows(0)._2.length
          rows.foreach { case (id, v) =>
            require(v.length == dim,
              s"ragged vector: id=$id has dim ${v.length}, expected $dim")
          }
          buildSegment(rows, m, efConstruction, seed, heuristic).iterator.map {
            case (id, vec, level, nbrs) => (seg, id, vec, level, nbrs)
          }
        }
      }(Encoders.product[GraphRow]).toDF(graphCols: _*)
  }

  /** In-memory HNSW construction over one segment's (id, vec) rows.
    * Classic insert (greedy descent to the node's level, then
    * beam-search + neighbor selection per layer), followed by the
    * chain-edge augmentation that certifies layer-0 connectivity. */
  private def buildSegment(rows: Array[(Long, Array[Float])], m: Int,
                           efC: Int, seed: Long, heuristic: Boolean = false)
      : Array[(Long, Array[Float], Int, Seq[Seq[Long]])] = {
    val n = rows.length
    val mL = 1.0 / math.log(m)
    val maxM0 = 2 * m
    val levels = Array.tabulate(n)(i => levelOf(rows(i)._1, seed, mL))
    // adjacency: node -> layer -> neighbor node indexes
    val nbrs = Array.tabulate(n)(i =>
      Array.fill(levels(i) + 1)(new scala.collection.mutable.ArrayBuffer[Int](maxM0 + 2)))

    // build-time beam: adjacency is the growing ArrayBuffer graph
    val beam = new Beam(n) {
      def dist(q: Array[Float], node: Int): Double = l2sq(q, rows(node)._2)
      def degree(node: Int, layer: Int): Int =
        if (layer < nbrs(node).length) nbrs(node)(layer).length else 0
      def neighbor(node: Int, layer: Int, i: Int): Int = nbrs(node)(layer)(i)
    }
    def searchLayer(q: Array[Float], eps: Seq[Int], ef: Int, lc: Int): Array[(Double, Int)] =
      beam.searchLayer(q, eps, ef, lc)

    /** Malkov & Yashunin Algorithm 4 over candidates ALREADY sorted
      * ascending by (dist-to-q, node): keep a candidate only if it is
      * closer to q than to every already-kept neighbor — edges buy
      * direction diversity, so clustered candidates collapse to one
      * representative and the graph keeps escape routes between
      * clusters. Deterministic (scan order is the sorted order). */
    def selectDiverse(q: Array[Float], sorted: Array[(Double, Int)],
                      cap: Int): Array[(Double, Int)] = {
      val kept = new scala.collection.mutable.ArrayBuffer[(Double, Int)](cap)
      var i = 0
      while (i < sorted.length && kept.length < cap) {
        val (dq, e) = sorted(i)
        var ok = true
        var j = 0
        while (ok && j < kept.length) {
          if (l2sq(rows(e)._2, rows(kept(j)._2)._2) < dq) ok = false
          j += 1
        }
        if (ok) kept += ((dq, e))
        i += 1
      }
      kept.toArray
    }

    /** Cap `node`'s layer-`lc` adjacency at `cap`: keep the closest
      * (the paper's simple Algorithm 3) or the diverse subset
      * (Algorithm 4) per the build's `heuristic` flag. */
    def shrink(node: Int, lc: Int, cap: Int): Unit = {
      val adj = nbrs(node)(lc)
      if (adj.length > cap) {
        val sorted = adj.map(e => (l2sq(rows(node)._2, rows(e)._2), e))
          .sorted.toArray
        val kept = if (heuristic) selectDiverse(rows(node)._2, sorted, cap).map(_._2)
                   else sorted.take(cap).map(_._2)
        adj.clear(); adj ++= kept
      }
    }

    var entry = -1
    var maxLevel = -1
    var i = 0
    while (i < n) {
      val q = rows(i)._2
      val lvl = levels(i)
      if (entry < 0) { entry = i; maxLevel = lvl }
      else {
        var ep = entry
        var lc = maxLevel
        while (lc > lvl) { // greedy descent above the node's level
          val best = searchLayer(q, Seq(ep), 1, lc)
          if (best.nonEmpty) ep = best(0)._2
          lc -= 1
        }
        lc = math.min(lvl, maxLevel)
        while (lc >= 0) {
          val w = searchLayer(q, Seq(ep), efC, lc)
          val cap = if (lc == 0) maxM0 else m
          val selected = if (heuristic) selectDiverse(q, w, m) else w.take(m)
          selected.foreach { case (_, e) =>
            nbrs(i)(lc) += e
            nbrs(e)(lc) += i
            shrink(e, lc, cap)
          }
          if (w.nonEmpty) ep = w(0)._2
          lc -= 1
        }
        if (lvl > maxLevel) { maxLevel = lvl; entry = i }
      }
      i += 1
    }

    // Chain augmentation AFTER all pruning: node i ↔ i−1 at layer 0.
    // These edges are exempt from the maxM0 cap — they are the
    // connectivity certificate, O(1) extra degree per node.
    var c = 1
    while (c < n) {
      if (!nbrs(c)(0).contains(c - 1)) nbrs(c)(0) += (c - 1)
      if (!nbrs(c - 1)(0).contains(c)) nbrs(c - 1)(0) += c
      c += 1
    }

    Array.tabulate(n) { j =>
      (rows(j)._1, rows(j)._2, levels(j),
        nbrs(j).toSeq.map(_.toSeq.map(e => rows(e)._1)))
    }
  }

  /** Arrange a graph frame into seg-WHOLE, seg-contiguous partitions —
    * the serving precondition of [[candidates]]. A raw read of the
    * seg-partitioned parquet artifact cannot guarantee it (a large
    * segment file splits across input partitions at row-group
    * boundaries), so traversal needs this one shuffle; `prepare`
    * exists so callers pay it ONCE per artifact version and serve
    * every query batch from the persisted result (the client caches
    * the handle per collection + mutation version) instead of
    * re-shuffling the corpus-sized graph on every search. */
  def prepare(graph: DataFrame): DataFrame = graph
    .select(col("seg").cast("int"), col("id"), col("vec"),
      col("level").cast("int"), col("nbrs"))
    .repartition(col("seg"))
    .sortWithinPartitions("seg", "id")
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Per-segment graph traversal → candidate (query_id, id, seg)
    * rows: up to `ef` per (segment, query), tagged with the segment
    * whose beam surfaced them (the per-SEGMENT granularity the radius
    * ladder's boundary signal needs — r9 advice). The exhaustive
    * certificate lives here — ef ≥ segment size returns every node
    * (see object doc). `prepared = true` promises the frame came from
    * [[prepare]] (seg-whole partitions) and skips the arranging
    * shuffle. */
  private[graft] def candidates(graph: DataFrame,
      queries: Array[(Long, Array[Double])], ef: Int,
      prepared: Boolean = false): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids in batch")
    val spark = graph.sparkSession
    val bc = spark.sparkContext.broadcast(queries.map { case (qid, qv) =>
      (qid, qv.map(_.toFloat)) })
    val arranged = if (prepared) graph else prepareNoPersist(graph)
    arranged
      .as(Encoders.product[GraphRow])
      .mapPartitions { it =>
        val qs = bc.value
        // a hash partition may hold several segments; rows arrive
        // seg-contiguous (sortWithinPartitions), so group by run
        val bySeg = it.toArray.groupBy(_._1).toSeq.sortBy(_._1)
        bySeg.iterator.flatMap { case (sg, rs) =>
          searchSegment(rs, qs, ef).map { case (q, id) => (q, id, sg) }
        }
      }(Encoders.product[(Long, Long, Int)]).toDF("query_id", "id", "seg")
  }

  private def prepareNoPersist(graph: DataFrame): DataFrame = graph
    .select(col("seg").cast("int"), col("id"), col("vec"),
      col("level").cast("int"), col("nbrs"))
    .repartition(col("seg"))
    .sortWithinPartitions("seg", "id")

  /** Traverse one segment's graph for every query. */
  private def searchSegment(rs: Array[GraphRow],
      qs: Array[(Long, Array[Float])], ef: Int): Iterator[(Long, Long)] = {
    val n = rs.length
    val idx = new java.util.HashMap[Long, Int](n * 2)
    var i = 0
    while (i < n) { idx.put(rs(i)._2, i); i += 1 }
    // neighbor ids → node indexes, once per segment
    val adj: Array[Array[Array[Int]]] = rs.map(r =>
      r._5.map(layer => layer.map(idx.get(_): Int).toArray).toArray)
    val vecs = rs.map(_._3)
    // entry point: max level, smallest id on ties (rows are id-sorted)
    var entry = 0
    var j = 1
    while (j < n) { if (rs(j)._4 > rs(entry)._4) entry = j; j += 1 }
    val maxLevel = rs(entry)._4
    val efEff = math.max(1, math.min(ef, n))

    // serve-time beam: adjacency is the frozen decoded index arrays
    val beam = new Beam(n) {
      def dist(q: Array[Float], node: Int): Double = l2sq(q, vecs(node))
      def degree(node: Int, layer: Int): Int =
        if (layer < adj(node).length) adj(node)(layer).length else 0
      def neighbor(node: Int, layer: Int, i: Int): Int = adj(node)(layer)(i)
    }

    qs.iterator.flatMap { case (qid, qv) =>
      var ep = entry
      var lc = maxLevel
      while (lc > 0) {
        val best = beam.searchLayer(qv, Seq(ep), 1, lc)
        if (best.nonEmpty) ep = best(0)._2
        lc -= 1
      }
      beam.searchLayer(qv, Seq(ep), efEff, 0).iterator.map { case (_, node) =>
        (qid, rs(node)._2)
      }
    }
  }

  /** HNSW search: graph traversal narrows each segment to `ef`
    * candidates per query, then the ORIGINAL vectors of only those
    * candidates are fetched from `data` (broadcast semi-join) and
    * exactly re-ranked by `metric` through the same VectorScore +
    * Ranked.topK pipeline as FLAT search. Traversal always navigates
    * by L2 (the graph is built in L2 space); the rerank metric is the
    * caller's — candidate coverage for non-L2 metrics is what
    * RecallProbe measures, and ef ≥ segment size makes any metric
    * exact (all candidates surface).
    *
    * Serving a stale graph stays delete-correct: candidates join
    * against the CURRENT `data` snapshot, so ids deleted since the
    * graph was built drop out. Within ONE fixed graph frame, ids
    * absent from it are unsearchable — but the client maintains the
    * graph incrementally (GraftCollection.appendHnswSegment: an
    * upsert batch lands as its own new segment graph), so a
    * client-served collection searches its full corpus without
    * waiting for a rebuild.
    *
    * `nodeKey`: how `data` rows map onto graph node ids — `None` for
    * numeric-PK collections (node id IS the document id), a surrogate
    * expression (xxhash64 of the string PK) for string-PK collections;
    * the rerank then restores the REAL id ([[Ranked.candidateRows]]),
    * so the output id column keeps the collection's own id type. */
  def search(graph: DataFrame, data: DataFrame, idCol: String, vecCol: String,
             queries: Array[(Long, Array[Double])], metric: String,
             k: Int, ef: Int = 10, prepared: Boolean = false,
             nodeKey: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val m = VectorMetric(metric)
    Ranked.topK(
      scoredCandidates(graph, data, idCol, vecCol, queries, metric,
        math.max(ef, k), prepared, nodeKey),
      k, asc = !m.largerIsBetter)
  }

  /** Radius search served from the graph (reference `radius` WITH the
    * collection's HNSW SearchParams — model/document.py SearchParams,
    * stub.py:589): traverse at beam `ef`, exactly rescore the
    * candidates, keep rows within the radius (score >= r for
    * similarity metrics, distance <= r for L2 — [[KnnSearch.radius]]'s
    * rule, applied to the RAW score before ranking/rounding), then the
    * same bounded-heap top-k postlude. ef ≥ segment size visits every
    * node, so the exhaustive setting equals FLAT
    * [[KnnSearch.radiusTopK]] byte-for-byte (pinned in HnswSpec) —
    * the radius family's verified-twin certificate. */
  def searchRadius(graph: DataFrame, data: DataFrame, idCol: String,
                   vecCol: String, queries: Array[(Long, Array[Double])],
                   metric: String, r: Double, k: Int, ef: Int = 10,
                   prepared: Boolean = false,
                   nodeKey: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val m = VectorMetric(metric)
    val scored = scoredCandidates(graph, data, idCol, vecCol, queries, metric,
      math.max(ef, k), prepared, nodeKey)
    val kept = if (m.largerIsBetter) scored.where(col("__s") >= r)
               else scored.where(col("__s") <= r)
    Ranked.topK(kept, k, asc = !m.largerIsBetter)
  }

  /** The shared traversal + exact-rescore stage: (query_id, __s, id)
    * rows over the beam's candidates, RAW scores — what every graph
    * serving path ranks, radius-filters, or fill-counts on. */
  private[graft] def scoredCandidates(graph: DataFrame, data: DataFrame,
      idCol: String, vecCol: String, queries: Array[(Long, Array[Double])],
      metric: String, candWidth: Int, prepared: Boolean,
      nodeKey: Option[org.apache.spark.sql.Column]): DataFrame = {
    val m = VectorMetric(metric)
    val spark = data.sparkSession
    import spark.implicits._
    // distinct: after incremental appends a re-upserted id has nodes in
    // BOTH its old segment graph (stale position) and the batch segment
    // — both surface the same id, and duplicate (query_id, id) pairs
    // would occupy two top-k ranks. Bounded input (segments·ef rows per
    // query), so the dedup never touches corpus-sized data.
    val cand = candidates(graph, queries, candWidth, prepared)
      .select("query_id", "id").distinct()
    val qdf = queries.toSeq.toDF("query_id", "__qv")
    // cand is NOT broadcast-hinted: at production ef it is tiny
    // (segments·ef ids per query — AQE broadcasts it), but on the
    // exhaustive-certificate path (ef ≥ segment size) it is
    // corpus-sized and a forced broadcast would hit the driver's
    // 8 GB/512M-row broadcast limits; the query batch IS bounded,
    // so it keeps the hint
    Ranked.candidateRows(data, idCol, vecCol, cand, nodeKey, bcast = false)
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"),
        VectorScore.score(m.name, col("__v"), col("__qv")).as("__s"), col("id"))
  }

  /** [[scoredCandidates]] keeping the SEGMENT tag: (query_id, __s, id,
    * seg) rows, one per (segment beam, candidate) — an id surfaced by
    * two segment beams appears once per segment (same score). The
    * radius ladder's done-rule needs this granularity: "the beam
    * passed the ball boundary" is a statement about ONE segment's
    * nearest-first frontier, and testing it on the union of beams lets
    * a single out-of-ball candidate from any segment stop escalation
    * for the whole query (r9 advice). Answers derived from this frame
    * must dedup (query_id, id) before ranking. */
  private[graft] def scoredCandidatesSeg(graph: DataFrame, data: DataFrame,
      idCol: String, vecCol: String, queries: Array[(Long, Array[Double])],
      metric: String, candWidth: Int, prepared: Boolean,
      nodeKey: Option[org.apache.spark.sql.Column]): DataFrame = {
    val m = VectorMetric(metric)
    val spark = data.sparkSession
    import spark.implicits._
    val cand = candidates(graph, queries, candWidth, prepared).distinct()
    val qdf = queries.toSeq.toDF("query_id", "__qv")
    // candidateRows inlined with the seg column kept (it projects the
    // candidate frame down to (query_id, id))
    val rows = nodeKey match {
      case None =>
        data.select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
          .join(cand, "id")
      case Some(nk) =>
        data.select(nk.as("__nk"), col(idCol).as("id"), col(vecCol).as("__v"))
          .join(cand.withColumnRenamed("id", "__nk"), "__nk")
          .drop("__nk")
    }
    rows.join(broadcast(qdf), "query_id")
      .select(col("query_id"),
        VectorScore.score(m.name, col("__v"), col("__qv")).as("__s"),
        col("id"), col("seg"))
  }
}
