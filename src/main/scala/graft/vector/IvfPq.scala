package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** IVF_PQ — the composed "IVF series" index of the reference
  * (/root/reference/aiotcvectordb/model/collection.py: "IVF series:
  * nprobe, specifying the number of units to be queried"; Tencent
  * VectorDB's IVF_PQ = coarse cells + product-quantized residuals').
  *
  * Storage: (id, cell, codes) — the cell prunes the scan (nprobe of
  * nlist partitions), the codes make the surviving sliver scannable by
  * table lookups. Together: scan cost ≈ (nprobe/nlist) · corpus · m
  * adds per query, memory ≈ m bytes per vector.
  */
object IvfPq {

  final case class Model(ivf: IvfIndex.Model, pq: PqIndex.Model)

  def train(data: DataFrame, vecCol: String, dim: Int, nlist: Int = 16,
            m: Int = 8, k: Int = 16, seed: Long = 42L): Model =
    Model(
      IvfIndex.train(data, vecCol, nlist, seed, maxIter = 10),
      PqIndex.train(data, vecCol, dim, m, k, seed))

  /** (id, cell, codes, resid) — the on-disk representation (partition
    * by cell via [[IvfIndex.writeIndexed]]-style layout at scale).
    * Assignment goes through [[IvfIndex.assignExpr]] — the SAME
    * expression the append path ([[GraftClient]] incremental segments)
    * and the [[IvfIndex.cellStats]] ball radii use. It must: the
    * radius route's cell certificate is only sound when the rho table
    * and the stored cell column agree on every boundary tiebreak, and
    * MLlib's KMeansModel.transform computes distances in a different
    * fp order (norm-shortcut form) that can flip a near-tie. */
  def encode(model: Model, data: DataFrame, idCol: String, vecCol: String): DataFrame =
    encodeAssigned(model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex,
      model.pq, data, idCol, vecCol)

  /** [[encode]] against persisted artifacts (stored centroid pairs +
    * reconstructed codebooks) — the maintenance path's encoder. */
  def encodeAssigned(centers: Seq[(Array[Double], Int)], pq: PqIndex.Model,
                     data: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cells = data.select(col(idCol).cast("long").as("id"),
      IvfIndex.assignExpr(centers.map { case (c, i) => (c.toSeq, i) },
        col(vecCol)).as("cell"))
    PqIndex.encode(pq, data, idCol, vecCol).join(cells, "id")
  }

  /** nprobe cells per query + ADC over the candidates. nprobe = nlist
    * degenerates to plain PQ search over everything. */
  def search(model: Model, encoded: DataFrame, queries: Array[(Long, Array[Double])],
             kTop: Int, nprobe: Int): DataFrame =
    searchStored(model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex,
      model.pq, encoded, queries, kTop, nprobe)

  /** The serving path over PERSISTED artifacts: centroids as
    * (centroid, cell) pairs and the PQ model reconstructed from stored
    * codebooks — no KMeansModel object, no retraining. */
  /** `cosineScores` marks a cosine-built index (see
    * [[IvfSq.searchStored]]): gate-space L2 ranking over unit-
    * normalized codes, emitted score = the dequantized-cosine estimate
    * 1 − d²/2, descending. */
  def searchStored(centers: Seq[(Array[Double], Int)], pq: PqIndex.Model,
                   encoded: DataFrame, queries: Array[(Long, Array[Double])],
                   kTop: Int, nprobe: Int,
                   cosineScores: Boolean = false): DataFrame = {
    // ADC tables are broadcast keyed BY query id; duplicate qids would
    // silently collapse to one entry (and one result group)
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids in batch")
    val spark = encoded.sparkSession
    import spark.implicits._

    // driver-side probe ranking (queries and centroids are both tiny)
    // through the ONE probe-order definition (IvfIndex.probeOrder —
    // shared with IVF_SQ8 serving and the nprobe calibration)
    val probes = queries.toSeq.flatMap { case (qid, qv) =>
      IvfIndex.probeOrder(centers, qv).take(nprobe).map(cell => (qid, cell))
    }
    val probesDf = probes.toDF("query_id", "cell")

    val bc = spark.sparkContext.broadcast(PqIndex.adcTables(pq, queries).toMap)

    // the probed-cell union is driver-known — pushing it as an In()
    // filter prunes the cell-partitioned code table at FILE LISTING
    // (PartitionFilters), instead of scanning every cell into the join
    val probedCells = probes.map(_._2).distinct
    val cand = encoded.where(col("cell").isin(probedCells: _*))
      .join(broadcast(probesDf), "cell")
      .select(col("query_id"), col("id"), col("codes"))
      .as(Encoders.product[(Long, Long, Array[Int])])
    val scored = cand.mapPartitions { it =>
      val tabs = bc.value
      it.map { case (qid, id, codes) =>
        val t = tabs(qid)
        var d = 0.0
        var s = 0
        while (s < codes.length) { d += t(s)(codes(s)); s += 1 }
        (qid, math.sqrt(d), id)
      }
    }(Encoders.product[(Long, Double, Long)]).toDF("query_id", "__s", "id")

    if (cosineScores)
      Ranked.topK(scored.select(col("query_id"),
        (lit(1.0) - col("__s") * col("__s") / 2).as("__s"), col("id")),
        kTop, asc = false)
    else Ranked.topK(scored, kTop, asc = true)
  }

  /** EXACT L2 radius search from the cell-partitioned PQ layout — the
    * [[SqIndex]]-family certificates composed over PQ codes: per query,
    * only cells with ||q - c_j|| ≤ R + rho_j survive
    * ([[IvfIndex.cellStats]] ball bound, checked driver-side over the
    * tiny centroid set and pushed as an isin PartitionFilter), the
    * stored per-row resid gates the ADC scan to the ball's provable
    * superset (|d(q,x) - ADC| ≤ resid), and the exact rerank closes.
    * Result ≡ FLAT radius+limit byte-for-byte at any nlist/m/k — see
    * [[IvfSq.searchStoredRadius]], whose structure this mirrors with
    * Int codes and ADC tables. */
  def searchStoredRadius(centers: Seq[(Array[Double], Int)], stats: DataFrame,
                         pq: PqIndex.Model, encoded: DataFrame,
                         data: DataFrame, idCol: String, vecCol: String,
                         queries: Array[(Long, Array[Double])], radius: Double,
                         k: Int,
                         nodeKey: Option[org.apache.spark.sql.Column] = None,
                         rerank: Ranked.Rerank = null): DataFrame = {
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids in batch")
    require(radius >= 0, s"negative L2 radius $radius")
    val spark = encoded.sparkSession
    import spark.implicits._

    // shared cell certificate + exact postlude (IvfIndex / Ranked) —
    // see IvfSq.searchStoredRadius; empty probes flow through as an
    // empty candidate frame with the id type bound from `data`
    val probes = IvfIndex.radiusProbes(centers,
      IvfIndex.collectCellRho(stats), queries, radius)
    val probesDf = probes.toDF("query_id", "cell")
    val bc = spark.sparkContext.broadcast(PqIndex.adcTables(pq, queries).toMap)

    val probedCells = probes.map(_._2).distinct
    val cand = encoded.where(col("cell").isin(probedCells: _*))
      .join(broadcast(probesDf), "cell")
      .select(col("query_id"), col("id"), col("codes"), col("resid"))
      .as(Encoders.product[(Long, Long, Array[Int], Double)])
      .mapPartitions { it =>
        val tabs = bc.value
        it.flatMap { case (qid, id, codes, resid) =>
          val t = tabs(qid)
          var d = 0.0; var s = 0
          while (s < codes.length) { d += t(s)(codes(s)); s += 1 }
          if (math.sqrt(d) <= Ranked.gateEps(radius + resid)) Some((qid, id))
          else None
        }
      }(Encoders.product[(Long, Long)]).toDF("query_id", "id")

    Ranked.exactRerank(data, idCol, vecCol, cand, queries, k,
      Some(radius), nodeKey, rerank)
  }

  /** The production IVF_PQ pattern (same shape as
    * [[PqIndex.searchRerank]]): cells prune the scan, ADC over the
    * surviving codes narrows to `kTop * candMult` candidates per query,
    * then the ORIGINAL vectors of only that sliver are fetched
    * (broadcast semi-join) and exactly re-ranked by L2. Lifts recall
    * off the ADC ceiling (quantization error bounds code-only ranking
    * regardless of nprobe — measured 0.33 recall@10 flat at m=8/k=16 on
    * the test corpus) back onto an nprobe-governed curve (0.82 at
    * nprobe=8, 0.86 at nprobe=16, candMult=10). */
  def searchRerank(model: Model, encoded: DataFrame,
                   data: DataFrame, idCol: String, vecCol: String,
                   queries: Array[(Long, Array[Double])], kTop: Int,
                   nprobe: Int, candMult: Int = 10): DataFrame =
    searchStoredRerank(model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex,
      model.pq, encoded, data, idCol, vecCol, queries, kTop, nprobe, candMult)

  /** [[searchRerank]] over persisted artifacts (see [[searchStored]]). */
  def searchStoredRerank(centers: Seq[(Array[Double], Int)], pq: PqIndex.Model,
                         encoded: DataFrame,
                         data: DataFrame, idCol: String, vecCol: String,
                         queries: Array[(Long, Array[Double])], kTop: Int,
                         nprobe: Int, candMult: Int = 10,
                         nodeKey: Option[org.apache.spark.sql.Column] = None,
                         rerank: Ranked.Rerank = null): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val rr = if (rerank == null) Ranked.Rerank("l2", queries, None) else rerank
    val m = VectorMetric(rr.metric)
    val cand = searchStored(centers, pq, encoded, queries, kTop * candMult, nprobe)
      .select(col("query_id"), col("id"))
    val qdf = rr.queries.toSeq.toDF("query_id", "__qv")
    val exact = Ranked.candidateRows(data, idCol, vecCol, cand, nodeKey,
        bcast = true)
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"),
        VectorScore.score(m.name, col("__v"), col("__qv")).as("__s"), col("id"))
    Ranked.topK(exact, kTop, asc = !m.largerIsBetter)
  }
}
