package graft.vector

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index: the reference's IVF_FLAT/IVF_* index
  * family (/root/reference/aiotcvectordb/model/index.py IVFFLATParams
  * nlist / search nprobe).
  *
  * Build = k-means over the corpus (MLlib, seeded); each vector stores
  * its `cell` assignment. At 100 TB the cell column is a PARTITION /
  * sort key of the stored collection, so an nprobe search prunes whole
  * parquet partitions at the scan (predicate pushdown on `cell`), not
  * post-scan. Search = rank centroids per query (tiny, broadcast), keep
  * `nprobe` cells, semi-join candidates on cell, exact re-rank within.
  * nprobe = nlist degenerates to exact search (used by the SQL oracle).
  */
object IvfIndex {

  final case class Model(kmeans: KMeansModel, nlist: Int)

  /** Train centroids (deterministic for a fixed seed + input). */
  def train(data: DataFrame, vecCol: String, nlist: Int, seed: Long = 42L,
            maxIter: Int = 20): Model = {
    // cache the feature projection: Lloyd's iterates maxIter times over
    // it, and uncached each pass would re-read + re-convert the corpus
    val feats = data.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .cache()
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cell")
    try Model(km.fit(feats), nlist)
    finally feats.unpersist(blocking = false)
  }

  /** Corpus with its cell assignment column appended. `outCol` lets
    * callers pick a non-colliding name ("cell" is a plausible USER
    * field — MLlib refuses to overwrite an existing column); the MLlib
    * feature column uses a reserved name so a user field called
    * "features" is never overwritten-then-dropped. */
  def assign(model: Model, data: DataFrame, vecCol: String,
             outCol: String = "cell"): DataFrame = {
    val fcol = "__graft_features"
    val withFeat = data.withColumn(fcol,
      array_to_vector(col(vecCol).cast("array<double>")))
    model.kmeans.setFeaturesCol(fcol).setPredictionCol(outCol)
      .transform(withFeat).drop(fcol)
  }

  /** Centroids as a small DataFrame (cell, centroid: array<double>). */
  def centroids(model: Model, spark: SparkSession): DataFrame = {
    import spark.implicits._
    model.kmeans.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq.toDF("cell", "centroid")
  }

  /** Cell assignment against FIXED (persisted) centroids as a single
    * expression: least() over (distance, cell) structs is the argmin,
    * earliest cell on ties — the same assignment the trained model
    * computes, with no model object, no shuffle, and no retraining.
    * This is the INCREMENTAL index-maintenance path: an upsert batch is
    * assigned to the existing cells in O(batch · nlist) inside the
    * batch's own projection. Null vectors get a null cell (they are
    * unsearchable, not dropped — same contract as null embeddings). */
  def assignExpr(centers: Seq[(Seq[Double], Int)], vec: Column): Column = {
    require(centers.nonEmpty, "no centroids to assign against")
    val best = least(centers.map { case (c, i) =>
      struct(VectorScore.l2(vec, typedLit(c)).as("d"), lit(i).as("c"))
    }: _*)
    when(vec.isNull, lit(null)).otherwise(best.getField("c"))
  }

  /** Top-2 assignment: the two nearest centroids as a sorted
    * array<struct<d, c>> ([0] = winner). array_sort on (d, c) structs
    * orders by distance then cell — the SAME tiebreak as
    * [[assignExpr]]'s least(), so element 0 always equals the
    * single-assign cell. Feeds margin-gated multi-cell assignment
    * (SemDeDup's boundary-pair device — the IVF multi-probe analog). */
  def assign2Expr(centers: Seq[(Seq[Double], Int)], vec: Column): Column = {
    require(centers.length >= 2, "top-2 assignment needs at least 2 centroids")
    val sorted = array_sort(array(centers.map { case (c, i) =>
      struct(VectorScore.l2(vec, typedLit(c)).as("d"), lit(i).as("c"))
    }: _*))
    when(vec.isNull, lit(null)).otherwise(slice(sorted, 1, 2))
  }

  /** Per-cell ball statistics: rho(cell) = max over members of
    * ||x - c_cell|| — ONE scalar per cell, the classic ball-tree bound
    * that lets an exact radius search prune whole cells at FILE
    * LISTING: a ball member x in cell j forces
    * ||q - c_j|| ≤ d(q,x) + ||x - c_j|| ≤ R + rho_j, so any cell with
    * ||q - c_j|| > R + rho_j provably holds no member. rho is computed
    * from the RAW vectors at encode/append time (exact); deletes only
    * shrink cells, so a stored rho stays a valid upper bound without
    * maintenance, and folding stats rows by max(rho) at compaction is
    * conservative-correct for the same reason. Output: (cell, rho),
    * one row per non-empty cell. Shared by the IVF_SQ8 and IVF_PQ
    * exact-radius routes. */
  def cellStats(centers: Seq[(Array[Double], Int)], data: DataFrame,
                vecCol: String): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val pairs = centers.map { case (c, i) => (c.toSeq, i) }
    // assignment through the SAME assignExpr the encoder uses — a
    // reimplemented loop could tiebreak a boundary point differently
    // (fp summation order) and silently under-state another cell's rho
    val centDf = broadcast(pairs.toDF("centroid", "cell"))
    data.select(assignExpr(pairs, col(vecCol)).as("cell"),
        col(vecCol).as("__v"))
      .join(centDf, "cell")
      .select(col("cell"),
        VectorScore.l2(col("__v"), col("centroid")).as("__d"))
      .groupBy("cell").agg(max(col("__d")).as("rho"))
  }

  /** Fold a persisted (cell, rho) stats table to the driver-side map
    * the cell certificate checks against — ≤ nlist rows by contract
    * (multiple generations per cell max-fold: conservative-correct,
    * deletes only shrink cells). */
  private[vector] def collectCellRho(stats: DataFrame): Map[Int, Double] =
    stats.select(col("cell").cast("int"), col("rho"))
      .groupBy("cell").agg(max("rho").as("rho"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

  /** The cell-certificate survivors for a radius query batch: (qid,
    * cell) pairs with ||q - c_j|| ≤ R + rho_j (epsilon-widened) —
    * driver-side over the tiny centroid set; cells with no stats row
    * are empty and prune automatically. Shared by the IVF_SQ8 and
    * IVF_PQ exact-radius routes so the prune policy cannot drift. */
  private[vector] def radiusProbes(centers: Seq[(Array[Double], Int)],
                                   rho: Map[Int, Double],
                                   queries: Array[(Long, Array[Double])],
                                   radius: Double): Seq[(Long, Int)] =
    queries.toSeq.flatMap { case (qid, qv) =>
      centers.flatMap { case (c, cell) =>
        rho.get(cell).flatMap { rj =>
          var d = 0.0; var i = 0
          while (i < qv.length) { val df = qv(i) - c(i); d += df * df; i += 1 }
          if (math.sqrt(d) <= Ranked.gateEps(radius + rj)) Some((qid, cell))
          else None
        }
      }
    }

  /** Collect a persisted (cell, centroid) table to the driver-side
    * literal form [[assignExpr]] needs (nlist rows — tiny by contract). */
  def centersFromDf(centroidsDf: DataFrame): Seq[(Seq[Double], Int)] =
    centroidsDf.select(col("centroid").cast("array<double>"), col("cell").cast("int"))
      .collect().map(r => (r.getSeq[Double](0), r.getInt(1))).toSeq

  /** EMPIRICAL default-nprobe calibration (r13 — the auto-ef
    * recall-floor contract extended to the cell families): a FIXED
    * default nprobe degrades silently as the auto-√N nlist grows with
    * the corpus (measured on the driver embeddings at production
    * nlist: nprobe=4 recall@10 reads 0.69 at 500 rows and 0.49 at
    * 2000), and unlike ef no single formula fits — the right probe
    * count is a property of the STORED corpus's cluster geometry
    * (clustered cells cover neighborhoods at tiny nprobe, isotropic
    * ones need ~nlist/2). So calibrate at rebuild time against the
    * corpus itself: take `sampleQ` member queries (lowest ids —
    * deterministic), compute their exact top-`k` over the corpus (one
    * scan, the cellStats cost class), assign each true neighbor its
    * cell through the SAME assignExpr as the encoder, and return the
    * smallest nprobe whose mean TOP-K CELL COVERAGE (fraction of true
    * neighbors whose cell ranks within the query's nprobe nearest
    * cells) reaches `target`. Coverage bounds the serving recall from
    * above and tracks it tightly (the candidate rescore inside probed
    * cells is exact), and the whole calibration is sample-bounded:
    * nothing corpus-sized reaches the driver. Persisted in index meta
    * like ef_default; a rebuild recalibrates (the centroids' own
    * staleness contract). */
  def calibrateNprobe(data: DataFrame, idCol: String, vecCol: String,
                      centers: Seq[(Array[Double], Int)], k: Int = 10,
                      sampleQ: Int = 32, target: Double = 0.95): Int = {
    // build-time numeric-id contract, like the encoders: string-PK
    // collections calibrate over the surrogate-keyed frame (indexKeyed
    // supplies it at every GraftClient call site) — idNorm would keep
    // a string qid and crash the driver-side collect below
    require(data.schema(idCol).dataType != org.apache.spark.sql.types.StringType,
      "calibrateNprobe keys by numeric id: string-PK collections " +
        "calibrate over a numeric surrogate column (the client derives xxhash64(id))")
    val nlist = centers.length
    if (nlist <= 1) return 1
    val queries = data
      .select(col(idCol).cast("long").as("qid"), col(vecCol).as("qvec"))
      .orderBy("qid").limit(sampleQ)
    // each member query's OWN row sits at distance 0 with its cell at
    // probe rank 1 by construction — free coverage that would dilute
    // the target by 1/k; exclude it so the 0.95 applies to GENUINE
    // neighbors (review finding)
    val gt = KnnSearch.topK(data, idCol, vecCol, queries, "qid", "qvec",
        "l2", k)
      .where(col("id") =!= col("query_id"))
    // each true neighbor's cell via the encoder's own assignExpr — a
    // different assignment rule could flip boundary rows (cellStats'
    // rationale)
    val pairs = centers.map { case (c, i) => (c.toSeq, i) }
    val gtCells = gt.select(col("query_id"), col("id"))
      .join(data.select(col(idCol).cast("long").as("id"),
        assignExpr(pairs, col(vecCol)).as("cell")), "id")
      .select(col("query_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._1).map { case (q, cs) => q -> cs.map(_._2) }
    val qvecs = queries.select(col("qid"),
        col("qvec").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    if (qvecs.isEmpty || gtCells.isEmpty) return 1
    // per query: cells ranked by the shared probe order, then the rank
    // of each true neighbor's cell
    val ranks: Array[Array[Int]] = qvecs.map { case (qid, qv) =>
      val order = probeOrder(centers, qv).zipWithIndex.toMap
      gtCells.getOrElse(qid, Array.empty[Int]).map(order(_) + 1)
    }
    val total = ranks.map(_.length).sum.toDouble
    if (total == 0) return 1
    var np = 1
    while (np < nlist &&
        ranks.map(_.count(_ <= np)).sum / total < target) np += 1
    np
  }

  /** Cells in probe order for one query: squared-L2 to each centroid,
    * ranked by (distance, cell) — ONE definition of the probe
    * tie-break ([[IvfPq.searchStored]], [[IvfSq.searchStored]] and
    * [[calibrateNprobe]] all rank through this; a divergent loop could
    * flip a boundary tiebreak and make the calibration measure a
    * different route than the one that serves). */
  private[vector] def probeOrder(centers: Seq[(Array[Double], Int)],
                                 qv: Array[Double]): Seq[Int] =
    centers.map { case (c, cell) =>
      var d = 0.0; var i = 0
      while (i < qv.length) { val df = qv(i) - c(i); d += df * df; i += 1 }
      (d, cell)
    }.sortBy(identity).map(_._2)

  /** IVF search: prune to each query's `nprobe` nearest cells, exact
    * KNN within the union of those cells. */
  def search(model: Model, data: DataFrame, idCol: String, vecCol: String,
             queries: DataFrame, qIdCol: String, qVecCol: String,
             metric: String, k: Int, nprobe: Int): DataFrame = {
    val assigned = assign(model, data, vecCol)
      .select(KnnSearch.idNorm(data, idCol).as("id"), col(vecCol).as("__vec"), col("cell"))
    searchAssigned(assigned, centroids(model, data.sparkSession),
      queries, qIdCol, qVecCol, metric, k, nprobe)
  }

  /** IVF search over a STORED index: `assigned` is (id, __vec, cell) —
    * typically a cell-partitioned collection written at rebuild_index
    * time — and `centroidsDf` the persisted (cell, centroid) table.
    * No model object or retraining needed: the serving path of an index
    * built in an earlier session. */
  def searchAssigned(assigned: DataFrame, centroidsDf: DataFrame,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     metric: String, k: Int, nprobe: Int): DataFrame = {
    val m = VectorMetric(metric)
    Ranked.topK(
      scoredProbed(assigned, centroidsDf, queries, qIdCol, qVecCol, metric, nprobe),
      k, asc = !m.largerIsBetter)
  }

  /** Radius search served from the cell layout (reference `radius`
    * WITH the IVF index's own nprobe — the SearchParams shape): probe
    * the nprobe nearest cells, exactly rescore their rows, gate the
    * RAW score by the radius before the bounded-heap top-k
    * ([[KnnSearch.radius]]'s rule — score >= r for similarity metrics,
    * distance <= r for L2). nprobe = nlist probes every cell, so the
    * full-probe setting equals FLAT radius+limit byte-for-byte over
    * the cell-assigned corpus — the family's exactness backstop. */
  def searchAssignedRadius(assigned: DataFrame, centroidsDf: DataFrame,
                           queries: DataFrame, qIdCol: String, qVecCol: String,
                           metric: String, r: Double, k: Int,
                           nprobe: Int): DataFrame = {
    val m = VectorMetric(metric)
    val scored = scoredProbed(assigned, centroidsDf, queries, qIdCol, qVecCol,
      metric, nprobe)
    val kept = if (m.largerIsBetter) scored.where(col("__s") >= r)
               else scored.where(col("__s") <= r)
    Ranked.topK(kept, k, asc = !m.largerIsBetter)
  }

  /** The shared probe + exact-rescore stage: (query_id, __s, id) rows
    * over the probed cells' candidates, RAW scores — what the ranked,
    * radius-gated, and fill-counted serving paths all consume. */
  private[graft] def scoredProbed(assigned: DataFrame, centroidsDf: DataFrame,
                                  queries: DataFrame, qIdCol: String,
                                  qVecCol: String, metric: String,
                                  nprobe: Int): DataFrame = {
    val m = VectorMetric(metric)
    // probe cells per query: queries × centroids (both tiny, broadcast)
    val q = queries.select(KnnSearch.idNorm(queries, qIdCol).as("query_id"), col(qVecCol).as("__qvec"))
    // the probes broadcast carries only (query_id, cell) KEYS — the
    // query vector attaches afterwards through one (query_id → vec)
    // broadcast, so the payload is |q|·nprobe keys plus |q| vectors,
    // NOT |q|·nprobe duplicated vectors (at the adaptive ladder's
    // full-probe backstop nprobe = nlist, the duplicated form would
    // broadcast |q|·nlist·dim doubles)
    val probes = q.crossJoin(broadcast(centroidsDf))
      .select(col("query_id"), col("cell"),
        VectorScore.l2(col("__qvec"), col("centroid")).as("__d"))
      .groupBy("query_id")
      .agg(TopKAgg.topk(col("__d"), col("cell").cast("long"), nprobe, asc = true).as("__t"))
      .select(col("query_id"), explode(col("__t.id")).as("cell"))

    // candidates: corpus rows in a probed cell of some query
    assigned.join(broadcast(probes), "cell")
      .join(broadcast(q), "query_id")
      .select(col("query_id"),
        VectorScore.score(m.name, col("__vec"), col("__qvec")).as("__s"), col("id"))
  }

  /** rebuild_index / modify_vector_index: (re)write the collection
    * PARTITIONED BY its cell assignment. A subsequent nprobe search
    * reads only the probed cell directories — partition pruning at the
    * file listing, before a single byte of vector data is scanned. This
    * is the on-disk layout that makes IVF pay off at 100 TB. */
  def writeIndexed(model: Model, data: DataFrame, vecCol: String, path: String): Unit =
    assign(model, data, vecCol)
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Scan only the given cells of an indexed collection (partition
    * pruning — verify via .explain PartitionFilters). */
  def readCells(spark: SparkSession, path: String, cells: Seq[Int]): DataFrame =
    spark.read.parquet(path).where(col("cell").isin(cells: _*))

  /** Index-build statistics: (cell, n_vectors), the IVF posting-list
    * histogram (rebuild_index observability). */
  def buildStats(model: Model, data: DataFrame, vecCol: String): DataFrame =
    assign(model, data, vecCol)
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
      .orderBy("cell")
}
