package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the remaining member of the reference's
  * "IVF series" (/root/reference/aiotcvectordb/model/collection.py:
  * "IVF series: nprobe, specifying the number of units to be queried";
  * Tencent VectorDB's series is IVF_FLAT / IVF_PQ / IVF_SQ8: SQ8
  * compresses each float32 dimension to one uint8 code against
  * per-dimension corpus min/max bounds — 4x smaller than the raw
  * vectors with near-lossless ranking, the middle ground between FLAT
  * (exact, full width) and PQ (m bytes, lossy).
  *
  * Train: one distributed per-dimension (min, max) aggregate — a
  * posexplode + groupBy(pos) whose output is `dim` rows regardless of
  * corpus size.
  * Encode: code[i] = round((v[i] - min[i]) / step[i]) with
  * step = (max - min) / 255, clamped to [0, 255] so vectors upserted
  * after training (possibly outside the trained bounds) stay encodable.
  * Search: asymmetric — the query stays float; a per-query table of
  * dim x 256 partial squared distances is precomputed and broadcast
  * (the same ADC trick as [[PqIndex]] with dsub = 1, k = 256), so
  * scanning a coded row is dim table lookups + adds.
  */
object SqIndex {

  /** Per-dimension quantization bounds. `vdelta(i) = 0` marks a
    * constant dimension (every code decodes to `vmin(i)`). */
  final case class Model(dim: Int, vmin: Array[Double], vdelta: Array[Double])

  /** Distributed per-dimension min/max: the shuffle moves `dim`
    * partial-agg rows per task, never vectors. */
  def train(data: DataFrame, vecCol: String): Model = {
    val rows = data
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    require(rows.nonEmpty, "cannot train SQ bounds on an empty corpus")
    val dim = rows.map(_.getInt(0)).max + 1
    // ragged input (some vectors shorter than dim): a short vector
    // contributes to the LOW positions only, so the per-position
    // contribution counts differ — whereas the position set itself is
    // always the contiguous 0..dim-1 (a row-count check can never
    // fire). Those vectors' missing dims would encode as code 0 and
    // decode to vmin, corrupting ranking with no error; fail fast
    // like modelFromDf.
    require(rows.map(_.getLong(3)).distinct.length == 1,
      s"ragged corpus: per-dimension counts differ across the $dim dimensions " +
        "in SQ training (vectors of unequal length)")
    val vmin = new Array[Double](dim)
    val vdelta = new Array[Double](dim)
    rows.foreach { r =>
      val p = r.getInt(0)
      vmin(p) = r.getDouble(1)
      vdelta(p) = (r.getDouble(2) - r.getDouble(1)) / 255.0
    }
    Model(dim, vmin, vdelta)
  }

  /** Model → (pos, vmin, vdelta) rows, the persistable form of the
    * bounds (`dim` tiny rows; dim itself rides in collection meta).
    * vdelta is persisted VERBATIM — synthesizing vmax and re-deriving
    * (vmax-vmin)/255 at load drifts 1 ulp on ~0.02% of IEEE (lo,hi)
    * pairs, which would make a later session decode with a slightly
    * different quantizer than the one that coded the segments. */
  def boundsDf(model: Model, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (0 until model.dim)
      .map(i => (i, model.vmin(i), model.vdelta(i)))
      .toDF("pos", "vmin", "vdelta")
  }

  /** Rebuild a [[Model]] from persisted bounds rows — the serving path
    * of an index trained in an earlier session. Bit-exact for the
    * (pos, vmin, vdelta) form; bounds persisted by the earlier
    * (pos, vmin, vmax) format still load via the re-derivation they
    * were written under. */
  def modelFromDf(df: DataFrame, dim: Int): Model = {
    val vmin = new Array[Double](dim)
    val vdelta = new Array[Double](dim)
    val seen = new Array[Boolean](dim)
    val hasDelta = df.columns.contains("vdelta")
    val third = if (hasDelta) col("vdelta") else col("vmax")
    df.select(col("pos"), col("vmin"), third).collect().foreach { r =>
      val p = r.getInt(0)
      vmin(p) = r.getDouble(1)
      vdelta(p) =
        if (hasDelta) r.getDouble(2)
        else (r.getDouble(2) - r.getDouble(1)) / 255.0
      seen(p) = true
    }
    require(seen.forall(identity), s"incomplete SQ bounds for dim=$dim")
    Model(dim, vmin, vdelta)
  }

  /** Quantize one vector AND report the exact reconstruction error
    * `resid = ||v - decode(codes)||₂` — the per-row bound the exact
    * radius gate rides on ([[searchRadius]]): by the triangle
    * inequality |d(q,v) - d(q,v̂)| ≤ resid, EXACTLY, including for
    * vectors outside the trained bounds (clamped codes just mean a
    * larger stored resid, never a broken bound). */
  private def quantize(model: Model, v: Array[Double]): (Array[Byte], Double) = {
    val codes = new Array[Byte](model.dim)
    var err = 0.0
    var i = 0
    while (i < model.dim) {
      val d = model.vdelta(i)
      val c =
        if (d == 0.0) 0L
        else math.round((v(i) - model.vmin(i)) / d)
      val cc = math.max(0L, math.min(255L, c))
      codes(i) = (cc & 0xffL).toByte
      val diff = v(i) - (model.vmin(i) + cc * d)
      err += diff * diff
      i += 1
    }
    (codes, math.sqrt(err))
  }

  /** (id, codes: binary, resid: double) — one byte per dimension plus
    * the exact per-row reconstruction error (8 bytes/row buys the
    * triangle-inequality gate that makes [[searchRadius]] EXACT from
    * the coded scan). Partition-wise imperative encode against the
    * broadcast bounds. Numeric-id contract, same as
    * [[PqIndex.encode]]: string-PK collections encode over a numeric
    * surrogate column (the client derives xxhash64(id)). */
  def encode(model: Model, data: DataFrame, idCol: String, vecCol: String): DataFrame = {
    require(data.schema(idCol).dataType != org.apache.spark.sql.types.StringType,
      "SQ codes key by numeric id: string-PK collections encode over a " +
        "numeric surrogate column (the client derives xxhash64(id))")
    val spark = data.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    data.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .as(Encoders.product[(Long, Array[Double])])
      .map { case (id, v) =>
        val (codes, resid) = quantize(bc.value, v)
        (id, codes, resid)
      }(Encoders.product[(Long, Array[Byte], Double)])
      .toDF("id", "codes", "resid")
  }

  /** Per-query lookup tables: table(i)(c) = (q_i - decode(i, c))^2.
    * dim x 256 doubles per query — broadcastable for any realistic
    * query batch. */
  private[vector] def distTables(model: Model,
      queries: Array[(Long, Array[Double])]): Array[(Long, Array[Array[Double]])] =
    queries.map { case (qid, qv) =>
      (qid, Array.tabulate(model.dim, 256) { (i, c) =>
        val diff = qv(i) - (model.vmin(i) + c * model.vdelta(i))
        diff * diff
      })
    }

  /** Asymmetric L2 top-k over the coded corpus: per-partition bounded
    * heaps, then the shared [[Ranked.topK]] postlude — `partial_topk`
    * before the only Exchange, exactly like the FLAT path. */
  def search(model: Model, encoded: DataFrame, queries: Array[(Long, Array[Double])],
             k: Int): DataFrame = {
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids: results are keyed by query id")
    val spark = encoded.sparkSession
    val bc = spark.sparkContext.broadcast(distTables(model, queries))
    val nq = queries.length

    val partial = encoded.select(col("id"), col("codes"))
      .as(Encoders.product[(Long, Array[Byte])])
      .mapPartitions { it =>
        val tabs = bc.value
        val heaps = Array.fill(nq)(new TopKBuffer(k, asc = true))
        it.foreach { case (id, codes) =>
          var j = 0
          while (j < nq) {
            val t = tabs(j)._2
            var d = 0.0
            var i = 0
            while (i < codes.length) { d += t(i)(codes(i) & 0xff); i += 1 }
            heaps(j).insert(math.sqrt(d), id)
            j += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, j) =>
          h.sortedPairs.iterator.map { case (sc, id) =>
            (tabs(j)._1, sc, id.asInstanceOf[Long]) }
        }
      }(Encoders.product[(Long, Double, Long)]).toDF("query_id", "__s", "id")

    Ranked.topK(partial, k, asc = true)
  }

  /** EXACT L2 radius search served from the coded scan — the
    * triangle-inequality gate over the stored per-row reconstruction
    * error: for any row, |d(q,x) - d(q,x̂)| ≤ resid where d(q,x̂) is
    * exactly the ADC distance, so `d(q,x) ≤ R  ⟹  ADC ≤ R + resid`.
    * One pass over the codes keeps that PROVABLE SUPERSET of the true
    * ball (typically a sliver — resid is small for in-bounds rows),
    * then the original vectors of only the survivors are fetched and
    * the exact `d ≤ R` gate + bounded top-k run on true L2. The result
    * EQUALS the FLAT radius+limit route byte-for-byte — a quantized
    * scan with an oracle that never needs to know the quantizer
    * existed (contrast the graph/cell radius routes, whose beams
    * navigate a proxy WITHOUT a per-row bound and must escalate with
    * measured recall). A tiny epsilon widens the gate against
    * floating-point rounding; widening only grows the superset, the
    * exact rerank gate is unaffected. */
  /** The resid-gated ball-superset candidates (query_id, id) — the
    * shared gate scan of [[searchRadius]], public so telemetry can
    * measure the survivor fraction the certificate admits (the work
    * the exact rerank pays for). */
  def radiusCandidates(model: Model, encoded: DataFrame,
                       queries: Array[(Long, Array[Double])],
                       radius: Double): DataFrame = {
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids: results are keyed by query id")
    require(radius >= 0, s"negative L2 radius $radius")
    val spark = encoded.sparkSession
    val bc = spark.sparkContext.broadcast(distTables(model, queries))
    val nq = queries.length
    encoded.select(col("id"), col("codes"), col("resid"))
      .as(Encoders.product[(Long, Array[Byte], Double)])
      .mapPartitions { it =>
        val tabs = bc.value
        it.flatMap { case (id, codes, resid) =>
          val gate = Ranked.gateEps(radius + resid)
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](0)
          var j = 0
          while (j < nq) {
            val t = tabs(j)._2
            var d = 0.0
            var i = 0
            while (i < codes.length) { d += t(i)(codes(i) & 0xff); i += 1 }
            if (math.sqrt(d) <= gate)
              out += ((tabs(j)._1, id))
            j += 1
          }
          out
        }
      }(Encoders.product[(Long, Long)]).toDF("query_id", "id")
  }

  /** `queries`/`radius` are GATE-SPACE (the space the codes quantize:
    * raw vectors for an l2-built index, unit-normalized for cosine);
    * `rerank` overrides the metric-space postlude ([[Ranked.Rerank]] —
    * null keeps the historical L2 plan byte-identical). */
  def searchRadius(model: Model, encoded: DataFrame,
                   data: DataFrame, idCol: String, vecCol: String,
                   queries: Array[(Long, Array[Double])], radius: Double,
                   k: Int,
                   nodeKey: Option[org.apache.spark.sql.Column] = None,
                   rerank: Ranked.Rerank = null): DataFrame =
    Ranked.exactRerank(data, idCol, vecCol,
      radiusCandidates(model, encoded, queries, radius),
      queries, k, Some(radius), nodeKey, rerank)

  /** EXACT L2 top-k from the coded scan — the kth-upper-bound
    * certificate (the top-k sibling of [[searchRadius]]'s ball gate):
    *
    *  pass 1: every row's distance upper bound u = ADC + resid; a
    *          bounded heap keeps each query's k smallest u, whose
    *          WORST value U satisfies d_k(true) ≤ U (each true
    *          distance is ≤ its own u, so the true kth ≤ the kth
    *          smallest upper bound);
    *  pass 2: keep rows with ADC − resid ≤ U — every true top-k
    *          member has d ≤ d_k ≤ U and ADC − resid ≤ d, so the
    *          survivors PROVABLY contain the answer;
    *  rerank: exact L2 over the survivors' original vectors.
    *
    * Result ≡ FLAT exact KNN byte-for-byte at any quantizer fidelity —
    * the candMult-rerank's "how big a shortlist is enough?" question
    * answered by a certificate instead of a guess. Two passes over the
    * 1-byte/dim codes + a sliver of raw vectors; queries with fewer
    * than k rows get U = +∞ (the gate keeps everything, the rerank
    * returns what exists). The per-query U collect is query-batch-
    * bounded (one double per query). */
  def searchTopKExact(model: Model, encoded: DataFrame,
                      data: DataFrame, idCol: String, vecCol: String,
                      queries: Array[(Long, Array[Double])], k: Int,
                      nodeKey: Option[org.apache.spark.sql.Column] = None,
                      rerank: Ranked.Rerank = null): DataFrame = {
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids: results are keyed by query id")
    val spark = encoded.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(distTables(model, queries))
    val nq = queries.length

    // pass 1: per-partition bounded heaps on u = ADC + resid (RAW —
    // TopKAgg emits unrounded scores; rounding U would break the bound)
    val partialU = encoded.select(col("id"), col("codes"), col("resid"))
      .as(Encoders.product[(Long, Array[Byte], Double)])
      .mapPartitions { it =>
        val tabs = bc.value
        val heaps = Array.fill(nq)(new TopKBuffer(k, asc = true))
        it.foreach { case (id, codes, resid) =>
          var j = 0
          while (j < nq) {
            val t = tabs(j)._2
            var d = 0.0
            var i = 0
            while (i < codes.length) { d += t(i)(codes(i) & 0xff); i += 1 }
            heaps(j).insert(math.sqrt(d) + resid, id)
            j += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, j) =>
          h.sortedPairs.iterator.map { case (sc, id) =>
            (tabs(j)._1, sc, id.asInstanceOf[Long]) }
        }
      }(Encoders.product[(Long, Double, Long)]).toDF("query_id", "__u", "id")
    val ubRows = partialU.groupBy("query_id")
      .agg(TopKAgg.topk(col("__u"), col("id"), k, asc = true).as("__t"))
      .select(col("query_id"), element_at(col("__t"), -1).getField("score").as("__U"),
        size(col("__t")).as("__n"))
      .collect()
    val U: Map[Long, Double] = ubRows.map { r =>
      r.getLong(0) -> (if (r.getInt(2) < k) Double.PositiveInfinity
                       else r.getDouble(1))
    }.toMap
    val bcU = spark.sparkContext.broadcast(U)

    // pass 2: the certificate gate ADC − resid ≤ U (epsilon-widened
    // against fp rounding — widening only grows the candidate set)
    val cand = encoded.select(col("id"), col("codes"), col("resid"))
      .as(Encoders.product[(Long, Array[Byte], Double)])
      .mapPartitions { it =>
        val tabs = bc.value
        val us = bcU.value
        it.flatMap { case (id, codes, resid) =>
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](0)
          var j = 0
          while (j < nq) {
            val qid = tabs(j)._1
            val u = us.getOrElse(qid, Double.PositiveInfinity)
            val t = tabs(j)._2
            var d = 0.0
            var i = 0
            while (i < codes.length) { d += t(i)(codes(i) & 0xff); i += 1 }
            if (math.sqrt(d) - resid <= Ranked.gateEps(u))
              out += ((qid, id))
            j += 1
          }
          out
        }
      }(Encoders.product[(Long, Long)]).toDF("query_id", "id")

    // gate-space L2 and the stored metric rank monotonically (cosine =
    // 1 − d²/2 on the unit sphere), so the gate-space kth-upper-bound
    // superset provably contains the metric-space top-k too — the
    // `rerank` override only changes the postlude's scoring space
    Ranked.exactRerank(data, idCol, vecCol, cand, queries, k,
      radius = None, nodeKey, rerank)
  }

  /** The production SQ pattern (same shape as [[PqIndex.searchRerank]]):
    * the coded scan narrows to `k * candMult` candidates per query,
    * then the ORIGINAL vectors of only that sliver are fetched
    * (broadcast semi-join) and exactly re-ranked by L2. */
  def searchRerank(model: Model, encoded: DataFrame,
                   data: DataFrame, idCol: String, vecCol: String,
                   queries: Array[(Long, Array[Double])], k: Int,
                   candMult: Int = 10): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val cand = search(model, encoded, queries, k * candMult)
      .select(col("query_id"), col("id"))
    val qdf = queries.toSeq.toDF("query_id", "__qv")
    val exact = data
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
      .join(broadcast(cand), "id")
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"), VectorScore.l2(col("__v"), col("__qv")).as("__s"), col("id"))
    Ranked.topK(exact, k, asc = true)
  }
}

/** IVF_SQ8 — coarse cells prune the scan (nprobe of nlist partitions),
  * SQ8 codes shrink the surviving sliver 4x. Same composition shape as
  * [[IvfPq]]; the quantizer trades PQ's m-byte codes for one byte per
  * dimension and a far lower quantization error (RecallProbe measures
  * the curve). */
object IvfSq {

  final case class Model(ivf: IvfIndex.Model, sq: SqIndex.Model)

  def train(data: DataFrame, vecCol: String, nlist: Int = 16,
            seed: Long = 42L): Model =
    Model(
      IvfIndex.train(data, vecCol, nlist, seed, maxIter = 10),
      SqIndex.train(data, vecCol))

  /** (id, cell, codes) — the on-disk representation, cell-partitioned
    * at scale so nprobe pruning happens at file listing. */
  def encode(model: Model, data: DataFrame, idCol: String, vecCol: String): DataFrame =
    encodeAssigned(model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex,
      model.sq, data, idCol, vecCol)

  /** [[encode]] against persisted artifacts (stored centroid pairs +
    * reconstructed bounds) — the maintenance path's encoder: an upsert
    * batch is coded against the STORED model, never a retrained one. */
  def encodeAssigned(centers: Seq[(Array[Double], Int)], sq: SqIndex.Model,
                     data: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val cells = data.select(col(idCol).cast("long").as("id"),
      IvfIndex.assignExpr(centers.map { case (c, i) => (c.toSeq, i) },
        col(vecCol)).as("cell"))
    SqIndex.encode(sq, data, idCol, vecCol).join(cells, "id")
  }

  /** Per-cell ball radii for the exact radius route — delegates to
    * [[IvfIndex.cellStats]] (the bound lives at the coarse-cell layer
    * and is shared with IVF_PQ). */
  def cellStats(centers: Seq[(Array[Double], Int)], data: DataFrame,
                vecCol: String): DataFrame =
    IvfIndex.cellStats(centers, data, vecCol)

  /** EXACT L2 radius search from the cell-partitioned coded layout —
    * the [[SqIndex.searchRadius]] triangle gate composed with
    * [[cellStats]] cell pruning: per query, only cells with
    * ||q - c_j|| ≤ R + rho_j survive (a driver-side check over the
    * tiny centroid set), the surviving cells' partitions are pruned at
    * file listing (isin PartitionFilter), the per-row resid gate keeps
    * the provable ball superset, and the exact rerank gates on true
    * L2. Result ≡ FLAT radius+limit byte-for-byte at ANY nlist —
    * pruning is certificate-backed, not recall-traded. `stats` rows
    * are (cell, rho) (≤ nlist of them — collected driver-side, a
    * bounded model like the centroids themselves); cells with no
    * stats row are empty and prune automatically. */
  def searchStoredRadius(centers: Seq[(Array[Double], Int)], stats: DataFrame,
                         sq: SqIndex.Model, encoded: DataFrame,
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

    // cell certificate: shared rho fold + probe policy (IvfIndex) —
    // the IVF_SQ8 and IVF_PQ arms must not drift apart. An empty probe
    // set (no cell can hold any ball member) flows through as an empty
    // candidate frame: the exactRerank postlude keeps the output
    // schema — including a string-PK id column — identical to the
    // non-empty path's.
    val probes = IvfIndex.radiusProbes(centers,
      IvfIndex.collectCellRho(stats), queries, radius)
    val probesDf = probes.toDF("query_id", "cell")
    val bc = spark.sparkContext.broadcast(SqIndex.distTables(sq, queries).toMap)

    val probedCells = probes.map(_._2).distinct
    val cand = encoded.where(col("cell").isin(probedCells: _*))
      .join(broadcast(probesDf), "cell")
      .select(col("query_id"), col("id"), col("codes"), col("resid"))
      .as(Encoders.product[(Long, Long, Array[Byte], Double)])
      .mapPartitions { it =>
        val tabs = bc.value
        it.flatMap { case (qid, id, codes, resid) =>
          val t = tabs(qid)
          var d = 0.0; var i = 0
          while (i < codes.length) { d += t(i)(codes(i) & 0xff); i += 1 }
          if (math.sqrt(d) <= Ranked.gateEps(radius + resid)) Some((qid, id))
          else None
        }
      }(Encoders.product[(Long, Long)]).toDF("query_id", "id")

    Ranked.exactRerank(data, idCol, vecCol, cand, queries, k,
      Some(radius), nodeKey, rerank)
  }

  /** nprobe cells per query + the asymmetric coded scan over the
    * candidates. nprobe = nlist degenerates to plain SQ search. */
  def search(model: Model, encoded: DataFrame, queries: Array[(Long, Array[Double])],
             kTop: Int, nprobe: Int): DataFrame =
    searchStored(model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex,
      model.sq, encoded, queries, kTop, nprobe)

  /** The serving path over PERSISTED artifacts: centroids as
    * (centroid, cell) pairs and bounds reconstructed from storage — no
    * KMeansModel object, no retraining. */
  /** `cosineScores` marks a cosine-built index (codes over unit-
    * normalized vectors, gate-space queries): ranking stays the ADC
    * scan's gate-space L2 heap (exactly monotone in cosine on the unit
    * sphere), and the EMITTED score becomes the dequantized-cosine
    * estimate 1 − d²/2, descending — the index's native approximate
    * score in its stored metric, the same fidelity class as the l2
    * arm's dequantized distance. */
  def searchStored(centers: Seq[(Array[Double], Int)], sq: SqIndex.Model,
                   encoded: DataFrame, queries: Array[(Long, Array[Double])],
                   kTop: Int, nprobe: Int,
                   cosineScores: Boolean = false): DataFrame = {
    // distance tables are broadcast keyed BY query id; duplicate qids
    // would silently collapse to one entry (and one result group)
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids in batch")
    val spark = encoded.sparkSession
    import spark.implicits._

    // driver-side probe ranking (queries and centroids are both tiny)
    // through the ONE probe-order definition (IvfIndex.probeOrder —
    // shared with IVF_PQ serving and the nprobe calibration)
    val probes = queries.toSeq.flatMap { case (qid, qv) =>
      IvfIndex.probeOrder(centers, qv).take(nprobe).map(cell => (qid, cell))
    }
    val probesDf = probes.toDF("query_id", "cell")

    val bc = spark.sparkContext.broadcast(SqIndex.distTables(sq, queries).toMap)

    // the probed-cell union is driver-known — pushing it as an In()
    // filter prunes the cell-partitioned code table at FILE LISTING
    // (PartitionFilters), instead of scanning every cell into the join
    val probedCells = probes.map(_._2).distinct
    val cand = encoded.where(col("cell").isin(probedCells: _*))
      .join(broadcast(probesDf), "cell")
      .select(col("query_id"), col("id"), col("codes"))
      .as(Encoders.product[(Long, Long, Array[Byte])])
    val scored = cand.mapPartitions { it =>
      val tabs = bc.value
      it.map { case (qid, id, codes) =>
        val t = tabs(qid)
        var d = 0.0
        var i = 0
        while (i < codes.length) { d += t(i)(codes(i) & 0xff); i += 1 }
        (qid, math.sqrt(d), id)
      }
    }(Encoders.product[(Long, Double, Long)]).toDF("query_id", "__s", "id")

    if (cosineScores)
      Ranked.topK(scored.select(col("query_id"),
        (lit(1.0) - col("__s") * col("__s") / 2).as("__s"), col("id")),
        kTop, asc = false)
    else Ranked.topK(scored, kTop, asc = true)
  }

  /** [[searchStoredRerank]] from a trained model (convenience for
    * probes/tests; the serving path uses the Stored form). */
  def searchRerank(model: Model, encoded: DataFrame,
                   data: DataFrame, idCol: String, vecCol: String,
                   queries: Array[(Long, Array[Double])], kTop: Int,
                   nprobe: Int, candMult: Int = 10): DataFrame =
    searchStoredRerank(model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex,
      model.sq, encoded, data, idCol, vecCol, queries, kTop, nprobe, candMult)

  /** The production IVF_SQ8 pattern: cells prune, the coded scan
    * narrows to `kTop * candMult` candidates, the original vectors of
    * only that sliver are exactly re-ranked by L2 (same shape as
    * [[IvfPq.searchStoredRerank]]). */
  def searchStoredRerank(centers: Seq[(Array[Double], Int)], sq: SqIndex.Model,
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
    val cand = searchStored(centers, sq, encoded, queries, kTop * candMult, nprobe)
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
