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

  private def quantize(model: Model, v: Array[Double]): Array[Byte] = {
    val codes = new Array[Byte](model.dim)
    var i = 0
    while (i < model.dim) {
      val d = model.vdelta(i)
      val c =
        if (d == 0.0) 0L
        else math.round((v(i) - model.vmin(i)) / d)
      codes(i) = (math.max(0L, math.min(255L, c)) & 0xffL).toByte
      i += 1
    }
    codes
  }

  /** (id, codes: binary) — one byte per dimension. Partition-wise
    * imperative encode against the broadcast bounds. Numeric-id
    * contract, same as [[PqIndex.encode]]: string-PK collections
    * encode over a numeric surrogate column (the client derives
    * xxhash64(id)). */
  def encode(model: Model, data: DataFrame, idCol: String, vecCol: String): DataFrame = {
    require(data.schema(idCol).dataType != org.apache.spark.sql.types.StringType,
      "SQ codes key by numeric id: string-PK collections encode over a " +
        "numeric surrogate column (the client derives xxhash64(id))")
    val spark = data.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    data.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .as(Encoders.product[(Long, Array[Double])])
      .map { case (id, v) => (id, quantize(bc.value, v)) }(
        Encoders.product[(Long, Array[Byte])])
      .toDF("id", "codes")
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

    val partial = encoded.as(Encoders.product[(Long, Array[Byte])])
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

  /** nprobe cells per query + the asymmetric coded scan over the
    * candidates. nprobe = nlist degenerates to plain SQ search. */
  def search(model: Model, encoded: DataFrame, queries: Array[(Long, Array[Double])],
             kTop: Int, nprobe: Int): DataFrame =
    searchStored(model.ivf.kmeans.clusterCenters.map(_.toArray).zipWithIndex,
      model.sq, encoded, queries, kTop, nprobe)

  /** The serving path over PERSISTED artifacts: centroids as
    * (centroid, cell) pairs and bounds reconstructed from storage — no
    * KMeansModel object, no retraining. */
  def searchStored(centers: Seq[(Array[Double], Int)], sq: SqIndex.Model,
                   encoded: DataFrame, queries: Array[(Long, Array[Double])],
                   kTop: Int, nprobe: Int): DataFrame = {
    // distance tables are broadcast keyed BY query id; duplicate qids
    // would silently collapse to one entry (and one result group)
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids in batch")
    val spark = encoded.sparkSession
    import spark.implicits._

    // driver-side probe ranking: queries and centroids are both tiny
    val probes = queries.toSeq.flatMap { case (qid, qv) =>
      centers.map { case (c, cell) =>
        var d = 0.0
        var i = 0
        while (i < qv.length) { val df = qv(i) - c(i); d += df * df; i += 1 }
        (qid, cell, d)
      }.sortBy { case (_, cell, d) => (d, cell) }.take(nprobe)
        .map { case (q, cell, _) => (q, cell) }
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

    Ranked.topK(scored, kTop, asc = true)
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
                         nodeKey: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val cand = searchStored(centers, sq, encoded, queries, kTop * candMult, nprobe)
      .select(col("query_id"), col("id"))
    val qdf = queries.toSeq.toDF("query_id", "__qv")
    val exact = Ranked.candidateRows(data, idCol, vecCol, cand, nodeKey,
        bcast = true)
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"), VectorScore.l2(col("__v"), col("__qv")).as("__s"), col("id"))
    Ranked.topK(exact, kTop, asc = true)
  }
}
