package graft.vector

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Product quantization — the reference's PQ index family
  * (/root/reference/aiotcvectordb/model/index.py IVF_PQ / PQ params:
  * M subquantizers, nbits→K centroids).
  *
  * Train: the vector space is split into `m` contiguous subspaces and a
  * small k-means codebook is fit per subspace (MLlib, seeded).
  * Encode: each vector compresses to `m` small codes (dim·4 bytes →
  * m bytes at k<=256) — the memory-footprint play that makes billion-
  * vector corpora scannable.
  * Search: per query an ADC (asymmetric distance computation) table of
  * m×k partial distances is precomputed and broadcast; scanning a coded
  * row is just m table lookups + adds, no float vector math.
  */
object PqIndex {

  /** codebooks(sub)(code) = centroid of that subspace cell. */
  final case class Model(m: Int, k: Int, dim: Int,
                         codebooks: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
  }

  /** Codebook training runs LOCALLY over a bounded sample (the standard
    * PQ recipe — codebooks need ~100k vectors, not the corpus): one
    * Spark job collects the sample, then m seeded Lloyd's runs on the
    * driver. No per-subspace Spark jobs, deterministic regardless of
    * partitioning. */
  def train(data: DataFrame, vecCol: String, dim: Int, m: Int = 8, k: Int = 16,
            seed: Long = 42L, maxIter: Int = 10, sampleSize: Int = 20000): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val sample: Array[Array[Double]] = data
      .select(col(vecCol).cast("array<double>"))
      .limit(sampleSize)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= k, s"need at least k=$k sample vectors")
    val codebooks = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      localLloyd(sub, k, maxIter, seed + s)
    }
    Model(m, k, dim, codebooks)
  }

  /** Seeded Lloyd's k-means on a local sample (k and dsub are tiny). */
  private def localLloyd(points: Array[Array[Double]], k: Int, maxIter: Int,
                         seed: Long): Array[Array[Double]] = {
    val d = points.head.length
    val rnd = new scala.util.Random(seed)
    val centers = Array.tabulate(k)(i =>
      points((rnd.nextInt(points.length) + i) % points.length).clone())
    val assign = new Array[Int](points.length)
    var it = 0
    var moved = true
    while (it < maxIter && moved) {
      moved = false
      var p = 0
      while (p < points.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0; var i = 0
          while (i < d) { val df = points(p)(i) - centers(c)(i); dist += df * df; i += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        if (assign(p) != best) { assign(p) = best; moved = true }
        p += 1
      }
      val sums = Array.fill(k, d)(0.0)
      val counts = new Array[Int](k)
      var p2 = 0
      while (p2 < points.length) {
        val c = assign(p2); counts(c) += 1
        var i = 0
        while (i < d) { sums(c)(i) += points(p2)(i); i += 1 }
        p2 += 1
      }
      var c2 = 0
      while (c2 < k) {
        if (counts(c2) > 0) {
          var i = 0
          while (i < d) { centers(c2)(i) = sums(c2)(i) / counts(c2); i += 1 }
        }
        c2 += 1
      }
      it += 1
    }
    centers
  }

  /** Model → (sub, code, centroid) rows, the persistable form of the
    * codebooks (m·k tiny rows; m/k/dim ride in collection meta). */
  def codebooksDf(model: Model, spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    (for (s <- 0 until model.m; c <- 0 until model.k)
      yield (s, c, model.codebooks(s)(c).toSeq)).toDF("sub", "code", "centroid")
  }

  /** Rebuild a [[Model]] from persisted codebook rows — the serving
    * path of an index trained in an earlier session. */
  def modelFromDf(df: DataFrame, m: Int, k: Int, dim: Int): Model = {
    val books = Array.ofDim[Array[Double]](m, k)
    df.select(col("sub"), col("code"), col("centroid")).collect().foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    require(books.forall(_.forall(_ != null)), s"incomplete codebooks for m=$m k=$k")
    Model(m, k, dim, books)
  }

  /** (id, codes: array<int>, resid: double) — m codes per vector plus
    * the exact reconstruction error ||v - v̂||₂, which falls out of the
    * encode for FREE (the per-subspace best distances ARE the squared
    * subspace residuals; their sum is ||v - v̂||² because subspaces
    * partition the dimensions). resid is the per-row triangle-
    * inequality bound [[searchRadius]] gates on. Partition-wise
    * imperative encode against the broadcast codebooks. The typed
    * block pipeline keys by numeric id; string-PK collections encode
    * over a numeric surrogate column (the client derives
    * xxhash64(id)). */
  def encode(model: Model, data: DataFrame, idCol: String, vecCol: String): DataFrame = {
    require(data.schema(idCol).dataType != org.apache.spark.sql.types.StringType,
      "PQ codes key by numeric id: string-PK collections encode over a " +
        "numeric surrogate column (the client derives xxhash64(id))")
    val spark = data.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    data.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .as(Encoders.product[(Long, Array[Double])])
      .mapPartitions { it =>
        val mod = bc.value
        val dsub = mod.dsub
        it.map { case (id, v) =>
          val codes = new Array[Int](mod.m)
          var err = 0.0
          var s = 0
          while (s < mod.m) {
            var best = 0
            var bestD = Double.MaxValue
            var c = 0
            while (c < mod.k) {
              val cent = mod.codebooks(s)(c)
              var d = 0.0
              var i = 0
              while (i < dsub) {
                val diff = v(s * dsub + i) - cent(i)
                d += diff * diff
                i += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            codes(s) = best
            err += bestD
            s += 1
          }
          (id, codes, math.sqrt(err))
        }
      }(Encoders.product[(Long, Array[Int], Double)]).toDF("id", "codes", "resid")
  }

  /** Per-query ADC tables: table(sub)(code) = |q_sub - centroid|^2.
    * Shared by [[search]] and [[IvfPq.search]] so the scoring math can
    * never drift between the two. */
  private[vector] def adcTables(model: Model,
      queries: Array[(Long, Array[Double])]): Array[(Long, Array[Array[Double]])] = {
    val dsub = model.dsub
    queries.map { case (qid, qv) =>
      (qid, Array.tabulate(model.m, model.k) { (s, c) =>
        val cent = model.codebooks(s)(c)
        var d = 0.0
        var i = 0
        while (i < dsub) { val diff = qv(s * dsub + i) - cent(i); d += diff * diff; i += 1 }
        d
      })
    }
  }

  /** ADC search: approximate L2 top-k over the coded corpus.
    * `cosineScores` marks a cosine-built index (see
    * [[IvfSq.searchStored]] — gate-space L2 ranking, the emitted score
    * becomes the dequantized-cosine estimate 1 − d²/2, descending).
    * @param queries (query_id, query vector) — the broadcast batch,
    *                in GATE SPACE (unit-normalized for cosine) */
  def search(model: Model, encoded: DataFrame, queries: Array[(Long, Array[Double])],
             k: Int, cosineScores: Boolean = false): DataFrame = {
    val spark = encoded.sparkSession
    val bc = spark.sparkContext.broadcast(adcTables(model, queries))
    val nq = queries.length

    val partial = encoded.select(col("id"), col("codes"))
      .as(Encoders.product[(Long, Array[Int])])
      .mapPartitions { it =>
        val tabs = bc.value
        val heaps = Array.fill(nq)(new TopKBuffer(k, asc = true))
        it.foreach { case (id, codes) =>
          var j = 0
          while (j < nq) {
            val t = tabs(j)._2
            var d = 0.0
            var s = 0
            while (s < codes.length) { d += t(s)(codes(s)); s += 1 }
            heaps(j).insert(math.sqrt(d), id)
            j += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, j) =>
          h.sortedPairs.iterator.map { case (sc, id) =>
            (tabs(j)._1, sc, id.asInstanceOf[Long]) }
        }
      }(Encoders.product[(Long, Double, Long)]).toDF("query_id", "__s", "id")

    if (cosineScores)
      Ranked.topK(partial.select(col("query_id"),
        (lit(1.0) - col("__s") * col("__s") / 2).as("__s"), col("id")),
        k, asc = false)
    else Ranked.topK(partial, k, asc = true)
  }

  /** EXACT L2 radius search from the ADC scan — the same triangle-
    * inequality device as [[SqIndex.searchRadius]]: the ADC distance is
    * exactly ||q - v̂||₂ (the reconstruction concatenates the per-
    * subspace nearest centroids, and the ADC table sums those exact
    * subspace distances), so with the stored per-row resid,
    * `d(q,v) ≤ R ⟹ ADC ≤ R + resid`. One coded pass keeps the provable
    * ball superset, the original vectors of only the survivors are
    * exactly reranked and gated — the result EQUALS the FLAT
    * radius+limit route byte-for-byte at any m/k (a LOSSIER quantizer
    * only means larger resids, i.e. a wider-but-still-exact gate, never
    * a wrong answer). */
  /** The resid-gated ball-superset candidates (query_id, id) — the
    * shared gate scan of [[searchRadius]], public for the survivor-
    * fraction telemetry (how much a finer codebook narrows the gate). */
  def radiusCandidates(model: Model, encoded: DataFrame,
                       queries: Array[(Long, Array[Double])],
                       radius: Double): DataFrame = {
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids: results are keyed by query id")
    require(radius >= 0, s"negative L2 radius $radius")
    val spark = encoded.sparkSession
    val bc = spark.sparkContext.broadcast(adcTables(model, queries))
    val nq = queries.length
    encoded.select(col("id"), col("codes"), col("resid"))
      .as(Encoders.product[(Long, Array[Int], Double)])
      .mapPartitions { it =>
        val tabs = bc.value
        it.flatMap { case (id, codes, resid) =>
          val gate = Ranked.gateEps(radius + resid)
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](0)
          var j = 0
          while (j < nq) {
            val t = tabs(j)._2
            var d = 0.0
            var s = 0
            while (s < codes.length) { d += t(s)(codes(s)); s += 1 }
            if (math.sqrt(d) <= gate)
              out += ((tabs(j)._1, id))
            j += 1
          }
          out
        }
      }(Encoders.product[(Long, Long)]).toDF("query_id", "id")
  }

  /** `queries`/`radius` are GATE-SPACE; `rerank` overrides the
    * metric-space postlude for a cosine-built index
    * ([[Ranked.Rerank]] — null keeps the historical L2 plan). */
  def searchRadius(model: Model, encoded: DataFrame,
                   data: DataFrame, idCol: String, vecCol: String,
                   queries: Array[(Long, Array[Double])], radius: Double,
                   k: Int,
                   nodeKey: Option[org.apache.spark.sql.Column] = None,
                   rerank: Ranked.Rerank = null): DataFrame =
    Ranked.exactRerank(data, idCol, vecCol,
      radiusCandidates(model, encoded, queries, radius),
      queries, k, Some(radius), nodeKey, rerank)

  /** EXACT L2 top-k from the ADC scan — the kth-upper-bound
    * certificate, identical math to [[SqIndex.searchTopKExact]] (see
    * there for the proof sketch): pass 1 bounds the true kth distance
    * by U = kth smallest (ADC + resid), pass 2 keeps the provable
    * superset ADC − resid ≤ U, the exact rerank closes. Answers the
    * candMult-rerank's "how big a shortlist is enough?" with a
    * certificate instead of a guess — byte-equal to FLAT exact KNN at
    * any m/k (a coarse codebook only widens the candidate set). */
  def searchTopKExact(model: Model, encoded: DataFrame,
                      data: DataFrame, idCol: String, vecCol: String,
                      queries: Array[(Long, Array[Double])], k: Int,
                      nodeKey: Option[org.apache.spark.sql.Column] = None,
                      rerank: Ranked.Rerank = null): DataFrame = {
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate query ids: results are keyed by query id")
    val spark = encoded.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(adcTables(model, queries))
    val nq = queries.length

    val partialU = encoded.select(col("id"), col("codes"), col("resid"))
      .as(Encoders.product[(Long, Array[Int], Double)])
      .mapPartitions { it =>
        val tabs = bc.value
        val heaps = Array.fill(nq)(new TopKBuffer(k, asc = true))
        it.foreach { case (id, codes, resid) =>
          var j = 0
          while (j < nq) {
            val t = tabs(j)._2
            var d = 0.0
            var s = 0
            while (s < codes.length) { d += t(s)(codes(s)); s += 1 }
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

    val cand = encoded.select(col("id"), col("codes"), col("resid"))
      .as(Encoders.product[(Long, Array[Int], Double)])
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
            var s = 0
            while (s < codes.length) { d += t(s)(codes(s)); s += 1 }
            if (math.sqrt(d) - resid <= Ranked.gateEps(u))
              out += ((qid, id))
            j += 1
          }
          out
        }
      }(Encoders.product[(Long, Long)]).toDF("query_id", "id")

    // the gate-space superset contains the metric-space top-k by
    // monotonicity (SqIndex.searchTopKExact's note) — `rerank` only
    // moves the postlude's scoring space
    Ranked.exactRerank(data, idCol, vecCol, cand, queries, k,
      radius = None, nodeKey, rerank)
  }

  /** The production PQ pattern: ADC narrows the corpus to `k * candMult`
    * candidates per query from codes alone, then the ORIGINAL vectors of
    * only those candidates are fetched (broadcast semi-join — the wide
    * vector column is read for a sliver of the corpus) and exactly
    * re-ranked. */
  def searchRerank(model: Model, encoded: DataFrame,
                   data: DataFrame, idCol: String, vecCol: String,
                   queries: Array[(Long, Array[Double])], k: Int,
                   candMult: Int = 10,
                   nodeKey: Option[org.apache.spark.sql.Column] = None,
                   rerank: Ranked.Rerank = null): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val rr = if (rerank == null) Ranked.Rerank("l2", queries, None) else rerank
    val m = VectorMetric(rr.metric)
    val cand = search(model, encoded, queries, k * candMult)
      .select(col("query_id"), col("id"))
    val qdf = rr.queries.toSeq.toDF("query_id", "__qv")
    val exact = Ranked.candidateRows(data, idCol, vecCol, cand, nodeKey,
        bcast = true)
      .join(broadcast(qdf), "query_id")
      .select(col("query_id"),
        VectorScore.score(m.name, col("__v"), col("__qv")).as("__s"), col("id"))
    Ranked.topK(exact, k, asc = !m.largerIsBetter)
  }
}
