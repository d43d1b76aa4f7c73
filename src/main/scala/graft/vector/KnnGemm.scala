package graft.vector

import breeze.linalg.DenseMatrix

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Block-matrix exact KNN for LARGE query batches.
  *
  * The expression path ([[KnnSearch.topK]]) evaluates one score per
  * (row, query) inside codegen — ideal up to ~tens of queries. When the
  * query batch is hundreds-to-thousands (offline retrieval, dedup
  * sweeps), per-element overhead dominates; this path multiplies a
  * corpus block against the whole query matrix with BLAS (breeze →
  * dev.ludovic.netlib) inside `mapPartitions`, amortizing to a dgemm.
  *
  * Same distribution shape as the expression path: queries broadcast
  * (as a local matrix), corpus never shuffles, per-partition bounded
  * heaps, one k-merge shuffle. Scores may differ from the sequential
  * path in the last ulp (summation order), so this feeds
  * throughput-bound pipelines, not the bit-exact oracle queries.
  * Numeric (long-castable) ids only.
  */
object KnnGemm {

  /** @param queries (query_id, unit query vector as doubles) — the RPC
    *                batch, small enough to ship to every task
    * @return (query_id, rank, id, score) like [[KnnSearch.topK]] */
  def topKGemm(data: DataFrame, idCol: String, vecCol: String,
               queries: Array[(Long, Array[Double])], metric: String, k: Int,
               blockSize: Int = 1024): DataFrame = {
    require(queries.nonEmpty, "empty query batch")
    val m = VectorMetric(metric)
    val spark = data.sparkSession
    val dim = queries.head._2.length
    val nq = queries.length

    // d x q matrix (queries as columns) + per-query norms
    val qMat = new DenseMatrix[Double](dim, nq)
    val qNorms = new Array[Double](nq)
    queries.zipWithIndex.foreach { case ((_, v), j) =>
      var s = 0.0
      var i = 0
      while (i < dim) { qMat(i, j) = v(i); s += v(i) * v(i); i += 1 }
      qNorms(j) = math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((qMat, qNorms, queries.map(_._1)))

    val typed = data.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .as(Encoders.product[(Long, Array[Double])])

    val partial = typed.mapPartitions { it =>
      val (qm, qn, qids) = bc.value
      val heaps = Array.fill(nq)(new TopKBuffer(k, !m.largerIsBetter))
      val blockIds = new Array[Long](blockSize)
      val block = new DenseMatrix[Double](blockSize, dim)
      var fill = 0

      def flush(): Unit = if (fill > 0) {
        val x = if (fill == blockSize) block else block(0 until fill, ::).copy
        val scores = x * qm // (fill x dim) * (dim x nq) -> BLAS dgemm
        var r = 0
        while (r < fill) {
          // row norm (for cosine/l2 corrections)
          var rn = 0.0
          var c = 0
          while (c < dim) { val v = block(r, c); rn += v * v; c += 1 }
          var j = 0
          while (j < nq) {
            val dot = scores(r, j)
            val s = m match {
              case VectorMetric.InnerProduct => dot
              case VectorMetric.Cosine => dot / (math.sqrt(rn) * qn(j))
              case VectorMetric.L2 =>
                // |x-q|^2 = |x|^2 - 2x.q + |q|^2 (clamped for fp noise)
                math.sqrt(math.max(0.0, rn - 2.0 * dot + qn(j) * qn(j)))
            }
            heaps(j).insert(s, blockIds(r))
            j += 1
          }
          r += 1
        }
        fill = 0
      }

      it.foreach { case (id, v) =>
        blockIds(fill) = id
        var i = 0
        while (i < dim) { block(fill, i) = v(i); i += 1 }
        fill += 1
        if (fill == blockSize) flush()
      }
      flush()

      heaps.iterator.zipWithIndex.flatMap { case (h, j) =>
        h.sortedPairs.iterator.map { case (s, id) =>
          (qids(j), s, id.asInstanceOf[Long])
        }
      }
    }(Encoders.product[(Long, Double, Long)]).toDF("query_id", "__s", "id")

    Ranked.topK(partial, k, asc = !m.largerIsBetter)
  }
}
