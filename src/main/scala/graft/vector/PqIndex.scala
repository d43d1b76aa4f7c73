package graft.vector

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
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

  def train(data: DataFrame, vecCol: String, dim: Int, m: Int = 8, k: Int = 16,
            seed: Long = 42L, maxIter: Int = 10): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val sliced = data.select((0 until m).map(s =>
      array_to_vector(expr(s"transform(slice($vecCol, ${s * dsub + 1}, $dsub), x -> cast(x as double))"))
        .as(s"sub$s")): _*).cache()
    try {
      val codebooks = (0 until m).map { s =>
        val km = new KMeans().setK(k).setSeed(seed + s).setMaxIter(maxIter)
          .setFeaturesCol(s"sub$s").setPredictionCol("cell")
        km.fit(sliced.select(s"sub$s")).clusterCenters.map(_.toArray)
      }.toArray
      Model(m, k, dim, codebooks)
    } finally sliced.unpersist(blocking = false)
  }

  /** (id, codes: array<int>) — m codes per vector. Partition-wise
    * imperative encode against the broadcast codebooks. */
  def encode(model: Model, data: DataFrame, idCol: String, vecCol: String): DataFrame = {
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
            s += 1
          }
          (id, codes)
        }
      }(Encoders.product[(Long, Array[Int])]).toDF("id", "codes")
  }

  /** ADC search: approximate L2 top-k over the coded corpus.
    * @param queries (query_id, query vector) — the broadcast batch */
  def search(model: Model, encoded: DataFrame, queries: Array[(Long, Array[Double])],
             k: Int): DataFrame = {
    val spark = encoded.sparkSession
    val dsub = model.dsub
    // per query: table(sub)(code) = |q_sub - centroid|^2
    val tables = queries.map { case (qid, qv) =>
      (qid, Array.tabulate(model.m, model.k) { (s, c) =>
        val cent = model.codebooks(s)(c)
        var d = 0.0
        var i = 0
        while (i < dsub) { val diff = qv(s * dsub + i) - cent(i); d += diff * diff; i += 1 }
        d
      })
    }
    val bc = spark.sparkContext.broadcast(tables)
    val nq = queries.length

    val partial = encoded.as(Encoders.product[(Long, Array[Int])])
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

    partial.groupBy("query_id")
      .agg(TopKAgg.topk(col("__s"), col("id"), k, asc = true).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__r")))
      .select(col("query_id"), (col("__pos") + 1).cast("int").as("rank"),
        col("__r.id").as("id"), round(col("__r.score"), 4).as("score"))
      .orderBy("query_id", "rank")
  }

  /** The production PQ pattern: ADC narrows the corpus to `k * candMult`
    * candidates per query from codes alone, then the ORIGINAL vectors of
    * only those candidates are fetched (broadcast semi-join — the wide
    * vector column is read for a sliver of the corpus) and exactly
    * re-ranked. */
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
    exact.groupBy("query_id")
      .agg(TopKAgg.topk(col("__s"), col("id"), k, asc = true).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__r")))
      .select(col("query_id"), (col("__pos") + 1).cast("int").as("rank"),
        col("__r.id").as("id"), round(col("__r.score"), 4).as("score"))
      .orderBy("query_id", "rank")
  }
}
