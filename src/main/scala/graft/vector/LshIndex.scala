package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane (signed random projection) LSH for cosine ANN —
  * the Spark-native scale path for the reference's graph/ANN indexes
  * (SURVEY.md §6: HNSW's sequential build doesn't distribute; banded
  * sign-LSH gives the same "candidate bucket then re-rank" shape with
  * joins only).
  *
  * Signature: bit i = sign(v · plane_i), planes drawn from a seeded
  * RNG (deterministic). Banded buckets: a candidate pair must share one
  * 4-bit band, so candidate generation is an equi-join on (band, value)
  * — never a cross product. Final ranking is exact cosine over the
  * candidate set only.
  */
object LshIndex {

  /** Deterministic hyperplanes: nBits × dim standard normals. */
  def planes(nBits: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Append a `sig` long column (nBits-bit signature). Each bit is one
    * codegen'd [[VectorScore]] inner product against a literal plane. */
  def withSignature(df: DataFrame, vecCol: String, nBits: Int, dim: Int,
                    seed: Long = 42L): DataFrame = {
    val sig = planes(nBits, dim, seed).zipWithIndex.map { case (p, i) =>
      when(VectorScore.ip(col(vecCol), typedLit(p)) >= 0.0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }.reduce[Column](_ bitwiseOR _)
    df.withColumn("sig", sig)
  }

  /** Vector dimension from a frame's first row (None when empty);
    * hyperplanes must span the FULL dimension or signatures silently
    * use a prefix of each vector and recall degrades with no error. */
  private[graft] def deriveDimOpt(df: DataFrame, vecCol: String): Option[Int] =
    // skip null vectors (a product state: zero-token docs store null
    // embeddings) — giving up on a null FIRST row would silently build
    // 1-dim planes and collapse recall
    df.where(col(vecCol).isNotNull).select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0))

  /** Dimension for LSH planes: first non-empty of the given frames;
    * 1 when all are empty (any plane set works — every downstream
    * result is empty anyway, and empty input must not throw). */
  private[graft] def deriveDim(frames: (DataFrame, String)*): Int =
    frames.iterator.flatMap { case (d, c) => deriveDimOpt(d, c) }
      .nextOption().getOrElse(1)

  /** Banded bucket rows (id-or-__i, b, v) for one side of the
    * candidate join. */
  private def banded(df: DataFrame, id: Column, vec: Column,
                     nBits: Int, bands: Int, dim: Int, seed: Long): DataFrame = {
    val bandBits = nBits / bands
    val mask = (1L << bandBits) - 1
    val bandCol = (b: Int) =>
      struct(lit(b).as("b"), shiftright(col("sig"), b * bandBits).bitwiseAND(mask).as("v"))
    withSignature(df.select(id.as("__i"), vec.as("__v")), "__v", nBits, dim, seed)
      .select(col("__i"),
        explode(array((0 until bands).map(bandCol): _*)).as("bk"))
      .select(col("__i").as("id"), col("bk.b").as("b"), col("bk.v").as("v"))
  }

  /** The corpus bucket table (id, b, v) — the PERSISTABLE LSH index:
    * computing it is the O(corpus · nBits) part of ANN, so it is built
    * once at rebuild time; queries touch only their own buckets. */
  def bucketTable(data: DataFrame, idCol: String, vecCol: String,
                  nBits: Int = 64, bands: Int = 16, dim: Int = 0,
                  seed: Long = 42L): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    val derived = deriveDimOpt(data, vecCol)
    derived.foreach(d => require(dim <= 0 || dim == d,
      s"dim=$dim does not match actual vector dimension $d"))
    val actualDim = derived.getOrElse(math.max(dim, 1))
    banded(data, KnnSearch.idNorm(data, idCol), col(vecCol), nBits, bands, actualDim, seed)
  }

  /** Banded ANN over a (possibly persisted) corpus bucket table:
    * candidates share at least one band; exact cosine re-rank, top-k
    * per query. The query batch is signed with the SAME (nBits, bands,
    * dim, seed) configuration the table was built with. */
  def annIndexed(buckets: DataFrame, data: DataFrame, idCol: String, vecCol: String,
                 queries: DataFrame, qIdCol: String, qVecCol: String,
                 k: Int, nBits: Int, bands: Int, dim: Int,
                 seed: Long): DataFrame = {
    require(nBits % bands == 0, "bands must divide nBits")
    // a query batch whose dimension differs from the table's would sign
    // vector prefixes and return silently wrong candidates
    deriveDimOpt(queries, qVecCol).foreach(d => require(d == dim,
      s"query vector dimension $d does not match the index dimension $dim"))
    // candidate dedup carries ONLY (query_id, id) through the distinct —
    // never the float vectors (a wide shuffle at scale); vectors are
    // re-attached afterwards (queries broadcast, data joined by id).
    val q = broadcast(banded(queries, KnnSearch.idNorm(queries, qIdCol), col(qVecCol),
      nBits, bands, dim, seed))
    val cand = buckets.join(q.select(col("id").as("query_id"), col("b"), col("v")),
        Seq("b", "v"))
      .select(col("query_id"), col("id"))
      .distinct()
    val dVecs = data.select(KnnSearch.idNorm(data, idCol).as("id"), col(vecCol).as("__v"))
    val qVecs = broadcast(queries.select(
      KnnSearch.idNorm(queries, qIdCol).as("query_id"), col(qVecCol).as("__qv")))
    val scored = cand.join(dVecs, "id").join(qVecs, "query_id")
    Ranked.topK(
      scored.select(col("query_id"), VectorScore.cosine(col("__v"), col("__qv")).as("__s"), col("id")),
      k, asc = false)
  }

  /** Index-free banded ANN (builds the bucket table inline).
    * `dim <= 0` (the default) derives the vector dimension from the
    * query batch; an explicit dim must match it. Defaults are the
    * measured production config (RecallProbe: recall@10 = 0.92 at
    * 64/16; 4-bit bands stay selective, 16 bands recover misses). */
  def ann(data: DataFrame, idCol: String, vecCol: String,
          queries: DataFrame, qIdCol: String, qVecCol: String,
          k: Int, nBits: Int = 64, bands: Int = 16, dim: Int = 0,
          seed: Long = 42L): DataFrame = {
    val derived = deriveDimOpt(queries, qVecCol).orElse(deriveDimOpt(data, vecCol))
    derived.foreach(d => require(dim <= 0 || dim == d,
      s"dim=$dim does not match actual vector dimension $d"))
    val actualDim = derived.getOrElse(math.max(dim, 1))
    annIndexed(bucketTable(data, idCol, vecCol, nBits, bands, actualDim, seed),
      data, idCol, vecCol, queries, qIdCol, qVecCol, k, nBits, bands, actualDim, seed)
  }
}
