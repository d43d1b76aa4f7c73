package graft

import org.apache.spark.sql.functions._

import graft.vector._

/** Pinned recall floors for the approximate ANN families at their
  * DOCUMENTED production settings, against the exact FLAT ground truth
  * (graft.RecallProbe is the full sweep; these are the floors a user
  * can rely on). Every family is seeded, so recall on the fixed
  * testdata is deterministic — the floors sit a few points under the
  * measured values (sf0.001, 32 queries, k=10):
  *   lsh 64/16 = 0.909 | ivf nprobe=8 = 0.869 | pq_rerank m=8 k=64 =
  *   0.959 | ivf_pq_rerank nprobe=8 = 0.803 | embedLsh 64/16 t=0.45 = 1.0
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = graft.sources.Tables.embeddings(spark, sf)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  private lazy val queries = embs.where(col("vec_id") < 32)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
  private lazy val qLocal = queries
    .select(col("qid"), col("qvec").cast("array<double>"))
    .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
  private lazy val gtCos = KnnSearch.topK(embs, "vec_id", "embedding",
    queries, "qid", "qvec", "cosine", 10)
  private lazy val gtL2 = KnnSearch.topK(embs, "vec_id", "embedding",
    queries, "qid", "qvec", "l2", 10)

  test("sign-LSH at the production default (64 bits / 16 bands) holds recall@10 >= 0.85") {
    val r = Recall.atK(LshIndex.ann(embs, "vec_id", "embedding",
      queries, "qid", "qvec", k = 10), gtCos)
    assert(r >= 0.85, s"lsh 64/16 recall@10 = $r")
  }

  test("IVF at nprobe=8 (nlist=16) holds recall@10 >= 0.8") {
    val model = IvfIndex.train(embs, "embedding", nlist = 16, maxIter = 10)
    val r = Recall.atK(IvfIndex.search(model, embs, "vec_id", "embedding",
      queries, "qid", "qvec", "l2", 10, nprobe = 8), gtL2)
    assert(r >= 0.8, s"ivf nprobe=8 recall@10 = $r")
  }

  test("PQ with exact rerank (m=8, k=64, candMult=10) holds recall@10 >= 0.9 and beats ADC-only") {
    val pq = PqIndex.train(embs, "embedding", dim = 64, m = 8, k = 64)
    val enc = PqIndex.encode(pq, embs, "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adc = Recall.atK(PqIndex.search(pq, enc, qLocal, 10), gtL2)
    val rr = Recall.atK(
      PqIndex.searchRerank(pq, enc, embs, "vec_id", "embedding", qLocal, 10), gtL2)
    enc.unpersist()
    assert(rr >= 0.9, s"pq rerank recall@10 = $rr")
    assert(rr > adc, s"rerank ($rr) must beat ADC-only ($adc)")
  }

  test("IVF_PQ exact rerank lifts recall off the ADC ceiling (>= 0.75 at nprobe=8)") {
    val model = IvfPq.train(embs, "embedding", dim = 64, nlist = 16, m = 8, k = 16)
    val enc = IvfPq.encode(model, embs, "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adc = Recall.atK(IvfPq.search(model, enc, qLocal, 10, nprobe = 8), gtL2)
    val rr = Recall.atK(IvfPq.searchRerank(model, enc, embs, "vec_id", "embedding",
      qLocal, 10, nprobe = 8, candMult = 10), gtL2)
    enc.unpersist()
    assert(rr >= 0.75, s"ivf_pq rerank recall@10 = $rr")
    assert(rr > adc + 0.2, s"rerank ($rr) must clearly beat the ADC ceiling ($adc)")
  }

  test("IVF_SQ8 code-only ranking tracks plain IVF (>= 0.8 at nprobe=8, no rerank)") {
    // SQ8's contract: 4x compression with near-lossless ranking — the
    // dequantized scan must hold the same floor plain IVF holds at the
    // same nprobe, WITHOUT an exact-rerank crutch (PQ code-only sits
    // at ~0.33 on this corpus)
    val model = IvfSq.train(embs, "embedding", nlist = 16)
    val enc = IvfSq.encode(model, embs, "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r = Recall.atK(IvfSq.search(model, enc, qLocal, 10, nprobe = 8), gtL2)
    enc.unpersist()
    assert(r >= 0.8, s"ivf_sq8 code-only recall@10 = $r")
  }

  test("embedLsh near-dup at the production band config (64/16, t=0.45) misses no true pair") {
    // t=0.45 is where THIS corpus has pairs (max pair cosine 0.48 at
    // sf0.001) — a higher "production" threshold would grade against an
    // empty truth set and prove nothing
    val truth = graft.dedup.Dedup.embedCosineAllPairs(embs, "vec_id", "embedding", 0.45)
    assert(truth.count() > 0, "vacuous test: no true pairs at this threshold")
    val r = Recall.pairRecall(
      graft.dedup.Dedup.embedLsh(embs, "vec_id", "embedding", 0.45, 64, 16), truth)
    assert(r >= 0.95, s"embedLsh 64/16 t=0.45 pair recall = $r")
  }
}
