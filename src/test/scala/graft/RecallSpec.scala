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

  test("BQ rerank recall climbs with candMult; floor holds at candMult=20 (spec corpus)") {
    // §5b-r8 BQ rows: 64-bit codes at dim 64 are information-limited,
    // so fixed-candMult recall DECAYS with corpus size (measured
    // 0.95/0.97/0.83 at cm=20 across the SFs) — candMult is the
    // explicit knob, exactly as documented for the PQ family. This
    // spec runs at sf0.001; the floor is the weakest measured value
    // minus noise margin.
    val bq = BqIndex.train(embs, "embedding")
    val enc = BqIndex.encode(bq, embs, "vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ham = Recall.atK(BqIndex.search(bq, enc, qLocal, 10), gtCos)
    val cm5 = Recall.atK(BqIndex.searchRerank(bq, enc, embs, "vec_id",
      "embedding", qLocal, 10, candMult = 5), gtCos)
    val cm20 = Recall.atK(BqIndex.searchRerank(bq, enc, embs, "vec_id",
      "embedding", qLocal, 10, candMult = 20), gtCos)
    enc.unpersist()
    assert(ham >= 0.2, s"bq hamming-only recall@10 = $ham")
    assert(cm5 > ham && cm20 > cm5,
      s"recall must climb with candMult: $ham -> $cm5 -> $cm20")
    assert(cm20 >= 0.85, s"bq rerank cm=20 recall@10 = $cm20")
  }

  test("BQ recall is corpus-geometry-limited, not dimension-limited (r8 verdict #4 grid)") {
    // RecallProbe bq_dim rows (n=2000, sf0.1 box): fixed-candMult
    // recall is DIMENSION-INVARIANT — isotropic gaussian corpora sit at
    // ~0.50/0.66/0.81 (cm 5/10/20) at dim 64, 256 AND 768, while a
    // 64-cluster mixture (the shape real embedding models produce) is
    // 1.0 everywhere. The r8 claim "at 768-1536 dims the bit budget is
    // 12-24x larger" buys nothing on the isotropic worst case: task
    // difficulty (all pairs near-orthogonal) grows exactly as fast as
    // the sign-agreement estimator sharpens. candMult remains the one
    // recall knob. This pin re-measures both geometries at dim 64 vs
    // 512 on a smaller deterministic corpus.
    def g(key: String, salt: Int) =
      s"sqrt(-2.0 * ln((pmod(xxhash64($key, j, $salt), 1000000) + 0.5) / 1000000.0)) * " +
      s"cos(6.283185307179586 * (pmod(xxhash64($key, j, ${salt + 1}), 1000000) + 0.5) / 1000000.0)"
    def synth(dim: Int, clustered: Boolean) =
      spark.range(1000).select(col("id").as("vec_id"),
        expr(s"transform(sequence(1, $dim), j -> " + (
          if (clustered) s"${g("pmod(id, 64)", 11)} + 0.5 * ${g("id", 1)}"
          else g("id", 1)) + ")").as("embedding"))
    def recallAt(dim: Int, clustered: Boolean): Double = {
      val e = synth(dim, clustered)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      val q = e.where(col("vec_id") < 16)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val ql = q.select(col("qid"), col("qvec").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val gt = KnnSearch.topK(e, "vec_id", "embedding", q, "qid", "qvec",
        "cosine", 10)
      val bq = BqIndex.train(e, "embedding")
      val enc = BqIndex.encode(bq, e, "vec_id", "embedding")
      val r = Recall.atK(BqIndex.searchRerank(bq, enc, e, "vec_id",
        "embedding", ql, 10, candMult = 20), gt)
      e.unpersist()
      r
    }
    val iso64 = recallAt(64, clustered = false)
    val iso512 = recallAt(512, clustered = false)
    val clu64 = recallAt(64, clustered = true)
    val clu512 = recallAt(512, clustered = true)
    // dimension-invariance on the hard case (within a noise band), a
    // hard floor on both dims, and the clustered (realistic) geometry
    // essentially exact
    assert(iso64 >= 0.75 && iso512 >= 0.75,
      s"isotropic cm=20 floors: dim64=$iso64 dim512=$iso512")
    assert(math.abs(iso512 - iso64) <= 0.12,
      s"recall should be dimension-invariant on isotropic data: $iso64 vs $iso512")
    assert(clu64 >= 0.95 && clu512 >= 0.95,
      s"clustered geometry floors: dim64=$clu64 dim512=$clu512")
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

  test("filtered HNSW holds the measured ef-for-selectivity guidance (and the collapse is real)") {
    // the hybrid/filtered serving path reranks filter-blind graph
    // candidates against the FILTERED snapshot — recall is governed by
    // segments × ef relative to k / selectivity (RecallProbe grid,
    // §5b): sel=0.1 needs ef≈64, sel=0.01 needs ef≈256 at 4 segments
    val g = HnswIndex.build(embs, "vec_id", "embedding", m = 8,
      efConstruction = 64, numSegments = 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    g.count()
    def recAt(mod: Int, ef: Int): Double = {
      val filtered = embs.where(col("vec_id") % mod === 0)
      val gt = KnnSearch.topK(filtered, "vec_id", "embedding",
        queries, "qid", "qvec", "cosine", 10)
      Recall.atK(HnswIndex.search(g, filtered, "vec_id", "embedding",
        qLocal, "cosine", 10, ef), gt)
    }
    assert(recAt(10, 64) >= 0.95, "sel=0.1 at ef=64 must hold >= 0.95")
    assert(recAt(100, 256) >= 0.95, "sel=0.01 at ef=256 must hold >= 0.95")
    // and the collapse the guidance exists for: the DEFAULT beam at a
    // 1%-selective filter leaves almost no surviving candidates
    assert(recAt(100, 10) <= 0.5,
      "fixed default ef at sel=0.01 collapsing is the documented behavior")
    g.unpersist()
  }

  test("filtered IVF degrades gracefully with selectivity and is exact at full probe") {
    // the IVF serving path PRE-filters before cell lookup (collection
    // search: candidates = filtered rows in probed cells), so unlike
    // the filter-blind HNSW beam the pool never collapses — recall is
    // cell COVERAGE of the farther-out filtered neighbors (RecallProbe
    // grid, §5b-r8: measured 0.77 at sel=0.1 np=8, 0.63 at sel=0.01
    // np=8 vs HNSW's 0.10 at its default beam)
    val model = IvfIndex.train(embs, "embedding", nlist = 16, maxIter = 10)
    def recAt(mod: Int, np: Int): Double = {
      val filtered = embs.where(col("vec_id") % mod === 0)
      val gt = KnnSearch.topK(filtered, "vec_id", "embedding",
        queries, "qid", "qvec", "l2", 10)
      Recall.atK(IvfIndex.search(model, filtered, "vec_id", "embedding",
        queries, "qid", "qvec", "l2", 10, np), gt)
    }
    assert(recAt(10, 8) >= 0.7, "sel=0.1 at nprobe=8 must hold >= 0.7")
    assert(recAt(100, 8) >= 0.5,
      "sel=0.01 at nprobe=8: graceful coverage decay, not a beam collapse")
    // full probe scans exactly the filtered rows — exact by structure,
    // at ANY selectivity
    assert(recAt(100, 16) == 1.0, "full-probe filtered IVF must be exact")
  }

  test("SemDeDup prod cells never lose an exact-duplicate pair; eps-pair recall floor holds") {
    // identical vectors assign to identical cells at ANY nclusters and
    // are unsplittable by the cap's mean-centered bisection — the pairs
    // a dedup MUST find are structurally inside one join group
    val base = embs.select(col("vec_id"), col("embedding"))
    val dup = base.where(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val pairs = graft.dedup.Dedup.semDedupPairs(base.unionByName(dup),
        "vec_id", "embedding", eps = 0.999, nclusters = 16, maxCellSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(i =>
      assert(pairs.contains((i, i + 10000)), s"exact-duplicate pair $i lost"))
    // borderline eps-pairs DO cross cell boundaries: measured prod
    // recall (nclusters=8, cap=4096, eps=0.45) is 0.71 here — the
    // clusterless synthetic corpus is SemDeDup's worst case (real
    // near-dups cluster); floor pinned under the measured value
    val truth = graft.dedup.Dedup.semDedupPairs(embs, "vec_id", "embedding",
      0.45, nclusters = 1)
    val r = Recall.pairRecall(graft.dedup.Dedup.semDedupPairs(embs, "vec_id",
      "embedding", 0.45, nclusters = 8, maxCellSize = 4096), truth)
    assert(r >= 0.6, s"semdedup prod pair recall = $r")
  }

  test("SemDeDup multi-assign: superset of single-assign pairs, recall floor at margin 0.05") {
    // margin-gated second-nearest-cell assignment (the boundary-pair
    // fix): structural invariants first — a row lands in at MOST 2
    // cells (row inflation <= 2 by construction) and its primary cell
    // never changes, so every single-assign pair still co-occurs:
    // multi-assign candidate pairs are a SUPERSET at any margin
    val single = graft.dedup.Dedup.semDedupPairs(embs, "vec_id", "embedding",
      0.45, nclusters = 8, maxCellSize = 4096)
    val multi = graft.dedup.Dedup.semDedupPairs(embs, "vec_id", "embedding",
      0.45, nclusters = 8, maxCellSize = 4096, assignMargin = 0.05)
    assert(single.join(multi, Seq("id_a", "id_b"), "left_anti").isEmpty,
      "multi-assign lost a single-assign pair")
    // measured floor (RecallProbe sf0.1: 0.36 single -> 0.76 at margin
    // 0.05, the clusterless synthetic worst case; sf0.01 here: 1.0)
    val truth = graft.dedup.Dedup.semDedupPairs(embs, "vec_id", "embedding",
      0.45, nclusters = 1)
    val rMulti = Recall.pairRecall(multi, truth)
    val rSingle = Recall.pairRecall(single, truth)
    assert(rMulti >= 0.7, s"semdedup multi-assign pair recall = $rMulti")
    assert(rMulti >= rSingle,
      s"multi-assign recall $rMulti under single-assign $rSingle")
    // margin = 0 must reproduce single-assign exactly (the same argmin
    // tiebreak), so the knob is safe to leave at its default
    val zero = graft.dedup.Dedup.semDedupPairs(embs, "vec_id", "embedding",
      0.45, nclusters = 8, maxCellSize = 4096, assignMargin = 0.0)
    assert(zero.exceptAll(single).isEmpty && single.exceptAll(zero).isEmpty)
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
