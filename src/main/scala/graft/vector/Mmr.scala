package graft.vector

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) —
  * diversified top-k: greedily pick the candidate maximizing
  *
  *   lambda · rel(q, d)  −  (1 − lambda) · max_{s ∈ selected} sim(d, s)
  *
  * so each pick trades query relevance against redundancy with what is
  * already selected. The retrieval-serving face of near-dup-aware
  * search: a result page (or a RAG context window) full of one tight
  * cluster's copies wastes its slots; lambda=1 degenerates to plain
  * top-k EXACTLY (pinned), lambda→0 maximizes spread.
  *
  * Scale shape — greedy selection is inherently sequential, so the
  * distribution is two-stage:
  *
  *  1. POOL: exact bounded top-(k·poolMult) per query through the
  *     [[TopKAgg]] heap pipeline (queries broadcast, scan never
  *     shuffles, RAW scores kept for the greedy math), then the pool's
  *     vectors join back — a (queries · k · poolMult)-sized sliver of
  *     the corpus.
  *  2. GREEDY per query inside `flatMapGroups` — each group holds at
  *     most k·poolMult rows, so the O(pool²·dim) selection is a
  *     per-task constant, runs IN PARALLEL across queries, and nothing
  *     corpus-sized ever reaches one task or the driver.
  *
  * The pool bound is the honest approximation knob (standard for MMR
  * over ANN systems): diversity is computed within the top-(k·poolMult)
  * relevance shortlist, not the whole corpus — documents outside the
  * pool can't be picked no matter how diverse. lambda=1 is exact at any
  * poolMult ≥ 1 by construction.
  *
  * Orientation: rel and sim both use `metric`, oriented so larger =
  * better/more-similar (L2 negates). Ties break by (objective, id) —
  * a total order, deterministic at every lambda.
  */
object Mmr {

  private def oriented(asc: Boolean, s: Double): Double = if (asc) -s else s

  /** Pairwise similarity oriented larger = more similar (L2 negates).
    * Per-metric loops: this runs O(k · pool) times per query inside
    * the greedy's hottest path — one generic loop maintaining four
    * accumulators would pay ~3× the needed multiply-adds. */
  private def sim(metric: String, a: Array[Double], b: Array[Double]): Double =
    metric match {
      case "cosine" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
          i += 1
        }
        // sqrt(na)·sqrt(nb), NOT sqrt(na·nb): bit-identical to
        // VectorScore's cosine (and the DuckDB oracle's), so a
        // candidate's self-similarity to an in-pool query point equals
        // its relevance EXACTLY — the two formulas differ in the last
        // ulp, which is enough to flip an exact-tie argmax
        if (na == 0.0 || nb == 0.0) 0.0
        else dot / (math.sqrt(na) * math.sqrt(nb))
      case "ip" =>
        var dot = 0.0
        var i = 0
        while (i < a.length) { dot += a(i) * b(i); i += 1 }
        dot
      case "l2" =>
        var dd = 0.0
        var i = 0
        while (i < a.length) { val df = a(i) - b(i); dd += df * df; i += 1 }
        -math.sqrt(dd)
      case other => throw new IllegalArgumentException(s"unknown metric $other")
    }

  private def idLess(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case (x: String, y: String) => x < y
    case _ => false
  }

  /** The greedy stage over an ALREADY-SCORED candidate pool
    * (query_id, id, __s raw, __v: array<double>) — shared by the exact
    * route below and the ANN-served arm (which feeds it graph-beam
    * candidates): the two arms' selection math cannot drift. Pool rows
    * per query must be bounded by the caller (the flatMapGroups
    * contract). */
  private[graft] def greedySelect(rows: DataFrame, metric: String, k: Int,
                                  lambda: Double): DataFrame = {
    val asc = !VectorMetric(metric).largerIsBetter
    val outSchema = StructType(Seq(
      StructField("query_id", rows.schema("query_id").dataType),
      StructField("rank", IntegerType, nullable = false),
      StructField("id", rows.schema("id").dataType),
      StructField("score", DoubleType)))
    val met = metric
    val lam = lambda
    val kk = k
    val ascB = asc
    rows.select(col("query_id"), col("id"), col("__s"), col("__v"))
      .groupByKey { r: Row =>
        r.get(0) match {
          case s: String => "s:" + s
          case other => "l:" + other
        }
      }(Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val cand = it.toArray
        val qid = cand.head.get(0)
        val ids = cand.map(_.get(1))
        val rels = cand.map(r => oriented(ascB, r.getDouble(2)))
        val raw = cand.map(_.getDouble(2))
        val vecs = cand.map(_.getSeq[Double](3).toArray)
        val n = cand.length
        val picked = new Array[Boolean](n)
        // running max-similarity of each candidate to the selected set:
        // updating it after each pick keeps the greedy O(n²·dim) total
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val order = scala.collection.mutable.ArrayBuffer.empty[Int]
        var round = 0
        while (round < math.min(kk, n)) {
          var best = -1
          var bestObj = Double.NegativeInfinity
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val penalty = if (order.isEmpty) 0.0 else maxSim(i)
              val obj = lam * rels(i) - (1.0 - lam) * penalty
              if (best < 0 || obj > bestObj ||
                  (obj == bestObj && idLess(ids(i), ids(best))))
                { best = i; bestObj = obj }
            }
            i += 1
          }
          picked(best) = true
          order += best
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val s = sim(met, vecs(j), vecs(best))
              if (s > maxSim(j)) maxSim(j) = s
            }
            j += 1
          }
          round += 1
        }
        order.iterator.zipWithIndex.map { case (i, pos) =>
          Row(qid, pos + 1, ids(i),
            BigDecimal(raw(i)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
      }(Encoders.row(outSchema))
      .orderBy("query_id", "rank")
  }

  /** Round-2 objective-gap telemetry — the TIE-DEGENERACY DETECTOR
    * behind the oracled greedy (r12 verdict #7): an exactly-oracled
    * argmax amplifies 1-ulp fp noise into different outputs precisely
    * when the chosen (λ, corpus) operating point ties the round-2
    * objectives — λ=0.5 with corpus-member queries ties the WHOLE pool
    * at objective exactly 0 (penalty ≡ relevance, the regime that
    * forced q_mmr's λ=0.5→0.7 move). Input is [[greedySelect]]'s own
    * bounded-pool frame; returns the minimal (best − second-best)
    * round-2 objective gap across queries (+∞ when no query has ≥ 3
    * candidates). An operating point reading under ~1e-9 is inside
    * fp noise and MUST NOT be SQL-oracled — DiversitySpec pins that
    * the detector fires at the known-degenerate λ=0.5 point and stays
    * clear at the production λ=0.7. Driver-side over the pool sliver
    * (bounded by the caller, like the greedy itself). */
  private[graft] def round2ObjectiveGap(rows: DataFrame, metric: String,
                                        lambda: Double): Double = {
    val asc = !VectorMetric(metric).largerIsBetter
    val cand = rows.select(col("query_id"), col("id"), col("__s"), col("__v"))
      .collect()
    if (cand.isEmpty) return Double.PositiveInfinity
    cand.groupBy(_.get(0)).values.map { g =>
      val ids = g.map(_.get(1))
      val rels = g.map(r => oriented(asc, r.getDouble(2)))
      val vecs = g.map(_.getSeq[Double](3).toArray)
      val n = g.length
      if (n < 3) Double.PositiveInfinity
      else {
        // round 1 = greedySelect's first pick: argmax λ·rel (penalty
        // identically 0), ties by id — the same comparison loop
        var best = 0
        var i = 1
        while (i < n) {
          val a = lambda * rels(i); val b = lambda * rels(best)
          if (a > b || (a == b && idLess(ids(i), ids(best)))) best = i
          i += 1
        }
        val objs = (0 until n).filter(_ != best).map { j =>
          lambda * rels(j) - (1.0 - lambda) * sim(metric, vecs(j), vecs(best))
        }.sorted(Ordering[Double].reverse)
        objs(0) - objs(1)
      }
    }.min
  }

  /** @return (query_id, rank, id, score) — `score` is the metric-native
    *         relevance (rounded to 4 decimals, the same contract as
    *         [[KnnSearch.topK]]), `rank` the SELECTION order. */
  def topKDiverse(
      data: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      metric: String,
      k: Int,
      lambda: Double,
      poolMult: Int = 4,
      filter: Option[Column] = None): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda=$lambda outside [0,1]")
    require(k > 0 && poolMult >= 1, s"k=$k poolMult=$poolMult")
    // duplicate query ids would pool two queries' candidates into one
    // greedy group — the same guard every sibling route carries, on
    // the NORMALIZED id (idNorm's long cast can merge non-integral
    // raw qids a raw-column check would miss)
    val qCounts = queries
      .select(KnnSearch.idNorm(queries, qIdCol).as("__qid"))
      .agg(count(lit(1)), countDistinct(col("__qid"))).head
    require(qCounts.getLong(0) == qCounts.getLong(1),
      "duplicate query ids (after id normalization): results are keyed by query id")
    val m = VectorMetric(metric)
    val asc = !m.largerIsBetter
    val corpus = filter.foldLeft(data)(_ where _)
      .select(KnnSearch.idNorm(data, idCol).as("id"), col(vecCol).as("__vec"))
    val q = broadcast(queries.select(
      KnnSearch.idNorm(queries, qIdCol).as("query_id"), col(qVecCol).as("__qvec")))
    val scored = corpus.crossJoin(q)
      .select(col("query_id"),
        VectorScore.score(m.name, col("__vec"), col("__qvec")).as("__s"),
        col("id"))
    // bounded pool, RAW scores (TopKAgg emits raw; rounding happens at
    // output so lambda=1 ranks exactly like KnnSearch.topK)
    val pool = scored.groupBy("query_id")
      .agg(TopKAgg.topk(col("__s"), col("id"), k * poolMult, asc).as("__top"))
      .select(col("query_id"), explode(col("__top")).as("__r"))
      .select(col("query_id"), col("__r.id").as("id"), col("__r.score").as("__s"))
    // the pool sliver's vectors (broadcast the bounded pool side)
    val rows = corpus.select(col("id"), col("__vec").cast("array<double>").as("__v"))
      .join(broadcast(pool), "id")
      .select(col("query_id"), col("id"), col("__s"), col("__v"))
    greedySelect(rows, metric, k, lambda)
  }
}
