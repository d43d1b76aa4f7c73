package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.dedup.Dedup
import graft.filter.FilterParser
import graft.hybrid.Fusion
import graft.ops.DocumentOps
import graft.sources.Tables
import graft.sparse.Bm25
import graft.text.TextAnalysis
import graft.multimodal.Multimodal
import graft.text.TextEmbed
import graft.vector.{IvfIndex, KnnSearch, LshIndex}

/** Driver contract: one `queries` entry (+ `oracleSql` where the op is
  * SQL-expressible) per operator in SURVEY.md §2.
  *
  * Oracle-parity rules used throughout (see SURVEY.md §4):
  *  - money aggregates go through DECIMAL(18,2) (exact) then cast to
  *    double, so Spark's shuffle-order-dependent double summation can
  *    never drift from DuckDB's;
  *  - every floating score is computed in double with the same operation
  *    order as DuckDB's list_* functions and rounded to 4 decimals AFTER
  *    ranking;
  *  - every result has a deterministic total ORDER BY, with id
  *    tie-breaks, mirrored in the oracle SQL.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // Query-batch used by every KNN query: the stored vectors with id < 8.
  private def knnQueries(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** Documents with a PLANTED three-sentence passage (doc_id-keyed,
    * oracle-mirrored): appended on ≡0 (mod 9), prepended on ≡1 — the
    * (A,B,C) span then recurs corpus-wide at two alignments while
    * every span touching the doc's own text stays unique. The span
    * dedup entries' non-vacuity device. */
  private def spanPlanted(spark: SparkSession, dir: String): DataFrame = {
    val plant = "Alpha gamma delta repeats. Beta span sentence here. Third planted sentence ends."
    val p9 = pmod(col("doc_id"), lit(9))
    Tables.documents(spark, dir).select(col("doc_id"),
      when(p9 === 0, concat(col("text"), lit(". " + plant)))
        .when(p9 === 1, concat(lit(plant + " "), col("text")))
        .otherwise(col("text")).as("text"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----------------------------------------------- relational / document
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_filter_compare" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(FilterParser.parse("""n_chars > 100 and lang != "en""""))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    "q_filter_in" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(FilterParser.parse("""lang in ("en", "fr") and source not in ("src0", "src1")"""))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    "q_filter_bool" -> ((s, dir) => {
      Tables.documents(s, dir)
        .where(FilterParser.parse(
          """not (lang = "en" or (n_chars >= 120 and n_chars < 400)) and source != "src3""""))
        .select("doc_id", "lang", "n_chars", "source")
        .orderBy("doc_id")
    }),

    "q_filter_array" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("tags", slice(split(col("text"), " "), 1, 5))
        .where(FilterParser.parse(
          """tags include ("spark", "join") and tags exclude ("slow") and tags include_all ("the")"""))
        .select(col("doc_id"), array_join(col("tags"), " ").as("tag_str"))
        .orderBy("doc_id")
    }),

    "q_query_sort_page" -> ((s, dir) => {
      DocumentOps.query(Tables.documents(s, dir),
        filter = "n_chars >= 60",
        sort = Seq(("n_chars", false), ("doc_id", true)),
        limit = Some(50), offset = 100,
        outputFields = Seq("doc_id", "n_chars", "lang"))
    }),

    "q_query_by_ids" -> ((s, dir) => {
      DocumentOps.byIds(Tables.documents(s, dir), "doc_id",
        Seq(3L, 17L, 42L, 99L, 123L, 256L, 400L, 499L),
        outputFields = Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy("doc_id")
    }),

    "q_count" -> ((s, dir) => {
      DocumentOps.countRows(Tables.documents(s, dir),
        """lang in ("en", "de") and n_chars > 150""")
    }),

    "q_upsert" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "source", "n_chars")
      val updates = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), lit("updated").as("source"), (col("n_chars") + 1).as("n_chars"))
        .unionAll(docs.where(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), lit("new").as("source"),
            lit(42L).as("n_chars")))
      DocumentOps.upsert(docs, updates, "doc_id").orderBy("doc_id")
    }),

    "q_delete" -> ((s, dir) => {
      DocumentOps.delete(Tables.documents(s, dir), "doc_id",
        """lang = "de" or n_chars < 60""", limit = Some(20))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    "q_update" -> ((s, dir) => {
      DocumentOps.update(Tables.documents(s, dir),
        """source = "src1" and n_chars < 200""",
        Map("lang" -> lit("xx"), "n_chars" -> (col("n_chars") + 1000)))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    "q_join" -> ((s, dir) => {
      // fact (orders) joined to broadcast dims (customer, nation):
      // no fact-side shuffle until the final small groupBy.
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_price"))
        .orderBy("n_name")
    }),

    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .withColumn("rnk", rank().over(w))
        .where(col("rnk") <= 5)
        .select("c_mktsegment", "rnk", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    }),

    // ------------------------------------------------- dense vector search
    "q_knn_cosine" -> ((s, dir) => {
      KnnSearch.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", "cosine", 10)
    }),

    "q_knn_l2" -> ((s, dir) => {
      KnnSearch.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", "l2", 10)
    }),

    "q_knn_ip" -> ((s, dir) => {
      KnnSearch.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", "ip", 10)
    }),

    "q_knn_filter" -> ((s, dir) => {
      KnnSearch.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", "cosine", 10,
        filter = Some(FilterParser.parse("label in (1, 2, 3, 4)")))
    }),

    "q_knn_radius" -> ((s, dir) => {
      KnnSearch.radius(Tables.embeddings(s, dir), "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", "cosine", 0.35)
    }),

    "q_knn_radius_limit" -> ((s, dir) => {
      // reference search(limit, radius) combined: top-5 among the
      // in-radius rows; the radius filter precedes the bounded heap
      KnnSearch.radiusTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", "cosine", r = 0.3, k = 5)
    }),

    "q_knn_by_id" -> ((s, dir) => {
      KnnSearch.byId(Tables.embeddings(s, dir), "vec_id", "embedding",
        Seq(3L, 5L, 8L, 13L), "cosine", 5)
    }),

    "q_grouped_search" -> ((s, dir) => {
      // grouped vector search (row 119): top-3 GROUPS per query ranked
      // by best member, top-4 members each — retrieval that refuses to
      // let one near-dup cluster monopolize the page. Exact and fully
      // oracled: both rankings are total orders (best-member ties →
      // smaller group, member ties → smaller id), and both reduce
      // through bounded heaps — no WindowExec anywhere in the plan.
      val embs = Tables.embeddings(s, dir)
      graft.vector.GroupedSearch.groupedTopK(embs, "vec_id", "embedding",
        "label", knnQueries(s, dir), "qid", "qvec", "cosine",
        limitGroups = 3, groupSize = 4)
    }),

    "q_grouped_hnsw" -> ((s, dir) => {
      // grouped search served from the persisted HNSW graph at
      // PRODUCTION ef (rows-only by design — the exhaustive twin below
      // is the oracled row): one group-blind traversal, exact rescore,
      // the SAME rankGrouped double-heap pipeline as the oracled exact
      // route. The client adds the group-fill ladder on top
      // (searchGroupedHnsw, pinned in DiversitySpec).
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val grpOf = embs.select(col("vec_id").cast("long").as("id"),
        graft.vector.GroupedSearch.grpNorm(embs, "label").as("grp"))
      val scored = graft.vector.HnswIndex.scoredCandidates(hnswGraphFor(s, dir),
          embs, "vec_id", "embedding", qLocal, "cosine", 48,
          prepared = false, nodeKey = None)
        .join(grpOf, "id")
        .select(col("query_id"), col("grp"), col("__s"), col("id"))
      graft.vector.GroupedSearch.rankGrouped(scored, 3, 4, asc = false)
    }),

    "q_grouped_hnsw_exhaustive" -> ((s, dir) => {
      // grouped-HNSW's ORACLED row (the verified-twin pattern): the
      // chain-connectivity certificate makes ef = MaxValue visit every
      // node, the candidate stream degenerates to the whole corpus,
      // and rankGrouped — the SAME pipeline as q_grouped_search —
      // reproduces the exact grouped result byte-for-byte while the
      // full graph machinery executes end-to-end.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val grpOf = embs.select(col("vec_id").cast("long").as("id"),
        graft.vector.GroupedSearch.grpNorm(embs, "label").as("grp"))
      val scored = graft.vector.HnswIndex.scoredCandidates(hnswGraphFor(s, dir),
          embs, "vec_id", "embedding", qLocal, "cosine", Int.MaxValue,
          prepared = false, nodeKey = None)
        .join(grpOf, "id")
        .select(col("query_id"), col("grp"), col("__s"), col("id"))
      graft.vector.GroupedSearch.rankGrouped(scored, 3, 4, asc = false)
    }),

    "q_mmr" -> ((s, dir) => {
      // MMR diversified top-k (row 120): the greedy is sequential PER
      // QUERY but its pool is bounded (k·poolMult = 40 rows/query), so
      // a DuckDB RECURSIVE CTE replays the argmax exactly — one
      // iteration per rank carrying the selected-id list, penalty =
      // max cosine against the selected set, the (objective, id)
      // tiebreak verbatim (r11 verdict #2: this row graduated from
      // rows-only to fully SQL-oracled). DiversitySpec additionally
      // pins lambda=1 ≡ exact top-k BYTE-FOR-BYTE, a hand-computed
      // two-cluster case, and determinism. The pool stage is the same
      // oracled TopKAgg pipeline as q_knn_cosine.
      // lambda = 0.7 (the client default), NOT 0.5: the standard query
      // batch is drawn from the corpus, so after the greedy picks the
      // query point itself every remaining candidate's penalty equals
      // its relevance and 0.5·rel − 0.5·pen ties at EXACTLY 0 pool-wide
      // — the whole selection would ride on last-ulp fp agreement
      // between engines. At 0.7 the objective is 0.4·rel on that round
      // (generically distinct, gaps ~1e-3 ≫ fp noise).
      val embs = Tables.embeddings(s, dir)
      graft.vector.Mmr.topKDiverse(embs, "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", "cosine",
        k = 10, lambda = 0.7, poolMult = 4)
    }),

    "q_mmr_hnsw" -> ((s, dir) => {
      // MMR served from the persisted HNSW graph at PRODUCTION beam
      // (rows-only by design — the exhaustive twin below is the oracled
      // row): one traversal seeds the relevance pool, exact rescore,
      // then the SAME Mmr.greedySelect stage as the oracled exact
      // route — the two arms' selection math cannot drift. The client
      // adds the pool-fill ladder on top (searchMmrHnsw, pinned in
      // DiversitySpec). Beam 40 = the pool size: a narrower beam could
      // not seed the pool (§7-probes-r11 measured selection overlap
      // 0.975/1.0 at ef 20/40).
      mmrFromGraph(s, dir, ef = 40)
    }),

    "q_mmr_hnsw_exhaustive" -> ((s, dir) => {
      // MMR-HNSW's ORACLED row (the verified-twin pattern, r11 verdict
      // #3): the chain-connectivity certificate makes ef = MaxValue
      // visit every node, the pool degenerates to the exact top-40,
      // and greedySelect — the SAME stage as q_mmr — reproduces the
      // exact diversified page byte-for-byte while the full graph
      // machinery executes end-to-end. Oracled by the same recursive
      // CTE as q_mmr.
      mmrFromGraph(s, dir, ef = Int.MaxValue)
    }),

    // --------------------------------------------- sparse / fulltext / hybrid
    "q_bm25_encode" -> ((s, dir) => {
      Bm25.encode(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("term"), col("tf"), round(col("weight"), 4).as("weight"))
        .orderBy("doc_id", "term")
    }),

    "q_fulltext" -> ((s, dir) => {
      Bm25.fulltextIndexed(sparseIndexFor(s, dir), FulltextTerms, 20, cutoffFrequency = 0.9)
    }),

    "q_hybrid_rrf" -> ((s, dir) => {
      val (dense, sparseQ) = hybridLists(s, dir)
      Fusion.rrf(Seq(dense.select("query_id", "id", "rank"), sparseQ),
        Seq("query_id"), "id", "rank", k = 60, topN = 10)
    }),

    "q_hybrid_weighted" -> ((s, dir) => {
      val (dense, _) = hybridLists(s, dir)
      val sparse = Bm25.fulltextIndexed(sparseIndexFor(s, dir),
        FulltextTerms, 20, cutoffFrequency = 0.9)
      val qids = Tables.embeddings(s, dir).where(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"))
      val sparseS = qids.crossJoin(broadcast(
        sparse.select(col("doc_id").as("id"), col("score"))))
      Fusion.weighted(Seq((dense.select("query_id", "id", "score"), 0.7), (sparseS, 0.3)),
        Seq("query_id"), "id", "score", topN = 10)
    }),

    "q_hybrid_perq" -> ((s, dir) => {
      // per-query keyword lists (AnnSearch + KeywordSearch pairs): each
      // dense query fuses with ITS OWN sparse ranked list
      import s.implicits._
      val (dense, _) = hybridLists(s, dir)
      val kw = PerQueryKeywords.toDF("query_id", "term")
      val sparse = Bm25.fulltextBatch(sparseIndexFor(s, dir), kw, 20, cutoffFrequency = 0.9)
      Fusion.rrf(Seq(dense.select("query_id", "id", "rank"),
        sparse.select(col("query_id"), col("doc_id").as("id"), col("rank"))),
        Seq("query_id"), "id", "rank", k = 60, topN = 10)
    }),

    "q_hybrid_ann" -> ((s, dir) => {
      // hybrid with the dense arm served from the HNSW graph artifact
      // (the reference's hybrid_search runs against the collection's
      // CONFIGURED index with the same ef param — collection.py:161;
      // conftest builds HNSW) instead of a FLAT corpus scan: per-query
      // dense cost is segments·ef traversal + sliver rerank. Rows-only
      // by design: the candidate set is ef-dependent; HybridAnnSpec
      // pins ANN-armed ≡ FLAT-armed at exhaustive ef (the family's
      // verified-twin pattern), and the FLAT-armed q_hybrid_rrf stays
      // the oracled row.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 4)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val dense = graft.vector.HnswIndex.search(hnswGraphFor(s, dir), embs,
        "vec_id", "embedding", qLocal, "cosine", k = 20, ef = 48)
      val sparse = Bm25.fulltextIndexed(sparseIndexFor(s, dir),
        FulltextTerms, 20, cutoffFrequency = 0.9)
      val qids = embs.where(col("vec_id") < 4).select(col("vec_id").as("query_id"))
      val sparseQ = qids.crossJoin(broadcast(
        sparse.select(col("doc_id").as("id"), col("rank"))))
        .select("query_id", "id", "rank")
      Fusion.rrf(Seq(dense.select("query_id", "id", "rank"), sparseQ),
        Seq("query_id"), "id", "rank", k = 60, topN = 10)
    }),

    "q_sparse_search" -> ((s, dir) => {
      // user-supplied sparse_vector field: documents store a pre-encoded
      // term->weight list; the query brings its own weighted sparse
      // vector and scores by dot product. Re-armed (round 8) through
      // the INVERTED POSTINGS artifact — the serving tier reads only
      // the query terms' posting slivers, never the stored vectors
      // (indexed ≡ inline bit-for-bit via the shared scoring tail, so
      // the q_sparse_search oracle is unchanged)
      val postings = graft.catalog.IndexStore.ensure(s, s"svpostings_${sfKey(dir)}") {
        val sv = graft.sparse.SparseSearch.packSparse(
          Bm25.weightedPostings(sparseIndexFor(s, dir)))
        graft.sparse.SparseSearch.sparsePostings(sv, "doc_id", "sparse_vector")
          .repartition(col("term")).sortWithinPartitions("term")
      }
      graft.sparse.SparseSearch.dotTopKIndexed(postings,
        Seq("spark" -> 2.0, "join" -> 1.0, "scan" -> 0.5), k = 15)
    }),

    "q_chunk_split" -> ((s, dir) => {
      TextAnalysis.chunkSplit(Tables.documents(s, dir), "doc_id", "text", "source",
        chunkSize = 80, overlap = 20)
        .orderBy("doc_id", "chunk_id")
    }),

    "q_file_details" -> ((s, dir) => {
      // batch file ingest (upload_file / query_file_details,
      // collection_view.py:342/:437): every document's text arrives as
      // a BINARY upload payload, and the registry — byte length, type,
      // REAL chunker count — is derived distributed from the payloads
      // (parse is a pure projection; one narrow count per file)
      val uploads = Tables.documents(s, dir)
        .where(col("text").isNotNull && col("n_chars") > 0)
        .select(concat(col("doc_id").cast("string"), lit(".md")).as("file_name"),
          encode(col("text"), "UTF-8").as("content"))
      graft.text.FileIngest.details(uploads, "file_name", "content")
        .orderBy("file_name")
    }),

    "q_file_images" -> ((s, dir) => {
      // get_image_url's asset registry (collection_view.py:425): each
      // uploaded markdown embeds one per-file figure and one shared
      // logo; parse extracts the refs and derives catalog-relative
      // URLs — a projection + explode, no shuffle beyond the distinct
      val uploads = Tables.documents(s, dir)
        .where(col("text").isNotNull && col("n_chars") > 0)
        .select(concat(col("doc_id").cast("string"), lit(".md")).as("file_name"),
          encode(concat(col("text"),
            lit(" ![fig](fig_"), col("doc_id").cast("string"), lit(".png)"),
            lit(" ![logo](assets/logo.png)")), "UTF-8").as("content"))
      graft.text.FileIngest.imageRefs(
          graft.text.FileIngest.parse(uploads, "file_name", "content"))
        .orderBy("file_name", "image_name")
    }),

    // ------------------------------------------------------------ dedup
    "q_dedup_exact" -> ((s, dir) => {
      Dedup.exact(Tables.documents(s, dir), "doc_id", "text").orderBy("keep_id")
    }),

    "q_dedup_ngram" -> ((s, dir) => {
      // the (doc_id, gram) postings are an ingest artifact — the
      // O(corpus) tokenize+explode is paid once; every dedup run joins
      // the stored postings
      Dedup.ngramJaccardFromPostings(ngramPostingsFor(s, dir), threshold = 0.5)
    }),

    "q_dedup_clusters" -> ((s, dir) => {
      // near-dup pairs -> connected components -> canonical (min-id)
      // cluster label per involved doc. The pair list is an ingest-time
      // artifact (computed once per corpus, like the other persisted
      // indexes); the query derives clusters from it.
      val pairs = graft.catalog.IndexStore.ensure(s, s"ngrampairs_${sfKey(dir)}") {
        Dedup.ngramJaccardFromPostings(ngramPostingsFor(s, dir), threshold = 0.5)
      }
      Dedup.connectedComponents(pairs, "id_a", "id_b").orderBy("doc_id")
    }),

    "q_cluster_reps" -> ((s, dir) => {
      // near-dup cluster COLLAPSE: keep the best-quality doc per
      // connected component of the near-dup pair graph (ties -> lowest
      // id), docs in no pair survive as their own cluster — the step
      // that APPLIES the near-dup report to the corpus (exact dedup
      // only ever removes byte-identical texts)
      val pairs = graft.catalog.IndexStore.ensure(s, s"ngrampairs_${sfKey(dir)}") {
        Dedup.ngramJaccardFromPostings(ngramPostingsFor(s, dir), threshold = 0.5)
      }
      val scored = graft.text.TextAnalysis
        .quality(Tables.documents(s, dir), "doc_id", "text")
        .select("doc_id", "quality")
      Dedup.clusterRepresentatives(scored, "doc_id", "quality", pairs)
        .orderBy("doc_id")
    }),

    "q_soft_dedup" -> ((s, dir) => {
      // SOFT near-dup handling: every doc survives with an integer
      // micro-weight 1e6/|cluster| so each near-dup cluster carries one
      // doc's worth of expected training mass — the reweighting
      // alternative to q_cluster_reps' hard collapse (same persisted
      // pair artifact)
      val pairs = graft.catalog.IndexStore.ensure(s, s"ngrampairs_${sfKey(dir)}") {
        Dedup.ngramJaccardFromPostings(ngramPostingsFor(s, dir), threshold = 0.5)
      }
      Dedup.softDedupWeights(Tables.documents(s, dir), "doc_id", pairs)
        .orderBy("doc_id")
    }),

    "q_dedup_embed" -> ((s, dir) => {
      Dedup.embedCosine(Tables.embeddings(s, dir), "vec_id", "embedding", threshold = 0.45)
    }),

    "q_semdedup" -> ((s, dir) => {
      // SemDeDup exhaustive twin (row 78): nclusters=1 makes the
      // cluster pruning vacuous (all-pairs), the centroid the corpus
      // mean — the whole pipeline (mean, pair graph, components,
      // lowest-centroid-cosine representative) checks against the
      // recursive-CTE DuckDB oracle
      Dedup.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        eps = 0.45, nclusters = 1)
    }),

    "q_semdedup_prod" -> ((s, dir) => {
      // the production config: k-means cells bound the pairwise work
      // (corpus^2/k in expectation — k in the tens of thousands at
      // 100 TB, the paper's own setting), served from the PERSISTED
      // centroid artifact (the O(corpus) training pass is ingest-time
      // work, like every model here). Rows-only: cluster boundaries
      // legitimately drop cross-cell pairs, so the result is a
      // deterministic (seeded) approximation of the twin above.
      val centDf = graft.catalog.IndexStore.ensure(s, s"semcent8_${sfKey(dir)}") {
        graft.vector.IvfIndex.centroids(
          graft.vector.IvfIndex.train(
            Tables.embeddings(s, dir), "embedding", nlist = 8, maxIter = 10), s)
      }
      // maxCellSize: the prod config carries the hot-cell bound (cells
      // cap pair work only IN EXPECTATION; one hot cluster degrades
      // toward n² without it). Far above this corpus' cell sizes, so
      // the toy result is identical — the bound exists for the skewed
      // corpus SemDedupProbe measures.
      // assignMargin 0.05: the recommended boundary-pair setting (r8
      // verdict #3) — pair recall 0.36 -> 0.76/0.86 at sf0.1 on the
      // clusterless worst case, §7-probes-r9 frontier; row inflation
      // <= 2 by construction
      Dedup.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        eps = 0.45, nclusters = 8,
        centers = Some(graft.vector.IvfIndex.centersFromDf(centDf)),
        maxCellSize = 4096, assignMargin = 0.05)
    }),

    "q_dedup_embed_lsh" -> ((s, dir) => {
      // the scale path: LSH band candidates -> exact cosine verify. At
      // this low threshold the bands are exhaustive-grade (r=2, b=16,
      // fixed seed ⇒ deterministic; crosschecked against the all-pairs
      // oracle at sf0.001/0.01/0.1), so the result hash-matches the
      // all-pairs oracle; high thresholds use selective bands (Scaladoc).
      // The band-bucket table is an ingest artifact — the O(corpus ·
      // nBits) signature pass is persisted; runs pay only the
      // bucket join + verify.
      val buckets = graft.catalog.IndexStore.ensure(s, s"emblsh_${sfKey(dir)}") {
        Dedup.lshBandBuckets(Tables.embeddings(s, dir), "vec_id", "embedding",
          nBits = 32, bands = 16, seed = 42L)
      }
      Dedup.embedLshFromBuckets(buckets, Tables.embeddings(s, dir),
        "vec_id", "embedding", threshold = 0.45, bands = 16)
    }),


    "q_cross_dedup" -> ((s, dir) => {
      // cross-corpus exact dedup (the re-ingest gate): a candidate
      // batch — here the whole documents table, as a re-crawl naturally
      // re-contains previously accepted pages — deduped by CONTENT
      // against the reference corpus (docs with doc_id % 3 == 0).
      // Bloom-gated: rows missing the broadcast bloom are accepted with
      // zero join; only bloom hits enter the verifying anti-join, so
      // the result is exact at any fpp.
      val docs = Tables.documents(s, dir)
      Dedup.crossCorpusExact(docs.select("doc_id", "source", "text"), "text",
          docs.where(col("doc_id") % 3 === 0), "text")
        .select("doc_id", "source").orderBy("doc_id")
    }),

    "q_passage_repeats" -> ((s, dir) => {
      // repeated-passage (boilerplate) report: 16-token stride-16
      // windows appearing verbatim in >= 2 distinct docs — the
      // corpus-frequency form of exact substring dedup (one explode +
      // one groupBy; nothing pairwise)
      Dedup.passageRepeats(Tables.documents(s, dir), "doc_id", "text",
        window = 16, stride = 16, minDocs = 2)
    }),

    "q_strip_boilerplate" -> ((s, dir) => {
      // the APPLY step of q_passage_repeats (row 73): drop each doc's
      // 16-token blocks whose passage repeats verbatim in >= 2 docs,
      // reassemble the remainder in order (trailing partial block and
      // sub-window docs always survive)
      Dedup.stripBoilerplate(Tables.documents(s, dir), "doc_id", "text",
        window = 16, minDocs = 2)
    }),

    "q_passage_repeats_shifted" -> ((s, dir) => {
      // arbitrary-alignment exact-substring report: stride-1 windows
      // hash-pruned (the explode shuffles 64-bit hashes, not window
      // text; only the corpus-frequency-bounded hot sliver regroups by
      // true passage). The corpus' own cross-doc repeats sit on block
      // boundaries, so the input deterministically plants a 16-token
      // passage at doc_id-varying offsets (mirrored in the oracle):
      // stride-16 q_passage_repeats can NOT see it (only one planted
      // doc is 16-aligned), stride-1 must.
      Dedup.passageRepeatsShifted(plantShifted(Tables.documents(s, dir)),
        "doc_id", "text", window = 16, minDocs = 2)
    }),

    "q_strip_boilerplate_shifted" -> ((s, dir) => {
      // the APPLY step of q_passage_repeats_shifted: every token
      // covered by a cross-doc repeated stride-1 window is dropped, so
      // the planted shifted passage disappears from every carrier doc
      // regardless of its offset (same planting as the report entry)
      Dedup.stripShiftedBoilerplate(plantShifted(Tables.documents(s, dir)),
        "doc_id", "text", window = 16, minDocs = 2)
    }),

    "q_dedup_intradoc" -> ((s, dir) => {
      // INTRA-document repeated-block dedup (row 77): C4's keep-the-
      // first-occurrence rule at 2-token block granularity (window 2
      // because this corpus' intra-doc verbatim repetition lives at
      // that width — 174/181/1655 affected docs across the SFs; wider
      // blocks repeat only ACROSS docs here, which is row 73's job)
      Dedup.dedupRepeatedBlocks(Tables.documents(s, dir), "doc_id", "text",
        window = 2)
    }),

    // ----------------------------------------------------- text analysis
    "q_lang_id" -> ((s, dir) => {
      TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")
    }),

    "q_quality" -> ((s, dir) => {
      TextAnalysis.quality(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")
    }),

    "q_token_count" -> ((s, dir) => {
      TextAnalysis.tokenCount(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")
    }),

    "q_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")
    }),

    "q_tfidf_keywords" -> ((s, dir) => {
      // top-3 tf·idf terms per document (smoothed idf as an integer
      // micro-nat per TERM, scores pure BIGINT products — the LM
      // rounding discipline, so ranking is engine-exact)
      TextAnalysis.tfidfKeywords(Tables.documents(s, dir), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rnk")
    }),

    "q_span_repeats" -> ((s, dir) => {
      // C4's cross-document three-sentence-span rule, REPORT stage —
      // planted spans (the passage device: the synthetic corpus has no
      // natural '.'-sentences, so ≡0 (mod 9) docs append and ≡1 docs
      // prepend the SAME three planted sentences, mirrored in the
      // oracle): the (A,B,C) span recurs across all planted docs at
      // two different positions, every other span is unique
      Dedup.repeatedSpans(spanPlanted(s, dir), "doc_id", "text")
    }),

    "q_span_dedup" -> ((s, dir) => {
      // the APPLY stage: non-first occurrences of the duplicated span
      // lose its three sentences; the globally first occurrence and
      // every unplanted doc reconstruct unchanged (normalized '. '
      // join — the lossy-punctuation convention of the line/block
      // strippers)
      Dedup.stripRepeatedSpans(spanPlanted(s, dir), "doc_id", "text")
    }),

    "q_lexical_spectrum" -> ((s, dir) => {
      graft.ops.Curation.lexicalSpectrum(Tables.documents(s, dir),
        "text", "source")
    }),

    "q_normalize_text" -> ((s, dir) => {
      // unicode normalization over PLANTED noise (the PII device:
      // doc_id-keyed dirt, mirrored in the oracle — the clean synthetic
      // corpus alone would make the op vacuous): curly quotes +
      // zero-width + NBSP on ≡0 (mod 4) docs, smart-quote prefix on ≡1,
      // tabs + a BEL control on ≡2, untouched on ≡3
      val p = pmod(col("doc_id"), lit(4))
      val dirty = Tables.documents(s, dir).select(col("doc_id"),
        when(p === 0, concat(lit("\u201C"), col("text"), lit("\u201D\u200B")))
          .when(p === 1, concat(lit("\u00A0\u2018q\u2019 "), col("text")))
          .when(p === 2, concat(col("text"), lit("\t\tend\u0007")))
          .otherwise(col("text")).as("text"))
      graft.text.TextAnalysis.normalizeText(dirty, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q_url_dedup" -> ((s, dir) => {
      // URL canonicalization + canonical-URL dedup over PLANTED urls
      // (doc_id-keyed, oracle-mirrored): case-variant scheme/host,
      // shared page key (doc_id DIV 7), a DEFAULT :443 port on ≡0 (mod
      // 13) (strips — https default), case-variant percent escapes on
      // ≡0/≡6 (mod 12) (%2F/%2f collapse), a trailing slash on ≡0 (mod
      // 11), tracking params everywhere plus an exact-name near-miss
      // `gclid_src` that must SURVIVE on ≡0 (mod 5), an EMBEDDED URL in
      // a kept `next` param on ≡0 (mod 19) (first-'://' split — value
      // case preserved), a fragment, and a SCHEMELESS override on ≡0
      // (mod 23) that must pass through unchanged
      val d = col("doc_id")
      val urls = Tables.documents(s, dir).select(d,
        when(pmod(d, lit(23)) === 0,
          concat(lit("www.example.com/Case"), pmod(d, lit(2))))
        .otherwise(concat(
          when(pmod(d, lit(2)) === 0, lit("HTTPS")).otherwise(lit("https")),
          lit("://"),
          when(pmod(d, lit(3)) === 0, lit("WWW.Example.COM"))
            .otherwise(lit("www.example.com")),
          when(pmod(d, lit(13)) === 0, lit(":443")).otherwise(lit("")),
          lit("/Page/"), expr("doc_id DIV 7"),
          when(pmod(d, lit(12)) === 0, lit("%2F"))
            .when(pmod(d, lit(12)) === 6, lit("%2f")).otherwise(lit("")),
          when(pmod(d, lit(11)) === 0, lit("/")).otherwise(lit("")),
          when(pmod(d, lit(5)) === 0,
            concat(lit("?id="), pmod(d, lit(2)), lit("&utm_campaign=c"), d,
              lit("&gclid_src=g")))
            .otherwise(concat(lit("?utm_source=s"), d)),
          when(pmod(d, lit(19)) === 0,
            lit("&next=https://Other.example.org/KeepCase")).otherwise(lit("")),
          lit("#sec"), d)).as("url"))
      graft.ops.UrlOps.urlDedup(urls, "doc_id", "url")
    }),

    "q_token_budget" -> ((s, dir) => {
      graft.ops.Curation.tokenBudget(Tables.documents(s, dir),
        "doc_id", "text", "source", budget = 800L)
    }),

    "q_hard_negatives" -> ((s, dir) => {
      // contrastive hard negatives: top-10 cosine neighbors whose label
      // DIFFERS from the anchor's — near the anchor, known non-positive
      val embs = Tables.embeddings(s, dir)
      val q = embs.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
          col("label").as("qlab"))
      KnnSearch.hardNegatives(embs, "vec_id", "embedding", "label",
        q, "qid", "qvec", "qlab", "cosine", 10)
    }),

    // ---------------------------------------- ANN indexes / rows-only ops
    "q_ivf_search" -> ((s, dir) => {
      // nprobe = nlist ⇒ exhaustive ⇒ equals the exact-KNN SQL oracle,
      // while still executing the full cell-probe machinery. The
      // centroids and cell assignments are ingest artifacts (training
      // is deterministic, so the two ensure blocks share one model);
      // the query serves from the stored index like the client path.
      IvfIndex.searchAssigned(
        ivfAssignedFor(s, dir), ivfCentroidsFor(s, dir),
        knnQueries(s, dir), "qid", "qvec", "l2", k = 5, nprobe = 16)
    }),

    "q_ivf_build" -> ((s, dir) => {
      val embs = Tables.embeddings(s, dir)
      val model = IvfIndex.train(embs, "embedding", nlist = 16, maxIter = 10)
      IvfIndex.buildStats(model, embs, "embedding")
    }),

    "q_ivf_assign" -> ((s, dir) => {
      // the ORACLED half of the IVF build family (the q_bpe_apply
      // artifact-as-fixture device on the index side): Lloyd's itself
      // is not SQL, but the ASSIGNMENT against persisted centroids is
      // — assignExpr's argmin-by-(distance, cell) replays as a window
      // over the centroid cross join (bounded: nlist rows per vector).
      // The centroids are genuinely trained (IvfIndex.train over the
      // pinned input), persisted, read back here; Round14Spec pins
      // trained == the oracle's inlined VALUES, so training drift
      // fails the spec before it can desync the oracle.
      val cents = ivfAssignCentroidsFor(s).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
        .map { case (cell, c) => (c, cell) }.toSeq
      Tables.embeddings(s, dir).select(col("vec_id"),
          graft.vector.IvfIndex.assignExpr(cents,
            col("embedding").cast("array<double>")).as("cell"))
        .orderBy("vec_id")
    }),

    "q_pq_search" -> ((s, dir) => {
      // PQ codes -> ADC candidate scan -> exact rerank of the sliver.
      // Codebooks + codes are persisted ingest artifacts (pqbooks /
      // pqcodes) — the serving run loads them, no retraining.
      val embs = Tables.embeddings(s, dir)
      val enc = pqEncodedFor(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.PqIndex.searchRerank(pqModelFor(s, dir), enc, embs,
        "vec_id", "embedding", qLocal, k = 10)
    }),

    "q_pq_exhaustive" -> ((s, dir) => {
      // the PQ family's ORACLED row (the verified-twin pattern on the
      // ANN side): with candMult spanning the whole corpus the ADC
      // stage cannot drop a true neighbor, and the exact rerank runs
      // the SAME VectorScore.l2 + Ranked.topK pipeline as FLAT search
      // => byte-equal to exact L2 KNN, so the q_knn_l2 oracle applies
      // while the full codebook/ADC/rerank machinery executes.
      val embs = Tables.embeddings(s, dir)
      val enc = pqEncodedFor(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val n = enc.count()
      graft.vector.PqIndex.searchRerank(pqModelFor(s, dir), enc, embs,
        "vec_id", "embedding", qLocal, k = 10, candMult = ((n + 9) / 10).toInt)
    }),

    "q_bq_search" -> ((s, dir) => {
      // binary quantization: 1 bit/dim against the per-dim corpus mean,
      // Hamming = XOR + popcount over packed longs. UNLIKE the float
      // families, the production ranking itself is integer-exact — the
      // oracle recomputes the identical distances by counting per-dim
      // sign disagreements, so this row is fully oracled with NO
      // exhaustive configuration needed (the packing is what's proved).
      // Thresholds + words are persisted ingest artifacts (bqthr/bqwords).
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.BqIndex.search(bqModelFor(s, dir), bqEncodedFor(s, dir),
        qLocal, k = 10)
    }),

    "q_bq_radius" -> ((s, dir) => {
      // radius on the BQ index: the gate is the index's OWN integer
      // Hamming distance, so gate and ranking share one metric and a
      // single bounded-heap scan is EXACT — no escalation ladder, no
      // exhaustive twin (the graph/cell radius routes escalate because
      // their beams navigate a PROXY of the gate metric; a linear bit
      // scan sees every code once). radius=24/limit=15 mixes
      // under-filled balls (11 hits) with truncated ones (22).
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.BqIndex.searchRadius(bqModelFor(s, dir),
        bqEncodedFor(s, dir), qLocal, radius = 24, k = 15)
    }),

    "q_bq_radius_filtered" -> ((s, dir) => {
      // filtered radius on the BQ index: the scalar predicate
      // SEMI-JOINS the code table down BEFORE the scan (a scan
      // structure pre-filters where a graph post-filters its beam),
      // so the in-ball top-k is exact among eligible rows at any
      // selectivity — still fully oracled
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val eligible = bqEncodedFor(s, dir).join(
        embs.where(col("label").isin(1, 2, 3))
          .select(col("vec_id").as("id")), Seq("id"), "left_semi")
      graft.vector.BqIndex.searchRadius(bqModelFor(s, dir), eligible,
        qLocal, radius = 28, k = 10)
    }),

    "q_bq_rerank" -> ((s, dir) => {
      // the production BQ pattern at a PRODUCTION shortlist (candMult=5,
      // 50 of the corpus): bit scan -> Hamming shortlist -> exact cosine
      // rerank of the sliver. Still fully oracled: the shortlist ties on
      // (distance, id) so the candidate SET is deterministic and the
      // oracle recomputes shortlist + rerank end-to-end.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.BqIndex.searchRerank(bqModelFor(s, dir), bqEncodedFor(s, dir),
        embs, "vec_id", "embedding", qLocal, k = 10, candMult = 5)
    }),

    "q_ivfpq_exhaustive" -> ((s, dir) => {
      // IVF_PQ's ORACLED row: nprobe = nlist probes every cell and the
      // corpus-spanning candMult makes the exact rerank degenerate to
      // exact L2 KNN (Round5Spec pins the same equality at the API
      // level; this runs it through the persisted artifacts — coarse
      // centroids, codebooks, cell-partitioned codes — end-to-end).
      val embs = Tables.embeddings(s, dir)
      val enc = ivfpqEncodedFor(s, dir)
      val centers = ivfCentroidsFor(s, dir).select("cell", "centroid").collect()
        .map(r => (r.getSeq[Double](1).toArray, r.getInt(0))).toSeq
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val n = enc.count()
      graft.vector.IvfPq.searchStoredRerank(centers, pqModelFor(s, dir), enc,
        embs, "vec_id", "embedding", qLocal, kTop = 10, nprobe = 16,
        candMult = ((n + 9) / 10).toInt)
    }),

    "q_ivfsq_search" -> ((s, dir) => {
      // IVF_SQ8 production path (the remaining member of the
      // reference's "IVF series"): nprobe cells prune the scan, the
      // uint8-coded (4x-compressed) rows rank by dequantized distance.
      // Rows-only by design — the quantized ranking is approximate
      // (RecallProbe measures it); the exhaustive twin below oracles
      // the same machinery.
      val embs = Tables.embeddings(s, dir)
      val enc = ivfsqEncodedFor(s, dir)
      val centers = ivfCentroidsFor(s, dir).select("cell", "centroid").collect()
        .map(r => (r.getSeq[Double](1).toArray, r.getInt(0))).toSeq
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.IvfSq.searchStored(centers, sqModelFor(s, dir), enc,
        qLocal, kTop = 10, nprobe = 4)
    }),

    "q_ivfsq_exhaustive" -> ((s, dir) => {
      // IVF_SQ8's ORACLED row (the verified-twin pattern): nprobe =
      // nlist probes every cell, and the corpus-spanning candMult makes
      // the exact rerank — the SAME VectorScore.l2 + Ranked.topK
      // pipeline as FLAT — degenerate to exact L2 KNN while the full
      // bounds/code/dequant machinery executes end-to-end from the
      // persisted artifacts.
      val embs = Tables.embeddings(s, dir)
      val enc = ivfsqEncodedFor(s, dir)
      val centers = ivfCentroidsFor(s, dir).select("cell", "centroid").collect()
        .map(r => (r.getSeq[Double](1).toArray, r.getInt(0))).toSeq
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val n = enc.count()
      graft.vector.IvfSq.searchStoredRerank(centers, sqModelFor(s, dir), enc,
        embs, "vec_id", "embedding", qLocal, kTop = 10, nprobe = 16,
        candMult = ((n + 9) / 10).toInt)
    }),

    "q_sq_radius" -> ((s, dir) => {
      // EXACT L2 radius from the IVF_SQ8 artifacts — certificate-backed
      // at both levels (row 118): stored per-cell ball radii prune
      // cells at file listing (||q-c_j|| > R + rho_j provably holds no
      // member), the stored per-row reconstruction error gates the ADC
      // scan to the ball's provable superset, and only that sliver's
      // original vectors are exactly reranked. Fully oracled — the
      // oracle is plain exact L2 radius+limit; it never needs to know
      // a quantizer existed (contrast the graph/cell radius routes,
      // which escalate a proxy beam with measured recall). radius=1.2 /
      // limit=15 mixes under-filled (5-12 hits at small SF) and
      // truncated (19-33 in-ball at sf0.1) regimes.
      val embs = Tables.embeddings(s, dir)
      val enc = ivfsqEncodedFor(s, dir)
      val centers = ivfCentroidsFor(s, dir).select("cell", "centroid").collect()
        .map(r => (r.getSeq[Double](1).toArray, r.getInt(0))).toSeq
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.IvfSq.searchStoredRadius(centers, ivfsqStatsFor(s, dir),
        sqModelFor(s, dir), enc, embs, "vec_id", "embedding",
        qLocal, radius = 1.2, k = 15)
    }),

    "q_sq_radius_filtered" -> ((s, dir) => {
      // filtered exact radius on IVF_SQ8: the scalar predicate
      // SEMI-JOINS the code table down BEFORE the scan and the exact
      // rerank runs against the same filtered snapshot — exact among
      // eligible rows at any selectivity, still fully oracled. Cell
      // pruning stays conservative under a filter (rho over the full
      // cell >= rho over its filtered subset).
      val embs = Tables.embeddings(s, dir)
      val eligible = embs.where(col("label").isin(1, 2, 3))
      val enc = ivfsqEncodedFor(s, dir).join(
        eligible.select(col("vec_id").as("id")), Seq("id"), "left_semi")
      val centers = ivfCentroidsFor(s, dir).select("cell", "centroid").collect()
        .map(r => (r.getSeq[Double](1).toArray, r.getInt(0))).toSeq
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.IvfSq.searchStoredRadius(centers, ivfsqStatsFor(s, dir),
        sqModelFor(s, dir), enc, eligible, "vec_id", "embedding",
        qLocal, radius = 1.25, k = 10)
    }),

    "q_sq_radius_cos" -> ((s, dir) => {
      // EXACT COSINE radius from a cosine-built IVF_SQ8 index (row
      // 118's cosine arm, r13): the stored artifacts live on the unit
      // sphere, the cell + row certificates gate at the L2 radius
      // √(2−2r), and the exact rerank scores true cosine over the RAW
      // vectors with the FLAT route's own expression and gate — so the
      // oracle is plain cosine radius+limit, quantizer-invisible, the
      // q_sq_radius discipline in the reference's DEFAULT metric.
      // r=0.35 sits under the corpus' max pair cosine (0.48–0.60 per
      // SF, §5b) so in-ball sets are non-trivial; limit=15 truncates.
      val embs = Tables.embeddings(s, dir)
      val enc = ivfsqCosEncodedFor(s, dir)
      val centers = ivfCosCentroidsFor(s, dir).select("cell", "centroid").collect()
        .map(r => (r.getSeq[Double](1).toArray, r.getInt(0))).toSeq
      val qRaw = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val gq = qRaw.map { case (q, v) =>
        (q, graft.vector.VectorScore.unitNormArr(v)) }
      val r = 0.35
      graft.vector.IvfSq.searchStoredRadius(centers, ivfsqCosStatsFor(s, dir),
        sqCosModelFor(s, dir), enc, embs, "vec_id", "embedding",
        gq, math.sqrt(2.0 - 2.0 * r), k = 15,
        rerank = graft.vector.Ranked.Rerank("cosine", qRaw, Some(r)))
    }),

    "q_pq_radius" -> ((s, dir) => {
      // EXACT L2 radius from the PQ codes (row 118's flat-layout arm):
      // the ADC pass gates on the stored per-row resid — at this
      // deliberately coarse codebook (m=8, k=16) the resids are LARGE,
      // so the certificate gate is wide and the exactness is doing
      // real work (a lossier quantizer widens the gate, never the
      // answer; §7-probes-r11 measures the survivor fraction against
      // codebook size). Fully oracled as plain exact L2 radius.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.PqIndex.searchRadius(pqModelFor(s, dir),
        pqEncodedFor(s, dir), embs, "vec_id", "embedding",
        qLocal, radius = 1.2, k = 12)
    }),

    "q_ivfpq_radius" -> ((s, dir) => {
      // EXACT L2 radius from the IVF_PQ layout — with this, every
      // quantized family serves radius: BQ (integer-exact, row 116),
      // IVF_SQ8 / PQ / IVF_PQ (certificate-exact, row 118). The cell
      // stats are shared with q_sq_radius: both composed families ride
      // the same coarse model (ivfCentroidsFor) and the same
      // assignExpr, so one rho table certifies both layouts.
      val embs = Tables.embeddings(s, dir)
      val enc = ivfpqEncodedFor(s, dir)
      val centers = ivfCentroidsFor(s, dir).select("cell", "centroid").collect()
        .map(r => (r.getSeq[Double](1).toArray, r.getInt(0))).toSeq
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.IvfPq.searchStoredRadius(centers, ivfsqStatsFor(s, dir),
        pqModelFor(s, dir), enc, embs, "vec_id", "embedding",
        qLocal, radius = 1.2, k = 10)
    }),

    "q_sq_topk_exact" -> ((s, dir) => {
      // EXACT top-k from the SQ8 coded scan — the kth-upper-bound
      // certificate (row 118's top-k sibling): pass 1 bounds the true
      // kth distance by the kth smallest (ADC + resid), pass 2 keeps
      // the provable superset, exact rerank closes. Oracled as plain
      // exact L2 KNN — the candMult-rerank's "is the shortlist big
      // enough?" answered by a certificate instead of a guess.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.SqIndex.searchTopKExact(sqModelFor(s, dir),
        ivfsqEncodedFor(s, dir), embs, "vec_id", "embedding", qLocal, k = 10)
    }),

    "q_pq_topk_exact" -> ((s, dir) => {
      // the same certificate over the PQ ADC scan: even at the coarse
      // m=8/k=16 codebook (whose wide resids make the gate admit most
      // of the corpus — §7-probes-r11 measures it) the answer is
      // byte-equal to exact KNN; a finer quantizer narrows the work,
      // never the result.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.PqIndex.searchTopKExact(pqModelFor(s, dir),
        pqEncodedFor(s, dir), embs, "vec_id", "embedding", qLocal, k = 10)
    }),

    "q_pq_radius_filtered" -> ((s, dir) => {
      // filtered exact radius on PQ codes: semi-join before the scan,
      // rerank against the filtered snapshot — exact among eligible
      // rows, fully oracled.
      val embs = Tables.embeddings(s, dir)
      val eligible = embs.where(col("label").isin(1, 2, 3))
      val enc = pqEncodedFor(s, dir).join(
        eligible.select(col("vec_id").as("id")), Seq("id"), "left_semi")
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.PqIndex.searchRadius(pqModelFor(s, dir), enc,
        eligible, "vec_id", "embedding", qLocal, radius = 1.25, k = 8)
    }),

    "q_hnsw_search" -> ((s, dir) => {
      // the reference's DEFAULT index (HNSW, search param `ef` —
      // collection.py:179): per-segment graph traversal narrows each
      // of the 4 segment graphs to ef=48 candidates per query, exact
      // cosine rerank of the sliver. Production path — rows-only by
      // design (RecallProbe measures what ef buys; recall floor pinned
      // in HnswSpec); the exhaustive twin below is the oracled row.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.HnswIndex.search(hnswGraphFor(s, dir), embs,
        "vec_id", "embedding", qLocal, "cosine", k = 10, ef = 48)
    }),

    "q_hnsw_exhaustive" -> ((s, dir) => {
      // HNSW's ORACLED row (the verified-twin pattern): the build's
      // chain edges make every segment graph connected BY CONSTRUCTION,
      // so ef >= segment size visits every node, candidates degenerate
      // to the whole corpus, and the exact rerank — the SAME
      // VectorScore + Ranked.topK pipeline as FLAT — equals exact
      // cosine KNN byte-for-byte while the full graph machinery
      // (entry-point descent, beam search, k-merge) executes
      // end-to-end from the persisted artifact.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.HnswIndex.search(hnswGraphFor(s, dir), embs,
        "vec_id", "embedding", qLocal, "cosine", k = 10, ef = Int.MaxValue)
    }),

    "q_hnsw_string_exhaustive" -> ((s, dir) => {
      // String-PK twin of q_hnsw_exhaustive — the reference's document
      // id is ALWAYS a string (collection.py:135 document_ids:
      // List[str]) and its default index is HNSW, so this is the
      // reference's single most common configuration. Graph nodes are
      // xxhash64(id) surrogates (the chunk layer's device); the exact
      // rerank restores the REAL string id (Ranked.candidateRows), so
      // the oracled output is string-keyed end-to-end and ties break
      // on the STRING id exactly as DuckDB orders them.
      val embs = Tables.embeddings(s, dir)
        .select(concat(lit("e"), col("vec_id").cast("string")).as("sid"),
          col("embedding"))
      val graph = graft.catalog.IndexStore.ensure(s,
          s"hnswgraph_str_${sfKey(dir)}", partitionBy = Seq("seg")) {
        graft.vector.HnswIndex.build(
          embs.withColumn("__sid64", xxhash64(col("sid"))),
          "__sid64", "embedding", m = 8, efConstruction = 64, numSegments = 4)
      }
      val qLocal = Tables.embeddings(s, dir).where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.HnswIndex.search(graph, embs, "sid", "embedding", qLocal,
        "cosine", k = 10, ef = Int.MaxValue,
        nodeKey = Some(xxhash64(col("sid"))))
    }),

    "q_hnsw_radius_exhaustive" -> ((s, dir) => {
      // radius served FROM THE GRAPH (reference: radius rides in
      // SearchParams next to ef, applied WITH the configured index —
      // model/document.py, stub.py:589), oracled by the verified-twin
      // device: ef >= segment size visits every node, so the raw-score
      // radius gate + bounded-heap top-k over the graph's candidates
      // equals FLAT radius+limit search byte-for-byte while the whole
      // traversal/rescore/boundary machinery executes end-to-end.
      val embs = Tables.embeddings(s, dir)
      val qLocal = embs.where(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      graft.vector.HnswIndex.searchRadius(hnswGraphFor(s, dir), embs,
        "vec_id", "embedding", qLocal, "cosine", r = 0.3, k = 5,
        ef = Int.MaxValue)
    }),

    "q_hard_negatives_hnsw" -> ((s, dir) => {
      // ANN arm of hard-negative mining at PRODUCTION ef (rows-only by
      // design — the exhaustive twin below is the oracled row): ONE
      // label-blind traversal over the persisted graph for the whole
      // anchor batch, null-safe label predicate applied at the exact
      // rerank (the hardNegativesHnsw rung shape; the client adds the
      // adaptive fill ladder on top, pinned in Round10Spec)
      hardNegativesFromGraph(s, dir, ef = 48)
    }),

    "q_hard_negatives_hnsw_exhaustive" -> ((s, dir) => {
      // the ORACLED twin: ef >= segment size visits every node, so the
      // label-filtered rerank over the graph's candidates equals the
      // exact O(N·Q) scan (KnnSearch.hardNegatives, q_hard_negatives'
      // oracle) byte-for-byte while the traversal + label-join rerank
      // executes end-to-end from the persisted artifact
      hardNegativesFromGraph(s, dir, ef = Int.MaxValue)
    }),

    "q_lsh_ann" -> ((s, dir) => {
      // banded ANN over the PERSISTED bucket table (signatures are the
      // O(corpus) part — computed once at rebuild, not per query) at
      // the measured production config: recall@10 = 0.92 (RecallProbe,
      // vs 0.45 at the old 16/4)
      val buckets = graft.catalog.IndexStore.ensure(s, s"lshbuckets64_${sfKey(dir)}") {
        LshIndex.bucketTable(Tables.embeddings(s, dir), "vec_id", "embedding",
          nBits = 64, bands = 16, dim = 64)
      }
      LshIndex.annIndexed(buckets, Tables.embeddings(s, dir), "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", k = 10, nBits = 64, bands = 16,
        dim = 64, seed = 42L)
    }),

    "q_lsh_ann_exhaustive" -> ((s, dir) => {
      // the LSH family's ORACLED row: at exhaustive-grade r=2 bands
      // (64/32 — measured recall@10 = 1.0 at all three SFs) the band
      // candidates cover the true top-k, and since the final ranking is
      // the SAME exact-cosine Ranked.topK the FLAT path uses, the
      // output is byte-identical to exact KNN — so the q_knn_cosine
      // oracle applies. The same candidates-then-verify oracle pattern
      // as the dedup twins, on the ANN side.
      val buckets = graft.catalog.IndexStore.ensure(s, s"lshbuckets6432_${sfKey(dir)}") {
        LshIndex.bucketTable(Tables.embeddings(s, dir), "vec_id", "embedding",
          nBits = 64, bands = 32, dim = 64)
      }
      LshIndex.annIndexed(buckets, Tables.embeddings(s, dir), "vec_id", "embedding",
        knnQueries(s, dir), "qid", "qvec", k = 10, nBits = 64, bands = 32,
        dim = 64, seed = 42L)
    }),

    "q_search_by_text" -> ((s, dir) => {
      // corpus embedded once at ingest (persisted index); per query only
      // the two query strings are embedded
      TextEmbed.searchEmbedded(embedIndexFor(s, dir), "doc_id",
        Seq("spark join filter window scan", "the fast key order sort table"), k = 10)
    }),

    "q_search_by_text_w2v" -> ((s, dir) => {
      // TRAINED-embedding search_by_text (row 113 — the reference's
      // server-side model, stood in by MLlib Word2Vec instead of the
      // hash stub): the word-vector table is a persisted ingest
      // artifact; corpus and queries embed through it as a pure
      // relational mean-of-word-vectors (deterministic given the
      // artifact), exact cosine top-k. rows-only by design: hogwild
      // SGD training isn't SQL-expressible — Round10Spec pins the
      // mechanics (artifact shape, vocab-mean embed, OOV totality,
      // upsert-through-vocab)
      val docs = Tables.documents(s, dir)
      val vocab = graft.catalog.IndexStore.ensure(s, s"w2vvocab_${sfKey(dir)}") {
        TextEmbed.trainWord2VecVocab(docs, "text", dim = 32)
      }
      val corpus = TextEmbed.embedWithVocab(docs, "doc_id", "text", vocab)
        .where(col("vec").isNotNull)
      val q = TextEmbed.embedWithVocab(
        docs.where(col("doc_id") < 2)
          .select(col("doc_id").as("qid"), col("text").as("qtext")),
        "qid", "qtext", vocab).where(col("vec").isNotNull)
      KnnSearch.topK(corpus, "doc_id", "vec", q, "qid", "vec", "cosine", 10)
    }),

    "q_dedup_minhash" -> ((s, dir) => {
      // signatures are an ingest artifact: the shingle+min O(corpus)
      // pass is persisted once; the query pays only the banded join
      val sig = graft.catalog.IndexStore.ensure(s, s"minhashsig_${sfKey(dir)}") {
        Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text")
      }
      Dedup.minhashLshFromSignatures(sig, threshold = 0.5)
    }),

    "q_dedup_simhash" -> ((s, dir) => {
      val sig = graft.catalog.IndexStore.ensure(s, s"simhashsig_${sfKey(dir)}") {
        Dedup.simhashSignatures(Tables.documents(s, dir), "doc_id", "text")
      }
      Dedup.simhashPairsFromSignatures(sig, maxHamming = 3)
    }),

    "q_dedup_simhash_verified" -> ((s, dir) => {
      // simhash block-bucket candidates (exhaustive-grade 8x8-bit
      // blocks: every j>=0.5 pair on the test corpora shares a block)
      // verified with EXACT jaccard over the persisted ngram postings —
      // same candidates-then-verify shape as q_dedup_minhash_verified,
      // hash-matches the same posting self-join oracle while the pair
      // join stays block-bounded
      val sig = graft.catalog.IndexStore.ensure(s, s"simhashsig_${sfKey(dir)}") {
        Dedup.simhashSignatures(Tables.documents(s, dir), "doc_id", "text")
      }
      Dedup.simhashVerifiedFromSets(sig, gramSetsFor(s, dir),
        blocks = 8, threshold = 0.5)
    }),

    "q_dedup_minhash_verified" -> ((s, dir) => {
      // minhash-banded candidates (exhaustive-grade r=1: a j>=0.5 pair
      // misses all 32 bands with p = 2^-32) verified with EXACT jaccard
      // over the persisted ngram postings — approximate candidate
      // generation, exact output: hash-matches the q_dedup_ngram oracle
      // while the pair join stays candidate-bounded
      val sig = graft.catalog.IndexStore.ensure(s, s"minhashsig_${sfKey(dir)}") {
        Dedup.minhashSignatures(Tables.documents(s, dir), "doc_id", "text")
      }
      Dedup.minhashVerifiedFromSets(sig, gramSetsFor(s, dir),
        numPerms = 32, bands = 32, threshold = 0.5)
    }),

    "q_det_split" -> ((s, dir) => {
      // deterministic content-addressed train/eval split: a pure
      // projection (no shuffle, no RNG state) reproducible across runs
      // and engines — eval docs can never leak into train between
      // pipeline versions
      graft.ops.Curation.hashSplit(
        Tables.documents(s, dir).select("doc_id"), "doc_id").orderBy("doc_id")
    }),

    "q_quality_filter" -> ((s, dir) => {
      // per-language top-quartile quality selection: thresholds derive
      // from a (lang, score) value-histogram (the corpus never sorts or
      // shuffles — the only full-width pass is the final filter scan)
      val scored = TextAnalysis.quality(
        Tables.documents(s, dir), "doc_id", "text", keep = Seq("lang"))
        .select("doc_id", "lang", "quality")
      graft.ops.Curation.topQuantileByGroup(scored, "lang", "quality", q = 0.75)
        .select("doc_id", "lang", "quality").orderBy("doc_id")
    }),

    "q_contamination" -> ((s, dir) => {
      // eval-split docs whose 3-grams already appear in the train
      // split: the held-out-contamination probe. Served from the
      // PERSISTED ngram postings (split membership is an expression
      // over doc_id, so the artifact needs no split column); train
      // grams collapse to a distinct set, so each eval gram matches
      // at most once — a containment join, never a pair fan-out
      graft.ops.Curation.contaminationFromGrams(ngramPostingsFor(s, dir))
    }),

    "q_decontaminate" -> ((s, dir) => {
      // the APPLY step of row 51: keep train-split docs whose gram
      // overlap with the eval split stays below 80% — the eval side
      // (the benchmark: small by construction) collapses to a
      // broadcast distinct-gram set, so the train corpus never
      // shuffles for the probe. Served from the persisted postings.
      graft.ops.Curation.decontaminateFromGrams(ngramPostingsFor(s, dir),
        maxShare = 0.8)
    }),

    "q_domain_mix" -> ((s, dir) => {
      // deterministic weighted domain sampling (data mixing): per-source
      // keep rates applied as a content-addressed hash threshold — a
      // pure projection (no shuffle, no RNG), reproducible across
      // engines, monotone in the rate (raising a rate only ADDS docs)
      graft.ops.Curation.sampleByWeights(
        Tables.documents(s, dir).select("doc_id", "source"), "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25,
          "src4" -> 0.0),
        defaultWeight = 0.6)
        .orderBy("doc_id")
    }),

    "q_length_quantiles" -> ((s, dir) => {
      // per-domain length distribution: EXACT integer-rank quantiles
      // (pX = smallest len with cum·100 >= X·N — no float percentile
      // interpolation), plus min/max/total — the profile packing ctx
      // sizes and Gopher floors are tuned from
      graft.ops.Curation.lengthQuantiles(
          Tables.documents(s, dir), "text", "source")
        .orderBy("domain")
    }),

    "q_winnow" -> ((s, dir) => {
      // winnowing fingerprints (Schleimer et al. 2003, the MOSS
      // scheme): per-window minima of salted-md5 k-gram hashes — any
      // verbatim match >= w+k-1 tokens shares a fingerprint at ANY
      // alignment, sketch density <= 2/(w+1). Pure projection; the
      // oracle recomputes the identical integers
      TextAnalysis.winnowFingerprints(
          Tables.documents(s, dir), "doc_id", "text", k = 4, w = 4)
        .orderBy("doc_id", "pos")
    }),

    "q_lang_lines" -> ((s, dir) => {
      // mixed-language page detection: per-line langId, majority
      // language + agreement ratio per doc. The synthetic corpus is
      // single-line, so the entry deterministically plants Spanish /
      // French lines (doc_id-keyed, mirrored in the oracle) — majority,
      // tie, and agreement paths all non-vacuous at every SF
      val planted = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(2L)) === 0,
            lit("\nel la de y en que el la")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5L)) === 0,
            lit("\nle est une et le est")).otherwise(lit(""))).as("text"))
      TextAnalysis.langLineComposition(planted, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q_winnow_matches" -> ((s, dir) => {
      // MOSS candidate stage: doc pairs sharing >= 2 distinct winnow
      // fingerprints (posting self-join over the sketch, df-pruned).
      // The sketch postings are an ingest artifact — computed once per
      // corpus like every dedup family's signatures; the query pays
      // the posting join only
      val fp = graft.catalog.IndexStore.ensure(s, s"winnowfp_${sfKey(dir)}") {
        TextAnalysis.winnowPostings(
          Tables.documents(s, dir), "doc_id", "text", k = 4, w = 4)
      }
      TextAnalysis.winnowMatchesFromPostings(fp, minShared = 2)
        .orderBy("id_a", "id_b")
    }),

    "q_corpus_stats" -> ((s, dir) => {
      // per-domain corpus report card: doc count, distinct-content
      // count (md5 identity), token volume, vocabulary size, char
      // volume, mean doc length — every metric integer-derived so the
      // oracle compare is exact (the sole ratio is one long/long
      // division, identical IEEE in both engines)
      graft.ops.Curation.corpusStats(
          Tables.documents(s, dir), "text", "source")
        .orderBy("domain")
    }),

    "q_pack" -> ((s, dir) => {
      // deterministic sequence packing: concat-and-chunk docs into
      // 256-token training rows; canonical order = (salted hash shard,
      // id) so the corpus shuffles once on shard and no global sort
      // exists — nShards bounds per-partition window size at scale
      import s.implicits._
      val docs = Tables.documents(s, dir)
      graft.ops.Curation.packSequences(docs, "doc_id",
          size(split($"text", " ")), budget = 256, nShards = 8)
        .orderBy("doc_id")
    }),

    "q_curate_pipeline" -> ((s, dir) => {
      // the COMPLETE training-set build, end-to-end: quality threshold
      // -> domain mix -> exact content dedup (lowest id per md5(text))
      // -> train split -> token-budget packing. Every stage
      // content-addressed, the whole pipeline oracle-verified as one
      // query.
      graft.ops.Curation.buildTrainingSet(
        Tables.documents(s, dir), "doc_id", "text", "source",
        weights = Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5,
          "src3" -> 0.25, "src4" -> 0.0),
        defaultWeight = 0.6, minQuality = 0.45,
        trainPct = 90, budget = 256, nShards = 8)
        .orderBy("doc_id")
    }),

    "q_repetition" -> ((s, dir) => {
      // Gopher-style repetition quality signal: duplicate-word fraction
      // + top-word share, pure per-row array expressions (zero shuffle)
      graft.text.TextAnalysis.repetitionStats(
        Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id")
    }),

    "q_temp_sample" -> ((s, dir) => {
      // temperature-based domain rebalancing (T=2): keep rate per
      // domain = sqrt(c_min/c_d) — head domains flatten toward the
      // tail, content-addressed like q_domain_mix. sqrt is correctly
      // rounded in IEEE, so the derived integer thresholds reproduce
      // bit-identically in the oracle.
      graft.ops.Curation.temperatureSample(
          Tables.documents(s, dir).select("doc_id", "source"),
          "doc_id", "source")
        .orderBy("doc_id")
    }),

    "q_shuffle_shards" -> ((s, dir) => {
      // deterministic sharded corpus SHUFFLE: no global permutation
      // index (a corpus-wide row_number is a single-partition sort) —
      // (shard, pos) addressing from two salted md5 hashes of the id,
      // content-addressed like q_det_split (reshuffle = change the
      // salt). One hash partitioning + per-shard bounded sorts.
      graft.ops.Curation.shuffleShards(
          Tables.documents(s, dir).select("doc_id"), "doc_id", nShards = 8)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    }),

    "q_length_batches" -> ((s, dir) => {
      // padding-minimizing loader batching: 16-token length bands,
      // batch_id = salted-hash rank within the band div 32 — similar
      // lengths share a batch (padding waste bounded by the band
      // width), domains mix deterministically. Only (id, count)
      // shuffle; the text never does.
      graft.ops.Curation.lengthBatches(
          Tables.documents(s, dir), "doc_id", "text",
          batchSize = 32, bandTokens = 16, nShards = 4)
        .select("doc_id", "ws_tokens", "bucket", "shard", "batch_id")
        .orderBy("doc_id")
    }),

    "q_pii_scrub" -> ((s, dir) => {
      // PII redaction (emails / IPv4s / phone-shaped runs -> typed
      // placeholders) with per-doc match counts — a pure projection at
      // scan speed. The synthetic corpus carries no PII, so the input
      // deterministically plants some (doc_id-keyed, mirrored in the
      // oracle) — the redaction path is non-vacuous at every SF.
      val docs = Tables.documents(s, dir)
      val withPii = docs.select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" contact u"), col("doc_id").cast("string"),
              lit("@mail.example.com"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            concat(lit(" from 10.0."), pmod(col("doc_id"), lit(200)).cast("string"),
              lit(".77"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7)) === 0,
            lit(" call 555-123-4567")).otherwise(lit(""))).as("text"))
      graft.text.TextAnalysis.scrubPii(withPii, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q_encoding_noise" -> ((s, dir) => {
      // mojibake/corruption scoring: control-char + U+FFFD counts and
      // their ratio — the RefinedWeb-style drop signal for documents
      // that survived a wrong decode. The synthetic corpus is clean,
      // so the entry deterministically plants noise (doc_id-keyed,
      // mirrored in the oracle) — non-vacuous at every SF.
      val docs = Tables.documents(s, dir)
      val planted = docs.select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(4)) === 0, lit("\u0007\u0001"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(6)) === 0, lit("\ufffd"))
            .otherwise(lit("")))
          .as("text"))
      graft.text.TextAnalysis.encodingNoise(planted, "doc_id", "text")
        .select(col("doc_id"), col("n_ctrl"), col("n_repl"), col("n_chars"),
          round(col("noise_ratio"), 6).as("noise_ratio"))
        .orderBy("doc_id")
    }),

    "q_lm_kneser_ney" -> ((s, dir) => {
      // interpolated Kneser–Ney over the SAME train/held-out split and
      // the SAME bigram sufficient statistic as q_lm_perplexity — the
      // backoff is the continuation distribution (distinct-context
      // counts), the smoothing KenLM/CCNet actually ship
      val docs = Tables.documents(s, dir)
      val model = graft.text.NgramLm.train(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      graft.text.NgramLm.scoreKn(
          docs.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", model)
        .orderBy("doc_id")
    }),

    "q_lm_perplexity" -> ((s, dir) => {
      // CCNet-style LM quality scoring: an interpolated absolute-
      // discount bigram LM trained on the even-doc_id half of the
      // corpus scores the HELD-OUT odd half — the split makes every
      // backoff path real (unseen bigrams, contexts AND words), which
      // is the deployment shape: counts are a persisted artifact,
      // candidates stream through it. nll = −mean per-token ln p at
      // the pinned rounding discipline (NgramLm scaladoc).
      val docs = Tables.documents(s, dir)
      val model = graft.text.NgramLm.train(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      graft.text.NgramLm.score(
          docs.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", model)
        .orderBy("doc_id")
    }),

    "q_lm_perplexity3" -> ((s, dir) => {
      // the order-3 chain of q_lm_perplexity: p3 backs off through p2
      // through the add-one unigram, double-<s> padding; same held-out
      // split, same rounding discipline. The trigram table is again
      // the lone sufficient statistic (its (v,w) marginal IS the
      // bigram table), which the oracle mirrors by deriving every
      // lower-order count from the tg CTE.
      val docs = Tables.documents(s, dir)
      val model = graft.text.NgramLm.train3(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      graft.text.NgramLm.score3(
          docs.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", model)
        .orderBy("doc_id")
    }),

    "q_ppl_buckets" -> ((s, dir) => {
      // CCNet's head/middle/tail step over the whole corpus: the
      // even-half LM scores EVERY document (trusted-subset model, the
      // CCNet deployment), then per source domain the best third by
      // nll is head — integer thresholds, tie groups bucket where
      // they start (NgramLm.buckets scaladoc).
      val docs = Tables.documents(s, dir)
      val model = graft.text.NgramLm.train(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text")
      // scored materializes once (localCheckpoint, inside the timed
      // query): buckets() executes its input twice — the grouped
      // threshold pass and the final assignment join — and scored is
      // the whole-corpus LM pass, the query's heaviest subplan (each
      // re-execution also re-trains every broadcast model table)
      val scored = graft.text.NgramLm.score(docs, "doc_id", "text", model)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .localCheckpoint()
      graft.text.NgramLm.buckets(scored, "doc_id", "source")
        .select("doc_id", "source", "n_tokens", "nll", "ppl_bucket")
        .orderBy("doc_id")
    }),

    "q_dsir_weights" -> ((s, dir) => {
      // DSIR importance weights (Xie et al. 2023): hashed unigram +
      // bigram features; target = the English slice, raw = the whole
      // corpus; logw = exact micro-nat integer sum over the doc's
      // gram instances ÷ 10⁶ (Dsir scaladoc). Candidates are the
      // non-target docs — the selection population.
      val docs = Tables.documents(s, dir)
      val model = graft.ops.Dsir.fit(
        docs.where(col("lang") === "en"), docs, "doc_id", "text")
      graft.ops.Dsir.weights(
          docs.where(col("lang") =!= "en"), "doc_id", "text", model)
        .orderBy("doc_id")
    }),

    "q_dsir_select" -> ((s, dir) => {
      // the resampling step: Gumbel top-k over the same weights —
      // sampling without replacement proportional to the importance
      // weight, content-addressed so the draw reproduces across
      // engines (the oracle computes the identical BIGINT keys).
      val docs = Tables.documents(s, dir)
      val model = graft.ops.Dsir.fit(
        docs.where(col("lang") === "en"), docs, "doc_id", "text")
      graft.ops.Dsir.select(
        docs.where(col("lang") =!= "en"), "doc_id", "text", model, 50)
    }),

    "q_c4_filter" -> ((s, dir) => {
      // C4's line rules need line structure the single-line synthetic
      // corpus lacks, so the entry deterministically plants it
      // (doc_id-keyed, mirrored in the oracle): a 5-word terminal-
      // punctuated line (kept), a 2-word punctuated line (dropped —
      // too short), a 3-sentence line (pushes the page over the
      // sentence floor), and a "lorem ipsum" tail (kills the page).
      // The base line never ends in terminal punctuation, so the
      // rules do real work on every document.
      val docs = Tables.documents(s, dir)
      val planted = docs.select(col("doc_id"), concat(
        col("text"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          lit("\nalpha beta gamma delta epsilon.")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 0,
          lit("\nshort line.")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          lit("\none two three four five. six seven eight nine ten. " +
            "eleven twelve thirteen fourteen fifteen.")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit(" lorem ipsum")).otherwise(lit(""))).as("text"))
      graft.text.TextAnalysis.c4Clean(planted, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q_gopher_rules" -> ((s, dir) => {
      // Gopher's stopword probe and line rules are vacuous on the
      // synthetic corpus (one line, one probe word in the vocabulary),
      // so the entry plants variety: stopword tails (flips the ≥2-hit
      // rule), hash runs (symbol ratio + alpha ratio), bullet lines,
      // and an ellipsis line — every output column varies and `keep`
      // flips on multiple distinct rules.
      val docs = Tables.documents(s, dir)
      val planted = docs.select(col("doc_id"), concat(
        col("text"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          lit(" and that of with to")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(9)) === 0,
          lit(" # # # # # # # # # # # #")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0,
          lit("\n- alpha bullet\n- beta bullet")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(13)) === 0,
          lit("\ntrailing thought...")).otherwise(lit(""))).as("text"))
      graft.text.TextAnalysis.gopherRules(planted, "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q_concat_chunks" -> ((s, dir) => {
      // GPT-style concat-and-chunk: the corpus in shuffle order with
      // one EOD per doc, cut every 128 tokens — slice rows tile each
      // doc exactly and every non-final block is exactly full
      // (Curation.concatChunks scaladoc; CurationSpec pins both).
      val docs = Tables.documents(s, dir)
      graft.ops.Curation.concatChunks(docs, "doc_id", "text",
          ctxTokens = 128, nShards = 8)
        .orderBy("doc_id", "block_id")
    }),

    "q_vocab_drift" -> ((s, dir) => {
      // ingest-drift monitoring: token-frequency comparison between two
      // corpus slices (here: domains src0-9 vs src10-19 standing in for
      // accepted-corpus vs incoming-batch). Exact counts + one division
      // per rate => engine-reproducible full-outer frequency report.
      val docs = Tables.documents(s, dir)
      val sideA = docs.where(substring(col("source"), 4, 10).cast("int") < 10)
      val sideB = docs.where(substring(col("source"), 4, 10).cast("int") >= 10)
      graft.ops.Curation.vocabDrift(sideA, sideB, "text").orderBy("tok")
    }),

    "q_quality_classifier" -> ((s, dir) => {
      // learned quality filter (GPT-3-style LR over hashed token
      // counts), distilled from the heuristic quality threshold and
      // served from the persisted (idx, w) model artifact. Rows-only:
      // the L-BFGS fit is not SQL-expressible; determinism + held-out
      // accuracy are pinned in QualityClassifierSpec.
      val model = qcModelFor(s, dir)
      graft.ops.QualityClassifier.score(
          model, Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), round(col("quality_prob"), 4).as("quality_prob"))
        .orderBy("doc_id")
    }),

    "q_quality_score" -> ((s, dir) => {
      // the ORACLED member of the learned-quality family (r14): the
      // SAME HashingTF-counts → dot → decision serving as
      // q_quality_classifier, from a PERSISTED micro-quantized (idx,
      // w6) artifact whose training corpus is pinned — the weights are
      // integer micro units (the NgramLm micro-nat discipline), so the
      // dot product is order-independent integer arithmetic and the
      // output stays in LOGIT domain (sign = the P ≥ 0.5 decision; the
      // lone exp() never runs in the certified path, the same device
      // that serves nll instead of perplexity). The DuckDB oracle
      // replays it token-level: Σ over token instances of
      // w6(bucket(token)), with the 31-token corpus vocabulary's
      // bucket weights inlined as VALUES (collisions are harmless —
      // colliding tokens share a bucket weight on both sides).
      // QualityClassifierSpec pins quantize(train(pinned)) == the
      // inlined map. The L-BFGS fit (q_quality_classifier) stays
      // rows-only by design.
      graft.ops.QualityClassifier.scoreLogitMicro(
          qcMicroModelFor(s), Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    "q_rare_bigrams" -> ((s, dir) => {
      // corpus-conditioned fluency scoring (the n-gram-LM quality
      // proxy, integer-exact): rare = corpus P(bigram) <= 1/20000,
      // probed against the persisted bigram-frequency artifact
      graft.text.TextAnalysis.bigramNovelty(
          Tables.documents(s, dir), "doc_id", "text",
          bigramCountsFor(s, dir))
        .orderBy("doc_id")
    }),

    "q_vocab_build" -> ((s, dir) => {
      // frequency vocabulary: top-24 tokens by corpus count, id =
      // dense rank with (count DESC, token ASC) tie-break — the
      // tokenizer artifact loaders map ids through. 24 < the corpus'
      // 31 distinct tokens at every SF, so the OOV path below is
      // non-vacuous everywhere (SURVEY §4 checklist).
      graft.text.Tokenizer.buildVocab(Tables.documents(s, dir), "text", 24)
        .orderBy("id")
    }),

    "q_tokenize_ids" -> ((s, dir) => {
      // tokenize-to-training-ids against the persisted vocabulary:
      // exploded (doc_id, pos, token_id) with OOV -> -1; the vocab
      // equi-join is the only non-projection step
      graft.text.Tokenizer.tokenizeIds(
          Tables.documents(s, dir), "doc_id", "text", vocabFor(s, dir))
        .orderBy("doc_id", "pos")
    }),

    "q_bpe_encode" -> ((s, dir) => {
      // trained-BPE subword encoding served from the persisted merge
      // table (rows-only: the greedy merge loop is not SQL-expressible;
      // TokenizerSpec pins training order, encode determinism, and
      // round-trip). One row per word position; pieces concatenate
      // back to the word + the </w> terminal.
      graft.text.Bpe.encode(
          Tables.documents(s, dir), "doc_id", "text", bpeMergesFor(s, dir))
        .select(col("doc_id"), col("pos"),
          concat_ws("|", col("pieces")).as("pieces"))
        .orderBy("doc_id", "pos")
    }),

    "q_bpe_apply" -> ((s, dir) => {
      // the ORACLED member of the BPE family (r12 verdict #6): the
      // SAME Bpe.encode machinery as q_bpe_encode (distinct-word table
      // → broadcast merge ranks → iterative per-word merging → corpus
      // equi-join on the word key), served from a PERSISTED merge
      // artifact whose training dictionary is pinned — so the DuckDB
      // oracle can replay encodeWord move-for-move with a recursive
      // CTE over the inlined 12 merges (the mmrOracle device: bounded
      // per-word state, argmin by (rank, position), one merge per
      // iteration). q_bpe_encode (corpus-trained, 50 merges) stays
      // rows-only; this entry closes the family's oracle gap.
      graft.text.Bpe.encode(
          Tables.documents(s, dir), "doc_id", "text", bpeApplyMergesFor(s))
        .select(col("doc_id"), col("pos"),
          concat_ws("|", col("pieces")).as("pieces"))
        .orderBy("doc_id", "pos")
    }),

    "q_unigram_apply" -> ((s, dir) => {
      // the ORACLED member of the unigram family (q_bpe_apply's
      // artifact-as-fixture device on the OTHER tokenizer): the SAME
      // Unigram.encode machinery as q_unigram_encode — distinct-word
      // table → broadcast piece table → per-word integer Viterbi →
      // corpus equi-join — served from the pinned-dictionary artifact,
      // so the DuckDB oracle replays the Viterbi DP itself with a
      // recursive CTE (working table carries EVERY prefix state
      // forward per iteration; the new prefix's argmax orders by
      // (score DESC, piece-count ASC, piece ASC) — viterbi()'s exact
      // tie rules; unseen single chars get the -69000000 UNK floor).
      // q_unigram_encode (corpus-trained) stays rows-only by design.
      graft.text.Unigram.encode(
          Tables.documents(s, dir), "doc_id", "text", unigramApplyModelFor(s))
        .select(col("doc_id"), col("pos"),
          concat_ws("|", col("pieces")).as("pieces"))
        .orderBy("doc_id", "pos")
    }),

    "q_unigram_encode" -> ((s, dir) => {
      // unigram-LM (SentencePiece/Kudo) subword encoding served from
      // the persisted piece table (rows-only: the EM/prune trainer and
      // the Viterbi segmenter are not SQL-expressible; UnigramSpec
      // pins train determinism, the integer-Viterbi tie rules,
      // round-trip, id mapping, and distributed ≡ local training).
      // One row per word position; pieces concatenate back to the word.
      graft.text.Unigram.encode(
          Tables.documents(s, dir), "doc_id", "text", unigramModelFor(s, dir))
        .select(col("doc_id"), col("pos"),
          concat_ws("|", col("pieces")).as("pieces"))
        .orderBy("doc_id", "pos")
    }),

    "q_unigram_ids" -> ((s, dir) => {
      // unigram pieces to LOADER IDS from the persisted artifact alone
      // (logp-desc dense rank; unseen chars → UnkId) — the SentencePiece
      // analog of q_bpe_ids (rows-only; UnigramSpec pins ids ≡ pieces
      // under the artifact map and the UnkId contract)
      graft.text.Unigram.encodeIds(
          Tables.documents(s, dir), "doc_id", "text", unigramModelFor(s, dir))
        .select(col("doc_id"), col("pos"),
          concat_ws("|", transform(col("piece_ids"), i => i.cast("string")))
            .as("piece_ids"))
        .orderBy("doc_id", "pos")
    }),

    "q_bpe_ids" -> ((s, dir) => {
      // BPE to LOADER IDS, served from the persisted merge table: the
      // piece-id space derives from the artifact alone (EndMark = 0,
      // sorted base alphabet, then merge products in rank order — no
      // new ranking pass), so ids are byte-stable across sessions.
      // Rows-only (the merge loop is not SQL-expressible); TokenizerSpec
      // pins ids ≡ pieces under the vocab map and the round-trip
      // through ids back to the original words.
      graft.text.Bpe.encodeIds(
          Tables.documents(s, dir), "doc_id", "text", bpeMergesFor(s, dir))
        .select(col("doc_id"), col("pos"),
          concat_ws("|", transform(col("piece_ids"), i => i.cast("string")))
            .as("piece_ids"))
        .orderBy("doc_id", "pos")
    }),

    "q_bpe_apply_ids" -> ((s, dir) => {
      // the ORACLED member of the loader-ID family (r14): the SAME
      // Bpe.encodeIds machinery as q_bpe_ids — merge replay + the
      // piece→id map derived from the MERGE ARTIFACT ALONE (EndMark=0,
      // sorted base alphabet, then merge products in rank order,
      // first-wins on collision) — served from the PINNED 12-merge
      // artifact, so the DuckDB oracle extends the q_bpe_apply
      // recursive CTE with the id table computed IN SQL from the same
      // inlined merges (alphabet = distinct unit chars of the merge
      // symbols; first-wins = min id per piece; OOV → -1).
      // q_bpe_ids (corpus-trained merges) stays rows-only by design.
      graft.text.Bpe.encodeIds(
          Tables.documents(s, dir), "doc_id", "text", bpeApplyMergesFor(s))
        .select(col("doc_id"), col("pos"),
          concat_ws("|", transform(col("piece_ids"), i => i.cast("string")))
            .as("piece_ids"))
        .orderBy("doc_id", "pos")
    }),

    "q_unigram_apply_ids" -> ((s, dir) => {
      // the unigram side of the same graduation: Unigram.encodeIds
      // from the pinned piece table, whose stored piece_id is the
      // 0-based (logp DESC, piece ASC) rank — re-derivable in SQL as a
      // row_number over the inlined VALUES, so the oracle extends the
      // q_unigram_apply Viterbi CTE with the id join (UNK single
      // chars → -1). q_unigram_ids (corpus-trained) stays rows-only.
      graft.text.Unigram.encodeIds(
          Tables.documents(s, dir), "doc_id", "text", unigramApplyModelFor(s))
        .select(col("doc_id"), col("pos"),
          concat_ws("|", transform(col("piece_ids"), i => i.cast("string")))
            .as("piece_ids"))
        .orderBy("doc_id", "pos")
    }),

    "q_events_window" -> ((s, dir) => {
      // batch form of the streaming windowed aggregation (row 40):
      // tumbling 1h windows over the events stream table. Handles both
      // testdata vintages: TIMESTAMP(MICROS) parquet reads as a native
      // timestamp (used directly); TIMESTAMP(NANOS) reads as long (ns)
      // under nanosAsLong — integer-divide to micros (same truncation
      // DuckDB's ns->us reader applies).
      val events = Tables.events(s, dir)
      val tsCol = events.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000"))
        case _ => col("ts")
      }
      events
        .groupBy(date_trunc("hour", tsCol).as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("win", "event_type")
    }),

    "q_skew_join" -> ((s, dir) => {
      // deliberately skewed fact: ~75% of events map to nation key 3.
      // The salted join (ops.Skew) spreads the hot key over 8 reducers
      // in the PLAN; AQE's runtime skew-join split handles whatever
      // residual imbalance the stats reveal. The dim side is 25 rows —
      // salting explodes it 8x, still broadcastable.
      val fact = Tables.events(s, dir).select(
        when(col("user_id") % 4 =!= 0, lit(3L))
          .otherwise(col("user_id") % 25).as("n_nationkey"),
        col("value"))
      val dim = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      graft.ops.Skew.saltedJoin(fact, dim, "n_nationkey", salts = 8)
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("n_name")
    }),

    "q_json_field" -> ((s, dir) => {
      // reference documents carry arbitrary JSON-typed fields
      // (model/document.py): extract + filter + aggregate on a JSON attr
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables.events(s, dir)
        .select(col("event_type"), k.as("k"))
        .where(col("k") > 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")
    }),

    "q_chunk_search" -> ((s, dir) => {
      // AI-document layer: content search with neighbor expansion over
      // the PERSISTED chunk index (split+embed paid once at ingest,
      // rows-only; embedding stub not SQL-able). Served through the
      // persisted HNSW chunk graph (the reference's collection_view
      // default index) at exhaustive ef — candidates degenerate to the
      // whole index and the SAME string-key ranking pipeline runs, so
      // the output is byte-identical to the FLAT scan while the graph
      // machinery executes end-to-end; production ef is the knob
      // (CollectionViewSpec pins prod-ef recall and the exhaustive
      // equality).
      graft.text.CollectionView.search(chunkIndexFor(s, dir),
        "doc_id", "spark join filter window scan", limit = 10, expandChunk = (1, 1),
        graph = Some(chunkGraphFor(s, dir)), ef = Int.MaxValue)
    }),

    "q_scalar_index" -> ((s, dir) => {
      // scalar filter index (add_index): the collection is laid out
      // partitioned by the indexed field, so the lang equality prunes
      // whole directories at file listing (PartitionFilters) — the
      // n_chars predicate still pushes into the parquet scan
      val indexed = graft.catalog.IndexStore.ensure(s, s"scalaridx_${sfKey(dir)}",
        partitionBy = Seq("lang")) { Tables.documents(s, dir) }
      indexed.where(FilterParser.parse("""lang = "en" and n_chars > 200"""))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    "q_multimodal" -> ((s, dir) => {
      // REAL image decode (r13 — the 12-round stub premise was wrong
      // for images: javax.imageio ships in this JDK): plant one actual
      // PNG per document (pixels = affine formulas of (doc_id, x, y)
      // mod 256), ImageIO-decode it back per partition, reduce to
      // INTEGER pixel sums. PNG is lossless, so the decoded stats
      // equal the formula exactly — fully DuckDB-oracled end-to-end
      // through a real codec (encode → decode → pixel math).
      Multimodal.decodeImageStats(
          Multimodal.plantPng(Tables.documents(s, dir), "doc_id")).toDF()
        .orderBy("doc_id")
    }),

    "q_media_resize" -> ((s, dir) => {
      // REAL decode → nearest-neighbor resample → REAL re-encode →
      // REAL decode: the resize stage's integer math (src = ⌊x·sw/tw⌋)
      // is reproduced in the oracle, so the whole two-codec round trip
      // is integer-exact. 10×7 target ≠ any planted dim: every image
      // genuinely resamples.
      Multimodal.decodeImageStats(
          Multimodal.resizeNearest(
            Multimodal.plantPng(Tables.documents(s, dir), "doc_id"), 10, 7)).toDF()
        .orderBy("doc_id")
    }),

    "q_audio_decode" -> ((s, dir) => {
      // REAL audio decode (r13 late addition — the image lesson
      // applied to sound: javax.sound.sampled parses RIFF/WAV PCM in
      // the JDK, no sound hardware involved): plant one actual PCM16
      // WAV per document (samples = an integer formula of (doc_id, i)
      // in [-2048, 2047]), AudioSystem-decode it back per partition,
      // reduce to integer sample sums. 16-bit PCM is lossless for the
      // planted range, so the decoded stats equal the formula exactly
      // — fully DuckDB-oracled through a real audio codec. Lossy
      // audio (MP3/OGG) and video containers remain the declared stub.
      Multimodal.decodeWavStats(
          Multimodal.plantWav(Tables.documents(s, dir), "doc_id")).toDF()
        .orderBy("doc_id")
    }),

    "q_frame_sample" -> ((s, dir) => {
      // video-shaped multimodal pipeline on a REAL codec (r13): each
      // document plants a frame-stacked PNG (2+id%3 frames of 12×8),
      // the sampler decodes it and emits every 2nd frame's integer
      // pixel sums — the one-row-to-many-frames flatMap geometry,
      // now DuckDB-oracled through the codec like q_multimodal.
      Multimodal.frameStats(
          Multimodal.plantFramePng(Tables.documents(s, dir), "doc_id"),
          everyN = 2, maxFrames = 8).toDF()
        .orderBy("doc_id", "frame_idx")
    }),

    "q_gif_frames" -> ((s, dir) => {
      // frame sampling over a REAL multi-frame CONTAINER (r14): each
      // document plants a genuine animated GIF (2+id%3 frames,
      // identity-gray palette = lossless), the sampler discovers the
      // frame count FROM THE FILE (ImageReader.getNumImages) and
      // decodes every 2nd frame via read(i) — the q_frame_sample
      // contract with the one-file-many-frames geometry no longer
      // simulated by a stacking convention.
      Multimodal.gifFrameStats(
          Multimodal.plantGif(Tables.documents(s, dir), "doc_id"),
          everyN = 2, maxFrames = 8).toDF()
        .orderBy("doc_id", "frame_idx")
    })
  )

  private val FulltextTerms = Seq("spark", "join", "filter", "window", "scan")

  /** Per-query keyword lists for q_hybrid_perq (mirrored in its oracle). */
  private val PerQueryKeywords: Seq[(Long, String)] = Seq(
    0L -> "spark", 0L -> "join",
    1L -> "filter", 1L -> "window",
    2L -> "scan", 2L -> "table",
    3L -> "spark", 3L -> "scan")

  private[graft] def sfKey(dir: String): String = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** Deterministic shifted-duplicate planting for the arbitrary-
    * alignment substring-dedup entries (mirrored verbatim in their
    * oracle SQL): every doc_id % 101 == 0 document gets the same
    * 16-token passage prepended behind doc_id % 7 pad tokens, so the
    * passage recurs across carriers at token offsets 0–6 — off the
    * 16-block grid for every carrier but the 0-pad one, which keeps
    * the stride-16 report blind to it (one aligned carrier < minDocs)
    * while the stride-1 report must surface it. 5 carriers at the
    * 500-doc SFs, 50 at sf0.1. */
  private def plantShifted(docs: DataFrame): DataFrame = {
    val boiler = (0 until 16).map(i => s"bq$i").mkString(" ")
    docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(101)) === 0,
        concat(expr("repeat('pad ', cast(doc_id % 7 as int))"),
          lit(boiler), lit(" "), col("text")))
        .otherwise(col("text")).as("text"))
  }

  /** Persisted BM25 index for a testdata dir: built once per JVM (the
    * reference server's rebuild-at-ingest), then every fulltext/hybrid
    * query reads only its terms' posting lists via parquet In-pushdown
    * over the term-clustered files. */
  private[graft] def sparseIndexFor(s: SparkSession, dir: String): Bm25.SparseIndex = {
    val postings = graft.catalog.IndexStore.ensure(s, s"ftpost_${sfKey(dir)}") {
      Bm25.rawPostings(Tables.documents(s, dir), "doc_id", "text")
        .repartitionByRange(col("term")).sortWithinPartitions("term")
    }
    val terms = graft.catalog.IndexStore.ensure(s, s"ftterms_${sfKey(dir)}") {
      Bm25.statsFromPostings(postings)
    }
    Bm25.SparseIndex(postings, terms)
  }

  /** One trained IVF model per (JVM, sf): both artifact builders pull
    * from this memo, so assignments can never come from a different
    * model than the centroids — and neither builder depends on the
    * OTHER having run first (each ensure block is self-sufficient;
    * training runs at most once per JVM, zero times when both
    * artifacts are already on disk in this JVM's built-set). */
  private val ivfModels =
    scala.collection.concurrent.TrieMap.empty[String, IvfIndex.Model]
  private def ivfModelFor(s: SparkSession, dir: String): IvfIndex.Model =
    ivfModels.getOrElseUpdate(sfKey(dir),
      IvfIndex.train(Tables.embeddings(s, dir), "embedding", nlist = 16, maxIter = 10))

  /** Persisted IVF artifacts: cell-partitioned assignments (+ ensures
    * the centroids artifact exists alongside, same model). */
  private[graft] def ivfAssignedFor(s: SparkSession, dir: String): DataFrame = {
    ivfCentroidsFor(s, dir)
    graft.catalog.IndexStore.ensure(s, s"ivfassign_${sfKey(dir)}", partitionBy = Seq("cell")) {
      IvfIndex.assign(ivfModelFor(s, dir), Tables.embeddings(s, dir), "embedding")
        .select(col("vec_id").as("id"), col("embedding").as("__vec"), col("cell"))
    }
  }

  private[graft] def ivfCentroidsFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"ivfcent_${sfKey(dir)}") {
      IvfIndex.centroids(ivfModelFor(s, dir), s)
    }

  /** Persisted per-segment HNSW graph (seg, id, vec, level, nbrs) —
    * the rebuild_index artifact of the reference's DEFAULT index type;
    * seg-partitioned so each search task reads whole segment graphs. */
  private[graft] def hnswGraphFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"hnswgraph_${sfKey(dir)}",
      partitionBy = Seq("seg")) {
      graft.vector.HnswIndex.build(Tables.embeddings(s, dir), "vec_id", "embedding",
        m = 8, efConstruction = 64, numSegments = 4)
    }

  /** MMR served from the persisted HNSW graph (rows 119/120 ANN
    * discipline): the graph traversal seeds the relevance pool at beam
    * max(ef, k·poolMult), exact rescored cosine, pool bounded through
    * the SAME TopKAgg pipeline as the exact route, then
    * [[graft.vector.Mmr.greedySelect]] — selection math shared with
    * q_mmr so the arms cannot drift. ef = Int.MaxValue is the oracled
    * exhaustive twin (pool ≡ the exact top-40 ⇒ output ≡ q_mmr). */
  private def mmrFromGraph(s: SparkSession, dir: String, ef: Int): DataFrame = {
    val embs = Tables.embeddings(s, dir)
    val qLocal = embs.where(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val poolSize = 10 * 4 // k · poolMult, the q_mmr parameters
    val scored = graft.vector.HnswIndex.scoredCandidates(hnswGraphFor(s, dir),
      embs, "vec_id", "embedding", qLocal, "cosine",
      math.max(ef, poolSize), prepared = false, nodeKey = None)
    val pool = scored.groupBy("query_id")
      .agg(graft.vector.TopKAgg.topk(col("__s"), col("id"), poolSize,
        asc = false).as("__top"))
      .select(col("query_id"), explode(col("__top")).as("__r"))
      .select(col("query_id"), col("__r.id").as("id"), col("__r.score").as("__s"))
    val rows = embs.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("__v"))
      .join(broadcast(pool), "id")
      .select(col("query_id"), col("id"), col("__s"), col("__v"))
    graft.vector.Mmr.greedySelect(rows, "cosine", 10, lambda = 0.7)
  }

  /** Hard-negative mining served from the persisted HNSW graph: ONE
    * label-blind traversal for the 8 standard anchors (candidates
    * don't depend on the anchor's label — per-label traversals would
    * degenerate to per-query cost on a many-label batch), the label
    * predicate applied at the exact rerank (candidate ids join the
    * corpus label projection, anchors broadcast theirs, null-safe
    * IS DISTINCT FROM), cosine rerank, top-10 — the
    * GraftCollection.hardNegativesHnsw rung shape. candWidth =
    * Int.MaxValue is the oracled exhaustive twin
    * (≡ KnnSearch.hardNegatives). */
  private def hardNegativesFromGraph(s: SparkSession, dir: String,
                                     ef: Int): DataFrame = {
    val embs = Tables.embeddings(s, dir)
    val graph = hnswGraphFor(s, dir)
    val anchors = embs.where(col("vec_id") < 8)
    val qLocal = anchors
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val qlabs = anchors.select(col("vec_id").as("query_id"),
      col("label").as("__qlab"))
    val labs = embs.select(col("vec_id").cast("long").as("id"),
      col("label").as("__lab"))
    val scored = graft.vector.HnswIndex.scoredCandidates(graph, embs,
      "vec_id", "embedding", qLocal, "cosine", math.max(ef, 10),
      prepared = false, nodeKey = None)
    graft.vector.Ranked.topK(
      scored.join(labs, "id").join(broadcast(qlabs), "query_id")
        .where(!(col("__lab") <=> col("__qlab")))
        .select(col("query_id"), col("__s"), col("id")),
      10, asc = false)
  }

  /** Persisted (doc_id, g) word-3gram postings — the dedup-family
    * ingest artifact shared by q_dedup_ngram and the cluster pair
    * list. */
  private[graft] def ngramPostingsFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"ngrampost_${sfKey(dir)}") {
      Dedup.ngrams(Tables.documents(s, dir), "doc_id", "text", 3)
    }

  /** Persisted (doc_id, __gs) gram-hash sets — the VERIFY-side ingest
    * artifact of the verified dedup twins (one groupBy over the
    * postings, persisted once; every verified run skips straight to the
    * candidate pair join). */
  private[graft] def gramSetsFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"gramsets_${sfKey(dir)}") {
      Dedup.gramSets(ngramPostingsFor(s, dir))
    }

  /** One trained PQ model per (JVM, sf), persisted as the codebooks
    * artifact and reconstructed from it — serving sessions load the
    * stored (sub, code, centroid) rows, no retraining (same contract as
    * [[ivfModelFor]]). */
  private val pqModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.vector.PqIndex.Model]
  private def pqModelFor(s: SparkSession, dir: String): graft.vector.PqIndex.Model =
    pqModels.getOrElseUpdate(sfKey(dir), {
      val books = graft.catalog.IndexStore.ensure(s, s"pqbooks_${sfKey(dir)}") {
        graft.vector.PqIndex.codebooksDf(
          graft.vector.PqIndex.train(Tables.embeddings(s, dir), "embedding",
            dim = 64, m = 8, k = 16), s)
      }
      graft.vector.PqIndex.modelFromDf(books, m = 8, k = 16, dim = 64)
    })

  /** Persisted PQ codes (id, codes, resid) — the scannable compressed
    * corpus plus the per-row reconstruction error the exact radius
    * gate rides on (cache key bumped when resid shipped — a stale
    * resid-less artifact must not serve the radius route). */
  private[graft] def pqEncodedFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"pqcodes2_${sfKey(dir)}") {
      graft.vector.PqIndex.encode(pqModelFor(s, dir),
        Tables.embeddings(s, dir), "vec_id", "embedding")
    }

  /** Persisted IVF_PQ codes (id, codes, resid, cell), cell-partitioned
    * so nprobe pruning happens at file listing; shares the IVF model
    * with [[ivfAssignedFor]] and the PQ codebooks with [[pqEncodedFor]]
    * (cache key bumped when resid + assignExpr-consistent cells
    * shipped). */
  private[graft] def ivfpqEncodedFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"ivfpqcodes2_${sfKey(dir)}",
      partitionBy = Seq("cell")) {
      graft.vector.IvfPq.encode(
        graft.vector.IvfPq.Model(ivfModelFor(s, dir), pqModelFor(s, dir)),
        Tables.embeddings(s, dir), "vec_id", "embedding")
    }

  /** One SQ8 quantizer per (JVM, sf), persisted as the per-dim bounds
    * artifact and reconstructed from it (same contract as
    * [[pqModelFor]]). */
  private val sqModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.vector.SqIndex.Model]
  private def sqModelFor(s: SparkSession, dir: String): graft.vector.SqIndex.Model =
    sqModels.getOrElseUpdate(sfKey(dir), {
      val bounds = graft.catalog.IndexStore.ensure(s, s"sqbounds_${sfKey(dir)}") {
        graft.vector.SqIndex.boundsDf(
          graft.vector.SqIndex.train(Tables.embeddings(s, dir), "embedding"), s)
      }
      graft.vector.SqIndex.modelFromDf(bounds, dim = 64)
    })

  /** Persisted IVF_SQ8 codes (id, codes, cell), cell-partitioned so
    * nprobe pruning happens at file listing; shares the coarse
    * centroids with [[ivfAssignedFor]] and the bounds with
    * [[sqModelFor]]. */
  private[graft] def ivfsqEncodedFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"ivfsqcodes2_${sfKey(dir)}",
      partitionBy = Seq("cell")) {
      val centers = graft.vector.IvfIndex.centersFromDf(ivfCentroidsFor(s, dir))
        .map { case (c, i) => (c.toArray, i) }
      graft.vector.IvfSq.encodeAssigned(centers, sqModelFor(s, dir),
        Tables.embeddings(s, dir), "vec_id", "embedding")
    }

  /** Persisted per-cell ball radii (cell, rho) for the IVF_SQ8 layout —
    * the cell-level certificate of the exact radius route (tiny:
    * one row per non-empty cell). */
  private[graft] def ivfsqStatsFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"ivfsqstats_${sfKey(dir)}") {
      val centers = graft.vector.IvfIndex.centersFromDf(ivfCentroidsFor(s, dir))
        .map { case (c, i) => (c.toArray, i) }
      graft.vector.IvfSq.cellStats(centers,
        Tables.embeddings(s, dir), "embedding")
    }

  // --------- cosine-built IVF_SQ8 artifacts (row 118's cosine arm, r13)
  //
  // The artifact contract of a COSINE-built quantized index: every
  // stored piece (coarse centroids, per-dim bounds, codes, per-row
  // resid, per-cell rho) lives in the UNIT-SPHERE gate space — codes
  // quantize x̂ = x/‖x‖, where cos(q,x) ≥ r ⇔ ‖q̂−x̂‖₂ ≤ √(2−2r) makes
  // the same L2 triangle certificates exact for cosine. The serve-time
  // rerank scores TRUE cosine over the RAW vectors, so the oracle is
  // plain cosine radius+limit and never sees the quantizer.

  /** Embeddings projected onto the unit sphere (the gate space). */
  private def normEmbeddings(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).withColumn("embedding",
      graft.vector.VectorScore.unitNorm(col("embedding")))

  private val ivfCosModels =
    scala.collection.concurrent.TrieMap.empty[String, IvfIndex.Model]
  private def ivfCosModelFor(s: SparkSession, dir: String): IvfIndex.Model =
    ivfCosModels.getOrElseUpdate(sfKey(dir),
      IvfIndex.train(normEmbeddings(s, dir), "embedding", nlist = 16, maxIter = 10))

  private[graft] def ivfCosCentroidsFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"ivfcentcos_${sfKey(dir)}") {
      IvfIndex.centroids(ivfCosModelFor(s, dir), s)
    }

  private val sqCosModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.vector.SqIndex.Model]
  private def sqCosModelFor(s: SparkSession, dir: String): graft.vector.SqIndex.Model =
    sqCosModels.getOrElseUpdate(sfKey(dir), {
      val bounds = graft.catalog.IndexStore.ensure(s, s"sqboundscos_${sfKey(dir)}") {
        graft.vector.SqIndex.boundsDf(
          graft.vector.SqIndex.train(normEmbeddings(s, dir), "embedding"), s)
      }
      graft.vector.SqIndex.modelFromDf(bounds, dim = 64)
    })

  private[graft] def ivfsqCosEncodedFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"ivfsqcodescos_${sfKey(dir)}",
      partitionBy = Seq("cell")) {
      val centers = graft.vector.IvfIndex.centersFromDf(ivfCosCentroidsFor(s, dir))
        .map { case (c, i) => (c.toArray, i) }
      graft.vector.IvfSq.encodeAssigned(centers, sqCosModelFor(s, dir),
        normEmbeddings(s, dir), "vec_id", "embedding")
    }

  private[graft] def ivfsqCosStatsFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"ivfsqstatscos_${sfKey(dir)}") {
      val centers = graft.vector.IvfIndex.centersFromDf(ivfCosCentroidsFor(s, dir))
        .map { case (c, i) => (c.toArray, i) }
      graft.vector.IvfSq.cellStats(centers, normEmbeddings(s, dir), "embedding")
    }

  /** One BQ quantizer per (JVM, sf), persisted as the per-dimension
    * threshold artifact and reconstructed from it (same contract as
    * [[pqModelFor]]). */
  private val bqModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.vector.BqIndex.Model]
  private def bqModelFor(s: SparkSession, dir: String): graft.vector.BqIndex.Model =
    bqModels.getOrElseUpdate(sfKey(dir), {
      val thr = graft.catalog.IndexStore.ensure(s, s"bqthr_${sfKey(dir)}") {
        graft.vector.BqIndex.thresholdsDf(
          graft.vector.BqIndex.train(Tables.embeddings(s, dir), "embedding"), s)
      }
      graft.vector.BqIndex.modelFromDf(thr, dim = 64)
    })

  /** Persisted BQ words (id, words) — the 1-bit/dim packed corpus. */
  private[graft] def bqEncodedFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"bqwords_${sfKey(dir)}") {
      graft.vector.BqIndex.encode(bqModelFor(s, dir),
        Tables.embeddings(s, dir), "vec_id", "embedding")
    }

  /** One distilled quality-classifier model per (JVM, sf), persisted
    * as the (idx, w) artifact and reconstructed from it (same contract
    * as [[pqModelFor]]). */
  private val qcModels =
    scala.collection.concurrent.TrieMap.empty[String, graft.ops.QualityClassifier.Model]
  private def qcModelFor(s: SparkSession, dir: String): graft.ops.QualityClassifier.Model =
    qcModels.getOrElseUpdate(sfKey(dir), {
      val nF = 1024
      val weights = graft.catalog.IndexStore.ensure(s, s"qcmodel_${sfKey(dir)}") {
        val labeled = graft.text.TextAnalysis
          .quality(Tables.documents(s, dir), "doc_id", "text", keep = Seq("text"))
        graft.ops.QualityClassifier.modelDf(
          graft.ops.QualityClassifier.distill(labeled, "text",
            col("quality") >= 0.45, numFeatures = nF), s)
      }
      graft.ops.QualityClassifier.modelFromDf(weights, nF)
    })

  /** Persisted corpus bigram frequencies — the trained "LM" artifact
    * of the rare-bigram fluency signal. */
  private[graft] def bigramCountsFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"bgcounts_${sfKey(dir)}") {
      graft.text.TextAnalysis.bigramCounts(Tables.documents(s, dir), "doc_id", "text")
    }

  /** Persisted frequency vocabulary (tokenizer artifact). */
  private[graft] def vocabFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"vocab24_${sfKey(dir)}") {
      graft.text.Tokenizer.buildVocab(Tables.documents(s, dir), "text", 24)
    }

  /** Persisted BPE merge table (trained tokenizer artifact). */
  private[graft] def bpeMergesFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"bpemerges_${sfKey(dir)}") {
      graft.text.Bpe.train(Tables.documents(s, dir), "text", numMerges = 50)
    }

  /** The PINNED training dictionary behind [[bpeApplyMergesFor]] —
    * head word types of the documents corpus with fixed counts, so the
    * trained merge table is a CONSTANT across SFs and the q_bpe_apply
    * oracle can spell the same 12 merges as SQL VALUES (TokenizerSpec
    * pins trainLocal(dict) == those rows: if training drifts, the spec
    * fails before the oracle can). */
  private[graft] val BpeApplyDict: Array[(String, Long)] = Array(
    ("scan", 10L), ("spark", 9L), ("sort", 8L), ("stream", 7L),
    ("table", 6L), ("data", 5L), ("slow", 4L), ("small", 4L),
    ("the", 3L), ("hash", 3L))

  /** Persisted merge table of the FIXED dictionary — the oracled
    * member of the BPE family (r12 verdict #6): the artifact is
    * genuinely trained (trainLocal, the same loop as Bpe.train's
    * driver stage), persisted, and read back by the encode — the
    * q_tokenize_ids "artifact becomes the fixture" pattern. */
  private[graft] def bpeApplyMergesFor(s: SparkSession): DataFrame =
    graft.catalog.IndexStore.ensure(s, "bpeapplymerges") {
      import s.implicits._
      graft.text.Bpe.trainLocal(BpeApplyDict, numMerges = 12)
        .map(m => (m.rank, m.left, m.right)).toSeq.toDF("rank", "left", "right")
    }

  /** Persisted unigram-LM piece table (piece, logp_micro, piece_id). */
  private[graft] def unigramModelFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"unigram_${sfKey(dir)}") {
      graft.text.Unigram.train(Tables.documents(s, dir), "text", vocabSize = 64)
    }

  /** Persisted unigram piece table of the FIXED dictionary — the
    * oracled member of the unigram family (the q_bpe_apply device for
    * the OTHER tokenizer): trained by the real EM/prune loop over the
    * same pinned 10-word dictionary, persisted, read back by the
    * encode; UnigramSpec pins trainLocal(dict) == the oracle's inlined
    * 20 rows. */
  private[graft] def unigramApplyModelFor(s: SparkSession): DataFrame =
    graft.catalog.IndexStore.ensure(s, "unigramapply") {
      import s.implicits._
      graft.text.Unigram.trainLocal(BpeApplyDict, vocabSize = 20)
        .map(p => (p.piece, p.logpMicro, p.pieceId)).toSeq
        .toDF("piece", "logp_micro", "piece_id")
    }

  /** Pinned synthetic training vectors behind [[ivfAssignCentroidsFor]]
    * — 64 deterministic dim-64 vectors (an integer formula over
    * (i, j), scaled into the embeddings tables' own ≈[−0.5, 0.5]
    * range so the assignment over the real corpus lands across many
    * cells), constant across SFs so the trained centroid table is a
    * constant the q_ivf_assign oracle can inline as VALUES. Single
    * partition: k-means'' init and the Lloyd's aggregations are
    * order-deterministic only with a fixed partitioning. */
  private[graft] def ivfAssignTrainInput(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until 64).map { i =>
      (i.toLong, (0 until 64).map(j => ((i * 31 + j * 17) % 97) / 96.0 - 0.5))
    }.toDF("id", "vec").coalesce(1)
  }

  /** Persisted centroid table of the pinned input — the oracled member
    * of the IVF build family (genuinely trained, persisted, read back
    * by the assignment; Round14Spec pins trained == the oracle's
    * inlined rows). */
  private[graft] def ivfAssignCentroidsFor(s: SparkSession): DataFrame =
    graft.catalog.IndexStore.ensure(s, "ivfassigncent") {
      IvfIndex.centroids(
        IvfIndex.train(ivfAssignTrainInput(s), "vec", nlist = 8, maxIter = 20), s)
    }

  /** The PINNED weak-labeled micro-corpus behind [[qcMicroModelFor]] —
    * 12 docs over the documents tables' own 31-token vocabulary with
    * fixed 0/1 labels, so the trained classifier is a CONSTANT across
    * SFs and the q_quality_score oracle can inline the vocabulary's
    * bucket weights as VALUES. */
  private[graft] val QcScoreCorpus: Seq[(String, Double)] = Seq(
    ("spark data query window scan", 1.0),
    ("join filter group agg table", 1.0),
    ("vector stream batch merge sort", 1.0),
    ("fast big column row value", 1.0),
    ("customer order hash small spark", 1.0),
    ("key line part merge query", 1.0),
    ("dup dup dup dup dup", 0.0),
    ("slow slow slow slow slow", 0.0),
    ("dup slow dup slow dup", 0.0),
    ("a a a a a", 0.0),
    ("the the the the the", 0.0),
    ("dup a slow the dup", 0.0))

  private[graft] val QcNumFeatures = 256

  /** Persisted micro-quantized quality model of the pinned corpus
    * (idx, w6) — genuinely trained (the same L-BFGS as
    * q_quality_classifier's model), quantized once to micro units,
    * persisted, read back by the scorer. */
  private[graft] def qcMicroModelFor(s: SparkSession): graft.ops.QualityClassifier.ModelMicro = {
    val df = graft.catalog.IndexStore.ensure(s, "qcmicro") {
      import s.implicits._
      graft.ops.QualityClassifier.modelMicroDf(
        graft.ops.QualityClassifier.quantize(
          graft.ops.QualityClassifier.train(
            QcScoreCorpus.toDF("text", "__label").coalesce(1),
            "text", "__label", QcNumFeatures)), s)
    }
    graft.ops.QualityClassifier.modelMicroFromDf(df, QcNumFeatures)
  }

  /** The PINNED trained values of [[ivfAssignCentroidsFor]] — the rows
    * the q_ivf_assign oracle inlines as VALUES. Round14Spec pins
    * trained == these exactly (training drift fails the spec before it
    * can desync the oracle); FixturePrint regenerates them. Spelled as
    * Double.toString's shortest round-trip repr, which DuckDB's
    * correctly-rounded strtod parses back to the identical double. */
  private[graft] val IvfAssignCentroids: Array[(Int, Array[Double])] = Array(
    (0, Array(
      0.41015625, -0.42317708333333337, -0.24609375, -0.06901041666666666, 0.10807291666666667,
      0.28515625, 0.3359375, -0.37109375, -0.19401041666666666, -0.01692708333333333,
      0.16015625, 0.3372395833333333, -0.1171875, -0.3190104166666667, -0.14192708333333334,
      0.03515624999999999, 0.21223958333333331, 0.3893229166666667, -0.44401041666666663, -0.2669270833333333,
      -0.08984375, 0.08723958333333333, 0.2643229166666667, 0.44140625, -0.39192708333333337,
      -0.21484375, -0.03776041666666667, 0.13932291666666669, 0.31640625, 0.11458333333333334,
      -0.33984375, -0.16276041666666666, 0.014322916666666671, 0.19140625, 0.3684895833333333,
      -0.3385416666666667, -0.2877604166666667, -0.11067708333333334, 0.06640625, 0.24348958333333331,
      0.4205729166666667, -0.41276041666666663, -0.23567708333333331, -0.05859375, 0.11848958333333333,
      0.2955729166666667, 0.22005208333333331, -0.36067708333333337, -0.18359375, -0.006510416666666678,
      0.17057291666666669, 0.34765625, -0.10677083333333333, -0.30859375, -0.13151041666666666,
      0.04557291666666667, 0.22265625, 0.3997395833333333, -0.43359375, -0.25651041666666663,
      -0.07942708333333334, 0.09765625, 0.2747395833333333, 0.4518229166666667)),
    (1, Array(
      0.07291666666666666, 0.25, 0.4270833333333333, -0.40625000000000006, -0.22916666666666666,
      -0.05208333333333333, 0.125, 0.3020833333333333, 0.1423611111111111, -0.35416666666666663,
      -0.17708333333333331, 0.0, 0.17708333333333331, 0.35416666666666663, -0.14236111111111108,
      -0.3020833333333333, -0.125, 0.05208333333333333, 0.22916666666666666, 0.40625,
      -0.4270833333333333, -0.25, -0.07291666666666666, 0.10416666666666666, 0.28125,
      0.20572916666666666, -0.37500000000000006, -0.19791666666666666, -0.020833333333333336, 0.15625,
      0.3333333333333333, 0.005208333333333343, -0.32291666666666663, -0.14583333333333331, 0.03125,
      0.20833333333333331, 0.38541666666666663, -0.27951388888888884, -0.2708333333333333, -0.09375,
      0.08333333333333333, 0.26041666666666663, 0.35329861111111105, -0.3958333333333333, -0.21875,
      -0.041666666666666664, 0.13541666666666666, 0.3125, 0.06857638888888888, -0.34375,
      -0.16666666666666666, 0.010416666666666666, 0.1875, 0.3645833333333333, -0.21614583333333331,
      -0.29166666666666663, -0.11458333333333333, 0.0625, 0.23958333333333331, 0.41666666666666663,
      -0.41666666666666663, -0.23958333333333331, -0.0625, 0.11458333333333333)),
    (2, Array(
      -0.2222222222222222, -0.04513888888888888, 0.13194444444444442, 0.30902777777777773, 0.14930555555555552,
      -0.3472222222222222, -0.17013888888888887, 0.0069444444444444284, 0.1840277777777778, 0.36111111111111105,
      -0.3038194444444444, -0.2951388888888889, -0.11805555555555554, 0.05902777777777779, 0.23611111111111108,
      0.4131944444444444, -0.4201388888888889, -0.2430555555555555, -0.06597222222222222, 0.1111111111111111,
      0.2881944444444444, 0.4652777777777778, -0.3680555555555556, -0.19097222222222224, -0.013888888888888885,
      0.16319444444444442, 0.3402777777777778, -0.15625, -0.3159722222222222, -0.13888888888888887,
      0.038194444444444434, 0.21527777777777773, 0.39236111111111105, -0.4409722222222222, -0.26388888888888884,
      -0.08680555555555554, 0.09027777777777779, 0.26736111111111105, 0.4444444444444444, -0.38888888888888884,
      -0.21180555555555552, -0.034722222222222224, 0.1423611111111111, 0.3194444444444444, 0.1597222222222222,
      -0.3368055555555556, -0.1597222222222222, 0.017361111111111112, 0.19444444444444442, 0.3715277777777778,
      -0.46180555555555547, -0.2847222222222222, -0.10763888888888887, 0.06944444444444443, 0.24652777777777773,
      0.42361111111111105, -0.4097222222222222, -0.23263888888888887, -0.05555555555555555, 0.12152777777777779,
      0.29861111111111105, 0.30729166666666663, -0.3576388888888889, -0.18055555555555552)),
    (3, Array(
      -0.1388888888888889, -0.2986111111111111, -0.12152777777777778, 0.055555555555555546, 0.23263888888888887,
      0.4097222222222222, -0.4236111111111111, -0.24652777777777776, -0.06944444444444445, 0.10763888888888888,
      0.2847222222222222, 0.2372685185185185, -0.37152777777777773, -0.19444444444444442, -0.017361111111111105,
      0.1597222222222222, 0.3368055555555555, -0.047453703703703706, -0.3194444444444444, -0.1423611111111111,
      0.03472222222222222, 0.21180555555555555, 0.38888888888888884, -0.33217592592592593, -0.2673611111111111,
      -0.09027777777777778, 0.08680555555555555, 0.2638888888888889, 0.3287037037037037, -0.3923611111111111,
      -0.21527777777777776, -0.038194444444444454, 0.1388888888888889, 0.3159722222222222, 0.15625,
      -0.34027777777777773, -0.16319444444444445, 0.013888888888888895, 0.1909722222222222, 0.3680555555555555,
      -0.24074074074074076, -0.2881944444444444, -0.1111111111111111, 0.06597222222222222, 0.24305555555555555,
      0.42013888888888884, -0.4131944444444444, -0.2361111111111111, -0.059027777777777776, 0.11805555555555555,
      0.2951388888888889, 0.13541666666666666, -0.3611111111111111, -0.18402777777777776, -0.006944444444444456,
      0.17013888888888887, 0.3472222222222222, -0.03703703703703704, -0.30902777777777773, -0.13194444444444445,
      0.045138888888888895, 0.2222222222222222, 0.3993055555555555, -0.4340277777777777)),
    (4, Array(
      -0.09837962962962961, 0.0787037037037037, 0.25578703703703703, 0.3206018518518518, -0.4004629629629629,
      -0.22337962962962965, -0.04629629629629629, 0.13078703703703703, 0.3078703703703703, 0.03587962962962962,
      -0.34837962962962965, -0.1712962962962963, 0.005787037037037029, 0.18287037037037032, 0.3599537037037037,
      -0.13657407407407404, -0.2962962962962963, -0.11921296296296297, 0.05787037037037036, 0.23495370370370372,
      0.41203703703703703, -0.4212962962962963, -0.24421296296296294, -0.06712962962962964, 0.1099537037037037,
      0.28703703703703703, 0.23958333333333326, -0.3692129629629629, -0.19212962962962962, -0.015046296296296292,
      0.16203703703703703, 0.3391203703703703, -0.045138888888888874, -0.3171296296296296, -0.1400462962962963,
      0.037037037037037035, 0.21412037037037032, 0.3912037037037037, -0.3298611111111111, -0.2650462962962963,
      -0.08796296296296297, 0.08912037037037036, 0.2662037037037037, 0.21875, -0.3900462962962963,
      -0.21296296296296294, -0.03587962962962963, 0.14120370370370372, 0.31828703703703703, 0.04629629629629629,
      -0.3379629629629629, -0.1608796296296296, 0.0162037037037037, 0.19328703703703703, 0.3703703703703703,
      -0.12615740740740738, -0.28587962962962965, -0.1087962962962963, 0.06828703703703702, 0.24537037037037032,
      0.4224537037037037, -0.41087962962962965, -0.23379629629629628, -0.056712962962962965)),
    (5, Array(
      0.31875000000000003, 0.09166666666666666, -0.3375, -0.16041666666666665, 0.016666666666666663,
      0.19375, 0.37083333333333335, -0.4625, -0.2854166666666667, -0.10833333333333335,
      0.06875, 0.24583333333333332, 0.4229166666666667, -0.41041666666666665, -0.2333333333333333,
      -0.05625, 0.12083333333333333, 0.2979166666666667, 0.47500000000000003, -0.3583333333333334,
      -0.18125000000000002, -0.004166666666666663, 0.1729166666666667, 0.35000000000000003, -0.28125,
      -0.30625, -0.12916666666666665, 0.04791666666666668, 0.225, 0.40208333333333335,
      -0.43125, -0.25416666666666665, -0.07708333333333334, 0.1, 0.2770833333333333,
      0.4541666666666667, -0.3791666666666667, -0.20208333333333336, -0.025, 0.15208333333333335,
      0.3291666666666667, -0.1, -0.32708333333333334, -0.15000000000000002, 0.027083333333333327,
      0.20416666666666672, 0.38125000000000003, -0.45208333333333334, -0.275, -0.09791666666666667,
      0.07916666666666668, 0.25625000000000003, 0.43333333333333335, -0.4, -0.22291666666666665,
      -0.04583333333333334, 0.13125, 0.30833333333333335, 0.2833333333333334, -0.3479166666666667,
      -0.17083333333333336, 0.00625, 0.18333333333333335, 0.3604166666666667)),
    (6, Array(
      0.21354166666666666, 0.390625, -0.4427083333333333, -0.265625, -0.08854166666666666,
      0.08854166666666666, 0.265625, 0.4427083333333333, -0.390625, -0.21354166666666666,
      -0.03645833333333334, 0.140625, 0.3177083333333333, 0.1579861111111111, -0.33854166666666663,
      -0.16145833333333331, 0.015625000000000007, 0.19270833333333331, 0.36979166666666663, -0.29513888888888884,
      -0.2864583333333333, -0.109375, 0.06770833333333333, 0.24479166666666666, 0.421875,
      -0.4114583333333333, -0.234375, -0.057291666666666664, 0.11979166666666666, 0.296875,
      0.1371527777777778, -0.359375, -0.18229166666666666, -0.005208333333333343, 0.171875,
      0.3489583333333333, -0.14756944444444442, -0.30729166666666663, -0.13020833333333331, 0.046875,
      0.22395833333333331, 0.40104166666666663, -0.4322916666666666, -0.2552083333333333, -0.078125,
      0.09895833333333333, 0.27604166666666663, 0.453125, -0.3802083333333333, -0.203125,
      -0.026041666666666664, 0.15104166666666666, 0.328125, 1.850371707708594E-17, -0.328125,
      -0.15104166666666666, 0.026041666666666664, 0.203125, 0.3802083333333333, -0.453125,
      -0.27604166666666663, -0.09895833333333333, 0.078125, 0.2552083333333333)),
    (7, Array(
      -0.3263888888888889, -0.14930555555555555, 0.02777777777777777, 0.2048611111111111, 0.3819444444444444,
      -0.3391203703703703, -0.2743055555555555, -0.09722222222222221, 0.0798611111111111, 0.2569444444444444,
      0.43402777777777773, -0.3993055555555555, -0.2222222222222222, -0.045138888888888895, 0.13194444444444445,
      0.30902777777777773, 0.14930555555555555, -0.3472222222222222, -0.17013888888888887, 0.00694444444444445,
      0.18402777777777776, 0.3611111111111111, -0.24768518518518515, -0.2951388888888889, -0.11805555555555555,
      0.059027777777777776, 0.2361111111111111, 0.4131944444444444, -0.42013888888888884, -0.24305555555555555,
      -0.06597222222222222, 0.1111111111111111, 0.2881944444444444, 0.24074074074074076, -0.3680555555555555,
      -0.1909722222222222, -0.0138888888888889, 0.16319444444444445, 0.34027777777777773, -0.04398148148148148,
      -0.3159722222222222, -0.1388888888888889, 0.03819444444444445, 0.21527777777777776, 0.3923611111111111,
      -0.4409722222222222, -0.2638888888888889, -0.08680555555555555, 0.09027777777777778, 0.2673611111111111,
      0.4444444444444444, -0.38888888888888884, -0.21180555555555555, -0.034722222222222224, 0.1423611111111111,
      0.3194444444444444, 0.047453703703703706, -0.3368055555555555, -0.1597222222222222, 0.017361111111111105,
      0.19444444444444442, 0.37152777777777773, -0.34953703703703703, -0.28472222222222215)))

  private[graft] val QcIntercept6: Long = -2487580L

  private[graft] val QcTokenWeights: Seq[(String, Int, Long)] = Seq(
    ("a", 99, -344297L), ("agg", 245, 1355054L), ("batch", 69, 1338028L),
    ("big", 88, 1338028L), ("column", 228, 1338028L), ("customer", 37, 1334077L),
    ("data", 223, 1310973L), ("dup", 130, -382696L), ("fast", 95, 1338028L),
    ("filter", 193, 1355054L), ("group", 6, 1355054L), ("hash", 22, 1334077L),
    ("join", 232, 1355054L), ("key", 107, 1435972L), ("line", 254, 1272831L),
    ("merge", 0, 1435972L), ("order", 26, 1334077L), ("part", 100, 1272831L),
    ("query", 153, 1421092L), ("row", 1, 1338028L), ("scan", 250, 1310973L),
    ("slow", 59, -374671L), ("small", 78, 1334077L), ("sort", 152, 1338028L),
    ("spark", 246, 1454777L), ("stream", 56, 1338028L), ("table", 219, 1355054L),
    ("the", 145, -344297L), ("value", 107, 1435972L), ("vector", 128, 1338028L),
    ("window", 147, 1310973L))


  /** Persisted corpus embedding (embed-at-ingest for search_by_text). */
  private[graft] def embedIndexFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"embed_${sfKey(dir)}") {
      TextEmbed.hashEmbed(Tables.documents(s, dir), "doc_id", "text")
    }

  /** Persisted chunk index (split+embed at ingest for the AI-doc layer). */
  private[graft] def chunkIndexFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"chunks_${sfKey(dir)}") {
      graft.text.CollectionView.buildChunkIndex(
        Tables.documents(s, dir).where(col("doc_id") < 1000), "doc_id", "text", "source")
    }

  /** Persisted HNSW graph over the chunk index (the reference's
    * collection_view default index at the chunk layer). */
  private[graft] def chunkGraphFor(s: SparkSession, dir: String): DataFrame =
    graft.catalog.IndexStore.ensure(s, s"chunkgraph_${sfKey(dir)}",
      partitionBy = Seq("seg")) {
      graft.text.CollectionView.buildChunkGraph(chunkIndexFor(s, dir), "doc_id",
        m = 8, efConstruction = 64, numSegments = 4)
    }

  /** Shared dense + (query-expanded) sparse ranked lists for hybrid search. */
  private def hybridLists(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val dense = KnnSearch.topK(Tables.embeddings(s, dir), "vec_id", "embedding",
      Tables.embeddings(s, dir).where(col("vec_id") < 4)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      "qid", "qvec", "cosine", 20)
    val sparse = Bm25.fulltextIndexed(sparseIndexFor(s, dir),
      FulltextTerms, 20, cutoffFrequency = 0.9)
    val qids = Tables.embeddings(s, dir).where(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"))
    val sparseQ = qids.crossJoin(broadcast(
      sparse.select(col("doc_id").as("id"), col("rank"))))
      .select("query_id", "id", "rank")
    (dense, sparseQ)
  }

  // --------------------------------------------------------------- oracles

  /** Shared BM25 CTE pipeline (mirrors [[Bm25.encode]] op-for-op so
    * double arithmetic is bit-identical). */
  private val Bm25Cte =
    """toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term != '' GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks WHERE term != '' GROUP BY doc_id),
      |corpus AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |enc AS (
      |  SELECT t.doc_id, t.term, t.tf,
      |    ln(1.0 + (corpus.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
      |    (t.tf * (1.2 + 1.0)) /
      |    (t.tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl.dl / (corpus.sum_dl / corpus.n_docs))) AS weight
      |  FROM tf t JOIN dl ON t.doc_id = dl.doc_id JOIN dfreq ON t.term = dfreq.term, corpus)""".stripMargin

  /** Fulltext CTEs on top of [[Bm25Cte]] (mirrors [[Bm25.fulltext]]). */
  private val FulltextCte =
    s"""$Bm25Cte,
       |qt AS (SELECT unnest(['spark','join','filter','window','scan']) AS term),
       |elig AS (SELECT dfreq.term FROM dfreq, corpus WHERE dfreq.df <= 0.9 * corpus.n_docs),
       |scored AS (
       |  SELECT e.doc_id,
       |    CAST(sum(CAST(round(e.weight, 4) AS DECIMAL(18,4))) AS DOUBLE) AS score,
       |    count(*) AS n_terms
       |  FROM enc e JOIN qt ON e.term = qt.term JOIN elig ON e.term = elig.term
       |  GROUP BY e.doc_id),
       |ranked AS (SELECT doc_id, n_terms, score,
       |  row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM scored)""".stripMargin

  /** Dense KNN CTE for hybrid fusion (cosine, qid < 4, mirrored ranks). */
  private val HybridDenseCte =
    """qv AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 4),
      |ds AS (SELECT qv.qid AS query_id, e.vec_id AS id,
      |         list_cosine_similarity(e.embedding::DOUBLE[], qv.qvec) AS sc
      |       FROM embeddings e, qv),
      |dense AS (SELECT query_id, id, sc,
      |  row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk FROM ds)""".stripMargin

  private val knnOracle: String => String = metric => {
    val (fn, dir2) = metric match {
      case "cosine" => ("list_cosine_similarity(e.embedding::DOUBLE[], q.qvec)", "DESC")
      case "l2" => ("list_distance(e.embedding::DOUBLE[], q.qvec)", "ASC")
      case "ip" => ("list_dot_product(e.embedding::DOUBLE[], q.qvec)", "DESC")
    }
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
       |s AS (SELECT q.qid AS query_id, e.vec_id AS id, $fn AS sc FROM embeddings e, q),
       |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc $dir2, id) AS rnk FROM s)
       |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
       |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** The MMR greedy (Mmr.greedySelect, k=10 λ=0.7 pool=40 cosine)
    * replayed exactly in DuckDB: the pool is BOUNDED, so a recursive
    * CTE can afford one iteration per selection round — the working
    * table holds one row per query carrying the selected-id list,
    * each iteration joins the remaining pool, computes penalty = max
    * cosine against the selected set, and keeps the argmax of
    * λ·rel − (1−λ)·penalty with the (objective, id) tiebreak — the
    * penalty coefficient is spelled `(1 - 0.7)` in the SQL, NOT the
    * literal 0.3: Mmr.greedySelect computes `(1.0 - lam)` at runtime
    * (= 0.30000000000000004) and fl(0.3) is one ulp below it, the
    * same last-ulp class the Mmr.sim formula fix closed. The
    * base case is the order.isEmpty branch (penalty 0 ⇒ order by
    * relevance alone). Raw unrounded rel/penalty throughout, rounding
    * only at output — Mmr's discipline verbatim. λ must stay OFF 0.5
    * here: the query batch lives in the corpus, so round 2's penalty
    * equals relevance for every candidate and 0.5/0.5 would tie the
    * whole pool at exactly 0 (see the q_mmr entry). */
  private val mmrOracle: String =
    """WITH RECURSIVE
      |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
      |s AS (SELECT q.qid AS query_id, e.vec_id AS id, e.embedding::DOUBLE[] AS v,
      |             list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS rel
      |      FROM embeddings e, q),
      |pool AS (SELECT query_id, id, v, rel FROM (
      |           SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, id) AS rn FROM s) t
      |         WHERE rn <= 40),
      |steps(query_id, rank, id, rel, chosen) AS (
      |  SELECT query_id, 1 AS rank, id, rel, [id] AS chosen FROM (
      |    SELECT query_id, id, rel,
      |           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, id) AS pk
      |    FROM pool) t WHERE pk = 1
      |  UNION ALL
      |  SELECT query_id, rank, id, rel, chosen FROM (
      |    SELECT c.query_id, c.rank, c.id, c.rel, list_append(c.chosen, c.id) AS chosen,
      |           row_number() OVER (PARTITION BY c.query_id
      |                              ORDER BY 0.7 * c.rel - (1 - 0.7) * c.pen DESC, c.id) AS pk
      |    FROM (
      |      SELECT st.query_id, st.rank + 1 AS rank, p.id, p.rel, st.chosen,
      |             max(list_cosine_similarity(p.v, p2.v)) AS pen
      |      FROM steps st
      |      JOIN pool p  ON p.query_id = st.query_id AND NOT list_contains(st.chosen, p.id)
      |      JOIN pool p2 ON p2.query_id = st.query_id AND list_contains(st.chosen, p2.id)
      |      WHERE st.rank < 10
      |      GROUP BY st.query_id, st.rank, p.id, p.rel, st.chosen
      |    ) c
      |  ) t WHERE pk = 1
      |)
      |SELECT query_id, CAST(rank AS INT) AS rank, id, round(rel, 4) AS score
      |FROM steps ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_compare" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE n_chars > 100 AND lang != 'en' ORDER BY doc_id""".stripMargin,

    "q_filter_in" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang IN ('en','fr') AND source NOT IN ('src0','src1') ORDER BY doc_id""".stripMargin,

    "q_filter_bool" ->
      """SELECT doc_id, lang, n_chars, source FROM documents
        |WHERE NOT (lang = 'en' OR (n_chars >= 120 AND n_chars < 400)) AND source != 'src3'
        |ORDER BY doc_id""".stripMargin,

    "q_filter_array" ->
      """WITH t AS (SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS tags FROM documents)
        |SELECT doc_id, array_to_string(tags, ' ') AS tag_str FROM t
        |WHERE list_has_any(tags, ['spark','join']) AND NOT list_has_any(tags, ['slow'])
        |  AND list_has_all(tags, ['the'])
        |ORDER BY doc_id""".stripMargin,

    "q_query_sort_page" ->
      """SELECT doc_id, n_chars, lang FROM documents WHERE n_chars >= 60
        |ORDER BY n_chars DESC, doc_id LIMIT 50 OFFSET 100""".stripMargin,

    "q_query_by_ids" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE doc_id IN (3,17,42,99,123,256,400,499) ORDER BY doc_id""".stripMargin,

    "q_count" ->
      "SELECT count(*) AS cnt FROM documents WHERE lang IN ('en','de') AND n_chars > 150",

    "q_scalar_index" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars > 200 ORDER BY doc_id""".stripMargin,

    "q_upsert" ->
      """WITH updates AS (
        |  SELECT doc_id, 'updated' AS source, n_chars + 1 AS n_chars FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 100000, 'new', CAST(42 AS BIGINT) FROM documents WHERE doc_id % 13 = 0),
        |merged AS (
        |  SELECT doc_id, source, n_chars, 1 AS v FROM updates
        |  UNION ALL
        |  SELECT doc_id, source, n_chars, 0 AS v FROM documents)
        |SELECT doc_id, source, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY v DESC) AS rn FROM merged)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_delete" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id NOT IN (
        |  SELECT doc_id FROM documents WHERE lang = 'de' OR n_chars < 60 ORDER BY doc_id LIMIT 20)
        |ORDER BY doc_id""".stripMargin,

    "q_update" ->
      """SELECT doc_id,
        |  CASE WHEN source = 'src1' AND n_chars < 200 THEN 'xx' ELSE lang END AS lang,
        |  CASE WHEN source = 'src1' AND n_chars < 200 THEN n_chars + 1000 ELSE n_chars END AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_join" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_window" ->
      """SELECT c_mktsegment, CAST(rnk AS INT) AS rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer)
        |WHERE rnk <= 5 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,

    // grouped search: groups rank per query by BEST member (ties →
    // smaller group key), members by (score, id) within their group —
    // two window ranks recompute the double-heap pipeline exactly
    "q_grouped_search" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id, CAST(e.label AS BIGINT) AS grp,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |g AS (SELECT query_id, grp, max(sc) AS gbest FROM s GROUP BY query_id, grp),
        |gr AS (SELECT query_id, grp,
        |        row_number() OVER (PARTITION BY query_id ORDER BY gbest DESC, grp) AS grp_rank
        |       FROM g),
        |mem AS (SELECT query_id, grp, id, sc,
        |        row_number() OVER (PARTITION BY query_id, grp ORDER BY sc DESC, id) AS rnk
        |        FROM s)
        |SELECT m.query_id, CAST(gr.grp_rank AS INT) AS grp_rank, m.grp,
        |       CAST(m.rnk AS INT) AS rank, m.id, round(m.sc, 4) AS score
        |FROM mem m JOIN gr USING (query_id, grp)
        |WHERE gr.grp_rank <= 3 AND m.rnk <= 4
        |ORDER BY query_id, grp_rank, rank""".stripMargin,

    // the exhaustive grouped-HNSW twin reproduces the exact grouped
    // ranking (chain-connectivity certificate: every node visited)
    "q_grouped_hnsw_exhaustive" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id, CAST(e.label AS BIGINT) AS grp,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |g AS (SELECT query_id, grp, max(sc) AS gbest FROM s GROUP BY query_id, grp),
        |gr AS (SELECT query_id, grp,
        |        row_number() OVER (PARTITION BY query_id ORDER BY gbest DESC, grp) AS grp_rank
        |       FROM g),
        |mem AS (SELECT query_id, grp, id, sc,
        |        row_number() OVER (PARTITION BY query_id, grp ORDER BY sc DESC, id) AS rnk
        |        FROM s)
        |SELECT m.query_id, CAST(gr.grp_rank AS INT) AS grp_rank, m.grp,
        |       CAST(m.rnk AS INT) AS rank, m.id, round(m.sc, 4) AS score
        |FROM mem m JOIN gr USING (query_id, grp)
        |WHERE gr.grp_rank <= 3 AND m.rnk <= 4
        |ORDER BY query_id, grp_rank, rank""".stripMargin,

    // the MMR greedy replayed exactly in SQL (r11 verdict #2): the pool
    // is bounded (top-40 per query), so a RECURSIVE CTE carries the
    // selected-id list and picks one row per iteration — penalty = max
    // cosine vs the selected set (first pick pays none: the base case
    // orders by relevance alone, Mmr.greedySelect's order.isEmpty
    // branch), objective = 0.7·rel − (1−0.7)·penalty, ties → smaller id
    "q_mmr" -> mmrOracle,
    // exhaustive-beam MMR-HNSW: every node visited ⇒ pool ≡ the exact
    // top-40 ⇒ the shared greedy reproduces q_mmr byte-for-byte
    "q_mmr_hnsw_exhaustive" -> mmrOracle,

    "q_knn_cosine" -> knnOracle("cosine"),
    // exhaustive-grade banded LSH covers the true top-k and re-ranks by
    // exact cosine through the same topk pipeline => equals exact KNN
    "q_lsh_ann_exhaustive" -> knnOracle("cosine"),
    // chain-connected segment graphs + ef >= segment size => every node
    // visited, exact rerank through the FLAT pipeline => exact KNN
    "q_hnsw_exhaustive" -> knnOracle("cosine"),

    // graph-served radius at the exhaustive bound: every node visited,
    // raw-score radius gate before the bounded heap => equals FLAT
    // radius+limit (the q_knn_radius_limit shape) byte-for-byte
    "q_hnsw_radius_exhaustive" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk
        |      FROM s WHERE sc >= 0.3)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // string-keyed exact cosine KNN — the surrogate-built graph's
    // exhaustive twin must reproduce it byte-for-byte, string ties
    // included
    "q_hnsw_string_exhaustive" ->
      """WITH e AS (SELECT 'e' || CAST(vec_id AS VARCHAR) AS sid, embedding FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.sid AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc FROM e, q),
        |r AS (SELECT query_id, id, sc,
        |        row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,
    "q_knn_l2" -> knnOracle("l2"),
    // corpus-spanning candMult: ADC cannot drop a true neighbor and the
    // exact L2 rerank shares the FLAT pipeline => equals exact KNN
    "q_pq_exhaustive" -> knnOracle("l2"),
    // nprobe = nlist + corpus-spanning candMult: every cell probed,
    // exact rerank => equals exact KNN
    "q_ivfpq_exhaustive" -> knnOracle("l2"),
    "q_ivfsq_exhaustive" -> knnOracle("l2"),
    "q_knn_ip" -> knnOracle("ip"),

    // BQ Hamming is integer-exact: recompute the per-dim decimal-mean
    // thresholds and count sign disagreements — proves the bit packing
    // at the PRODUCTION configuration (no exhaustive twin needed)
    "q_bq_search" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
        |thr AS (SELECT pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS m
        |  FROM (SELECT unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v) GROUP BY pos),
        |bits AS (SELECT id, pos, (x > m) AS b FROM
        |  (SELECT id, unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v) ex
        |  JOIN thr USING (pos)),
        |h AS (SELECT qb.id AS query_id, cb.id AS id,
        |    CAST(sum(CASE WHEN cb.b != qb.b THEN 1 ELSE 0 END) AS BIGINT) AS ham
        |  FROM bits cb JOIN bits qb ON cb.pos = qb.pos AND qb.id < 8
        |  GROUP BY qb.id, cb.id),
        |r AS (SELECT query_id, id, ham,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ham, id) AS rnk FROM h)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(CAST(ham AS DOUBLE), 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_bq_radius" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
        |thr AS (SELECT pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS m
        |  FROM (SELECT unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v) GROUP BY pos),
        |bits AS (SELECT id, pos, (x > m) AS b FROM
        |  (SELECT id, unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v) ex
        |  JOIN thr USING (pos)),
        |h AS (SELECT qb.id AS query_id, cb.id AS id,
        |    CAST(sum(CASE WHEN cb.b != qb.b THEN 1 ELSE 0 END) AS BIGINT) AS ham
        |  FROM bits cb JOIN bits qb ON cb.pos = qb.pos AND qb.id < 8
        |  GROUP BY qb.id, cb.id),
        |r AS (SELECT query_id, id, ham,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ham, id) AS rnk
        |  FROM h WHERE ham <= 24)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(CAST(ham AS DOUBLE), 4) AS score
        |FROM r WHERE rnk <= 15 ORDER BY query_id, rank""".stripMargin,

    "q_bq_radius_filtered" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
        |thr AS (SELECT pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS m
        |  FROM (SELECT unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v) GROUP BY pos),
        |bits AS (SELECT id, pos, (x > m) AS b FROM
        |  (SELECT id, unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v) ex
        |  JOIN thr USING (pos)),
        |h AS (SELECT qb.id AS query_id, cb.id AS id,
        |    CAST(sum(CASE WHEN cb.b != qb.b THEN 1 ELSE 0 END) AS BIGINT) AS ham
        |  FROM bits cb JOIN bits qb ON cb.pos = qb.pos AND qb.id < 8
        |  WHERE cb.id IN (SELECT vec_id FROM embeddings WHERE label IN (1, 2, 3))
        |  GROUP BY qb.id, cb.id),
        |r AS (SELECT query_id, id, ham,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ham, id) AS rnk
        |  FROM h WHERE ham <= 28)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(CAST(ham AS DOUBLE), 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    // the exact-radius quantized routes (IVF_SQ8 / PQ): the Spark side
    // scans CODES behind triangle-inequality certificates (per-cell
    // rho, per-row resid) and exactly reranks the provable superset —
    // so the oracle is plain exact L2 radius+limit over the raw
    // vectors; the quantizer is invisible to it by construction
    "q_sq_radius" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_distance(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc, id) AS rnk
        |      FROM s WHERE sc <= 1.2)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 15 ORDER BY query_id, rank""".stripMargin,

    "q_sq_radius_filtered" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_distance(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q WHERE e.label IN (1, 2, 3)),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc, id) AS rnk
        |      FROM s WHERE sc <= 1.25)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    // the cosine arm: same certificate machinery on the unit sphere,
    // oracled as plain cosine radius+limit (keep similarity >= r,
    // rank DESC) — the quantizer and the √(2−2r) gate are invisible
    "q_sq_radius_cos" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk
        |      FROM s WHERE sc >= 0.35)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 15 ORDER BY query_id, rank""".stripMargin,

    // planted-PNG decode pipelines (r13): the Spark side runs a REAL
    // codec (PNG encode → ImageIO decode → integer pixel sums); the
    // oracle replays the planted pixel formulas — affine in
    // (doc_id, frame, x, y) mod 256 — in plain SQL. PNG losslessness
    // is exactly what makes the two sides integer-equal.
    "q_multimodal" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id % 4) * 4 AS w, 6 + (doc_id % 3) * 4 AS h FROM documents),
        |px AS (SELECT doc_id, w, h,
        |         (doc_id*31 + x*7 + y*13) % 256 AS r,
        |         (doc_id*17 + x*5 + y*11) % 256 AS g,
        |         (doc_id*23 + x*3 + y*19) % 256 AS b
        |       FROM d, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(w * h AS BIGINT) AS n_pixels,
        |       CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |       CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,

    // nearest-neighbor resample to 10×7: src pixel = (⌊x·w/10⌋, ⌊y·h/7⌋)
    // — the resize stage's own integer math, through TWO real codec
    // passes (decode → resample → encode → decode)
    "q_media_resize" ->
      """WITH d AS (SELECT doc_id, 8 + (doc_id % 4) * 4 AS w, 6 + (doc_id % 3) * 4 AS h FROM documents),
        |px AS (SELECT doc_id,
        |         (doc_id*31 + ((x*w)//10)*7 + ((y*h)//7)*13) % 256 AS r,
        |         (doc_id*17 + ((x*w)//10)*5 + ((y*h)//7)*11) % 256 AS g,
        |         (doc_id*23 + ((x*w)//10)*3 + ((y*h)//7)*19) % 256 AS b
        |       FROM d, UNNEST(range(0, 10)) AS tx(x), UNNEST(range(0, 7)) AS ty(y))
        |SELECT doc_id, CAST(10 AS INT) AS width, CAST(7 AS INT) AS height,
        |       CAST(70 AS BIGINT) AS n_pixels,
        |       CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |       CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // planted PCM16 WAV through a REAL AudioSystem decode: the sample
    // formula replayed in SQL (16-bit PCM is lossless for the range)
    "q_audio_decode" ->
      """WITH d AS (SELECT doc_id, 50 + (doc_id % 5) * 25 AS n FROM documents),
        |s AS (SELECT doc_id, n, ((doc_id*37 + i*17) % 4096) - 2048 AS v
        |      FROM d, UNNEST(range(0, n)) AS t(i))
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |       CAST(8000 AS INT) AS sample_rate,
        |       CAST(sum(v) AS BIGINT) AS sum_amp,
        |       CAST(sum(abs(v)) AS BIGINT) AS sum_abs
        |FROM s GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    // frame-stacked PNG, every 2nd frame of 2+id%3 sampled (the cap of
    // 8 never binds at ≤ 2 sampled frames), 12×8 frames
    "q_frame_sample" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents),
        |fr AS (SELECT doc_id, f FROM d, UNNEST(range(0, nf)) AS tf(f) WHERE f % 2 = 0),
        |px AS (SELECT doc_id, f,
        |         (doc_id*31 + f*101 + x*7 + y*13) % 256 AS r,
        |         (doc_id*17 + f*101 + x*5 + y*11) % 256 AS g,
        |         (doc_id*23 + f*101 + x*3 + y*19) % 256 AS b
        |       FROM fr, UNNEST(range(0, 12)) AS tx(x), UNNEST(range(0, 8)) AS ty(y))
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |       CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |       CAST(sum(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin,

    // q_gif_frames: the SAME sampling contract through a REAL
    // multi-frame GIF container — gray frames (identity palette, so
    // r = g = b = the planted formula), frame count 2+id%3 discovered
    // from the file, every 2nd frame sampled
    "q_gif_frames" ->
      """WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents),
        |fr AS (SELECT doc_id, f FROM d, UNNEST(range(0, nf)) AS tf(f) WHERE f % 2 = 0),
        |px AS (SELECT doc_id, f,
        |         (doc_id*31 + f*101 + x*7 + y*13) % 256 AS v
        |       FROM fr, UNNEST(range(0, 12)) AS tx(x), UNNEST(range(0, 8)) AS ty(y))
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |       CAST(sum(v) AS BIGINT) AS sum_r, CAST(sum(v) AS BIGINT) AS sum_g,
        |       CAST(sum(v) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin,

    // q_ivf_assign: argmin-by-(distance, cell) against the PINNED
    // trained centroids (IvfAssignCentroids — Round14Spec pins the
    // persisted artifact == these rows). list_distance is DuckDB's
    // sqrt-of-squared-diffs L2 — the q_ivf_search precedent against
    // VectorScore.l2; the cell tiebreak mirrors assignExpr's least()
    // over (d, c) structs.
    "q_ivf_assign" ->
      s"""WITH cent(cell, c) AS (VALUES
         |${IvfAssignCentroids.map { case (cell, c) =>
              s"  ($cell, [${c.map(java.lang.Double.toString).mkString(",")}]::DOUBLE[])"
            }.mkString(",\n")}),
         |a AS (SELECT e.vec_id, cent.cell,
         |        row_number() OVER (PARTITION BY e.vec_id
         |          ORDER BY list_distance(e.embedding::DOUBLE[], cent.c) ASC, cent.cell ASC) AS rnk
         |      FROM embeddings e, cent)
         |SELECT vec_id, CAST(cell AS INT) AS cell FROM a WHERE rnk = 1 ORDER BY vec_id""".stripMargin,

    // q_quality_score: token-level replay of the micro-logit serving —
    // Σ over token instances of w6(bucket(token)) with the corpus
    // vocabulary's bucket weights inlined from the PINNED quantized
    // model (QcTokenWeights / QcIntercept6 — Round14Spec pins the
    // trained artifact == these). Pure integer arithmetic on both
    // sides; colliding tokens (key/value at bucket 107) share a weight
    // on both sides by construction. A document token OUTSIDE the
    // pinned vocabulary that collides with a trained bucket would
    // hash-mismatch loudly (verified: the documents tables' distinct
    // token set IS the 31 pinned tokens at all three SFs).
    "q_quality_score" ->
      s"""WITH w(tok, w6) AS (VALUES
         |${QcTokenWeights.map { case (t, _, w) => s"  ('$t', ${w}::BIGINT)" }.mkString(",\n")}),
         |tk AS (SELECT doc_id, tok FROM (
         |         SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |       WHERE tok <> ''),
         |sw AS (SELECT tk.doc_id, sum(w.w6) AS s FROM tk JOIN w ON tk.tok = w.tok GROUP BY tk.doc_id)
         |SELECT d.doc_id,
         |       CAST($QcIntercept6 + coalesce(sw.s, 0) AS BIGINT) AS logit_micro,
         |       ($QcIntercept6 + coalesce(sw.s, 0)) >= 0 AS pass
         |FROM documents d LEFT JOIN sw ON d.doc_id = sw.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_pq_radius" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_distance(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc, id) AS rnk
        |      FROM s WHERE sc <= 1.2)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 12 ORDER BY query_id, rank""".stripMargin,

    "q_ivfpq_radius" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_distance(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc, id) AS rnk
        |      FROM s WHERE sc <= 1.2)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    // the kth-upper-bound certificate routes equal plain exact L2 KNN
    "q_sq_topk_exact" -> knnOracle("l2"),
    "q_pq_topk_exact" -> knnOracle("l2"),

    "q_pq_radius_filtered" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_distance(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q WHERE e.label IN (1, 2, 3)),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc, id) AS rnk
        |      FROM s WHERE sc <= 1.25)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 8 ORDER BY query_id, rank""".stripMargin,

    // Hamming shortlist (deterministic: ties on (distance, id)) of
    // k*candMult = 50, then exact cosine rerank of the sliver — the
    // production path, recomputed end-to-end
    "q_bq_rerank" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings),
        |thr AS (SELECT pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS m
        |  FROM (SELECT unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v) GROUP BY pos),
        |bits AS (SELECT id, pos, (x > m) AS b FROM
        |  (SELECT id, unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v) ex
        |  JOIN thr USING (pos)),
        |h AS (SELECT qb.id AS query_id, cb.id AS id,
        |    CAST(sum(CASE WHEN cb.b != qb.b THEN 1 ELSE 0 END) AS BIGINT) AS ham
        |  FROM bits cb JOIN bits qb ON cb.pos = qb.pos AND qb.id < 8
        |  GROUP BY qb.id, cb.id),
        |short AS (SELECT query_id, id FROM (SELECT query_id, id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY ham, id) AS rnk FROM h)
        |  WHERE rnk <= 50),
        |s AS (SELECT sh.query_id, sh.id, list_cosine_similarity(c.e, q.e) AS sc
        |  FROM short sh JOIN v c ON sh.id = c.id JOIN v q ON sh.query_id = q.id),
        |rr AS (SELECT query_id, id, sc,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM rr WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_knn_filter" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q WHERE e.label IN (1,2,3,4)),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_knn_radius" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q)
        |SELECT query_id, id, round(sc, 4) AS score FROM s
        |WHERE sc >= 0.35 ORDER BY query_id, id""".stripMargin,

    "q_knn_radius_limit" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk
        |      FROM s WHERE sc >= 0.3)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_knn_by_id" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings
        |           WHERE vec_id IN (3,5,8,13)),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_domain_mix" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT % 10000 AS INT)
        |  < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 7500
        |                WHEN 'src2' THEN 5000  WHEN 'src3' THEN 2500
        |                WHEN 'src4' THEN 0     ELSE 6000 END
        |ORDER BY doc_id""".stripMargin,

    // exact integer-rank quantiles over the (domain, len) grouped
    // sliver: pX = smallest len with cum·100 >= X·N (pure integer
    // cross-multiplication — quantile_disc semantics on both engines)
    "q_length_quantiles" ->
      """WITH l AS (SELECT source AS domain, len(string_split(text, ' ')) AS len
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT domain, len, count(*) AS c FROM l GROUP BY 1, 2),
        |cum AS (SELECT domain, len, c,
        |  sum(c) OVER (PARTITION BY domain ORDER BY len) AS cum,
        |  sum(c) OVER (PARTITION BY domain) AS n FROM g)
        |SELECT domain, CAST(max(n) AS BIGINT) AS n_docs,
        |  CAST(min(CASE WHEN cum * 100 >= n * 50 THEN len END) AS INT) AS p50,
        |  CAST(min(CASE WHEN cum * 100 >= n * 90 THEN len END) AS INT) AS p90,
        |  CAST(min(CASE WHEN cum * 100 >= n * 99 THEN len END) AS INT) AS p99,
        |  CAST(min(len) AS INT) AS min_len, CAST(max(len) AS INT) AS max_len,
        |  CAST(sum(len * c) AS BIGINT) AS total_tokens
        |FROM cum GROUP BY domain ORDER BY domain""".stripMargin,

    // winnowing: recompute the identical salted-md5 32-bit k-gram
    // hashes, take each window's leftmost minimum, distinct the
    // (pos, hash) selections — proves the whole sketch integer-exactly
    "q_winnow" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |           FROM documents),
        |h AS (SELECT doc_id, list_transform(generate_series(1, len(a) - 3),
        |        i -> ('0x' || substr(md5(a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' || a[i+3] || 'winnow'), 1, 8))::BIGINT) AS hs
        |      FROM t WHERE len(a) >= 7),
        |s AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(hs) - 3),
        |        j -> struct_pack(p := j + list_position(hs[j:j+3], list_min(hs[j:j+3])) - 2,
        |                         f := list_min(hs[j:j+3])))) AS sel
        |      FROM h)
        |SELECT DISTINCT doc_id, CAST(sel.p AS INT) AS pos, sel.f AS fingerprint
        |FROM s ORDER BY doc_id, pos""".stripMargin,

    // per-line langId under the SAME stopword rule as q_lang_id, then
    // majority via min(struct(-count, lang)) — ties to the
    // alphabetically first language on both engines
    "q_lang_lines" ->
      """WITH planted AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'el la de y en que el la' ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'le est une et le est' ELSE '' END AS text
        |  FROM documents),
        |l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM planted),
        |s AS (SELECT doc_id,
        |  len(list_filter(string_split(line, ' '), x -> x IN ('der','die','das','und','ist','nicht'))) AS s_de,
        |  len(list_filter(string_split(line, ' '), x -> x IN ('the','a','of','and','is','to','in'))) AS s_en,
        |  len(list_filter(string_split(line, ' '), x -> x IN ('el','la','de','y','en','que'))) AS s_es,
        |  len(list_filter(string_split(line, ' '), x -> x IN ('le','la','de','et','est','une'))) AS s_fr,
        |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_fr THEN 'es'
        |       ELSE 'fr' END AS lang FROM l),
        |c AS (SELECT doc_id, lang, count(*) AS c FROM s GROUP BY 1, 2),
        |m AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
        |      min(struct_pack(nc := -c, lang := lang)) AS mm FROM c GROUP BY 1)
        |SELECT doc_id, n_lines, mm.lang AS major_lang,
        |  CAST(-mm.nc AS BIGINT) AS n_major,
        |  CAST(-mm.nc AS DOUBLE) / n_lines AS agreement
        |FROM m ORDER BY doc_id""".stripMargin,

    // winnow sketch -> distinct (doc, fingerprint) postings -> df-pruned
    // self-join -> pairs sharing >= 2 fingerprints (the MOSS candidate
    // stage, recomputed integer-exactly end-to-end)
    "q_winnow_matches" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |           FROM documents),
        |h AS (SELECT doc_id, list_transform(generate_series(1, len(a) - 3),
        |        i -> ('0x' || substr(md5(a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' || a[i+3] || 'winnow'), 1, 8))::BIGINT) AS hs
        |      FROM t WHERE len(a) >= 7),
        |s AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(hs) - 3),
        |        j -> list_min(hs[j:j+3]))) AS f
        |      FROM h),
        |fp AS (SELECT DISTINCT doc_id, f FROM s),
        |rare AS (SELECT f FROM fp GROUP BY f HAVING count(*) <= 1000),
        |fr AS (SELECT fp.doc_id, fp.f FROM fp JOIN rare USING (f))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |FROM fr a JOIN fr b ON a.f = b.f AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q_corpus_stats" ->
      """WITH doclvl AS (SELECT source AS domain, count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS distinct_texts,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        |  FROM documents GROUP BY 1),
        |tok AS (SELECT source AS domain, count(DISTINCT tk) AS distinct_tokens FROM
        |  (SELECT source, unnest(string_split(text, ' ')) AS tk FROM documents)
        |  WHERE tk <> '' GROUP BY 1)
        |SELECT d.domain, n_docs, distinct_texts, total_tokens, total_chars,
        |  COALESCE(distinct_tokens, 0) AS distinct_tokens,
        |  CAST(total_tokens AS DOUBLE) / n_docs AS avg_doc_tokens
        |FROM doclvl d LEFT JOIN tok t ON d.domain = t.domain
        |ORDER BY d.domain""".stripMargin,

    "q_pack" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 8))::BIGINT % 8 AS INT) AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens FROM documents),
        |c AS (SELECT doc_id, shard, tokens,
        |  CAST(COALESCE(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM d)
        |SELECT doc_id, shard, tokens, start_tok,
        |  start_tok // 256 AS pack, start_tok % 256 AS pack_off
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_curate_pipeline" ->
      """WITH q AS (SELECT doc_id, source, text,
        |  0.4 * least(1.0, len(string_split(text, ' ')) / 100.0)
        |      + 0.3 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |      + 0.3 * least(1.0, (len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','is','to','in'))) / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0) AS quality
        |  FROM documents),
        |f AS (SELECT * FROM q WHERE quality >= 0.45),
        |s AS (SELECT * FROM f
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT % 10000 AS INT)
        |    < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 7500
        |                  WHEN 'src2' THEN 5000  WHEN 'src3' THEN 2500
        |                  WHEN 'src4' THEN 0     ELSE 6000 END),
        |fp AS (SELECT doc_id, text, md5(text) AS fpr FROM s),
        |dd AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fpr),
        |tr AS (SELECT fp.doc_id, fp.text FROM fp JOIN dd ON fp.doc_id = dd.doc_id
        |  WHERE CAST(('0x' || substr(md5(CAST(fp.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT) < 90),
        |d AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 8))::BIGINT % 8 AS INT) AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens FROM tr),
        |c AS (SELECT doc_id, shard, tokens,
        |  CAST(COALESCE(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM d)
        |SELECT doc_id, shard, tokens, start_tok,
        |  start_tok // 256 AS pack, start_tok % 256 AS pack_off
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
        |SELECT doc_id,
        |  len(l) AS n_words,
        |  len(list_distinct(l)) AS n_distinct,
        |  (len(l) - len(list_distinct(l))) / CAST(len(l) AS DOUBLE) AS dup_frac,
        |  list_max(list_transform(list_distinct(l),
        |    w -> len(list_filter(l, x -> x = w)))) AS top_cnt,
        |  list_max(list_transform(list_distinct(l),
        |    w -> len(list_filter(l, x -> x = w)))) / CAST(len(l) AS DOUBLE) AS top_share
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_temp_sample" ->
      """WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
        |m AS (SELECT min(c) AS cmin FROM c WHERE source IS NOT NULL),
        |r AS (SELECT source,
        |        CAST(floor(sqrt(CAST(m.cmin AS DOUBLE) / CAST(c.c AS DOUBLE)) * 10000) AS INT) AS thr
        |      FROM c, m)
        |SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':temp'), 1, 8))::BIGINT % 10000 AS INT) < r.thr
        |ORDER BY d.doc_id""".stripMargin,

    "q_encoding_noise" ->
      """WITH planted AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 4 = 0 THEN chr(7) || chr(1) ELSE '' END ||
        |    CASE WHEN doc_id % 6 = 0 THEN chr(65533) ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]')) AS n_ctrl,
        |  len(regexp_extract_all(text, chr(65533))) AS n_repl,
        |  length(text) AS n_chars,
        |  round((len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]'))
        |         + len(regexp_extract_all(text, chr(65533))))
        |        / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS noise_ratio
        |FROM planted ORDER BY doc_id""".stripMargin,

    // Kneser–Ney: same split and count tables; the backoff term is the
    // add-one-smoothed CONTINUATION distribution (distinct-context
    // counts cw/ct) instead of raw unigram frequency
    "q_lm_kneser_ney" ->
      """WITH tr AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |            FROM documents WHERE doc_id % 2 = 0),
        |trp AS (SELECT doc_id, CASE WHEN i = 1 THEN '<s>' ELSE a[i-1] END AS v, a[i] AS w
        |        FROM tr, UNNEST(range(1, len(a) + 1)) AS r(i)),
        |bgc AS (SELECT v, w, count(*) AS c_vw FROM trp GROUP BY v, w),
        |ctx AS (SELECT v, sum(c_vw) AS c_v, count(*) AS n1p FROM bgc GROUP BY v),
        |cw AS (SELECT w, count(*) AS n1pw FROM bgc GROUP BY w),
        |ct AS (SELECT count(*) AS btypes, count(DISTINCT w) AS wtypes FROM bgc),
        |sc AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |       FROM documents WHERE doc_id % 2 = 1),
        |scp AS (SELECT doc_id, CASE WHEN i = 1 THEN '<s>' ELSE a[i-1] END AS v, a[i] AS w
        |        FROM sc, UNNEST(range(1, len(a) + 1)) AS r(i)),
        |lp AS (SELECT s.doc_id,
        |  CAST(round(ln(CASE WHEN ctx.c_v IS NULL
        |    THEN (CAST(coalesce(cw.n1pw, 0) AS DOUBLE) + 1.0)
        |         / (CAST(ct.btypes AS DOUBLE) + CAST(ct.wtypes AS DOUBLE) + 1.0)
        |    ELSE greatest(CAST(coalesce(bgc.c_vw, 0) AS DOUBLE) - 0.75, 0.0) / CAST(ctx.c_v AS DOUBLE)
        |       + (0.75 * CAST(ctx.n1p AS DOUBLE) / CAST(ctx.c_v AS DOUBLE)) *
        |         ((CAST(coalesce(cw.n1pw, 0) AS DOUBLE) + 1.0)
        |          / (CAST(ct.btypes AS DOUBLE) + CAST(ct.wtypes AS DOUBLE) + 1.0))
        |    END) * 1000000, 0) AS BIGINT) AS lp6
        |  FROM scp s LEFT JOIN bgc ON s.v = bgc.v AND s.w = bgc.w
        |             LEFT JOIN ctx ON s.v = ctx.v
        |             LEFT JOIN cw ON s.w = cw.w
        |             CROSS JOIN ct)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(((-sum(lp6)) * 10000) // (count(*) * 1000000) AS DOUBLE) / 10000.0 AS nll
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_lm_perplexity" ->
      """WITH tr AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |            FROM documents WHERE doc_id % 2 = 0),
        |trp AS (SELECT doc_id, CASE WHEN i = 1 THEN '<s>' ELSE a[i-1] END AS v, a[i] AS w
        |        FROM tr, UNNEST(range(1, len(a) + 1)) AS r(i)),
        |bgc AS (SELECT v, w, count(*) AS c_vw FROM trp GROUP BY v, w),
        |ctx AS (SELECT v, sum(c_vw) AS c_v, count(*) AS n1p FROM bgc GROUP BY v),
        |uni AS (SELECT w, count(*) AS c_w FROM trp GROUP BY w),
        |tot AS (SELECT sum(c_w) AS t_tokens, count(*) AS vocab FROM uni),
        |sc AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |       FROM documents WHERE doc_id % 2 = 1),
        |scp AS (SELECT doc_id, CASE WHEN i = 1 THEN '<s>' ELSE a[i-1] END AS v, a[i] AS w
        |        FROM sc, UNNEST(range(1, len(a) + 1)) AS r(i)),
        |lp AS (SELECT s.doc_id,
        |  CAST(round(ln(CASE WHEN ctx.c_v IS NULL
        |    THEN (CAST(coalesce(uni.c_w, 0) AS DOUBLE) + 1.0)
        |         / (CAST(tot.t_tokens AS DOUBLE) + CAST(tot.vocab AS DOUBLE) + 1.0)
        |    ELSE greatest(CAST(coalesce(bgc.c_vw, 0) AS DOUBLE) - 0.75, 0.0) / CAST(ctx.c_v AS DOUBLE)
        |       + (0.75 * CAST(ctx.n1p AS DOUBLE) / CAST(ctx.c_v AS DOUBLE)) *
        |         ((CAST(coalesce(uni.c_w, 0) AS DOUBLE) + 1.0)
        |          / (CAST(tot.t_tokens AS DOUBLE) + CAST(tot.vocab AS DOUBLE) + 1.0))
        |    END) * 1000000, 0) AS BIGINT) AS lp6
        |  FROM scp s LEFT JOIN bgc ON s.v = bgc.v AND s.w = bgc.w
        |             LEFT JOIN ctx ON s.v = ctx.v
        |             LEFT JOIN uni ON s.w = uni.w
        |             CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(((-sum(lp6)) * 10000) // (count(*) * 1000000) AS DOUBLE) / 10000.0 AS nll
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_lm_perplexity3" ->
      """WITH tr AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |            FROM documents WHERE doc_id % 2 = 0),
        |trp3 AS (SELECT doc_id,
        |           CASE WHEN i <= 2 THEN '<s>' ELSE a[i-2] END AS u,
        |           CASE WHEN i = 1 THEN '<s>' ELSE a[i-1] END AS v, a[i] AS w
        |         FROM tr, UNNEST(range(1, len(a) + 1)) AS r(i)),
        |tg AS (SELECT u, v, w, count(*) AS c_uvw FROM trp3 GROUP BY u, v, w),
        |bctx AS (SELECT u, v, sum(c_uvw) AS c_uv, count(*) AS n1p3 FROM tg GROUP BY u, v),
        |bgc AS (SELECT v, w, sum(c_uvw) AS c_vw FROM tg GROUP BY v, w),
        |ctx AS (SELECT v, sum(c_vw) AS c_v, count(*) AS n1p FROM bgc GROUP BY v),
        |uni AS (SELECT w, sum(c_vw) AS c_w FROM bgc GROUP BY w),
        |tot AS (SELECT sum(c_w) AS t_tokens, count(*) AS vocab FROM uni),
        |sc AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |       FROM documents WHERE doc_id % 2 = 1),
        |scp3 AS (SELECT doc_id,
        |           CASE WHEN i <= 2 THEN '<s>' ELSE a[i-2] END AS u,
        |           CASE WHEN i = 1 THEN '<s>' ELSE a[i-1] END AS v, a[i] AS w
        |         FROM sc, UNNEST(range(1, len(a) + 1)) AS r(i)),
        |lp0 AS (SELECT s.doc_id, tg.c_uvw, bctx.c_uv, bctx.n1p3,
        |  CASE WHEN ctx.c_v IS NULL
        |    THEN (CAST(coalesce(uni.c_w, 0) AS DOUBLE) + 1.0)
        |         / (CAST(tot.t_tokens AS DOUBLE) + CAST(tot.vocab AS DOUBLE) + 1.0)
        |    ELSE greatest(CAST(coalesce(bgc.c_vw, 0) AS DOUBLE) - 0.75, 0.0) / CAST(ctx.c_v AS DOUBLE)
        |       + (0.75 * CAST(ctx.n1p AS DOUBLE) / CAST(ctx.c_v AS DOUBLE)) *
        |         ((CAST(coalesce(uni.c_w, 0) AS DOUBLE) + 1.0)
        |          / (CAST(tot.t_tokens AS DOUBLE) + CAST(tot.vocab AS DOUBLE) + 1.0))
        |    END AS p2
        |  FROM scp3 s LEFT JOIN tg ON s.u = tg.u AND s.v = tg.v AND s.w = tg.w
        |              LEFT JOIN bctx ON s.u = bctx.u AND s.v = bctx.v
        |              LEFT JOIN bgc ON s.v = bgc.v AND s.w = bgc.w
        |              LEFT JOIN ctx ON s.v = ctx.v
        |              LEFT JOIN uni ON s.w = uni.w
        |              CROSS JOIN tot),
        |lp AS (SELECT doc_id,
        |  CAST(round(ln(CASE WHEN c_uv IS NULL THEN p2
        |    ELSE greatest(CAST(coalesce(c_uvw, 0) AS DOUBLE) - 0.75, 0.0) / CAST(c_uv AS DOUBLE)
        |       + (0.75 * CAST(n1p3 AS DOUBLE) / CAST(c_uv AS DOUBLE)) * p2
        |    END) * 1000000, 0) AS BIGINT) AS lp6 FROM lp0)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(((-sum(lp6)) * 10000) // (count(*) * 1000000) AS DOUBLE) / 10000.0 AS nll
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_ppl_buckets" ->
      """WITH tr AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |            FROM documents WHERE doc_id % 2 = 0),
        |trp AS (SELECT doc_id, CASE WHEN i = 1 THEN '<s>' ELSE a[i-1] END AS v, a[i] AS w
        |        FROM tr, UNNEST(range(1, len(a) + 1)) AS r(i)),
        |bgc AS (SELECT v, w, count(*) AS c_vw FROM trp GROUP BY v, w),
        |ctx AS (SELECT v, sum(c_vw) AS c_v, count(*) AS n1p FROM bgc GROUP BY v),
        |uni AS (SELECT w, count(*) AS c_w FROM trp GROUP BY w),
        |tot AS (SELECT sum(c_w) AS t_tokens, count(*) AS vocab FROM uni),
        |sc AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |       FROM documents),
        |scp AS (SELECT doc_id, CASE WHEN i = 1 THEN '<s>' ELSE a[i-1] END AS v, a[i] AS w
        |        FROM sc, UNNEST(range(1, len(a) + 1)) AS r(i)),
        |lp AS (SELECT s.doc_id,
        |  CAST(round(ln(CASE WHEN ctx.c_v IS NULL
        |    THEN (CAST(coalesce(uni.c_w, 0) AS DOUBLE) + 1.0)
        |         / (CAST(tot.t_tokens AS DOUBLE) + CAST(tot.vocab AS DOUBLE) + 1.0)
        |    ELSE greatest(CAST(coalesce(bgc.c_vw, 0) AS DOUBLE) - 0.75, 0.0) / CAST(ctx.c_v AS DOUBLE)
        |       + (0.75 * CAST(ctx.n1p AS DOUBLE) / CAST(ctx.c_v AS DOUBLE)) *
        |         ((CAST(coalesce(uni.c_w, 0) AS DOUBLE) + 1.0)
        |          / (CAST(tot.t_tokens AS DOUBLE) + CAST(tot.vocab AS DOUBLE) + 1.0))
        |    END) * 1000000, 0) AS BIGINT) AS lp6
        |  FROM scp s LEFT JOIN bgc ON s.v = bgc.v AND s.w = bgc.w
        |             LEFT JOIN ctx ON s.v = ctx.v
        |             LEFT JOIN uni ON s.w = uni.w
        |             CROSS JOIN tot),
        |sco AS (SELECT doc_id, count(*) AS n_tokens,
        |  CAST(((-sum(lp6)) * 10000) // (count(*) * 1000000) AS DOUBLE) / 10000.0 AS nll
        |FROM lp GROUP BY doc_id),
        |scod AS (SELECT s.doc_id, d.source, s.n_tokens, s.nll
        |         FROM sco s JOIN documents d USING (doc_id)),
        |grp AS (SELECT source, nll, count(*) AS c FROM scod GROUP BY source, nll),
        |asg AS (SELECT source, nll,
        |  coalesce(sum(c) OVER (PARTITION BY source ORDER BY nll
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS strt,
        |  sum(c) OVER (PARTITION BY source) AS n FROM grp),
        |bkt AS (SELECT source, nll,
        |  CASE WHEN strt <= n // 3 THEN 'head'
        |       WHEN strt <= (2 * n) // 3 THEN 'middle'
        |       ELSE 'tail' END AS ppl_bucket FROM asg)
        |SELECT d.doc_id, d.source, d.n_tokens, d.nll, b.ppl_bucket
        |FROM scod d JOIN bkt b USING (source, nll) ORDER BY d.doc_id""".stripMargin,

    "q_dsir_weights" ->
      """WITH tokt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |              FROM documents WHERE lang = 'en'),
        |gt AS (SELECT a[i] AS g FROM tokt, UNNEST(range(1, len(a) + 1)) AS r(i)
        |       UNION ALL
        |       SELECT a[i-1] || ' ' || a[i] AS g FROM tokt, UNNEST(range(2, len(a) + 1)) AS r(i)),
        |ct AS (SELECT CAST(('0x' || substr(md5(g || ':dsir'), 1, 8))::BIGINT % 4096 AS BIGINT) AS b,
        |              count(*) AS ctn
        |       FROM gt GROUP BY 1),
        |tokr AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |         FROM documents),
        |gr AS (SELECT a[i] AS g FROM tokr, UNNEST(range(1, len(a) + 1)) AS r(i)
        |       UNION ALL
        |       SELECT a[i-1] || ' ' || a[i] AS g FROM tokr, UNNEST(range(2, len(a) + 1)) AS r(i)),
        |cr AS (SELECT CAST(('0x' || substr(md5(g || ':dsir'), 1, 8))::BIGINT % 4096 AS BIGINT) AS b,
        |              count(*) AS crn
        |       FROM gr GROUP BY 1),
        |tt AS (SELECT coalesce(sum(ctn), 0) AS t FROM ct),
        |rt AS (SELECT coalesce(sum(crn), 0) AS r FROM cr),
        |dense AS (SELECT CAST(UNNEST(range(0, 4096)) AS BIGINT) AS b),
        |ratio AS (SELECT dense.b, CAST(round(ln(
        |    ((CAST(coalesce(ct.ctn, 0) AS DOUBLE) + 1.0) / (CAST(tt.t AS DOUBLE) + 4096.0))
        |  / ((CAST(coalesce(cr.crn, 0) AS DOUBLE) + 1.0) / (CAST(rt.r AS DOUBLE) + 4096.0))
        |  ) * 1000000, 0) AS BIGINT) AS lr6
        |  FROM dense LEFT JOIN ct USING (b) LEFT JOIN cr USING (b)
        |             CROSS JOIN tt CROSS JOIN rt),
        |tokc AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |         FROM documents WHERE lang <> 'en'),
        |gc AS (SELECT doc_id, a[i] AS g FROM tokc, UNNEST(range(1, len(a) + 1)) AS r(i)
        |       UNION ALL
        |       SELECT doc_id, a[i-1] || ' ' || a[i] AS g FROM tokc, UNNEST(range(2, len(a) + 1)) AS r(i)),
        |bc AS (SELECT doc_id, CAST(('0x' || substr(md5(g || ':dsir'), 1, 8))::BIGINT % 4096 AS BIGINT) AS b
        |       FROM gc)
        |SELECT doc_id, count(*) AS n_feats,
        |       CAST(sum(lr6) AS DOUBLE) / 1000000.0 AS logw
        |FROM bc JOIN ratio USING (b) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_dsir_select" ->
      """WITH tokt AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |              FROM documents WHERE lang = 'en'),
        |gt AS (SELECT a[i] AS g FROM tokt, UNNEST(range(1, len(a) + 1)) AS r(i)
        |       UNION ALL
        |       SELECT a[i-1] || ' ' || a[i] AS g FROM tokt, UNNEST(range(2, len(a) + 1)) AS r(i)),
        |ct AS (SELECT CAST(('0x' || substr(md5(g || ':dsir'), 1, 8))::BIGINT % 4096 AS BIGINT) AS b,
        |              count(*) AS ctn
        |       FROM gt GROUP BY 1),
        |tokr AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |         FROM documents),
        |gr AS (SELECT a[i] AS g FROM tokr, UNNEST(range(1, len(a) + 1)) AS r(i)
        |       UNION ALL
        |       SELECT a[i-1] || ' ' || a[i] AS g FROM tokr, UNNEST(range(2, len(a) + 1)) AS r(i)),
        |cr AS (SELECT CAST(('0x' || substr(md5(g || ':dsir'), 1, 8))::BIGINT % 4096 AS BIGINT) AS b,
        |              count(*) AS crn
        |       FROM gr GROUP BY 1),
        |tt AS (SELECT coalesce(sum(ctn), 0) AS t FROM ct),
        |rt AS (SELECT coalesce(sum(crn), 0) AS r FROM cr),
        |dense AS (SELECT CAST(UNNEST(range(0, 4096)) AS BIGINT) AS b),
        |ratio AS (SELECT dense.b, CAST(round(ln(
        |    ((CAST(coalesce(ct.ctn, 0) AS DOUBLE) + 1.0) / (CAST(tt.t AS DOUBLE) + 4096.0))
        |  / ((CAST(coalesce(cr.crn, 0) AS DOUBLE) + 1.0) / (CAST(rt.r AS DOUBLE) + 4096.0))
        |  ) * 1000000, 0) AS BIGINT) AS lr6
        |  FROM dense LEFT JOIN ct USING (b) LEFT JOIN cr USING (b)
        |             CROSS JOIN tt CROSS JOIN rt),
        |tokc AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS a
        |         FROM documents WHERE lang <> 'en'),
        |gc AS (SELECT doc_id, a[i] AS g FROM tokc, UNNEST(range(1, len(a) + 1)) AS r(i)
        |       UNION ALL
        |       SELECT doc_id, a[i-1] || ' ' || a[i] AS g FROM tokc, UNNEST(range(2, len(a) + 1)) AS r(i)),
        |bc AS (SELECT doc_id, CAST(('0x' || substr(md5(g || ':dsir'), 1, 8))::BIGINT % 4096 AS BIGINT) AS b
        |       FROM gc),
        |w AS (SELECT doc_id, sum(lr6) AS w6
        |      FROM bc JOIN ratio USING (b) GROUP BY doc_id),
        |sel AS (SELECT doc_id, w6, w6 + CAST(round(-ln(-ln(
        |    ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':gumbel'), 1, 8))::BIGINT + 0.5)
        |     / 4294967296.0))) * 1000000, 0) AS BIGINT) AS k6
        |  FROM w ORDER BY k6 DESC, doc_id LIMIT 50)
        |SELECT doc_id, CAST(w6 AS DOUBLE) / 1000000.0 AS logw,
        |       CAST(k6 AS DOUBLE) / 1000000.0 AS gkey
        |FROM sel ORDER BY doc_id""".stripMargin,

    "q_c4_filter" ->
      """WITH planted AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'alpha beta gamma delta epsilon.' ELSE '' END
        |  || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'short line.' ELSE '' END
        |  || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'one two three four five. six seven eight nine ten. eleven twelve thirteen fourteen fifteen.' ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0 THEN ' lorem ipsum' ELSE '' END AS text
        |  FROM documents),
        |k AS (SELECT doc_id, text, string_split(text, chr(10)) AS ls,
        |  list_filter(string_split(text, chr(10)), x ->
        |    right(x, 1) IN ('.', '!', '?', '"')
        |    AND len(list_filter(string_split(x, ' '), w -> w <> '')) >= 5) AS kl
        |  FROM planted)
        |SELECT doc_id,
        |  coalesce(array_to_string(kl, chr(10)), '') AS text_clean,
        |  len(ls) AS n_lines, len(kl) AS n_lines_kept,
        |  len(regexp_extract_all(coalesce(array_to_string(kl, chr(10)), ''), '[.!?]')) AS n_sentences,
        |  (len(regexp_extract_all(coalesce(array_to_string(kl, chr(10)), ''), '[.!?]')) >= 3
        |   AND NOT instr(lower(text), 'lorem ipsum') > 0
        |   AND NOT instr(text, '{') > 0 AND NOT instr(text, '}') > 0) AS keep
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_gopher_rules" ->
      """WITH planted AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 2 = 0 THEN ' and that of with to' ELSE '' END
        |  || CASE WHEN doc_id % 9 = 0 THEN ' # # # # # # # # # # # #' ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN chr(10) || '- alpha bullet' || chr(10) || '- beta bullet' ELSE '' END
        |  || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'trailing thought...' ELSE '' END AS text
        |  FROM documents),
        |w AS (SELECT doc_id, text,
        |  list_filter(string_split(replace(text, chr(10), ' '), ' '), x -> x <> '') AS ws,
        |  string_split(text, chr(10)) AS ls FROM planted),
        |s AS (SELECT doc_id, text, ws, ls,
        |  len(ws) AS n_words,
        |  CAST(greatest(len(ws), 1) AS DOUBLE) AS wden,
        |  CAST(len(ls) AS DOUBLE) AS lden FROM w),
        |r AS (SELECT doc_id, n_words,
        |  CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0) AS DOUBLE) / wden AS mean_word_len,
        |  CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / wden AS alpha_ratio,
        |  CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.'))
        |       + len(regexp_extract_all(text, '…')) AS DOUBLE) / wden AS symbol_ratio,
        |  CAST(len(list_filter(ls, x -> left(x, 1) IN ('-', '*', '•'))) AS DOUBLE) / lden AS bullet_ratio,
        |  CAST(len(list_filter(ls, x -> right(x, 3) = '...' OR right(x, 1) = '…')) AS DOUBLE) / lden AS ellipsis_ratio,
        |  (CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END
        |   + CASE WHEN list_contains(ws, 'be') THEN 1 ELSE 0 END
        |   + CASE WHEN list_contains(ws, 'to') THEN 1 ELSE 0 END
        |   + CASE WHEN list_contains(ws, 'of') THEN 1 ELSE 0 END
        |   + CASE WHEN list_contains(ws, 'and') THEN 1 ELSE 0 END
        |   + CASE WHEN list_contains(ws, 'that') THEN 1 ELSE 0 END
        |   + CASE WHEN list_contains(ws, 'have') THEN 1 ELSE 0 END
        |   + CASE WHEN list_contains(ws, 'with') THEN 1 ELSE 0 END) AS stop_hits
        |  FROM s)
        |SELECT doc_id, n_words, mean_word_len, alpha_ratio, symbol_ratio,
        |  bullet_ratio, ellipsis_ratio, stop_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |   AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
        |   AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
        |   AND stop_hits >= 2) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_concat_chunks" ->
      """WITH t AS (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> '')) + 1 AS c,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'shuffle'), 1, 8))::BIGINT % 8 AS INT) AS shard,
        |  md5(CAST(doc_id AS VARCHAR) || 'shuffle:pos') AS ok
        |  FROM documents),
        |p AS (SELECT doc_id, c, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY ok, doc_id) - 1 AS INT) AS pos
        |  FROM t),
        |o AS (SELECT doc_id, c, shard, pos,
        |  CAST(coalesce(sum(c) OVER (PARTITION BY shard ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS ofs
        |  FROM p),
        |s AS (SELECT doc_id, shard, pos, ofs, c,
        |  UNNEST(range(ofs // 128, (ofs + c - 1) // 128 + 1)) AS block_id
        |  FROM o)
        |SELECT doc_id, shard, pos, block_id,
        |  greatest(block_id * 128 - ofs, 0) AS slice_start,
        |  least((block_id + 1) * 128, ofs + c) - greatest(block_id * 128, ofs) AS slice_len
        |FROM s ORDER BY doc_id, block_id""".stripMargin,

    "q_shuffle_shards" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'shuffle'), 1, 8))::BIGINT % 8 AS INT) AS shard,
        |  CAST(row_number() OVER (
        |      PARTITION BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'shuffle'), 1, 8))::BIGINT % 8
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || 'shuffle:pos'), doc_id) - 1 AS INT) AS pos
        |FROM documents ORDER BY shard, pos""".stripMargin,

    "q_length_batches" ->
      """SELECT doc_id,
        |  len(string_split(coalesce(text, ''), ' ')) AS ws_tokens,
        |  CAST(len(string_split(coalesce(text, ''), ' ')) // 16 AS INT) AS bucket,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'batch:shard'), 1, 8))::BIGINT % 4 AS INT) AS shard,
        |  CAST((row_number() OVER (
        |      PARTITION BY len(string_split(coalesce(text, ''), ' ')) // 16,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'batch:shard'), 1, 8))::BIGINT % 4
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || 'batch'), doc_id) - 1) // 32 AS INT) AS batch_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      """WITH pii AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.77' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b', '<PHONE>', 'g') AS text_clean,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(text, '\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\b')) AS n_phones
        |FROM pii ORDER BY doc_id""".stripMargin,

    "q_vocab_drift" ->
      """WITH t AS (SELECT CASE WHEN TRY_CAST(substr(source, 4) AS INT) < 10 THEN 'a'
        |                 WHEN TRY_CAST(substr(source, 4) AS INT) >= 10 THEN 'b' END AS side,
        |            unnest(string_split(coalesce(text, ''), ' ')) AS tok FROM documents),
        |c AS (SELECT side, tok, count(*) AS c FROM t WHERE tok <> '' AND side IS NOT NULL GROUP BY side, tok),
        |tot AS (SELECT
        |    CAST(coalesce(sum(CASE WHEN side = 'a' THEN c END), 0) AS BIGINT) AS na,
        |    CAST(coalesce(sum(CASE WHEN side = 'b' THEN c END), 0) AS BIGINT) AS nb FROM c),
        |p AS (SELECT coalesce(ca.tok, cb.tok) AS tok,
        |             coalesce(ca.c, 0) AS c_a, coalesce(cb.c, 0) AS c_b
        |      FROM (SELECT tok, c FROM c WHERE side = 'a') ca
        |      FULL OUTER JOIN (SELECT tok, c FROM c WHERE side = 'b') cb USING (tok))
        |SELECT tok, c_a, c_b,
        |  CAST(c_a AS DOUBLE) / CAST(tot.na AS DOUBLE) AS rate_a,
        |  CAST(c_b AS DOUBLE) / CAST(tot.nb AS DOUBLE) AS rate_b,
        |  CAST(c_a AS DOUBLE) / CAST(tot.na AS DOUBLE) -
        |    CAST(c_b AS DOUBLE) / CAST(tot.nb AS DOUBLE) AS rate_diff
        |FROM p, tot ORDER BY tok""".stripMargin,

    "q_rare_bigrams" ->
      """WITH tk AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM documents),
        |base AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |       ELSE [] END AS bgs FROM tk),
        |bg AS (SELECT doc_id, unnest(bgs) AS bg FROM base),
        |cnt AS (SELECT bg, count(*) AS c FROM bg GROUP BY bg),
        |tot AS (SELECT sum(c) AS n FROM cnt),
        |rare AS (SELECT bg FROM cnt, tot WHERE c * 20000 <= n),
        |hits AS (SELECT doc_id, count(*) AS n_rare FROM bg JOIN rare USING (bg) GROUP BY doc_id)
        |SELECT b.doc_id, CAST(len(b.bgs) AS INT) AS n_bigrams,
        |  coalesce(h.n_rare, 0) AS n_rare,
        |  CASE WHEN len(b.bgs) > 0
        |       THEN CAST(coalesce(h.n_rare, 0) AS DOUBLE) / CAST(len(b.bgs) AS DOUBLE) END AS rare_rate
        |FROM base b LEFT JOIN hits h USING (doc_id) ORDER BY b.doc_id""".stripMargin,

    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS win, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win, event_type""".stripMargin,

    "q_skew_join" ->
      """SELECT n_name, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT CASE WHEN user_id % 4 <> 0 THEN 3 ELSE user_id % 25 END AS k, value
        |      FROM events) e
        |JOIN nation n ON n.n_nationkey = e.k
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_json_field" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_ivf_search" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_distance(e.embedding::DOUBLE[], q.qvec) AS sc FROM embeddings e, q),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc ASC, id) AS rnk FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_bm25_encode" ->
      s"""WITH $Bm25Cte
         |SELECT doc_id, term, tf, round(weight, 4) AS weight FROM enc
         |ORDER BY doc_id, term""".stripMargin,

    "q_sparse_search" ->
      s"""WITH $Bm25Cte,
         |qw AS (SELECT term, qw FROM (VALUES
         |  ('spark', 2.0), ('join', 1.0), ('scan', 0.5)) AS t(term, qw)),
         |sc AS (SELECT e.doc_id,
         |  CAST(sum(CAST(round(e.weight, 4) AS DECIMAL(18,4)) * CAST(qw.qw AS DECIMAL(8,4))) AS DOUBLE) AS score
         |  FROM enc e JOIN qw ON e.term = qw.term GROUP BY e.doc_id),
         |r AS (SELECT doc_id, score,
         |  row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
         |SELECT CAST(rank AS INT) AS rank, doc_id, score FROM r
         |WHERE rank <= 15 ORDER BY rank""".stripMargin,

    "q_fulltext" ->
      s"""WITH $FulltextCte
         |SELECT CAST(rank AS INT) AS rank, doc_id, n_terms, score FROM ranked
         |WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q_hybrid_rrf" ->
      s"""WITH $FulltextCte,
         |$HybridDenseCte,
         |contrib AS (
         |  SELECT query_id, id, 1.0 / (60 + rnk) AS c FROM dense WHERE rnk <= 20
         |  UNION ALL
         |  SELECT q.qid AS query_id, r.doc_id AS id, 1.0 / (60 + r.rank) AS c
         |  FROM (SELECT DISTINCT qid FROM qv) q, ranked r WHERE r.rank <= 20),
         |fused AS (SELECT query_id, id, sum(c) AS rrf FROM contrib GROUP BY query_id, id),
         |final AS (SELECT query_id, id, rrf,
         |  row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, id) AS rank FROM fused)
         |SELECT query_id, CAST(rank AS INT) AS rank, id, round(rrf, 6) AS rrf
         |FROM final WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_hybrid_perq" ->
      s"""WITH $Bm25Cte,
         |$HybridDenseCte,
         |qt AS (SELECT CAST(query_id AS BIGINT) AS query_id, term FROM (VALUES
         |  (0,'spark'),(0,'join'),(1,'filter'),(1,'window'),
         |  (2,'scan'),(2,'table'),(3,'spark'),(3,'scan')) AS t(query_id, term)),
         |elig AS (SELECT dfreq.term FROM dfreq, corpus WHERE dfreq.df <= 0.9 * corpus.n_docs),
         |sc AS (
         |  SELECT qt.query_id, e.doc_id,
         |    CAST(sum(CAST(round(e.weight, 4) AS DECIMAL(18,4))) AS DOUBLE) AS score
         |  FROM enc e JOIN qt ON e.term = qt.term JOIN elig ON e.term = elig.term
         |  GROUP BY qt.query_id, e.doc_id),
         |sr AS (SELECT query_id, doc_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank FROM sc),
         |contrib AS (
         |  SELECT query_id, id, 1.0 / (60 + rnk) AS c FROM dense WHERE rnk <= 20
         |  UNION ALL
         |  SELECT query_id, doc_id AS id, 1.0 / (60 + rank) AS c FROM sr WHERE rank <= 20),
         |fused AS (SELECT query_id, id, sum(c) AS rrf FROM contrib GROUP BY query_id, id),
         |final AS (SELECT query_id, id, rrf,
         |  row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, id) AS rank FROM fused)
         |SELECT query_id, CAST(rank AS INT) AS rank, id, round(rrf, 6) AS rrf
         |FROM final WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_hybrid_weighted" ->
      s"""WITH $FulltextCte,
         |$HybridDenseCte,
         |contrib AS (
         |  SELECT query_id, id,
         |    CAST(0.7 AS DECIMAL(8,4)) * CAST(round(sc, 4) AS DECIMAL(18,4)) AS c
         |  FROM dense WHERE rnk <= 20
         |  UNION ALL
         |  SELECT q.qid AS query_id, r.doc_id AS id,
         |    CAST(0.3 AS DECIMAL(8,4)) * CAST(r.score AS DECIMAL(18,4)) AS c
         |  FROM (SELECT DISTINCT qid FROM qv) q, ranked r WHERE r.rank <= 20),
         |fused AS (SELECT query_id, id, CAST(sum(c) AS DOUBLE) AS score
         |          FROM contrib GROUP BY query_id, id),
         |final AS (SELECT query_id, id, score,
         |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM fused)
         |SELECT query_id, CAST(rank AS INT) AS rank, id, score
         |FROM final WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_chunk_split" ->
      """SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |  source || ': ' || substr(text, CAST(i * 60 + 1 AS INT), 80) AS chunk
        |FROM (SELECT doc_id, text, source,
        |        unnest(generate_series(0, greatest(0, CAST(floor((length(text) - 1) / 60.0) AS INT)))) AS i
        |      FROM documents)
        |ORDER BY doc_id, chunk_id""".stripMargin,

    "q_file_details" ->
      """SELECT CAST(doc_id AS VARCHAR) || '.md' AS file_name,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_length,
        |  'md' AS file_type,
        |  CAST(greatest(0, CAST(floor((length(text) - 1) / 60.0) AS INT)) + 1 AS BIGINT) AS n_chunks
        |FROM documents WHERE text IS NOT NULL AND n_chars > 0
        |ORDER BY file_name""".stripMargin,

    "q_file_images" ->
      """WITH f AS (SELECT CAST(doc_id AS VARCHAR) || '.md' AS file_name, doc_id
        |           FROM documents WHERE text IS NOT NULL AND n_chars > 0),
        |i AS (SELECT file_name, 'fig_' || CAST(doc_id AS VARCHAR) || '.png' AS image_name FROM f
        |      UNION ALL SELECT file_name, 'assets/logo.png' FROM f)
        |SELECT file_name, image_name,
        |  'files/' || file_name || '/' || image_name AS url
        |FROM i ORDER BY file_name, image_name""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups, md5(text) AS text_hash
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q_dedup_ngram" ->
      """WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toksrc)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
        |FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_clusters" ->
      """WITH RECURSIVE toksrc AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toksrc)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM inter
        |  JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM edges
        |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a),
        |comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)
        |SELECT doc_id, cluster_id FROM comp ORDER BY doc_id""".stripMargin,

    // same recursive-CTE components as q_dedup_clusters, then keep the
    // best-quality doc per component (row_number over quality DESC, id)
    // and pass docs in no pair through as their own cluster
    "q_cluster_reps" ->
      """WITH RECURSIVE toksrc AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toksrc)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM inter
        |  JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM edges
        |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a),
        |comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
        |q AS (SELECT doc_id,
        |  0.4 * least(1.0, len(string_split(text, ' ')) / 100.0)
        |      + 0.3 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |      + 0.3 * least(1.0, (len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','is','to','in'))) / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0) AS quality
        |  FROM documents),
        |clustered AS (SELECT q.doc_id, q.quality, comp.cluster_id,
        |  row_number() OVER (PARTITION BY comp.cluster_id ORDER BY q.quality DESC, q.doc_id) AS rn
        |  FROM q JOIN comp ON q.doc_id = comp.doc_id)
        |SELECT doc_id, quality, cluster_id FROM clustered WHERE rn = 1
        |UNION ALL
        |SELECT doc_id, quality, doc_id AS cluster_id FROM q
        |  WHERE doc_id NOT IN (SELECT doc_id FROM comp)
        |ORDER BY doc_id""".stripMargin,

    // same recursive-CTE components, then weight_micro = floor(1e6 /
    // cluster size) per doc — pure integer division, loners weight 1e6
    "q_soft_dedup" ->
      """WITH RECURSIVE toksrc AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toksrc)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT id_a, id_b FROM inter
        |  JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM edges
        |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a),
        |comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
        |csz AS (SELECT cluster_id, count(*) AS cs FROM comp GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(c.cluster_id, d.doc_id) AS cluster_id,
        |  CAST(coalesce(cs, 1) AS BIGINT) AS cluster_size,
        |  CAST(1000000 // coalesce(cs, 1) AS BIGINT) AS weight_micro
        |FROM documents d
        |LEFT JOIN comp c ON d.doc_id = c.doc_id
        |LEFT JOIN csz ON c.cluster_id = csz.cluster_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_semdedup" ->
      """WITH RECURSIVE v AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS e
        |        FROM embeddings),
        |cent AS (SELECT list(m ORDER BY pos) AS c FROM (
        |  SELECT pos, CAST(sum(CAST(x AS DECIMAL(30,15))) AS DOUBLE) / count(*) AS m
        |  FROM (SELECT unnest(e) AS x, generate_subscripts(e, 1) AS pos FROM v)
        |  GROUP BY pos)),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM v a, v b
        |  WHERE a.doc_id < b.doc_id AND list_cosine_similarity(a.e, b.e) >= 0.45),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(a, b) AS (SELECT a, b FROM edges
        |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b != r.a),
        |comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a),
        |scored AS (SELECT v.doc_id,
        |    -round(list_cosine_similarity(v.e, cent.c), 4) AS s FROM v, cent),
        |clustered AS (SELECT s.doc_id,
        |    row_number() OVER (PARTITION BY comp.cluster_id
        |                       ORDER BY s.s DESC, s.doc_id) AS rn
        |  FROM scored s JOIN comp ON s.doc_id = comp.doc_id)
        |SELECT doc_id FROM clustered WHERE rn = 1
        |UNION ALL
        |SELECT doc_id FROM v WHERE doc_id NOT IN (SELECT doc_id FROM comp)
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_embed" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,

    // LSH-candidates + exact-verify must equal the all-pairs answer when
    // the band configuration is exhaustive for the threshold
    "q_dedup_embed_lsh" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
        |FROM embeddings a, embeddings b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
        |ORDER BY id_a, id_b""".stripMargin,

    "q_lang_id" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und','ist','nicht'))) AS s_de,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','is','to','in'))) AS s_en,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','y','en','que'))) AS s_es,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('le','la','de','et','est','une'))) AS s_fr,
        |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_fr THEN 'es'
        |       ELSE 'fr' END AS predicted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  (length(text) - (len(string_split(text, ' ')) - 1)) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len,
        |  len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio,
        |  len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','is','to','in'))) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
        |  0.4 * least(1.0, len(string_split(text, ' ')) / 100.0)
        |      + 0.3 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |      + 0.3 * least(1.0, (len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','is','to','in'))) / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens,
        |  length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // identical plant, identical sentence convention ('.'-split, trim,
    // drop empties), duplicated spans via window count, global first
    // occurrence via row_number over (doc_id, pos)
    "q_span_repeats" ->
      """WITH planted AS (SELECT doc_id, CASE CAST(doc_id % 9 AS INT)
        |  WHEN 0 THEN text || '. Alpha gamma delta repeats. Beta span sentence here. Third planted sentence ends.'
        |  WHEN 1 THEN 'Alpha gamma delta repeats. Beta span sentence here. Third planted sentence ends. ' || text
        |  ELSE text END AS text FROM documents),
        |s AS (SELECT doc_id, list_filter(list_transform(string_split(text, '.'), x -> trim(x)), x -> x <> '') AS l
        |      FROM planted),
        |sp AS (SELECT doc_id, CAST(i AS INT) AS pos, array_to_string(l[i:i+2], '. ') AS span
        |       FROM s, UNNEST(range(1, len(l) - 1)) AS r(i) WHERE len(l) >= 3),
        |w AS (SELECT doc_id, pos, span,
        |        count(*) OVER (PARTITION BY span) AS n_occ,
        |        row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        |      FROM sp)
        |SELECT doc_id, pos, span, n_occ, rn = 1 AS is_first
        |FROM w WHERE n_occ >= 2 ORDER BY doc_id, pos""".stripMargin,

    // the apply step: doom the sentences of every non-first duplicated
    // span occurrence, rebuild per doc with string_agg ordered by
    // sentence position
    "q_span_dedup" ->
      """WITH planted AS (SELECT doc_id, CASE CAST(doc_id % 9 AS INT)
        |  WHEN 0 THEN text || '. Alpha gamma delta repeats. Beta span sentence here. Third planted sentence ends.'
        |  WHEN 1 THEN 'Alpha gamma delta repeats. Beta span sentence here. Third planted sentence ends. ' || text
        |  ELSE text END AS text FROM documents),
        |s AS (SELECT doc_id, list_filter(list_transform(string_split(text, '.'), x -> trim(x)), x -> x <> '') AS l
        |      FROM planted),
        |sent AS (SELECT doc_id, CAST(i AS INT) AS sent_pos, l[i] AS sentence
        |         FROM s, UNNEST(range(1, len(l) + 1)) AS r(i)),
        |sp AS (SELECT doc_id, CAST(i AS INT) AS pos, array_to_string(l[i:i+2], '. ') AS span
        |       FROM s, UNNEST(range(1, len(l) - 1)) AS r(i) WHERE len(l) >= 3),
        |w AS (SELECT doc_id, pos,
        |        count(*) OVER (PARTITION BY span) AS n_occ,
        |        row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        |      FROM sp),
        |doomed AS (SELECT DISTINCT d.doc_id, CAST(p AS INT) AS sent_pos
        |           FROM (SELECT doc_id, pos FROM w WHERE n_occ >= 2 AND rn > 1) d,
        |                UNNEST(range(d.pos, d.pos + 3)) AS u(p)),
        |kept AS (SELECT sent.doc_id, sent.sent_pos, sent.sentence
        |         FROM sent LEFT JOIN doomed USING (doc_id, sent_pos)
        |         WHERE doomed.sent_pos IS NULL),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |               string_agg(sentence, '. ' ORDER BY sent_pos) AS text_clean
        |        FROM kept GROUP BY doc_id),
        |cnt AS (SELECT doc_id, count(*) AS n_sentences FROM sent GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(cnt.n_sentences, 0) AS n_sentences,
        |  COALESCE(cnt.n_sentences, 0) - COALESCE(reb.n_kept, 0) AS n_dropped,
        |  COALESCE(reb.text_clean, '') AS text_clean
        |FROM documents d LEFT JOIN cnt USING (doc_id) LEFT JOIN reb USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // the same whitespace-token convention; ratios are the identical
    // unrounded IEEE divisions over exact integer inputs
    "q_lexical_spectrum" ->
      """WITH tc AS (SELECT domain, tk, count(*) AS c FROM (
        |    SELECT source AS domain,
        |           unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
        |    FROM documents) GROUP BY domain, tk)
        |SELECT domain,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_types,
        |  CAST(max(c) AS BIGINT) AS top_type_tokens,
        |  CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS type_token_ratio,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS hapax_ratio
        |FROM tc GROUP BY domain ORDER BY domain""".stripMargin,

    // the identical planted dirt (chr() codepoints = the Scala \u
    // escapes) and the identical translate/strip/collapse rule chain
    "q_normalize_text" ->
      """WITH dirty AS (SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
        |  WHEN 0 THEN chr(8220) || text || chr(8221) || chr(8203)
        |  WHEN 1 THEN chr(160) || chr(8216) || 'q' || chr(8217) || ' ' || text
        |  WHEN 2 THEN text || chr(9) || chr(9) || 'end' || chr(7)
        |  ELSE text END AS text FROM documents),
        |n AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(translate(text,
        |      chr(8216) || chr(8217) || chr(8220) || chr(8221) || chr(8211) || chr(8212) || chr(160),
        |      chr(39) || chr(39) || chr(34) || chr(34) || '--' || ' '),
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]', '', 'g'),
        |   '[ \x{09}]+', ' ', 'g')) AS text_norm FROM dirty)
        |SELECT doc_id, text_norm, text_norm <> text AS changed
        |FROM n ORDER BY doc_id""".stripMargin,

    // identical planted urls and the identical canonicalization chain:
    // first-'://' split, lowercase scheme+host, default-port strip,
    // fragment drop, exact-key tracking-param drop with order
    // preserved, trailing-slash strip on non-root paths, percent-hex
    // lowercase, schemeless pass-through
    "q_url_dedup" ->
      """WITH urls AS (SELECT doc_id,
        |  CASE WHEN doc_id % 23 = 0 THEN 'www.example.com/Case' || (doc_id % 2)
        |  ELSE
        |   (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
        |   (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM' ELSE 'www.example.com' END) ||
        |   (CASE WHEN doc_id % 13 = 0 THEN ':443' ELSE '' END) ||
        |   '/Page/' || (doc_id // 7) ||
        |   (CASE WHEN doc_id % 12 = 0 THEN '%2F' WHEN doc_id % 12 = 6 THEN '%2f' ELSE '' END) ||
        |   (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END) ||
        |   (CASE WHEN doc_id % 5 = 0 THEN '?id=' || (doc_id % 2) || '&utm_campaign=c' || doc_id || '&gclid_src=g'
        |         ELSE '?utm_source=s' || doc_id END) ||
        |   (CASE WHEN doc_id % 19 = 0 THEN '&next=https://Other.example.org/KeepCase' ELSE '' END) ||
        |   '#sec' || doc_id END AS url
        | FROM documents),
        |parts AS (SELECT doc_id, url, instr(url, '://') AS sep,
        |  lower(substr(url, 1, instr(url, '://') - 1)) AS scheme,
        |  substr(url, instr(url, '://') + 3) AS rest
        | FROM urls),
        |hostp AS (SELECT *, split_part(split_part(split_part(rest, '#', 1), '?', 1), '/', 1) AS host_raw FROM parts),
        |hp AS (SELECT *, lower(host_raw) AS host_port,
        |  substr(rest, length(host_raw) + 1) AS pathq,
        |  CASE WHEN scheme = 'http' THEN ':80' WHEN scheme = 'https' THEN ':443' ELSE '' END AS def_port
        | FROM hostp),
        |hh AS (SELECT *, CASE WHEN length(def_port) > 0 AND ends_with(host_port, def_port)
        |    THEN substr(host_port, 1, length(host_port) - length(def_port)) ELSE host_port END AS host,
        |  split_part(pathq, '#', 1) AS nofrag FROM hp),
        |pq AS (SELECT *, split_part(nofrag, '?', 1) AS path0,
        |  CASE WHEN instr(nofrag, '?') > 0 THEN substr(nofrag, instr(nofrag, '?') + 1) ELSE '' END AS query
        | FROM hh),
        |kq AS (SELECT *, coalesce(array_to_string(list_filter(string_split(query, '&'),
        |    p -> NOT (starts_with(split_part(p, '=', 1), 'utm_')
        |           OR split_part(p, '=', 1) = 'fbclid'
        |           OR split_part(p, '=', 1) = 'gclid')), '&'), '') AS kept
        | FROM pq),
        |canon0 AS (SELECT doc_id, url, sep, scheme || '://' || host ||
        |  (CASE WHEN length(path0) > 1 AND substr(path0, length(path0), 1) = '/'
        |        THEN substr(path0, 1, length(path0) - 1) ELSE path0 END) ||
        |  (CASE WHEN length(kept) > 0 THEN '?' || kept ELSE '' END) AS c
        | FROM kq),
        |lowpct AS (SELECT doc_id, url, sep,
        |  CASE WHEN len(ps) > 1 THEN ps[1] || '%' || array_to_string(
        |    list_transform(ps[2:], x -> CASE WHEN regexp_matches(x, '^[0-9A-Fa-f]{2}')
        |      THEN lower(substr(x, 1, 2)) || substr(x, 3) ELSE x END), '%')
        |  ELSE c END AS cl
        | FROM (SELECT *, string_split(c, '%') AS ps FROM canon0)),
        |canon AS (SELECT doc_id,
        |  CASE WHEN sep = 0 OR NOT regexp_matches(substr(url, 1, sep - 1), '^[A-Za-z][A-Za-z0-9+.-]*$')
        |       THEN url ELSE cl END AS url_canon FROM lowpct)
        |SELECT min(doc_id) AS id, url_canon FROM canon GROUP BY url_canon ORDER BY id""".stripMargin,

    // same salted-md5 content-addressed order as detSplit, inclusive
    // running token total per domain (window sum is HUGEINT in DuckDB —
    // cast to BIGINT to match Spark's long)
    "q_token_budget" ->
      """WITH b AS (SELECT doc_id, source AS domain,
        |  CAST(len(string_split(coalesce(text, ''), ' ')) AS INT) AS n_tokens,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'budget'), 1, 8))::BIGINT AS ord
        | FROM documents),
        |c AS (SELECT doc_id, domain, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY domain ORDER BY ord, doc_id) AS BIGINT) AS cum_tokens
        | FROM b)
        |SELECT doc_id, domain, n_tokens, cum_tokens, cum_tokens <= 800 AS keep
        |FROM c ORDER BY doc_id""".stripMargin,

    // null-safe label inequality (IS DISTINCT FROM = Spark's negated
    // <=>), exact cosine top-k through the shared ranking shape
    "q_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label AS qlab
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q WHERE e.label IS DISTINCT FROM q.qlab),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk
        |      FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    // the ANN arm's exhaustive twin: ef >= segment size visits every
    // node, so the graph-served label-filtered rerank equals the exact
    // scan — the SAME oracle as q_hard_negatives
    "q_hard_negatives_hnsw_exhaustive" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label AS qlab
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |        list_cosine_similarity(e.embedding::DOUBLE[], q.qvec) AS sc
        |      FROM embeddings e, q WHERE e.label IS DISTINCT FROM q.qlab),
        |r AS (SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, id) AS rnk
        |      FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rank, id, round(sc, 4) AS score
        |FROM r WHERE rnk <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    // smoothed idf (ln((N+1)/(df+1)) + 1) rounded ONCE to an integer
    // micro-nat per term; scores are BIGINT tf × idf_micro products, so
    // the per-doc ranking is engine-exact (the LM discipline)
    "q_tfidf_keywords" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
        |    tf.tf * CAST(round(ln((n.n + 1.0) / (df.df + 1.0)) * 1000000 + 1000000, 0) AS BIGINT) AS score_micro
        |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        |rk AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS INT) AS rnk FROM sc)
        |SELECT doc_id, rnk, term, tf, score_micro FROM rk WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    // simhash-candidates + exact-verify must equal the full posting
    // self-join answer when the block geometry is exhaustive for the
    // threshold (same oracle as q_dedup_ngram / q_dedup_minhash_verified)
    "q_dedup_simhash_verified" ->
      """WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toksrc)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
        |FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // minhash-candidates + exact-verify must equal the full posting
    // self-join answer when the band configuration is exhaustive for
    // the threshold (same oracle as q_dedup_ngram)
    "q_dedup_minhash_verified" ->
      """WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toksrc)),
        |sz AS (SELECT doc_id, count(*) AS sz FROM ng GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, inter, round(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
        |FROM inter JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
        |WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q_det_split" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT) AS bucket,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT) < 90
        |       THEN 'train' ELSE 'eval' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_filter" ->
      """WITH q AS (SELECT doc_id, lang,
        |  0.4 * least(1.0, len(string_split(text, ' ')) / 100.0)
        |      + 0.3 * (len(list_distinct(string_split(text, ' '))) / CAST(len(string_split(text, ' ')) AS DOUBLE))
        |      + 0.3 * least(1.0, (len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and','is','to','in'))) / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 5.0) AS quality
        |  FROM documents),
        |r AS (SELECT doc_id, lang, quality,
        |  percent_rank() OVER (PARTITION BY lang ORDER BY quality) AS pr FROM q)
        |SELECT doc_id, lang, quality FROM r WHERE pr >= 0.75 ORDER BY doc_id""".stripMargin,

    "q_cross_dedup" ->
      """SELECT b.doc_id, b.source FROM documents b
        |WHERE NOT EXISTS (SELECT 1 FROM documents a
        |                  WHERE a.doc_id % 3 = 0 AND a.text = b.text)
        |ORDER BY b.doc_id""".stripMargin,

    "q_passage_repeats" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |win AS (SELECT doc_id, array_to_string(t[i:i+15], ' ') AS passage
        |        FROM toks, UNNEST(range(1, len(t) - 14, 16)) AS r(i)
        |        WHERE len(t) >= 16)
        |SELECT passage, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |FROM win GROUP BY passage HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY passage""".stripMargin,

    "q_strip_boilerplate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |allwin AS (SELECT doc_id, CAST((i - 1) // 16 AS INT) AS b,
        |                  array_to_string(t[i:i+15], ' ') AS passage
        |           FROM toks, UNNEST(range(1, len(t) - 14, 16)) AS r(i)
        |           WHERE len(t) >= 16),
        |rep AS (SELECT passage FROM allwin
        |        GROUP BY passage HAVING count(DISTINCT doc_id) >= 2),
        |keptb AS (SELECT doc_id, string_agg(passage, ' ' ORDER BY b) AS body
        |          FROM allwin WHERE passage NOT IN (SELECT passage FROM rep)
        |          GROUP BY doc_id),
        |doomed AS (SELECT doc_id, count(*) AS nb
        |           FROM allwin WHERE passage IN (SELECT passage FROM rep)
        |           GROUP BY doc_id),
        |base AS (SELECT doc_id, t, len(t) AS n,
        |                CAST(len(t) // 16 AS INT) AS nfull FROM toks)
        |SELECT base.doc_id,
        |  CASE WHEN base.n < 16 THEN array_to_string(base.t, ' ')
        |       ELSE concat_ws(' ', NULLIF(keptb.body, ''),
        |              NULLIF(array_to_string(base.t[base.nfull*16+1:base.n], ' '), ''))
        |  END AS clean_text,
        |  COALESCE(doomed.nb, 0) AS n_blocks_removed
        |FROM base LEFT JOIN keptb USING (doc_id) LEFT JOIN doomed USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // stride-1 windows at every alignment: the planted CASE mirrors
    // plantShifted exactly (same passage, same doc_id-keyed offsets)
    "q_passage_repeats_shifted" ->
      """WITH planted AS (SELECT doc_id,
        |  CASE WHEN doc_id % 101 = 0
        |       THEN repeat('pad ', CAST(doc_id % 7 AS INT))
        |            || 'bq0 bq1 bq2 bq3 bq4 bq5 bq6 bq7 bq8 bq9 bq10 bq11 bq12 bq13 bq14 bq15'
        |            || ' ' || text
        |       ELSE text END AS text FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM planted),
        |win AS (SELECT doc_id, array_to_string(t[i:i+15], ' ') AS passage
        |        FROM toks, UNNEST(range(1, len(t) - 14, 1)) AS r(i)
        |        WHERE len(t) >= 16)
        |SELECT passage, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |FROM win GROUP BY passage HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY passage""".stripMargin,

    "q_strip_boilerplate_shifted" ->
      """WITH planted AS (SELECT doc_id,
        |  CASE WHEN doc_id % 101 = 0
        |       THEN repeat('pad ', CAST(doc_id % 7 AS INT))
        |            || 'bq0 bq1 bq2 bq3 bq4 bq5 bq6 bq7 bq8 bq9 bq10 bq11 bq12 bq13 bq14 bq15'
        |            || ' ' || text
        |       ELSE text END AS text FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM planted),
        |win AS (SELECT doc_id, i, array_to_string(t[i:i+15], ' ') AS passage
        |        FROM toks, UNNEST(range(1, len(t) - 14, 1)) AS r(i)
        |        WHERE len(t) >= 16),
        |rep AS (SELECT passage FROM win
        |        GROUP BY passage HAVING count(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT w.doc_id, j
        |        FROM win w, UNNEST(range(w.i, w.i + 16)) AS rr(j)
        |        WHERE w.passage IN (SELECT passage FROM rep)),
        |tok AS (SELECT doc_id, i AS idx, t[i] AS tok
        |        FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)),
        |kept AS (SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.idx) AS body
        |         FROM tok k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.j = k.idx
        |         WHERE c.j IS NULL GROUP BY k.doc_id),
        |nrem AS (SELECT doc_id, count(*) AS n FROM cov GROUP BY doc_id)
        |SELECT b.doc_id, COALESCE(kept.body, '') AS clean_text,
        |       COALESCE(nrem.n, 0) AS n_tokens_removed
        |FROM toks b LEFT JOIN kept USING (doc_id) LEFT JOIN nrem USING (doc_id)
        |ORDER BY b.doc_id""".stripMargin,

    "q_dedup_intradoc" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (SELECT doc_id, CAST((i - 1) // 2 AS INT) AS b,
        |             array_to_string(t[i:i+1], ' ') AS p
        |      FROM toks, UNNEST(range(1, len(t), 2)) AS r(i)
        |      WHERE len(t) >= 2),
        |occ AS (SELECT doc_id, b, p,
        |          row_number() OVER (PARTITION BY doc_id, p ORDER BY b) AS rn
        |        FROM w),
        |keptb AS (SELECT doc_id, string_agg(p, ' ' ORDER BY b) AS body
        |          FROM occ WHERE rn = 1 GROUP BY doc_id),
        |doomed AS (SELECT doc_id, count(*) AS nb FROM occ WHERE rn > 1
        |           GROUP BY doc_id),
        |base AS (SELECT doc_id, t, len(t) AS n,
        |                CAST(len(t) // 2 AS INT) AS nfull FROM toks)
        |SELECT base.doc_id,
        |  CASE WHEN base.n < 2 THEN array_to_string(base.t, ' ')
        |       ELSE concat_ws(' ', NULLIF(keptb.body, ''),
        |              NULLIF(array_to_string(base.t[base.nfull*2+1:base.n], ' '), ''))
        |  END AS clean_text,
        |  COALESCE(doomed.nb, 0) AS n_blocks_removed
        |FROM base LEFT JOIN keptb USING (doc_id) LEFT JOIN doomed USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_vocab_build" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token),
        |rk AS (SELECT token, n,
        |         row_number() OVER (ORDER BY n DESC, token) - 1 AS id FROM cnt)
        |SELECT token, id, n FROM rk WHERE id < 24 ORDER BY id""".stripMargin,

    "q_tokenize_ids" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token),
        |rk AS (SELECT token,
        |         row_number() OVER (ORDER BY n DESC, token) - 1 AS id FROM cnt),
        |v AS (SELECT token, id FROM rk WHERE id < 24),
        |pos AS (SELECT doc_id, i - 1 AS pos, t[i] AS token
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |             UNNEST(range(1, len(t) + 1)) AS r(i)
        |        WHERE t[i] <> '')
        |SELECT pos.doc_id, pos.pos, COALESCE(v.id, -1) AS token_id
        |FROM pos LEFT JOIN v USING (token)
        |ORDER BY doc_id, pos""".stripMargin,

    // q_bpe_apply: Bpe.encodeWord replayed move-for-move — the working
    // table carries each word's CURRENT symbol list; every iteration
    // finds the applicable adjacent pair with the smallest (rank,
    // position) (encodeWord's scan keeps the FIRST position of the
    // strictly-minimal rank — exactly argmin by (rank, pos)) and
    // merges that ONE occurrence; a word with no applicable pair is
    // terminal. The merges are the pinned trainLocal(BpeApplyDict)
    // output, spelled as VALUES (TokenizerSpec pins the equality).
    // Known split-unit caveat: the init CTE chars by CODE POINT
    // (w[i]) while encodeWord chars by UTF-16 code unit — identical on
    // the driver's ASCII corpora; a future vintage with astral-plane
    // characters would fail this oracle LOUDLY (row mismatch), never
    // silently (SURVEY §4).
    "q_bpe_apply" ->
      """WITH RECURSIVE
        |m(rank, l, r) AS (SELECT * FROM (VALUES
        |  (0,'t','a'),(1,'a','n'),(2,'an','</w>'),(3,'c','an</w>'),(4,'s','can</w>'),
        |  (5,'a','r'),(6,'ar','k'),(7,'ark','</w>'),(8,'e','</w>'),(9,'p','ark</w>'),
        |  (10,'s','park</w>'),(11,'o','r')) t),
        |words AS (SELECT DISTINCT token AS w FROM
        |  (SELECT unnest(string_split(text, ' ')) AS token FROM documents) WHERE token <> ''),
        |init AS (SELECT w, list_append([w[i] for i in range(1, len(w)+1)], '</w>') AS syms FROM words),
        |steps(w, syms) AS (
        |  SELECT w, syms FROM init
        |  UNION ALL
        |  SELECT w, list_slice(syms, 1, p-1) || [syms[p] || syms[p+1]] || list_slice(syms, p+2, len(syms))
        |  FROM (
        |    SELECT s.w, s.syms, c.p,
        |           row_number() OVER (PARTITION BY s.w ORDER BY c.rank, c.p) AS rn
        |    FROM steps s,
        |         LATERAL (SELECT i AS p, m.rank FROM UNNEST(range(1, len(s.syms))) t(i)
        |                  JOIN m ON m.l = s.syms[i] AND m.r = s.syms[i+1]) c
        |  ) WHERE rn = 1
        |),
        |final AS (
        |  SELECT w, array_to_string(syms, '|') AS pieces FROM steps s
        |  WHERE NOT EXISTS (SELECT 1 FROM UNNEST(range(1, len(s.syms))) t(i)
        |                    JOIN m ON m.l = s.syms[i] AND m.r = s.syms[i+1])
        |),
        |pos AS (SELECT doc_id, i - 1 AS pos, t[i] AS w
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |             UNNEST(range(1, len(t) + 1)) AS r(i)
        |        WHERE t[i] <> '')
        |SELECT pos.doc_id, pos.pos, final.pieces
        |FROM pos JOIN final USING (w)
        |ORDER BY doc_id, pos""".stripMargin,

    // q_unigram_apply: Unigram.viterbi replayed as an integer DP — the
    // working table carries EVERY prefix state (w, j ≤ it) forward per
    // iteration (a recursive CTE sees only the previous iteration's
    // rows, and position it+1 needs states back to it+1−maxPieceLen);
    // the new prefix state is the argmax over candidate last pieces by
    // (score DESC, piece-count ASC, piece ASC) — viterbi()'s tie rules
    // verbatim; single chars outside the table score the -69000000 UNK
    // floor, longer misses are not candidates. The piece table is the
    // pinned trainLocal(BpeApplyDict, 20) artifact as VALUES
    // (UnigramSpec pins the equality); 6 = its max piece length
    // ("stream" — update together with the pin if the dict changes).
    "q_unigram_apply" ->
      """WITH RECURSIVE
        |pt(piece, lp) AS (SELECT * FROM (VALUES
        |  ('a',-1813266),('l',-2058388),('t',-2309703),('s',-2550865),
        |  ('scan',-2646175),('e',-2751535),('h',-2751535),('spark',-2751535),
        |  ('sort',-2869318),('stream',-3002850),('b',-3157000),('d',-3339322),
        |  ('m',-3562466),('o',-3562466),('w',-3562466),('c',-5641907),
        |  ('k',-5641907),('n',-5641907),('p',-5641907),('r',-5641907)) t),
        |words AS (SELECT DISTINCT token AS w FROM
        |  (SELECT unnest(string_split(text, ' ')) AS token FROM documents) WHERE token <> ''),
        |steps(w, j, score, np, path, it) AS (
        |  SELECT w, 0, CAST(0 AS BIGINT), 0, '', 0 FROM words
        |  UNION ALL
        |  SELECT w, j, score, np, path, it FROM (
        |    SELECT w, j, score, np, path, it + 1 AS it, 0 AS is_new, CAST(0 AS BIGINT) AS rn
        |    FROM steps WHERE it < len(w)
        |    UNION ALL
        |    SELECT c.w, c.it + 1 AS j, c.score, c.np, c.path, c.it + 1 AS it, 1 AS is_new,
        |           row_number() OVER (PARTITION BY c.w ORDER BY c.score DESC, c.np, c.piece) AS rn
        |    FROM (
        |      SELECT s.w, s.it, s.score + lps.lp AS score, s.np + 1 AS np,
        |             CASE WHEN s.path = '' THEN lps.piece ELSE s.path || '|' || lps.piece END AS path,
        |             lps.piece
        |      FROM steps s,
        |           LATERAL (SELECT s.w[s.j + 1 : s.it + 1] AS piece,
        |                           COALESCE((SELECT pt.lp FROM pt WHERE pt.piece = s.w[s.j + 1 : s.it + 1]),
        |                                    CASE WHEN s.it + 1 - s.j = 1 THEN CAST(-69000000 AS BIGINT) END) AS lp) lps
        |      WHERE s.it < len(s.w) AND s.j >= s.it + 1 - 6 AND s.j <= s.it AND lps.lp IS NOT NULL
        |    ) c
        |  ) WHERE is_new = 0 OR rn = 1
        |),
        |final AS (SELECT w, path AS pieces FROM steps WHERE j = len(w) AND it = len(w)),
        |pos AS (SELECT doc_id, i - 1 AS pos, t[i] AS w
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |             UNNEST(range(1, len(t) + 1)) AS r(i)
        |        WHERE t[i] <> '')
        |SELECT pos.doc_id, pos.pos, final.pieces
        |FROM pos JOIN final USING (w)
        |ORDER BY doc_id, pos""".stripMargin,

    // q_bpe_apply_ids: the q_bpe_apply merge replay extended with the
    // loader-id map computed IN SQL from the same inlined merges —
    // Bpe.pieceIds verbatim: id 0 = '</w>', ids 1..A = the sorted
    // distinct unit characters of the merge symbols (trailing '</w>'
    // stripped, the bare '</w>' symbol excluded), then one id per
    // merge PRODUCT in rank order; first-wins on collision = min(id)
    // per piece (assignment order is ascending id); OOV pieces → -1
    // (Tokenizer.UnkId).
    "q_bpe_apply_ids" ->
      """WITH RECURSIVE
        |m(rank, l, r) AS (SELECT * FROM (VALUES
        |  (0,'t','a'),(1,'a','n'),(2,'an','</w>'),(3,'c','an</w>'),(4,'s','can</w>'),
        |  (5,'a','r'),(6,'ar','k'),(7,'ark','</w>'),(8,'e','</w>'),(9,'p','ark</w>'),
        |  (10,'s','park</w>'),(11,'o','r')) t),
        |words AS (SELECT DISTINCT token AS w FROM
        |  (SELECT unnest(string_split(text, ' ')) AS token FROM documents) WHERE token <> ''),
        |init AS (SELECT w, list_append([w[i] for i in range(1, len(w)+1)], '</w>') AS syms FROM words),
        |steps(w, syms) AS (
        |  SELECT w, syms FROM init
        |  UNION ALL
        |  SELECT w, list_slice(syms, 1, p-1) || [syms[p] || syms[p+1]] || list_slice(syms, p+2, len(syms))
        |  FROM (
        |    SELECT s.w, s.syms, c.p,
        |           row_number() OVER (PARTITION BY s.w ORDER BY c.rank, c.p) AS rn
        |    FROM steps s,
        |         LATERAL (SELECT i AS p, m.rank FROM UNNEST(range(1, len(s.syms))) t(i)
        |                  JOIN m ON m.l = s.syms[i] AND m.r = s.syms[i+1]) c
        |  ) WHERE rn = 1
        |),
        |finals AS (
        |  SELECT w, syms FROM steps s
        |  WHERE NOT EXISTS (SELECT 1 FROM UNNEST(range(1, len(s.syms))) t(i)
        |                    JOIN m ON m.l = s.syms[i] AND m.r = s.syms[i+1])
        |),
        |msyms AS (SELECT l AS sym FROM m UNION ALL SELECT r AS sym FROM m),
        |alpha AS (SELECT DISTINCT ch FROM (
        |  SELECT unnest([s2[i] for i in range(1, len(s2)+1)]) AS ch FROM (
        |    SELECT CASE WHEN sym LIKE '%</w>' THEN sym[1:len(sym)-4] ELSE sym END AS s2
        |    FROM msyms WHERE sym <> '</w>'))),
        |ids0 AS (
        |  SELECT '</w>' AS piece, CAST(0 AS BIGINT) AS pid
        |  UNION ALL
        |  SELECT ch, row_number() OVER (ORDER BY ch) FROM alpha
        |  UNION ALL
        |  SELECT l || r, (SELECT count(*) FROM alpha) + 1 + rank FROM m),
        |ids AS (SELECT piece, min(pid) AS pid FROM ids0 GROUP BY piece),
        |fp AS (SELECT w, i AS ord, syms[i] AS piece
        |       FROM finals, UNNEST(range(1, len(syms)+1)) r(i)),
        |fid AS (SELECT w, ord, COALESCE(ids.pid, -1) AS pid
        |        FROM fp LEFT JOIN ids USING (piece)),
        |finalids AS (SELECT w, string_agg(CAST(pid AS VARCHAR), '|' ORDER BY ord) AS piece_ids
        |             FROM fid GROUP BY w),
        |pos AS (SELECT doc_id, i - 1 AS pos, t[i] AS w
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |             UNNEST(range(1, len(t) + 1)) AS r(i)
        |        WHERE t[i] <> '')
        |SELECT pos.doc_id, pos.pos, finalids.piece_ids
        |FROM pos JOIN finalids USING (w)
        |ORDER BY doc_id, pos""".stripMargin,

    // q_unigram_apply_ids: the q_unigram_apply Viterbi CTE extended
    // with the stored piece_id re-derived in SQL — trainLocal assigns
    // pieceId = 0-based rank in (logp DESC, piece ASC) order
    // (Unigram.scala trainLocal's sortBy(-lp, s).zipWithIndex), so
    // row_number() - 1 over the same inlined VALUES reproduces it;
    // UNK single chars (the -69000000 floor path) → -1.
    "q_unigram_apply_ids" ->
      """WITH RECURSIVE
        |pt(piece, lp) AS (SELECT * FROM (VALUES
        |  ('a',-1813266),('l',-2058388),('t',-2309703),('s',-2550865),
        |  ('scan',-2646175),('e',-2751535),('h',-2751535),('spark',-2751535),
        |  ('sort',-2869318),('stream',-3002850),('b',-3157000),('d',-3339322),
        |  ('m',-3562466),('o',-3562466),('w',-3562466),('c',-5641907),
        |  ('k',-5641907),('n',-5641907),('p',-5641907),('r',-5641907)) t),
        |ptid AS (SELECT piece, row_number() OVER (ORDER BY lp DESC, piece) - 1 AS pid FROM pt),
        |words AS (SELECT DISTINCT token AS w FROM
        |  (SELECT unnest(string_split(text, ' ')) AS token FROM documents) WHERE token <> ''),
        |steps(w, j, score, np, path, it) AS (
        |  SELECT w, 0, CAST(0 AS BIGINT), 0, '', 0 FROM words
        |  UNION ALL
        |  SELECT w, j, score, np, path, it FROM (
        |    SELECT w, j, score, np, path, it + 1 AS it, 0 AS is_new, CAST(0 AS BIGINT) AS rn
        |    FROM steps WHERE it < len(w)
        |    UNION ALL
        |    SELECT c.w, c.it + 1 AS j, c.score, c.np, c.path, c.it + 1 AS it, 1 AS is_new,
        |           row_number() OVER (PARTITION BY c.w ORDER BY c.score DESC, c.np, c.piece) AS rn
        |    FROM (
        |      SELECT s.w, s.it, s.score + lps.lp AS score, s.np + 1 AS np,
        |             CASE WHEN s.path = '' THEN lps.piece ELSE s.path || '|' || lps.piece END AS path,
        |             lps.piece
        |      FROM steps s,
        |           LATERAL (SELECT s.w[s.j + 1 : s.it + 1] AS piece,
        |                           COALESCE((SELECT pt.lp FROM pt WHERE pt.piece = s.w[s.j + 1 : s.it + 1]),
        |                                    CASE WHEN s.it + 1 - s.j = 1 THEN CAST(-69000000 AS BIGINT) END) AS lp) lps
        |      WHERE s.it < len(s.w) AND s.j >= s.it + 1 - 6 AND s.j <= s.it AND lps.lp IS NOT NULL
        |    ) c
        |  ) WHERE is_new = 0 OR rn = 1
        |),
        |final AS (SELECT w, path AS pieces FROM steps WHERE j = len(w) AND it = len(w)),
        |fp AS (SELECT w, i AS ord, sp[i] AS piece
        |       FROM (SELECT w, string_split(pieces, '|') AS sp FROM final),
        |            UNNEST(range(1, len(sp)+1)) r(i)),
        |fid AS (SELECT w, ord, COALESCE(ptid.pid, -1) AS pid
        |        FROM fp LEFT JOIN ptid USING (piece)),
        |finalids AS (SELECT w, string_agg(CAST(pid AS VARCHAR), '|' ORDER BY ord) AS piece_ids
        |             FROM fid GROUP BY w),
        |pos AS (SELECT doc_id, i - 1 AS pos, t[i] AS w
        |        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |             UNNEST(range(1, len(t) + 1)) AS r(i)
        |        WHERE t[i] <> '')
        |SELECT pos.doc_id, pos.pos, finalids.piece_ids
        |FROM pos JOIN finalids USING (w)
        |ORDER BY doc_id, pos""".stripMargin,

    "q_decontaminate" ->
      """WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toksrc)),
        |sp AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT) AS bucket
        |  FROM documents),
        |traing AS (SELECT ng.doc_id, g FROM ng JOIN sp USING (doc_id) WHERE bucket < 90),
        |evalg AS (SELECT DISTINCT g FROM ng JOIN sp USING (doc_id) WHERE bucket >= 90),
        |sz AS (SELECT doc_id, count(*) AS n_grams FROM traing GROUP BY doc_id),
        |sh AS (SELECT t.doc_id, count(*) AS n_shared FROM traing t
        |       JOIN evalg e ON t.g = e.g GROUP BY t.doc_id)
        |SELECT sz.doc_id, sz.n_grams, COALESCE(sh.n_shared, 0) AS n_shared,
        |  COALESCE(sh.n_shared, 0) / CAST(sz.n_grams AS DOUBLE) AS share
        |FROM sz LEFT JOIN sh USING (doc_id)
        |WHERE COALESCE(sh.n_shared, 0) / CAST(sz.n_grams AS DOUBLE) < 0.8
        |ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      """WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |             WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g FROM toksrc)),
        |sp AS (SELECT doc_id,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INT) AS bucket
        |  FROM documents),
        |evalg AS (SELECT ng.doc_id, g FROM ng JOIN sp USING (doc_id) WHERE bucket >= 90),
        |traing AS (SELECT DISTINCT g FROM ng JOIN sp USING (doc_id) WHERE bucket < 90),
        |sz AS (SELECT doc_id, count(*) AS n_grams FROM evalg GROUP BY doc_id)
        |SELECT e.doc_id AS doc_id, sz.n_grams, count(*) AS n_shared,
        |  count(*) / CAST(sz.n_grams AS DOUBLE) AS share
        |FROM evalg e JOIN traing t ON e.g = t.g JOIN sz ON e.doc_id = sz.doc_id
        |GROUP BY e.doc_id, sz.n_grams
        |ORDER BY e.doc_id""".stripMargin
  )
}
