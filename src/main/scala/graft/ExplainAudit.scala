package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the scale-critical queries so the
  * shuffle/broadcast/pushdown shape can be audited per round. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_knn_cosine", "q_knn_filter", "q_join", "q_dedup_ngram",
        "q_dedup_minhash", "q_fulltext", "q_dedup_minhash_verified",
        "q_dedup_simhash_verified", "q_lsh_ann",
        "q_det_split", "q_quality_filter", "q_contamination",
        "q_domain_mix", "q_pack", "q_repetition", "q_curate_pipeline",
        "q_cluster_reps", "q_ivfsq_search", "q_rare_bigrams",
        "q_quality_classifier", "q_vocab_drift",
        "q_hnsw_search", "q_strip_boilerplate", "q_vocab_build",
        "q_tokenize_ids", "q_bpe_encode", "q_bpe_ids", "q_hybrid_ann",
        "q_chunk_search", "q_semdedup_prod",
        "q_hnsw_string_exhaustive", "q_passage_repeats_shifted",
        "q_strip_boilerplate_shifted", "q_lm_perplexity", "q_lm_perplexity3",
        "q_ppl_buckets", "q_dsir_select", "q_concat_chunks",
        "q_soft_dedup", "q_tfidf_keywords", "q_bq_search", "q_bq_rerank",
        "q_lm_kneser_ney", "q_sparse_search", "q_unigram_encode",
        "q_winnow", "q_winnow_matches", "q_length_quantiles", "q_lang_lines",
        "q_hnsw_radius_exhaustive", "q_normalize_text", "q_url_dedup",
        "q_token_budget", "q_hard_negatives", "q_span_repeats",
        "q_span_dedup", "q_lexical_spectrum",
        "q_hard_negatives_hnsw", "q_hard_negatives_hnsw_exhaustive",
        "q_search_by_text_w2v",
        "q_sq_radius", "q_sq_radius_filtered", "q_pq_radius",
        "q_ivfpq_radius", "q_sq_topk_exact", "q_pq_topk_exact",
        "q_grouped_search", "q_grouped_hnsw", "q_mmr",
        "q_sq_radius_cos", "q_multimodal", "q_media_resize",
        "q_frame_sample", "q_bpe_apply", "q_unigram_apply", "q_audio_decode",
        "q_gif_frames", "q_ivf_assign", "q_quality_score",
        "q_bpe_apply_ids", "q_unigram_apply_ids")
    val spark = GraftSession.get()
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
