package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Plan-audit main: dumps the physical plan of each headline query to
  * PLANS.md so the audit trail regenerates from the SHIPPED code with one
  * command (round 2's hand-captured file went stale within 30 minutes of a
  * fix). AQE is disabled for readability — the recorded shapes are the
  * static plans; AQE only improves on them at runtime (skew splits,
  * broadcast demotion/promotion).
  *
  * Usage: `sbt "runMain graft.Plans [sfDir] [outFile]"`.
  */
object Plans {
  /** Headline set: the flagship pipeline, each join/dedup/ANN family's
    * most expensive member, and every query a past verdict audited.
    */
  val headline: Seq[String] = Seq(
    "j1_join_filter", "q1_agg", "q_star_join",
    "w1_idempotent", "w1_idempotent_bloom",
    "dedup_minhash", "dedup_ngram", "sim_topk", "sim_lsh_topk", "sim_ivf_topk",
    "sim_pq_topk", "sim_ivfpq_topk",
    "j4_corr_update", "q_asof_join", "pipeline_evidence", "w_tumbling",
    "q_range_join", "dedup_winnow", "q_pivot", "q_salted_join",
    "q_csv_src", "q_json_src", "mm_binary",
    "text_gopher", "text_top_ngrams", "q_stratified_sample",
    "dedup_decontaminate", "text_c4", "text_boilerplate",
    "q_pack", "text_bm25", "q_zorder",
    "text_cdc", "dedup_cdc", "dedup_decontaminate_report",
    "text_inverted_index", "text_normalize", "q_token_drift",
    "q_pack_assemble", "q_hll_union", "dedup_incremental",
    "q_global_rank", "q_source_cap", "dedup_semantic", "dedup_semantic_incr",
    "q_heavy_hitters", "text_rarity", "q_window_range", "q_profile",
    "sim_lsh_mp_topk", "text_sim_pairs", "q_join_size_est", "q_funnel",
    "q_retention", "q_table_diff", "q_resample", "q_embed_centroids",
    "sim_ivf_det_topk", "sim_pq_det_topk", "sim_ivfpq_det_topk",
    "dedup_containment", "pipeline_curation", "dedup_semantic_mp",
    "q_triples", "text_chunk", "q_mixture_sample", "text_bpe_train",
    "text_bpe_apply", "q_rrf_fusion", "q_mmr_select", "q_random_walk",
    "q_label_prop", "q_tv_drift", "pipeline_er", "q_ppr", "q_hits",
    "q_attribution", "q_quality_report", "q_agg_merge", "text_keywords",
    "pipeline_rag", "q_split_leakage_safe",
    "q_interval_merge", "q_changepoint", "q_knn_classify",
    "text_search_topk", "pipeline_audit", "q_trend", "q_autocorr",
    "q_grid_quantiles", "q_cdc_apply", "q_seq_patterns",
    "q_power_iteration", "mm_audio_energy", "q_shortest_path",
    "text_maxmatch", "q_group_quantiles", "text_url_canon",
    "q_twap", "q_seasonal_residual",
    "q_target_encoding", "q_ab_test", "q_modularity", "q_feature_hash",
    "q_length_buckets", "q_pref_pairs", "q_roc_auc", "q_calibration",
    "q_winsorize", "q_hilbert", "dedup_substring",
    "q_quantile_norm", "q_rand_proj", "q_confusion",
    "q_benford", "q_readability", "q_centroid_shift",
    "q_vocab_coverage", "mm_image_stats", "q_sql_surface",
    "q_label_outliers", "q_degree_dist", "mm_audio_silence",
    "q_rand_index", "dedup_sweep", "q_group_auc")

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    val spark = GraftSession.create(appName = "graft-plans", master = "local[8]",
      shufflePartitions = Some(8))
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    val sb = new StringBuilder
    sb.append("# PLANS — captured physical plans (sf0.01, AQE off for readability)\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.Plans\"` — do not hand-edit.\n")
    sb.append("What to look for: `PushedFilters` and pruned `ReadSchema` on every\n")
    sb.append("scan, `BroadcastHashJoin` for dimension joins, partial/final\n")
    sb.append("`HashAggregate` pairs, and no unexpected `Exchange`. The only\n")
    sb.append("`BroadcastNestedLoopJoin`s anywhere have a PARAMETER-SIZED broadcast\n")
    sb.append("side by construction — `sim_topk`'s bounded query set (the exact\n")
    sb.append("baseline, deliberately exhaustive), the corpus×centroid /\n")
    sb.append("sample×codebook assignment crosses of the IVF/PQ family (nlist or\n")
    sb.append("m·ksub rows — the inherent O(N·nlist) quantizer assignment), and\n")
    sb.append("`text_bm25`'s ONE-row corpus-stats cross. Never corpus×corpus.\n\n")

    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      val plan =
        try fn(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Exception => s"PLANNING FAILED: ${e.getMessage}" }
      sb.append(s"## $name\n\n```\n").append(plan.trim).append("\n```\n\n")
    }
    Files.write(Paths.get(outFile), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plans] wrote ${headline.size} plans to $outFile")
    spark.stop()
  }
}
