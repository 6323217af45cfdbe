#!/usr/bin/env python
"""Benchmark harness: headline queries + the KG pipeline at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"q_name": sec, ...}, "sf": "<dir>", ...}

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
  RBS_BENCH_CONVS      synthetic-transcript conversations (default 3000)
  RBS_BENCH_TRIALS     trials per query, min reported (default 3)

Every query runs RBS_BENCH_TRIALS times inside ONE process and the MIN is
the headline number ("queries"); all trials are published under "trials".
This box is epoch-noisy (identical multi-minute runs vary +62%,
BENCH/BASELINE.md) and the noise is additive, so min-over-trials is the
steady-state estimator — a single-shot wall reads the VM lottery, not the
engine.

The KG-pipeline input is the deterministic seeded transcript corpus
(fixtures.make_turns) materialized once to a /tmp parquet cache keyed by its
parameters, so repeated runs measure the ENGINE, not fixture generation.
Each query is forced end-to-end with a noop sink (full materialization, no
driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("RBS_BENCH_CONVS", "3000"))
TRIALS = max(1, int(os.environ.get("RBS_BENCH_TRIALS", "3")))
SKEW_TURNS = 3000

HEADLINE = [
    "agg_hash",
    "join_sortmerge",
    "join_broadcast",
    "win_rank",
    "topk",
    "triple_assembly",
    "mention_assembly",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "text_quality",
    "doc_fingerprint",
    "connected_components",
    # r4 additions — new flagship ops (totals are NOT comparable to
    # BENCH_r0[1-3] without subtracting these five keys; per-query walls
    # and epoch_control_sec remain the cross-round basis)
    "kg_two_hop",
    "kg_conv_summary",
    "dedup_cluster",
    "ann_ivf_topk",
    "corpus_filter",
    # r5 additions — graph analytics + data-pipeline ops (subtract this
    # group too when comparing totals to earlier rounds; the r4-comparable
    # subtotal = total minus the r4 AND r5 groups)
    "kg_cooccur_lift",
    "kg_triangles",
    "kg_clustering",
    "kg_reach",
    "kg_temporal_span",
    "kg_communities",
    "quality_repetition",
    "ann_range_search",
    "emb_kmeans",
    "kg_kcore",
    "contamination_ngram",
    "sample_stratified",
    "mix_weights",
    "quality_oov_rate",
    "chunk_tokens",
    "kg_pred_conflicts",
    # r5b additions (second r5 session) — event analytics + KG export +
    # walk corpus (subtract this group too for earlier-round-comparable
    # subtotals)
    "funnel_conversion",
    "retention_cohort",
    "event_transitions",
    "kg_export_nquads",
    "kg_adjacency",
    "kg_random_walks",
    # r5c additions (fourth r5 session) — lexical retrieval + link
    # prediction (subtract this group too for earlier-round-comparable
    # subtotals)
    "tfidf_topk",
    "bm25_topk",
    "kg_neighbor_jaccard",
    "dedup_passage",
    # r5d additions (fifth r5 session) — ingest scrub + sequence packing
    # (subtract this group too for earlier-round-comparable subtotals)
    "pii_scrub",
    "pack_sequences",
    # r5e additions (sixth r5 session) — split/shard/novelty/percentile +
    # prototypicality (subtract this group too for earlier-round-comparable
    # subtotals)
    "split_assign",
    "shuffle_shard",
    "bigram_novelty",
    "agg_percentile_approx",
    "emb_prototypicality",
    "bpe_train",
    "kg_sample_neighbors",
    "sketch_hll_merge",
    "macro_data_prep",
    "events_anomaly",
    # r5f additions (seventh r5 session) — attribution + entity cards +
    # exact-stats corr + correlated subquery + the IVF-PQ composition
    # (subtract this group too for earlier-round-comparable subtotals)
    "events_attribution",
    "kg_entity_cards",
    "agg_stats_corr",
    "filter_subquery_correlated",
    "ann_ivfpq_topk",
    # r5g additions (eighth r5 session) — lateral join + CMS + degree
    # distribution + HITS + BPE encode + fill-forward + rolling DAU
    # (subtract this group too for earlier-round-comparable subtotals)
    "join_lateral",
    "sketch_cms",
    "kg_degree_dist",
    "kg_hits",
    "bpe_encode",
    "win_fill_forward",
    "events_rolling_dau",
    "scd2_intervals",
    "fn_url",
    "calendar_densify",
    "macro_kg_report",
    "agg_bitmap_distinct",
    "join_null_safe",
    "quality_line_filter",
    "agg_argminmax",
    "emb_binarize",
    "fn_struct",
    "fn_try",
    # r5h additions (ninth r5 session) — conditional/codec expression
    # families, exact histogram, streaks, RFM, URL dedup (subtract this
    # group too for earlier-round-comparable subtotals)
    "fn_conditional",
    "fn_encode",
    "agg_histogram",
    "events_streaks",
    "events_rfm",
    "dedup_url",
    "sketch_bloom",
    "corpus_length_dist",
    "mix_sample",
    "events_journey_paths",
    "kg_diameter",
    "join_temporal",
    "events_ab_test",
    "kg_growth",
    "fn_editdistance",
    "agg_moments",
    "events_forecast",
    "lm_bigram",
    "kg_reciprocity",
    "fn_mask",
    "events_trend",
    "events_seasonality",
    "events_gaps",
    "win_running_distinct",
    "kg_assortativity",
    "fn_variant",
    "agg_listagg",
    "basket_pairs",
    "source_orc",
    "events_daily_growth",
    "fn_collation",
    "macro_market_share",
    "merge_upsert",
    "cdc_apply",
    "snapshot_diff",
    "zorder_key",
    "fn_xml",
    "kg_provenance",
    "kg_canonical_facts",
    "emb_pca",
    # r5i additions (ninth-session tail + tenth r5 session) — the
    # completed TPC-H macro family, data-layout maintenance ops, events
    # islands/pareto/concurrency/benford, RRF fusion, DPP join, weighted
    # stats (subtract this group too for earlier-round-comparable
    # subtotals)
    "events_enrich",
    "source_binary",
    "macro_local_supplier_volume",
    "macro_returned_items",
    "macro_promo_share",
    "events_funnel_window",
    "text_normalize",
    "macro_pricing_summary",
    "macro_order_priority",
    "macro_volume_shipping",
    "macro_cust_distribution",
    "macro_small_qty_revenue",
    "macro_top_spenders",
    "macro_disjunctive_revenue",
    "macro_idle_customers",
    "macro_forecast_revenue",
    "macro_top_supplier",
    "scan_schema_evolution",
    "scan_metadata",
    "compact_small_files",
    "table_profile",
    "events_islands",
    "events_pareto",
    "events_concurrency",
    "events_benford",
    "retrieval_rrf",
    "agg_weighted_stats",
    "join_partition_pruned",
    "join_runtime_filtered",
    "sql_parameterized",
    "observe_metrics",
    "source_python_datasource",
    "recursive_cte",
    "sql_scalar_udf",
    "sql_table_udf",
    "sql_session_variables",
    "sql_execute_immediate",
    "events_lifecycle",
    "udf_map_arrow",
    "udf_grouped_arrow",
    "udtf_polymorphic",
    # r5j additions (eleventh r5 session) — the final expressible TPC-H
    # pair (Q12/Q21) + DAU/MAU stickiness (subtract this group too for
    # earlier-round-comparable subtotals)
    "macro_shipmode_priority",
    "macro_waiting_suppliers",
    "events_stickiness",
    "kg_betweenness",
    # r5k additions (twelfth r5 session) — CUSUM break, lag-1 ACF, SQL
    # pipe syntax (subtract this group too for earlier-round-comparable
    # subtotals)
    "events_changepoint",
    "events_autocorr",
    "sql_pipe_syntax",
    "kg_closeness",
    "kg_bridges",
    "kg_articulation",
    "emb_quantize_int8",
    "index_inverted",
    "events_srm",
    "kg_components",
    "lm_freq_of_freqs",
    "events_cuped",
    "chunk_overlap",
    "kg_mst",
    "win_frame_range_time",
    "source_csv_corrupt",
    "scan_agg_pushdown",
    "udf_scalar_iter",
    "dedup_containment",
    "events_outlier_mad",
    "kg_conv_similarity",
    "dedup_lines",
    "events_ewma",
    "macro_graph_health",
    "macro_experiment_report",
    # r5l additions (thirteenth r5 session) — eccentricity/SCC kernels,
    # DiD/power/KS/MWU/concentration stats, KN smoothing, MRR/MMR
    # retrieval, SymSpell fuzzy join (subtract this group too for
    # earlier-round-comparable subtotals)
    "kg_eccentricity",
    "kg_scc",
    "events_did",
    "events_power",
    "events_concentration",
    "events_ks_test",
    "events_mann_whitney",
    "retrieval_mrr",
    "retrieval_mmr",
    "lm_kneser_ney",
    "join_fuzzy_name",
    # r5m additions (thirteenth-session continuation) — KM survival,
    # Spearman/chi-square/Theil-Sen exact stats, NDCG + P/R@k retrieval
    # eval, held-out coverage, the hop plot, and the one-pass retrieval
    # report (subtract this group too for earlier-round-comparable
    # subtotals)
    "events_survival",
    "events_spearman",
    "events_chi2",
    "events_theil_sen",
    "retrieval_ndcg",
    "retrieval_pr_at_k",
    "lm_coverage",
    "kg_path_length_dist",
    "macro_retrieval_report",
    "events_winsorized_mean",
    "kg_k_truss",
    "emb_knn_graph",
    "emb_cluster_knn",
    "scan_bucket_pruned",
    "macro_series_profile",
    "sql_group_by_all",
    "fn_luhn",
    "agg_grouping_id",
    "kg_shortest_path",
    # r5n additions (fourteenth session) — Kendall tau-b, MAP@10
    # (subtract this group too for earlier-round-comparable subtotals)
    "events_kendall",
    "retrieval_map",
    # r5o additions (fifteenth session) — Holt smoothing, Cramér's V,
    # runs test (subtract this group too for earlier-round-comparable
    # subtotals)
    "events_holt",
    "events_cramers_v",
    "events_runs_test",
    "retrieval_err",
    "eval_cohen_kappa",
    "text_readability",
    "kg_motif_census",
    "kg_resource_allocation",
    "fn_soundex",
    "agg_boolean",
    "scan_row_index",
    "mix_temperature",
    "macro_dedup_report",
    "emb_hard_negatives",
    "events_jackknife",
    "events_deciles",
    "kg_ppr",
    "retrieval_recall_at_k",
    "lm_zipf_profile",
    "macro_text_report",
    "events_anova",
    "sql_order_by_all",
    "events_tukey_fences",
    "lm_heaps_profile",
    "emb_norm_profile",
    "events_dispersion",
    "events_bowley_skew",
    "events_lorenz",
    "fn_width_bucket",
    "macro_daily_health",
    "events_wilcoxon",
    "events_sign_test",
    "kg_transitivity",
    "quality_gopher_rules",
    "pack_ffd",
    "kg_rich_club",
    "fn_sentences",
    "curriculum_order",
    "kg_degree_centralization",
    "events_hourly_profile",
    "eval_lang_confusion",
    "kg_pred_cooccur",
    "macro_amount_profile",
    # r5p additions (sixteenth session) — Mann-Kendall trend,
    # Kruskal-Wallis, Brown-Forsythe (subtract this group too for
    # earlier-round-comparable subtotals)
    "events_mann_kendall",
    "events_kruskal",
    "events_levene",
    "kg_four_cliques",
    "kg_preferential_attachment",
    "lm_collocations",
    "fn_aes_roundtrip",
    "emb_dim_stats",
    "events_friedman",
    "mix_epochs",
    # r5q additions (seventeenth session) — McNemar, Cochran's Q,
    # Simpson diversity, RBP/bpref/interpolated-PR retrieval, harmonic
    # centrality, Salton/Sorensen link indices, global efficiency
    # (subtract this group too for earlier-round-comparable subtotals)
    "events_mcnemar",
    "events_cochran_q",
    "events_simpson",
    "retrieval_rbp",
    "retrieval_bpref",
    "retrieval_interp_pr",
    "kg_salton_sorensen",
    "kg_harmonic",
    "kg_efficiency",
    "events_drawdown",
    "sketch_kmv",
    "fn_interval",
    "sql_hints",
    "sql_unpivot",
    "scan_nested_prune",
    "join_interval_overlap",
    "events_bollinger",
    "kg_condensation",
    "events_rsi",
    "dataset_fingerprint",
    "macro_session_report",
    "lm_stupid_backoff",
    "emb_prefix_recall",
    "events_holt_winters",
    "join_band",
    "kg_edge_betweenness",
    "kg_modularity",
    "macro_tokenizer_report",
    # r5r additions (eighteenth session) — Cliff's delta, Cohen's d
    # (subtract this group too for earlier-round-comparable subtotals)
    "events_cliff_delta",
    "events_cohens_d",
    "events_odds_ratio",
    "events_gini",
    "lm_yule_k",
    "win_percent_rank",
    "fn_levenshtein",
    # r5s additions (nineteenth session) — cohort LTV curve, native XML
    # source (subtract this group too for earlier-round-comparable
    # subtotals)
    "events_cohort_ltv",
    "source_xml",
    # r5t additions (twentieth session) — Durbin-Watson, Hellinger
    # distance, Nelson-Aalen hazard (subtract this group too for
    # earlier-round-comparable subtotals)
    "events_durbin_watson",
    "events_hellinger",
    "events_nelson_aalen",
    # r5u additions (twenty-first session) — TV/Wasserstein distances,
    # ordinal association, PACF/Ljung-Box/Pettitt diagnostics (subtract
    # this group too for earlier-round-comparable subtotals)
    "events_tv_distance",
    "events_wasserstein",
    "events_gamma",
    "events_pacf",
    "events_ljung_box",
    "events_pettitt",
    "events_cochran_armitage",
    "kg_avg_neighbor_degree",
    "retrieval_r_precision",
    "macro_serial_report",
    "events_page",
    "events_turning_points",
    "events_mk_seasonal",
    "kg_clustering_curve",
    "events_records",
    "dedup_cross_split",
    "emb_isotropy",
    "events_quade",
    "events_acf_profile",
    "corpus_split_budget",
    "macro_randomness_report",
    "events_cross_correlation",
    "events_interrupted_ts",
]


def bench_turns_path() -> str:
    """Materialize (once) the deterministic bench transcript corpus."""
    path = f"/tmp/rbs_bench_turns_c{N_CONVS}_s{SKEW_TURNS}_seed42"
    if os.path.exists(os.path.join(path, "_DONE")):
        return path
    from reach_banner_spark.fixtures import make_turns

    turns, _ = make_turns(n_convs=N_CONVS, skew_conv_turns=SKEW_TURNS, seed=42)
    turns["ts"] = turns["ts"].astype("datetime64[us]")  # Spark can't read ns
    os.makedirs(path, exist_ok=True)
    # write via pyarrow (no Spark needed for fixture materialization)
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pandas(turns, preserve_index=False)
    pq.write_table(tbl, os.path.join(path, "turns.parquet"))
    open(os.path.join(path, "_DONE"), "w").write("ok")
    return path


def force(df) -> int:
    """Materialize the full result without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from reach_banner_spark.session import build_session

    turns_path = bench_turns_path()

    spark = build_session(
        app_name="rbs-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    q = em.queries()
    times: dict[str, float] = {}

    # warm the JVM/python-worker pool once (excluded from timings)
    spark.range(1000000).selectExpr("sum(id)").collect()

    # epoch control: a fixed JVM-only aggregation whose wall classifies the
    # host state this bench ran in (this shared VM drifts between quiet and
    # kernel-time-dominated epochs that move multi-minute walls 2x; see
    # BENCH/scaling_r3_host_state.json). Compare across rounds BEFORE
    # comparing query walls.
    ctl = []
    for _ in range(2):
        t0 = time.time()
        (
            spark.range(30_000_000)
            .selectExpr("id % 10000 AS k", "id AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        ctl.append(round(time.time() - t0, 3))
    epoch_control = min(ctl)

    trials: dict[str, list[float]] = {}

    def timed(key: str, run) -> None:
        ts = []
        for _ in range(TRIALS):
            t0 = time.time()
            run()
            ts.append(round(time.time() - t0, 3))
        trials[key] = ts
        times[key] = min(ts)

    for key in HEADLINE:
        fn = q[key]
        timed(key, lambda: force(fn(spark, SF_DIR)))

    # KG pipeline over the synthetic transcript corpus
    from reach_banner_spark.fixtures import ensure_model, make_lexicon
    from reach_banner_spark import schemas
    from reach_banner_spark.plans.pipeline import run_pipeline

    turns = spark.read.parquet(f"{turns_path}/turns.parquet")
    n_turns = turns.count()
    lexicon = spark.createDataFrame(make_lexicon(), schema=schemas.LEXICON)
    model_path = ensure_model()

    timed(
        "kg_pipeline",
        lambda: force(run_pipeline(turns, lexicon, model_path, window_turns=2)),
    )
    kg_sec = times["kg_pipeline"]

    # mention-detection-only throughput (the BANNER-core number)
    from reach_banner_spark.operators.mentions import detect_mentions, paren_balanced
    from reach_banner_spark.plans.pipeline import salt_repartition

    timed(
        "mention_detect",
        lambda: force(
            detect_mentions(salt_repartition(turns), model_path).filter(
                paren_balanced("surface")
            )
        ),
    )

    # --- checkpointed production path (G6): the actual 100 TB story ---
    # cold leg: full pipeline with a per-stage checkpoint table (G7
    # bucketed parquet + manifest) after every stage; resume leg: the
    # kill-after-stage-3 scenario — wipe ONLY the triples stage and re-run;
    # the three upstream stages must be resumed from their checkpoints.
    import shutil

    from reach_banner_spark.plans.checkpoint import run_pipeline_checkpointed

    ck_root = os.path.join("/tmp", f"rbs_bench_ckpt_p{os.getpid()}")

    def ckpt_cold():
        shutil.rmtree(ck_root, ignore_errors=True)
        triples, cp = run_pipeline_checkpointed(
            spark, turns, lexicon, model_path, ck_root
        )
        force(triples)
        assert cp.stages_run == ["mentions", "linked", "canonical", "triples"], (
            cp.stages_run,
            cp.stages_resumed,
        )

    timed("kg_pipeline_ckpt", ckpt_cold)

    def ckpt_resume():
        shutil.rmtree(os.path.join(ck_root, "triples"), ignore_errors=True)
        triples, cp = run_pipeline_checkpointed(
            spark, turns, lexicon, model_path, ck_root
        )
        force(triples)
        assert cp.stages_resumed == ["mentions", "linked", "canonical"], (
            cp.stages_resumed
        )
        assert cp.stages_run == ["triples"], cp.stages_run

    timed("kg_pipeline_resume", ckpt_resume)
    shutil.rmtree(ck_root, ignore_errors=True)

    # --- incremental (streaming) pipeline throughput ---
    # stream_kg = the complete pipeline per micro-batch with bounded tail
    # state; measured on its own staged corpus (3 micro-batches) against
    # one-shot run_pipeline on the SAME turns for the overhead ratio.
    from reach_banner_spark.streaming.ops import (
        _staged_turn_stream_dir,
        stream_kg,
    )

    stream_convs = int(os.environ.get("RBS_BENCH_STREAM_CONVS", "500"))
    staged = _staged_turn_stream_dir(n_convs=stream_convs, skew=500)
    s_turns = spark.read.parquet(staged)
    n_stream_turns = s_turns.count()
    timed(
        "stream_kg",
        lambda: force(stream_kg(spark, SF_DIR, staged_dir=staged)),
    )
    timed(
        "stream_kg_batch_twin",
        lambda: force(run_pipeline(s_turns, lexicon, model_path, window_turns=2)),
    )

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "trials": trials,
                "n_trials": TRIALS,
                "epoch_control_sec": epoch_control,
                "sf": SF_DIR,
                "cpus": CPUS,
                "kg_turns": n_turns,
                "kg_turns_per_sec": round(n_turns / kg_sec, 1),
                "mention_turns_per_sec": round(n_turns / times["mention_detect"], 1),
                # checkpointed-path economics (r4 VERDICT #1): what the
                # per-stage durability costs, and what a mid-run kill saves
                "ckpt_overhead_ratio": round(
                    times["kg_pipeline_ckpt"] / kg_sec, 2
                ),
                "resume_vs_cold_ratio": round(
                    times["kg_pipeline_resume"] / times["kg_pipeline_ckpt"], 2
                ),
                # incremental pipeline economics (r4 VERDICT #5)
                "stream_turns": n_stream_turns,
                "stream_kg_turns_per_sec": round(
                    n_stream_turns / times["stream_kg"], 1
                ),
                "stream_vs_batch_ratio": round(
                    times["stream_kg"] / times["stream_kg_batch_twin"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
