#!/usr/bin/env python3
"""Scaling-slope gate: time-vs-rows exponents across sf0.001/0.01/0.1.

Runs the expensive-query subset through graft.Bench at all three scale
factors (or reuses existing /tmp/bench_scale_<sf>.json dumps with
--reuse), normalizes each query by its driving table's row growth, and
gates the slope exponent over the informative decade (sf0.01 -> sf0.1,
where documents grow 10x):

    slope = log(t_big / t_small) / log(rows_big / rows_small)

Gate: slope <= 1.2 for EVERY query, the embedding pair generators
included. Since round 9, q32 (cosine near-dup) and q65 (SemDeDup)
auto-derive their quantizer from the corpus count (cell/bucket
population held ~64 as the corpus grows — Similarity.autoCentroids /
autoPlanes), which turns their within-cell pair stage from n²/k at
fixed k into ~n·cellSize — linear overall, so the uniform 1.2 gate
applies. The former fixed-knob escape hatch (gate <= 2.0) is gone.

Streaming queries are floor-dominated at these sizes (slopes ~0.0-0.1);
they are included to prove state does NOT grow with input (watermark
eviction), not to measure compute.

Usage: python3 tools/scaling_slopes.py [--reuse]
Exits nonzero if any gate fails.
"""
import json
import math
import os
import subprocess
import sys

SFS = ["sf0.001", "sf0.01", "sf0.1"]
QUERIES = (
    "q26_jaccard_pairs,q28_minhash_lsh_pairs,q30_simhash_pairs,"
    "q32_cosine_neardup,q63_dedup_clusters,q65_semdedup,q47_edit_distance,"
    "q57_repetition_profile,q64_bm25_rank,q67_vocab_topk,"
    "q61_stream_interval_join,q71_streaming_sliding,q35_streaming_tumbling,"
    "q51_contamination,q109_paragraph_dedup,q110_cluster_reps,"
    "q111_span_excision,"
    "q113_tfidf_keywords,q114_kn_score,q115_cms_counts,"
    "q116_host_pagerank,q117_hll_distinct,q118_dsir_select,"
    "q119_histogram_quantiles,q120_crawl_pipeline,"
    "q121_length_band_hist,q122_distribution_drift,qb44_media_resize,"
    "q123_lsh_dedup_clusters,q125_stream_neardup_ingest,q126_kmv_overlap,"
    "q127_dup_weights,q128_wordpiece_vocab,q129_wordpiece_encode,"
    "q130_token_budget,q131_hard_negatives,q132_perplexity_bands,"
    "q133_containment_pairs,q134_embedding_drift,qb46_audio_neardup,"
    "q135_containment_prefix,q136_stream_cms,q137_corpus_datasheet,"
    "q138_split_leakage,q139_quality_classifier,q140_filter_calibration,"
    "q141_sample_estimate,q142_tokenizer_fertility,q143_release_delta,"
    "q144_quality_budget,q145_ngram_diversity,"
    "q147_ngram_diversity_kmv,q154_gopher_rules,q155_hashed_tf,"
    "q156_hashed_neardup,q159_hashed_tfidf,q162_unigram_vocab,"
    "q163_unigram_encode,q164_crossdoc_spans,q165_crossdoc_excise,"
    "q166_stream_heavy_hitters,"
    "q171_event_gapfill,q172_scd2_intervals,q173_bucketed_join,"
    "q174_dictionary_tags,q175_hll_rollup,q176_pmi_pairs,"
    "q177_cohort_retention,q178_touch_attribution,q179_event_patterns,"
    "q180_time_weighted_avg,q181_changelog_compact,q182_fuzzy_name_join,"
    "q183_triangle_census,q184_stream_changelog,q185_entity_resolution,"
    "q186_skew_profile,q187_kmin_rollup,q188_interval_overlap,"
    "q189_nearest_event_join,q190_embedding_isotropy,q191_corpus_digest,"
    "q192_jl_distortion,"
    "q193_vector_route_dispatch,q194_vector_route_recall,"
    "q195_lsh_recall_sampled,q196_minhash_estimator_sampled,"
    "q197_salted_join_auto,q198_vector_recall_sampled,"
    "q199_vector_overlap_sampled,q200_nested_quantizer,"
    "q201_route_threshold_sensitivity,q202_cell_multiprobe_neardup,"
    "q203_cell_probe_recall_sampled"
)
# driving table per query, and that table's row count per sf
TABLE = {
    "q26_jaccard_pairs": "documents", "q28_minhash_lsh_pairs": "documents",
    "q30_simhash_pairs": "documents", "q47_edit_distance": "documents",
    "q57_repetition_profile": "documents", "q63_dedup_clusters": "documents",
    "q64_bm25_rank": "documents", "q67_vocab_topk": "documents",
    "q51_contamination": "documents",
    "q109_paragraph_dedup": "documents", "q110_cluster_reps": "documents",
    "q111_span_excision": "documents",
    "q119_histogram_quantiles": "orders", "q120_crawl_pipeline": "documents",
    "q113_tfidf_keywords": "documents", "q114_kn_score": "documents",
    "q115_cms_counts": "documents", "q116_host_pagerank": "documents",
    "q117_hll_distinct": "documents", "q118_dsir_select": "documents",
    "q121_length_band_hist": "documents",
    "q122_distribution_drift": "documents",
    "q123_lsh_dedup_clusters": "documents",
    "q125_stream_neardup_ingest": "documents",
    "q126_kmv_overlap": "documents",
    "q127_dup_weights": "documents",
    "q128_wordpiece_vocab": "documents",
    "q129_wordpiece_encode": "documents",
    "q130_token_budget": "documents",
    "q131_hard_negatives": "embeddings",
    "q132_perplexity_bands": "documents",
    "q133_containment_pairs": "documents",
    "q134_embedding_drift": "embeddings",
    "q135_containment_prefix": "documents",
    "q136_stream_cms": "events",
    "q137_corpus_datasheet": "documents",
    "q138_split_leakage": "documents",
    "q139_quality_classifier": "documents",
    "q140_filter_calibration": "documents",
    "q141_sample_estimate": "documents",
    "q142_tokenizer_fertility": "documents",
    "q143_release_delta": "documents",
    "q144_quality_budget": "documents",
    "q145_ngram_diversity": "documents",
    "q147_ngram_diversity_kmv": "documents",
    "q154_gopher_rules": "documents",
    "q155_hashed_tf": "documents",
    "q156_hashed_neardup": "documents",
    "q159_hashed_tfidf": "documents",
    "q162_unigram_vocab": "documents",
    "q163_unigram_encode": "documents",
    "q164_crossdoc_spans": "documents",
    "q165_crossdoc_excise": "documents",
    "q166_stream_heavy_hitters": "documents",
    # qb44/qb46 read FIXED-SIZE synthetic media batches (200 images / 72
    # audio clips at every sf): their gate is time INVARIANCE, not a slope
    "qb44_media_resize": "fixed",
    "qb46_audio_neardup": "fixed",
    "q32_cosine_neardup": "embeddings", "q65_semdedup": "embeddings",
    "q35_streaming_tumbling": "events", "q61_stream_interval_join": "events",
    "q71_streaming_sliding": "events",
    "q171_event_gapfill": "events",
    "q172_scd2_intervals": "events",
    "q177_cohort_retention": "events",
    "q178_touch_attribution": "events",
    "q179_event_patterns": "events",
    "q180_time_weighted_avg": "events",
    "q181_changelog_compact": "events",
    "q182_fuzzy_name_join": "part",
    "q183_triangle_census": "documents",
    "q184_stream_changelog": "events",
    "q185_entity_resolution": "part",
    "q186_skew_profile": "events",
    "q187_kmin_rollup": "documents",
    "q188_interval_overlap": "events",
    "q189_nearest_event_join": "events",
    "q190_embedding_isotropy": "embeddings",
    "q191_corpus_digest": "documents",
    "q192_jl_distortion": "embeddings",
    "q193_vector_route_dispatch": "documents",
    "q194_vector_route_recall": "documents",
    "q195_lsh_recall_sampled": "documents",
    "q196_minhash_estimator_sampled": "documents",
    "q197_salted_join_auto": "events",
    "q198_vector_recall_sampled": "documents",
    "q199_vector_overlap_sampled": "documents",
    "q200_nested_quantizer": "embeddings",
    "q201_route_threshold_sensitivity": "documents",
    "q202_cell_multiprobe_neardup": "documents",
    "q203_cell_probe_recall_sampled": "documents",
    "q173_bucketed_join": "lineitem",
    "q174_dictionary_tags": "documents",
    "q175_hll_rollup": "documents",
    "q176_pmi_pairs": "documents",
}
ROWS = {
    "documents": {"sf0.001": 500, "sf0.01": 500, "sf0.1": 5000},
    "embeddings": {"sf0.001": 500, "sf0.01": 500, "sf0.1": 2000},
    "events": {"sf0.001": 1000, "sf0.01": 10000, "sf0.1": 100000},
    "orders": {"sf0.001": 1500, "sf0.01": 15000, "sf0.1": 150000},
    "lineitem": {"sf0.001": 6000, "sf0.01": 60000, "sf0.1": 600000},
    "part": {"sf0.001": 200, "sf0.01": 2000, "sf0.1": 20000},
    "fixed": {"sf0.001": 200, "sf0.01": 200, "sf0.1": 200},
}


def bench(sf: str) -> dict:
    out = f"/tmp/bench_scale_{sf}.json"
    if "--reuse" in sys.argv and os.path.exists(out):
        print(f"[slopes] reusing {out}")
    else:
        print(f"[slopes] benching {sf} ...")
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=f"/root/testdata/{sf}",
                   SPARK_GRAFT_ONLY=QUERIES,
                   SPARK_GRAFT_BENCH_OUT=out)
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=env, check=True, capture_output=True)
    return json.load(open(out))["queries"]


def main() -> int:
    t = {sf: bench(sf) for sf in SFS}
    bad = 0
    print(f"{'query':28s} {'table':11s} {'t(.001)':>8s} {'t(.01)':>8s} "
          f"{'t(.1)':>8s} {'slope':>6s}  gate")
    for q in sorted(TABLE):
        tbl = TABLE[q]
        a, b, c = (t[sf][q] for sf in SFS)
        if min(a, b, c) <= 0:  # Bench records failures as -1.0
            print(f"{q:28s} {tbl:11s} {a:8.2f} {b:8.2f} {c:8.2f}   n/a  "
                  f"FAIL (bench error sentinel)")
            bad += 1
            continue
        xdata = ROWS[tbl]["sf0.1"] / ROWS[tbl]["sf0.01"]
        if xdata == 1:
            # input does not grow with sf: the gate is time invariance
            ratio = c / b
            ok = ratio <= 1.5
            bad += 0 if ok else 1
            print(f"{q:28s} {tbl:11s} {a:8.2f} {b:8.2f} {c:8.2f} {'flat':>6s}  "
                  f"{'OK' if ok else 'FAIL (t ratio > 1.5 on fixed input)'}")
            continue
        slope = math.log(c / b) / math.log(xdata)
        limit = 1.2
        ok = slope <= limit
        bad += 0 if ok else 1
        print(f"{q:28s} {tbl:11s} {a:8.2f} {b:8.2f} {c:8.2f} {slope:6.2f}  "
              f"{'OK' if ok else f'FAIL (> {limit})'}")
    print(f"[slopes] {'all gates pass' if bad == 0 else f'{bad} FAILURES'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
