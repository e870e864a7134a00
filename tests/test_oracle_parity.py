"""Self-validating correctness gate: every registry query with an oracle is
executed on Spark AND DuckDB at sf0.001 and must match exactly (post-
rounding). This is the same comparison the driver performs at sf0.01."""

from __future__ import annotations

import pytest

from solar_data_tools_spark.registry import QUERIES
from tests.oracle_utils import compare, duckdb_run

WITH_ORACLE = [n for n, s in QUERIES.items() if s.oracle is not None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_small, name):
    spec = QUERIES[name]
    spark_df = spec.fn(spark, sf_small)
    oracle = duckdb_run(spec.oracle, sf_small)
    compare(spark_df, oracle, name)


# Rows-only (no-oracle) queries are checked by per-query semantic
# invariants in tests/test_semantic_invariants.py.


# The driver compares at sf0.01, where data-dependent failure modes the
# tiny scale can't surface (deeper dedup funnels, fuller domain caps,
# knife-edge filter thresholds) become reachable. Re-verify the
# highest-composition oracles at that exact scale every session.
_SF001 = "/root/testdata/sf0.01"
_TWO_SCALE = [
    "q140_crawl_curation_pipeline",
    "q139_dedup_keep_best",
    "q138_classifier_score",
    "q132_latitude_study",
    "q135_longitude_study_closed",
    "q136_ground_truth_tilt_azimuth",
    "q141_pq_encode",
    "q142_pq_adc_topk",
    "q143_dsir_selection",
    "q144_url_blocklist",
    "q147_quality_pyramid",
    "q148_pagerank",
    "q149_binary_hamming_topk",
    "q152_weighted_shuffle",
    "q153_binary_rerank",
    "q154_chunk_dedup",
    "q155_corpus_report",
    "q156_curation_pipeline_v2",
    "q158_cluster_balanced_sample",
    "q159_semantic_decontamination",
    "q160_within_doc_dedup",
    "q161_epoch_mix",
    "q162_bm25_topk",
    "q163_cms_heavy_hitters",
    "q164_hybrid_rrf",
    "q165_novelty_scores",
    "q166_source_overlap",
    "q167_source_overlap_minhash",
    "q168_token_budget_cut",
]


@pytest.mark.parametrize("name", _TWO_SCALE)
def test_oracle_parity_driver_scale(spark, name):
    import os

    if not os.path.isdir(_SF001):
        pytest.skip("sf0.01 testdata not present")
    spec = QUERIES[name]
    compare(spec.fn(spark, _SF001), duckdb_run(spec.oracle, _SF001), name)
