"""Registry queries engine-vs-engine at sf0.1 — the pipeline/pattern
analog of test_tpcds14_sf01.

Every driver CORRECTNESS row runs at sf0.01 only, so constants embedded
in the pipeline operators (MinHash band structure, sign-LSH bit count,
IVF cell count, q9's revenue thresholds, the pattern chooser's
broadcast/skew thresholds) had no guard that they stay non-degenerate
when the data grows 10x. This module re-runs a scale-sensitive slice of
the registry against the same DuckDB oracles the driver uses, at sf0.1:
non-empty AND hash-exact. g3/g4 additionally exercise the DEFAULT
strategy chooser end-to-end at a scale where the degree-skew probe
actually samples.

Marked ``slow`` (pytest.ini excludes it from the default run); invoke
with ``python -m pytest -m slow tests/test_registry_sf01.py``.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.1"

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

# scale-sensitive selections: embedded constants (d2 bands, d5/sim2 LSH
# bits, sim3 IVF cells, ml1 Lloyd init, q9 thresholds), volume-driven
# plan choices (g3/g4 chooser, flagship broadcast star), and the
# watermark/sessionization literals (e3)
SPOT_QUERIES = [
    "flagship_star_agg",
    "q9_case_scalar_buckets",
    "a5_count_distinct",
    "d2_dedup_minhash_lsh",
    "d5_dedup_embedding",
    "sim2_lsh_bucketed_ann",
    "sim3_ivf_ann",
    "ml1_kmeans_cluster_sizes",
    "g3_triangle_count",
    "g4_square_count",
    "c1_decontaminate_4gram",
    "e3_session_window",
    # r6 additions with embedded constants that must survive 10x data:
    # q7's nation pair (supplier coverage per nation), q21's multi-
    # supplier/late-tie structure, q22's inactivity window + balance
    # threshold, sim5's grid codebooks + 50-wide shortlist
    "q7_volume_shipping",
    "q21_waiting_supplier",
    "q22_inactive_customers",
    "sim5_pq_adc_ann",
    # r7 additions: sim6's adaptive-split cap (more buckets exceed it at
    # 2000 vectors), c9's per-stratum k vs stratum size, sql7's hop
    # bound vs the denser sf0.1 edge graph
    "sim6_knn_graph",
    "c9_priority_sample",
    "cdc1_scd2_compress",
    "sql7_recursive_cte",
    # r9 additions: d8's 5-gram width vs the 10x-denser natural-repeat
    # surface, c11's per-source factor tiers, c12/c13's fixed 100-token
    # budget against 10x-larger domains (keep set must stay
    # non-degenerate, contexts must still fill)
    "d8_duplicated_spans",
    "d9_span_excise",
    "c11_epoch_upsample",
    "c12_token_budget_select",
    "c13_e2e_mix",
    # r10 additions: c14's planted-copy rates and broadcast cov-delivery
    # vs the 10x corpus, c15's cluster split over the denser near-dup
    # graph, t8's gram folds against 10x more (and longer-tailed) docs
    "c14_dedup_excise_split",
    "c15_leakage_safe_split",
    "t8_repetition_metrics",
    # r11 additions: c16's Gopher thresholds vs the 10x corpus — the cut
    # must stay planted-docs-only (no natural doc trips the top-gram
    # shares) and the one-frame cut+dedup window must stay hash-exact;
    # d10's band buckets and jaccard threshold vs a 10x index (novel
    # docs must stay novel as bucket occupancy grows)
    "c16_repetition_cut_split",
    "d10_incremental_lsh_probe",
    # r12 additions: e6 drains c16's corpus THROUGH the stream (twice-
    # delivered) — at 10x the docs the arrival-time dedup state and the
    # in-row cut must still reproduce the batch survivor set exactly;
    # d11's grown-index probe must keep near-dups-of-grown resolving to
    # grown ids as natural bucket occupancy grows 10x
    "e6_streaming_quality_cut",
    "d11_grown_index_probe",
]


@pytest.fixture(scope="module")
def duck_sf01(duck):
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield duck
    for t in TABLES:
        duck.execute(f"DROP VIEW IF EXISTS {t}")


@pytest.mark.parametrize("name", SPOT_QUERIES)
def test_registry_sf01_matches_duckdb(spark, duck_sf01, name):
    import __spark_entry__ as e
    from oracle_check import compare_frames

    qs, oracles = e.queries(), e.oracle_sql()
    assert name in oracles, f"{name} has no oracle — pick an oracle-checked query"
    sp = qs[name](spark, SF_DIR).toPandas()
    assert len(sp) > 0, f"{name}: empty at sf0.1 — a scale-tuned constant went degenerate"
    compare_frames(sp, duck_sf01.execute(oracles[name]).df(), name)
