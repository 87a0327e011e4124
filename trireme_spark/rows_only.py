"""Declared rows-only registrations — the machine-readable contract.

Some registry keys legitimately have no DuckDB oracle: the driver then
records a weaker rows-only check for them, which shows up as
``err: "no_oracle"`` in CORRECTNESS_r{N}.json. That is by design, not a
failure — but the set must be DECLARED, not discovered per round, so a
graded window's expected-green count is computable in advance and any
``no_oracle`` row NOT in this manifest is an automatic red flag
(judge round-9 directive #3).

Each entry carries WHY the key cannot be SQL-mirrored and the pytest
node(s) that carry its correctness contract instead (error bounds,
recall floors, planted-answer recovery, full-equality recomputes).

``scripts/gen_rows_only.py`` renders this to ``ROWS_ONLY.json`` at the
repo root together with the current grading window's expected
accounting; ``tests/test_oracle.py`` pins the key set against the live
registry in both directions, so a key silently losing (or gaining) an
oracle fails the suite.
"""

from __future__ import annotations

# why-class -> human explanation (shared by several keys)
WHY = {
    "sketch_state": (
        "cross-engine sketch state: HLL/KLL register layouts and merge "
        "order differ by engine, so per-row equality with DuckDB is not "
        "defined; the contract is the published error bound"
    ),
    "approx_recall": (
        "approximate / seeded-model output: result is recall-gated "
        "against the exact baseline, not row-exact"
    ),
    "iterative_state": (
        "iterative / greedy model state (centroid trajectories, SVD "
        "basis sign/rotation, peeling order, greedy argmax chain, BPE "
        "merge loop) is not expressible as a single SQL statement"
    ),
    "calibrated_noise": (
        "differentially-private output is calibrated noise by "
        "definition; the contract is the noise distribution, not values"
    ),
    "external_codec": (
        "output depends on a codec library (zlib) the oracle engine "
        "does not ship; the contract is a python-side identity recompute"
    ),
}

# key -> (why-class, [pytest node(s) carrying the correctness contract])
ROWS_ONLY: dict[str, tuple[str, list[str]]] = {
    # cross-engine sketch state
    "agg_approx_distinct": (
        "sketch_state",
        ["tests/test_quality.py::test_approx_distinct_error_bound"],
    ),
    "agg_approx_percentile": (
        "sketch_state",
        ["tests/test_quality.py::test_approx_percentile_error_bound"],
    ),
    "agg_hll_intersection": (
        "sketch_state",
        ["tests/test_quality.py::test_hll_intersection_error_bound"],
    ),
    "agg_hll_sketch_union": (
        "sketch_state",
        ["tests/test_quality.py::test_hll_sketch_union_error_bound"],
    ),
    "events_wau_hll_sliding": (
        "sketch_state",
        ["tests/test_quality.py::test_wau_hll_error_bound"],
    ),
    # approximate / seeded-model outputs
    "sim_ann_lsh": (
        "approx_recall",
        [
            "tests/test_quality.py::test_ann_lsh_recall",
            "tests/test_quality.py::test_ann_lsh_recall_clustered",
        ],
    ),
    "sim_ann_ivf": (
        "approx_recall",
        [
            "tests/test_quality.py::test_ann_ivf_recall",
            "tests/test_quality.py::test_ann_ivf_recall_clustered",
        ],
    ),
    "sim_ann_ivfpq": (
        "approx_recall",
        [
            "tests/test_quality.py::test_ann_ivfpq_recall",
            "tests/test_quality.py::test_ann_ivfpq_recall_clustered",
        ],
    ),
    "dedup_simhash": (
        "approx_recall",
        ["tests/test_quality.py::test_simhash_invariants"],
    ),
    # iterative / greedy model state
    "cluster_kmeans_fit": (
        "iterative_state",
        ["tests/test_quality.py::test_kmeans_fit_invariants"],
    ),
    "embed_pca_project": (
        "iterative_state",
        ["tests/test_quality.py::test_pca_projection_contract"],
    ),
    "embed_pq_quantize": (
        "iterative_state",
        ["tests/test_quality.py::test_pq_quantize_invariants"],
    ),
    "embed_procrustes_align": (
        "iterative_state",
        ["tests/test_quality.py::test_procrustes_recovers_planted_rotation"],
    ),
    "ts_dtw_distance": (
        "iterative_state",
        [
            "tests/test_staged_r12e.py::test_dtw_python_recompute",
            "tests/test_staged_r12e.py::test_dtw_nonnegative_and_deterministic",
            "tests/test_staged_properties.py::test_dtw_dp_matches_brute_force_enumeration",
        ],
    ),
    "graph_kcore": (
        "iterative_state",
        [
            "tests/test_quality.py::test_kcore_exact_on_known_graph_and_invariants",
            "tests/test_independent_recompute.py::test_kcore_matches_python_recompute",
        ],
    ),
    "sim_mmr_rerank": (
        "iterative_state",
        ["tests/test_quality.py::test_mmr_rerank_diversifies"],
    ),
    "text_bpe_train_merges": (
        "iterative_state",
        [
            "tests/test_quality.py::test_bpe_first_merge_matches_exact_pair_count",
            "tests/test_quality.py::test_bpe_batched_equals_sequential_16_merges",
        ],
    ),
    "text_bpe_encode": (
        "iterative_state",
        ["tests/test_quality.py::test_bpe_encode_lossless_and_compressive"],
    ),
    "text_compression_quality": (
        "external_codec",
        [
            "tests/test_staged_r14b.py::test_compression_python_zlib_identity",
            "tests/test_staged_r14b.py::test_compression_deterministic_and_bounded",
        ],
    ),
    "dedup_lsh_eval": (
        "approx_recall",
        [
            "tests/test_staged_r14c.py::test_lsh_eval_truth_side_matches_duckdb",
            "tests/test_staged_r14c.py::test_lsh_eval_identities_and_nested_band_monotonicity",
        ],
    ),
    # calibrated noise by definition
    "etl_dp_noisy_counts": (
        "calibrated_noise",
        ["tests/test_quality.py::test_dp_noisy_counts_calibration"],
    ),
}


def manifest() -> dict:
    """Render the manifest plus the CURRENT grading window's accounting.

    Imports the live registry, so the window slice and the
    oracle-missing set are read from the code that ships, not from a
    copy that can drift.
    """
    import trireme_spark.queries  # noqa: F401  (populates the registry)
    from trireme_spark import registry

    keys = list(registry.QUERIES)
    window = keys[:50]
    rows_only_in_window = [k for k in window if k in ROWS_ONLY]
    return {
        "_comment": (
            "Declared rows-only registrations (no DuckDB oracle by "
            "design). A CORRECTNESS_r{N}.json row with err=no_oracle "
            "whose key is NOT listed here is a red flag. Generated by "
            "scripts/gen_rows_only.py from trireme_spark/rows_only.py; "
            "pinned against the live registry by tests/test_oracle.py."
        ),
        "keys": {
            k: {"why_class": wc, "why": WHY[wc], "pytest": nodes}
            for k, (wc, nodes) in sorted(ROWS_ONLY.items())
        },
        "current_window": {
            "slots": f"1-{len(window)}",
            "first_key": window[0],
            "last_key": window[-1],
            "expected_hash_green": len(window) - len(rows_only_in_window),
            "expected_rows_only": sorted(rows_only_in_window),
        },
    }
