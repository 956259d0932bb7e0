import os

# smaller shuffle fan-in for the 4-CPU test session (must be set before
# halvesting_geometric_ray.config is imported)
os.environ.setdefault("HGR_SHUFFLE_BLOCKS", "8")

import pytest
import ray
import ray.data as rd


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    from halvesting_geometric_ray.ops._util import tune_block_sizing
    tune_block_sizing()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    from halvesting_geometric_ray.fixtures import build_corpus

    return build_corpus(100, 42)


@pytest.fixture(scope="session")
def tiny_pages_dir():
    from halvesting_geometric_ray.fixtures import ensure_pages_parquet

    return ensure_pages_parquet(100, 42)


@pytest.fixture(scope="session")
def tiny_graph(tiny_pages_dir, tmp_path_factory):
    from halvesting_geometric_ray.graph.build import build_graph

    wd = str(tmp_path_factory.mktemp("graph_tiny"))
    return build_graph(tiny_pages_dir, wd)


@pytest.fixture(scope="session")
def small_corpus():
    from halvesting_geometric_ray.fixtures import build_corpus

    return build_corpus(2000, 7)


@pytest.fixture(scope="session")
def small_graph(tmp_path_factory):
    from halvesting_geometric_ray.fixtures import ensure_pages_parquet
    from halvesting_geometric_ray.graph.build import build_graph

    d = ensure_pages_parquet(2000, 7)
    wd = str(tmp_path_factory.mktemp("graph_small"))
    return build_graph(d, wd)


# ---------------------------------------------------------------------------
# Slow-lane marking (r4 VERDICT directive 6): ladder / chaos / fuzz /
# e2e-CLI tests and everything measured >= ~4.5 s in the round-5 full
# run are marked `slow` centrally here (regenerate from
# `pytest --durations=80`), so the default CI loop is
# `-m "not slow"` and the full lane stays intact — no test deleted.
_SLOW_TESTS = {
    "tests/test_betweenness.py::test_betweenness_sampled_estimator",
    "tests/test_bfs.py::test_bfs_sources_ds_parity",
    "tests/test_bowtie.py::test_bowtie_auto_pivot_matches_oracle",
    "tests/test_bowtie.py::test_bowtie_explicit_pivot_multi_part",
    "tests/test_bowtie.py::test_giant_scc_pivot_exact",
    "tests/test_bpe.py::test_partitioning_independent",
    "tests/test_bridges.py::test_2ecc_labels_match_bridge_free_components",
    "tests/test_bridges.py::test_cycle_no_bridges",
    "tests/test_bridges.py::test_random_graphs_match_tarjan",
    "tests/test_bridges.py::test_tree_all_bridges",
    "tests/test_bridges.py::test_two_triangles_one_bridge",
    "tests/test_cliques.py::test_k5_planted",
    "tests/test_cliques.py::test_partitioning_invariance",
    "tests/test_components.py::test_cc_resume",
    "tests/test_components.py::test_cc_without_pointer_jumping_same_labels",
    "tests/test_dbscan.py::test_past_cap_border_and_min_pts_one_parity",
    "tests/test_incremental.py::test_extend_csr_and_warm_pagerank",
    "tests/test_incremental.py::test_extend_graph_idempotent_and_recrawl_filter",
    "tests/test_incremental.py::test_extend_graph_stable_ids_and_edges",
    "tests/test_kcore.py::test_kcore_known_shape",
    "tests/test_kcore.py::test_kcore_matches_oracle",
    "tests/test_kcore.py::test_kcore_partitioning_independent",
    "tests/test_leiden.py::test_louvain_leiden_guarantee",
    "tests/test_linkpred.py::test_layout_independent",
    "tests/test_louvain.py::test_beats_label_propagation_on_fixture",
    "tests/test_louvain.py::test_checkpoint_does_not_perturb",
    "tests/test_louvain.py::test_contraction_regimes_agree",
    "tests/test_louvain.py::test_layout_invariance",
    "tests/test_louvain.py::test_mirror_owner_parity",
    "tests/test_metadata.py::test_hash_id_mode_isomorphic",
    "tests/test_mirror.py::test_mirror_layout_invariance_and_estimate_only",
    "tests/test_mst.py::test_driver_and_distributed_root_paths_agree",
    "tests/test_multilevel.py::test_multilevel_covers_balances_and_is_layout_independent",
    "tests/test_multilevel.py::test_multilevel_cut_not_worse_than_flat_on_planted",
    "tests/test_multilevel.py::test_refine_improves_a_scrambled_planted_assignment",
    "tests/test_pagerank.py::test_pagerank_resume_mid_iteration",
    "tests/test_pagerank.py::test_pagerank_resume_mid_run",
    "tests/test_propagate.py::test_sgc_composition_denoises_labels",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_bfs_hops]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_toposort_urls]",
    "tests/test_queries_relational.py::test_query_matches_oracle[q_scd2_history]",
    "tests/test_salsa.py::test_salsa_ignores_self_loops_and_dups",
    "tests/test_salsa.py::test_salsa_layout_invariant",
    "tests/test_scan.py::test_scan_hub_vs_outlier",
    "tests/test_scan.py::test_scan_layout_invariance",
    "tests/test_scan.py::test_scan_matches_oracle",
    "tests/test_spam.py::test_partitioned",
    "tests/test_spectral.py::test_layout_invariance",
    "tests/test_temporal.py::test_layout_invariance_and_validation",
    "tests/test_text_dedup.py::test_sql_parity[q_dedup_clusters]",
    "tests/test_textrank.py::test_textrank_layout_invariance",
    "tests/test_triads.py::test_census_reciprocal_and_dag_invariants",
    "tests/test_triads.py::test_partitioning_invariance_and_table",
    "tests/test_truss.py::test_clique_plus_tail",
    "tests/test_truss.py::test_random_matches_oracle",
    "tests/test_validate.py::test_cli_validate",
}
# second band (round-5 fast-lane re-measure): everything >= ~3.2 s
_SLOW_TESTS |= {
    "tests/test_ann.py::test_ivfpq_recall_and_compression",
    "tests/test_bfs.py::test_double_sweep_diameter_matches_oracle",
    "tests/test_bowtie.py::test_bowtie_crafted",
    "tests/test_bpe.py::test_train_matches_reference[20]",
    "tests/test_cc_warmstart.py::test_warm_fewer_rounds_on_chain_merge",
    "tests/test_cc_warmstart.py::test_warm_with_new_vertices",
    "tests/test_dbscan.py::test_past_cap_distributed_path_bitwise_parity",
    "tests/test_graph_build.py::test_empty_and_degenerate_inputs",
    "tests/test_graph_build.py::test_ids_deterministic_across_runs",
    "tests/test_hostgraph.py::test_host_pagerank_composes",
    "tests/test_landmarks.py::test_upper_bound_and_landmark_exactness",
    "tests/test_leiden.py::test_modularity_non_decreasing",
    "tests/test_leiden.py::test_refine_matches_oracle_random[4-0]",
    "tests/test_leiden.py::test_refine_matches_oracle_random[4-5]",
    "tests/test_linear.py::test_end_to_end_quality_gate_on_hashed_features",
    "tests/test_louvain.py::test_phase1_crash_resume_bitwise[8000000]",
    "tests/test_louvain.py::test_planted_partition_quality",
    "tests/test_metrics.py::test_common_neighbors_hub_cap",
    "tests/test_metrics.py::test_conductance_two_cliques_exact",
    "tests/test_mirror.py::test_mirror_bucket_cap_star",
    "tests/test_mirror.py::test_mirror_candidates_planted_pairs",
    "tests/test_mst.py::test_layout_invariance",
    "tests/test_nullmodel.py::test_deterministic_and_layout_invariant",
    "tests/test_nullmodel.py::test_rewiring_destroys_clustering",
    "tests/test_pagerank.py::test_pagerank_sparse_checkpoint_interval",
    "tests/test_pagerank.py::test_pagerank_uniform_weights_equal_unweighted",
    "tests/test_pagerank.py::test_pagerank_weighted_multigraph_folds_multiplicity",
    "tests/test_pagerank.py::test_personalized_pagerank_matches_oracle",
    "tests/test_pagerank.py::test_ppr_and_classic_checkpoints_do_not_mix",
    "tests/test_partition.py::test_relabel_by_blocks_roundtrip",
    "tests/test_partition.py::test_relabel_pagerank_permutation_invariance",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_clustering_coeff]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_condensation_urls]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_feature_smooth_urls]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_fourcliques_urls]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_graph_profile]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_host_backbone_disparity]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_salsa_urls]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_scan_edges]",
    "tests/test_queries_graph_oracle.py::test_graph_sql_parity[q_triad_census_urls]",
    "tests/test_queries_relational.py::test_query_matches_oracle[q_cosupply_triangles]",
    "tests/test_redirects.py::test_layout_invariance",
    "tests/test_salsa.py::test_salsa_matches_power_iteration",
    "tests/test_salsa.py::test_salsa_star_closed_form",
    "tests/test_scc.py::test_scc_partitioning_and_actor_independent",
    "tests/test_simrank.py::test_simrank_layout_invariant",
    "tests/test_spectral.py::test_ritz_values_match_dense_eigh[4]",
    "tests/test_stat_tests.py::test_spearman_perfect_monotone_and_degenerate",
    "tests/test_temporal.py::test_matches_sequential_fixpoint_random",
    "tests/test_textrank.py::test_textrank_matches_sequential_oracle",
    "tests/test_triads.py::test_census_random_graph_matches_bruteforce",
    "tests/test_triangles_labelprop.py::test_triangles_edges_matches_sym_path",
    "tests/test_unigram.py::test_layout_invariance_fixed_num_parts",
    "tests/test_walks.py::test_walks_layout_independent",
    "tests/test_walks.py::test_walks_seed_changes_draws",
    "tests/test_wl.py::test_star_and_layout_invariance",
    "tests/test_wordpiece.py::test_apply_roundtrip_and_unk",
    "tests/test_wordpiece.py::test_layout_invariance",
    "tests/test_wordpiece.py::test_matches_sequential_reference[8]",
}
# whole modules: end-to-end CLI sweeps and SIGKILL chaos
_SLOW_MODULES = {"tests/test_cli.py", "tests/test_kill_resume.py"}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for it in items:
        nodeid = it.nodeid
        base = nodeid.split("[")[0]
        mod = nodeid.split("::")[0]
        if (nodeid in _SLOW_TESTS or base in _SLOW_TESTS
                or mod in _SLOW_MODULES):
            it.add_marker(_pytest.mark.slow)
