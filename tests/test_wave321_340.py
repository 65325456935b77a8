"""Edge-case tests for waves 321-340: lifecycle/temporal class closure,
survivorship bounds, positional TTR closure, triangle-flow bounds,
cannibalization pair counts, calibration bounds, clock-phase closure,
kNN reciprocity bounds, brokerage share closure, Omori positivity,
weighted-median bounds, heaping closure, Pareto-point bounds, metricity
bounds, centroid ordering, exclusivity bounds, persistence bounds,
cron-detector bounds, monotonicity closure, ARCH bounds, return-interval
positivity, price-variance closure, corr-summary ordering, batching
bounds, dup-length bias, eccentricity bounds, concurrency bounds,
rank-shift closure, double-jeopardy count, opening-outcome closure,
position-bias bounds, hapax-census closure, Anscombe flags, hazard
monotone risk, duplicate-name closure, switching bounds, association
bounds, mutual-best symmetry, binding-rule closure. Value contracts are
enforced by the parametrized oracle gate; these pin semantics."""

import numpy as np
import pandas as pd

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_brand_lifecycle_closure():
    got = _run("part_brand_lifecycle")
    if len(got):
        assert set(got["lifecycle"]) <= {"growth", "flat", "decline"}
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= 4


def test_temporal_classes_closure():
    got = _run("users_temporal_classes")
    if len(got):
        assert set(got["temporal_class"]) <= {"regular", "random", "bursty"}
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= 4


def test_survivorship_bounds():
    got = _run("docs_dedup_survivorship")
    if len(got):
        assert (got["n_kept"] <= got["n_docs"]).all()
        assert (got["n_kept"] >= 1).all()


def test_positional_ttr_thirds():
    got = _run("docs_positional_ttr")
    if len(got):
        assert set(got["third"]) <= {0, 1, 2}
        assert (got["n_types"] <= got["n_tokens"]).all()


def test_triangle_flow_bounds():
    got = _run("nation_trade_triangles")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_cyclic"]) <= int(r["n_triads"])
        assert int(r["max_cyclic_flow"]) <= int(r["total_cyclic_flow"]) or \
            int(r["n_cyclic"]) <= 1


def test_cannibalization_counts():
    got = _run("part_brand_cannibalization")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_negative"]) <= int(r["n_pairs"])
        assert int(r["min_r_micro"]) <= int(r["mean_r_micro"])


def test_signcode_calibration_bounds():
    got = _run("emb_signcode_calibration")
    if len(got):
        assert (got["mae_micro"] >= 0).all()
        assert (got["corr_micro"].abs() <= 1_000_001).all()


def test_clock_phase_closure():
    got = _run("events_shard_clock_phase")
    if len(got):
        assert (got["med_minute"] >= 0).all()
        assert (got["med_minute"] <= 59).all()
        assert len(got) <= 16


def test_knn_reciprocity_bounds():
    got = _run("emb_knn_reciprocity")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_mutual"]) <= int(r["n_edges"])
        assert int(r["n_edges"]) == int(r["n_nodes"]) * int(r["k"])


def test_brokerage_share_closure():
    got = _run("nation_two_hop_brokerage")
    if len(got):
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= len(got) + 1


def test_omori_positive():
    got = _run("events_omori_decay")
    if len(got):
        assert (got["k_milli"] > 0).all()
        assert (got["r2_micro"] <= 1_000_001).all()


def test_weighted_median_bounds():
    got = _run("lineitem_weighted_median")
    if len(got):
        r = got.iloc[0]
        assert int(r["diff_milli"]) == int(r["wmed_milli"]) - int(
            r["med_milli"]
        )


def test_heaping_closure():
    got = _run("orders_day_of_month_heaping")
    if len(got):
        assert len(got) == 28
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= 30


def test_pareto_point_bounds():
    got = _run("users_pareto_point")
    if len(got):
        r = got.iloc[0]
        assert int(r["k_users"]) <= int(r["n_users"])
        assert 5 * int(r["events_covered"]) >= 4 * int(r["n_events"])


def test_metricity_bounds():
    got = _run("emb_metricity_audit")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_violations"]) <= int(r["n_triples"])
        assert int(r["rate_micro"]) <= 1_000_001


def test_temporal_centroid():
    got = _run("events_temporal_centroid")
    if len(got):
        assert len(got) == 1


def test_exclusivity_bounds():
    got = _run("docs_vocab_exclusivity")
    if len(got):
        assert (got["n_exclusive"] <= got["n_types"]).all()
        assert (got["excl_token_share_micro"] <= 1_000_001).all()


def test_persistence_bounds():
    got = _run("users_activity_persistence")
    if len(got):
        assert (got["r_micro"].abs() <= 1_000_001).all()


def test_cron_detector_bounds():
    got = _run("events_cron_detector")
    if len(got):
        r = got.iloc[0]
        assert 0 <= int(r["top_minute"]) <= 59
        assert int(r["top_share_micro"]) >= 16_666  # >= 1/60


def test_monotonicity_closure():
    got = _run("part_size_price_monotonicity")
    if len(got):
        r = got.iloc[0]
        k = int(r["n_sizes"])
        assert int(r["n_adjacent_violations"]) <= k - 1
        assert int(r["n_inversions"]) <= k * (k - 1) // 2


def test_arch_lm_bounds():
    got = _run("events_arch_lm")
    if len(got):
        assert (got["r_micro"].abs() <= 1_000_001).all()
        assert (got["lm_micro"] >= 0).all()


def test_return_intervals_positive():
    got = _run("events_return_intervals")
    if len(got):
        assert (got["mean_interval_milli"] > 0).all()
        assert (got["theory_milli"] > 0).all()


def test_intra_order_price_closure():
    got = _run("lineitem_intra_order_price_variance")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_varying"]) <= int(r["n_multi"]) <= int(
            r["n_groups"]
        )


def test_corr_summary_ordering():
    got = _run("events_type_corr_summary")
    if len(got):
        r = got.iloc[0]
        assert int(r["min_r_micro"]) <= int(r["max_r_micro"])
        assert int(r["mean_abs_r_micro"]) <= 1_000_001


def test_subsecond_batching_bounds():
    got = _run("events_subsecond_batching")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_multi"]) <= int(r["n_active"])
        assert int(r["poisson_share_micro"]) <= 1_000_001


def test_dup_length_bias_defined():
    got = _run("docs_dup_length_bias")
    if len(got):
        r = got.iloc[0]
        assert int(r["diff_milli"]) == int(r["mean_len_dup_milli"]) - int(
            r["mean_len_unique_milli"]
        )


def test_eccentricity_bounds():
    got = _run("nation_eccentricity")
    if len(got):
        r0 = got.iloc[0]
        assert (got["ecc"] <= int(r0["diameter"])).all()
        assert (got["ecc"] >= int(r0["radius"])).all()


def test_peak_concurrency_bounds():
    got = _run("events_peak_concurrency")
    if len(got):
        r = got.iloc[0]
        assert 1 <= int(r["peak_count"]) <= int(r["n_events"])


def test_rank_shift_closure():
    got = _run("events_type_quantile_rank_shift")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_discordant"]) + int(r["n_tied"]) <= int(r["n_pairs"])


def test_double_jeopardy_defined():
    got = _run("part_brand_double_jeopardy")
    if len(got):
        assert (got["r_micro"].abs() <= 1_000_001).all()


def test_opening_outcome_closure():
    got = _run("conv_opening_outcome")
    if len(got):
        assert (got["n_resolved"] <= got["n_convs"]).all()
        assert set(got["opened_with_error"]) <= {0, 1}


def test_position_bias_bounds():
    got = _run("docs_token_position_bias")
    if len(got):
        assert len(got) <= 20
        assert (got["relpos_micro"] >= 0).all()
        assert (got["relpos_micro"] <= 1_000_001).all()


def test_hapax_census_closure():
    got = _run("docs_hapax_density_census")
    if len(got):
        assert abs(int(got["share_micro"].sum()) - 1_000_000) <= len(got) + 1
        assert (got["density_decile"] <= 9).all()


def test_anscombe_flags():
    got = _run("events_anscombe_check")
    if len(got):
        assert set(got["improved"]) <= {0, 1}
        assert (got["ratio_raw_micro"] >= 1_000_000).all()
        assert (got["ratio_anscombe_micro"] >= 1_000_000).all()


def test_reorder_hazard_risk_monotone():
    got = _run("customer_reorder_hazard")
    if len(got) > 1:
        g = got.sort_values("week")
        assert (np.diff(g["n_at_risk"].to_numpy(np.int64)) <= 0).all()
        assert (g["n_events"] <= g["n_at_risk"]).all()


def test_duplicate_names_closure():
    got = _run("part_duplicate_names")
    if len(got):
        r = got.iloc[0]
        assert int(r["n_dup_names"]) <= int(r["n_names"])
        assert int(r["n_parts_in_dups"]) >= 2 * int(r["n_dup_names"]) or \
            int(r["n_dup_names"]) == 0


def test_type_switching_bounds():
    got = _run("users_type_switching")
    if len(got):
        assert (got["obs_switch_micro"] <= 1_000_001).all()
        assert (got["exp_switch_micro"] <= 1_000_001).all()


def test_brand_type_association_bounds():
    got = _run("part_brand_type_association")
    if len(got):
        assert (got["v_micro"] <= 1_000_001).all()
        assert (got["chi2_micro"] >= 0).all()


def test_mutual_best_symmetry():
    got = _run("nation_mutual_best")
    if len(got):
        assert (got["w_ab"] > 0).all()
        assert (got["w_ba"] > 0).all()


def test_binding_rules_closure():
    got = _run("docs_gopher_binding_rules")
    if len(got):
        assert (got["n_sole_fail"] <= got["n_fail_rule"]).all()
        assert (got["n_fail_rule"] <= got["n_fail_total"]).all()
        assert len(got) == 4
