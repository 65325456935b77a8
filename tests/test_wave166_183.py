"""Edge-case tests for waves 166-183 (the gap between the 152-165 and
184-192 batches): chi-square positivity, heatmap/mix share closure,
dedup-vocab survival bounds, decile closure, Pearson bounds, Jaccard
bounds, whale-concentration ordering, dimension-census consistency,
failure-rate bounds, calendar-gap arithmetic, cluster-size closure,
Wilson-bound ordering, SLO monotonicity, ANOVA eta² bounds, continuity
arithmetic, transition-matrix sanity, char-class closure. Value contracts
are enforced by the parametrized oracle gate; these pin semantics."""

import numpy as np
import pandas as pd

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
MICRO = 1_000_000


def _run(name, path=SF):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def _shares_close(shares, group_sizes):
    """rounded per-group shares must land within n_cells of 1e6 (floor
    rounding undershoots; half-up can overshoot by one per cell)."""
    assert (shares <= MICRO + group_sizes).all()
    assert (shares >= MICRO - group_sizes).all()


def test_segment_independence_chi2():
    got = _run("customer_segment_independence")
    assert (got["chi2_micro"] >= 0).all()
    assert (got["dof"] > 0).all()


def test_qty_price_heatmap_share_closure():
    got = _run("lineitem_qty_price_heatmap")
    assert got["share_micro"].between(0, MICRO).all()
    total = got["share_micro"].sum()
    assert MICRO - len(got) <= total <= MICRO


def test_dedup_vocab_survival():
    got = _run("docs_dedup_vocab_impact")
    assert (got["n_dedup"] <= got["n_raw"]).all()
    assert got["survival_micro"].between(0, MICRO).all()
    assert set(got["rank"]) == set(range(1, len(got) + 1))


def test_value_deciles_closure():
    got = _run("users_value_deciles")
    assert set(got["decile"]) <= set(range(1, 11))
    assert (got["n_users"] > 0).all()
    total = got["value_share_micro"].sum()
    assert MICRO - len(got) <= total <= MICRO


def test_balance_volume_pearson_bounds():
    got = _run("supplier_balance_vs_volume")
    assert got["pearson_micro"].between(-MICRO, MICRO).all()


def test_echo_rate_bounds():
    got = _run("conv_echo_rate")
    assert got["jaccard_micro"].between(0, MICRO).all()
    assert (got["n_user_words"] > 0).all()
    assert (got["n_assistant_words"] > 0).all()


def test_yearly_whales_ordering():
    got = _run("orders_yearly_whales")
    assert (got["top_cents"] <= got["total_cents"]).all()
    assert got["concentration_micro"].between(1, MICRO).all()


def test_dimension_census_consistency():
    got = _run("part_dimension_census")
    assert (got["n_brands"] <= got["n_parts"]).all()
    assert (got["n_sizes"] >= 1).all()
    assert (got["avg_size_micro"] > 0).all()


def test_arg_failure_bounds():
    got = _run("tools_arg_failure")
    assert (got["n_errors"] <= got["n_calls"]).all()
    assert got["failure_micro"].between(0, MICRO).all()


def test_calendar_gap_arithmetic():
    got = _run("orders_calendar_gaps")
    r = got.iloc[0]
    assert int(r["n_active_days"]) + int(r["n_missing_days"]) == int(
        r["span_days"]
    )
    assert int(r["longest_gap"]) <= int(r["n_missing_days"])


def test_cluster_size_histogram_closure():
    got = _run("docs_cluster_size_histogram")
    assert (got["cluster_size"] >= 2).all()
    assert (got["n_docs"] == got["cluster_size"] * got["n_clusters"]).all()


def test_debt_wilson_ordering():
    got = _run("customer_debt_wilson")
    # the Wilson lower bound never exceeds the point estimate
    assert (got["wilson_lb"] <= got["debt_rate"]).all()
    assert (got["n_neg"] <= got["n"]).all()


def test_slo_monotone():
    got = _run("sg_slo_attainment")
    assert (got["within_500ms"] <= got["within_2s"]).all()
    assert (got["within_2s"] <= got["n_calls"]).all()
    assert (got["slo_500ms_micro"] <= got["slo_2s_micro"]).all()


def test_route_daily_volume_shares():
    got = _run("route_daily_volume")
    assert got["in_sink_micro"].between(0, MICRO).all()
    for _, g in got.groupby("sink"):
        _shares_close(pd.Series([g["in_sink_micro"].sum()]), len(g))


def test_weekly_value_mix_shares():
    got = _run("events_weekly_value_mix")
    for _, g in got.groupby("week"):
        _shares_close(pd.Series([g["in_week_micro"].sum()]), len(g))


def test_latency_cv_nonneg():
    got = _run("sg_latency_cv")
    assert (got["cv_micro"] >= 0).all()
    assert (got["n_calls"] > 0).all()


def test_returns_by_discount_bounds():
    got = _run("lineitem_returns_by_discount")
    assert (got["n_returned"] <= got["n_lines"]).all()
    assert got["return_micro"].between(0, MICRO).all()


def test_role_tool_matrix_shares():
    got = _run("conv_role_tool_matrix")
    assert got["in_role_micro"].between(1, MICRO).all()
    assert (got["n_turns"] > 0).all()


def test_resolution_rate_bounds():
    got = _run("conv_resolution_rate")
    assert (got["n_resolved"] <= got["n_convs"]).all()
    assert got["resolution_micro"].between(0, MICRO).all()


def test_hour_entropy_bounds():
    got = _run("events_hour_entropy")
    # entropy over a 24-slot alphabet is bounded by ln 24 (micro or nats)
    assert (got["entropy"] >= 0).all()
    assert (got["entropy"] <= 3_178_055).all()


def test_max_order_share_ordering():
    got = _run("nation_max_order_share")
    assert (got["max_cents"] <= got["sum_cents"]).all()
    assert got["max_share_micro"].between(1, MICRO).all()


def test_tool_precedence():
    got = _run("conv_tool_precedence")
    assert (got["tool_a"] < got["tool_b"]).all()
    assert ((got["a_first"] + got["b_first"]) > 0).all()
    assert got["a_precedence_micro"].between(0, MICRO).all()


def test_first_error_depth():
    got = _run("conv_first_error_depth")
    assert (got["first_error_turn"] >= 0).all()
    assert (got["n_convs"] > 0).all()


def test_dow_priority_mix_shares():
    got = _run("orders_dow_priority_mix")
    assert got["dow"].between(0, 7).all()
    for _, g in got.groupby("dow"):
        _shares_close(pd.Series([g["in_dow_micro"].sum()]), len(g))


def test_id_continuity_arithmetic():
    got = _run("docs_id_continuity")
    r = got.iloc[0]
    assert int(r["n_distinct_ids"]) <= int(r["n_docs"])
    assert int(r["n_missing"]) == int(r["span"]) - int(r["n_distinct_ids"])
    assert int(r["n_dup_rows"]) == int(r["n_docs"]) - int(r["n_distinct_ids"])


def test_value_anova_eta2_bounds():
    got = _run("events_value_anova")
    assert got["eta2_micro"].between(0, MICRO).all()


def test_export_share_bounds():
    got = _run("trade_export_share")
    assert got["export_micro"].between(0, MICRO).all()
    assert (got["n_lines"] > 0).all()


def test_resolution_by_length():
    got = _run("conv_resolution_by_length")
    assert (got["n_resolved"] <= got["n_convs"]).all()


def test_role_gap_matrix():
    got = _run("conv_role_gap_matrix")
    assert (got["n_transitions"] > 0).all()
    assert (got["sum_us"] >= 0).all()
    assert (got["avg_us_micro"] >= 0).all()


def test_duration_histogram():
    got = _run("conv_duration_histogram")
    assert (got["n_turns"] >= got["n_convs"]).all()


def test_tax_profile_closure():
    got = _run("lineitem_tax_profile")
    total = got["share_micro"].sum()
    assert MICRO - len(got) <= total <= MICRO


def test_half_role_shift_bounds():
    got = _run("conv_half_role_shift")
    assert got["first_share_micro"].between(0, MICRO).all()
    assert ((got["n_first"] + got["n_second"]) > 0).all()


def test_brand_size_slope():
    got = _run("part_brand_size_slope")
    assert (got["n_parts"] >= 2).all()
    assert (got["avg_cents"] > 0).all()


def test_sev_transitions():
    got = _run("conv_sev_transitions")
    assert (got["n"] > 0).all()
    assert got["sev_from"].notna().all() and got["sev_to"].notna().all()


def test_charclass_profile_closure():
    got = _run("docs_charclass_profile")
    assert (got["chars"] > 0).all()
    for c in ("letters_micro", "digits_micro", "spaces_micro"):
        assert got[c].between(0, MICRO).all()
    assert (
        got["letters_micro"] + got["digits_micro"] + got["spaces_micro"]
        <= MICRO + 3
    ).all()
