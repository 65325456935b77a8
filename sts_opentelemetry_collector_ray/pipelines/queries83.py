"""Driver-contract queries, wave 83 — customer cohort LTV (first-order-month
cohorts × month offset: active customers and exact micro revenue — the
lifetime-value curve behind retention economics) and hashing-trick feature
encoding (FNV-bucketed (event_type × hour-of-day) crosses per user — the
fixed-width categorical encoder for downstream models). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly.

The feature-hash oracle replays fnv1a32 in SQL with the `_FNV32_DOC`
list_reduce idiom over the cross string (ASCII-safe)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES83: dict[str, str] = {}

_LTV_BUCKETS = 64
_FH_BINS = 64
_FH_BUCKETS = 64
_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# customer_cohort_ltv — cohort month × offset revenue curve
# ---------------------------------------------------------------------------


def q_customer_cohort_ltv(sf_dir: str):
    """Cohort LTV: cohort = the customer's first order month; for every
    (cohort_month, month_offset) cell, the distinct active customers and the
    exact micro revenue (o_totalprice quantized per row).

    Scale shape: (cust, month, price-micro) rows share ONE custkey-bucket
    exchange; each bucket derives first months locally (it owns its
    customers), converts to offsets and emits per-(cohort, offset) integer
    partials — the driver re-reduces |months|² bounded cells."""

    def rows(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        c = t["o_custkey"].to_numpy().astype(np.int64)
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        tp = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "c": c,
                "ym": y * 12 + (m - 1),
                "tp": tp,
                "_b": (c % _LTV_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("c", sort=False)["ym"].min()
        f = first.reindex(g["c"]).to_numpy(np.int64)
        ym = g["ym"].to_numpy(np.int64)
        coh = f // 12 * 100 + (f % 12) + 1  # YYYYMM
        off = ym - f
        df = pd.DataFrame(
            {"coh": coh, "off": off, "c": g["c"].to_numpy(np.int64),
             "tp": g["tp"].to_numpy(np.int64)}
        )
        out = df.groupby(["coh", "off"], sort=False).agg(
            n_cust=("c", "nunique"), rev=("tp", "sum")
        )
        out = out.reset_index()
        return pd.DataFrame(
            {
                "coh": out["coh"].to_numpy(np.int64),
                "off": out["off"].to_numpy(np.int64),
                "n_cust": out["n_cust"].to_numpy(np.int64),
                "rev": out["rev"].to_numpy(np.int64),
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |months|² cells per bucket
        .groupby(["coh", "off"], as_index=False)[["n_cust", "rev"]]
        .sum()
        .sort_values(["coh", "off"], kind="mergesort")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "cohort_month": part["coh"].to_numpy(np.int64),
            "month_offset": part["off"].to_numpy(np.int64),
            "n_customers": part["n_cust"].to_numpy(np.int64),
            "revenue_micro": part["rev"].to_numpy(np.int64),
        }
    )


ORACLES83["customer_cohort_ltv"] = """
WITH o AS (
  SELECT o_custkey AS c,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS ym,
         CAST(floor(o_totalprice * 1000000 + 0.5) AS HUGEINT) AS tp
  FROM orders
),
f AS (SELECT c, min(ym) AS f0 FROM o GROUP BY 1)
SELECT CAST(f0 // 12 * 100 + (f0 % 12) + 1 AS BIGINT) AS cohort_month,
       CAST(ym - f0 AS BIGINT) AS month_offset,
       CAST(count(DISTINCT o.c) AS BIGINT) AS n_customers,
       CAST(sum(tp) AS BIGINT) AS revenue_micro
FROM o JOIN f ON f.c = o.c
GROUP BY 1, 2 ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# events_feature_hashing — FNV-bucketed (type × hour-of-day) crosses
# ---------------------------------------------------------------------------


def q_events_feature_hashing(sf_dir: str):
    """The hashing trick: the categorical cross ``event_type:hour_of_day``
    maps to bin fnv1a32(cross) % {B}; per (user, bin), the event count — a
    fixed-width sparse feature matrix in long form.

    Scale shape: per-batch combiner partials (user, bin, n) — the cross
    string builds with ONE Arrow binary_join kernel and hashes with the
    vectorized Arrow-buffer FNV — then ONE user-bucket exchange where each
    bucket re-reduces its users and emits final rows.""".format(B=_FH_BINS)
    from ..functions.hashing import fnv1a32_array

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        hod = (t["ts"].cast(pa.int64()).to_numpy() // _HOUR_US) % 24
        cross = pc.binary_join_element_wise(
            t["event_type"],
            pa.array(hod.astype("U2").astype(object), pa.string()),
            ":",
        )
        bins = (fnv1a32_array(cross) % np.uint64(_FH_BINS)).astype(np.int64)
        u = t["user_id"].to_numpy().astype(np.int64)
        g = (
            pd.DataFrame({"u": u, "bin": bins})
            .groupby(["u", "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        g["_b"] = (g["u"].to_numpy(np.int64) % _FH_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "bin"], sort=False, as_index=False)["n"].sum()
        return pd.DataFrame(
            {
                "user_id": out["u"].to_numpy(np.int64),
                "bin": out["bin"].to_numpy(np.int64),
                "n": out["n"].to_numpy(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


_FNV32_CROSS = (
    "list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(event_type || ':' "
    "|| CAST(epoch_us(ts) // {h} % 24 AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296) % {b}"
).format(h=_HOUR_US, b=_FH_BINS)

ORACLES83["events_feature_hashing"] = f"""
SELECT user_id, CAST({_FNV32_CROSS} AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2 ORDER BY 1, 2"""


QUERIES83 = {
    "customer_cohort_ltv": q_customer_cohort_ltv,
    "events_feature_hashing": q_events_feature_hashing,
}
