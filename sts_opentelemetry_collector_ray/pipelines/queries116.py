"""Driver-contract queries, wave 116 — order-amount reconciliation (per
order, the header total vs the sum of its line gross amounts: the ledger
audit that catches partial loads and double-applied discounts) and price
points (the .00 / .99 cents-ending profile per event type — the
rounded-data / psychological-pricing detector). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES116: dict[str, str] = {}

_REC_BUCKETS = 64
_REC_TOL_BP = 100  # within-tolerance = |dev| ≤ 1% of the header total


# ---------------------------------------------------------------------------
# orders_amount_reconciliation — header vs line-sum deviation audit
# ---------------------------------------------------------------------------


def q_orders_amount_reconciliation(sf_dir: str):
    """Reconciliation: per order, dev = header cents − Σ line gross cents
    (extendedprice, undiscounted); the report counts orders reconciling
    within {T} bp of the header and the exact mean absolute deviation in
    micro-cents. Orders without lines are excluded (nothing to reconcile
    against).

    Scale shape: lineitem pre-sums per (orderkey) inside each batch; header
    rows join through ONE tagged orderkey-bucket exchange; only
    (n, n_within, Σ|dev|) scalars leave each bucket.""".format(T=_REC_TOL_BP)

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = pd.DataFrame({"k": k, "line": cents}).groupby("k", sort=False).sum()
        g = g.reset_index()
        g["hdr"] = np.int64(-1)
        g["_b"] = (g["k"] % _REC_BUCKETS).astype(np.int64)
        return g[["k", "line", "hdr", "_b"]]

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "line": np.zeros(len(k), np.int64),
                "hdr": cents,
                "_b": (k % _REC_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["hdr"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "hdr"]]
        li = g.loc[~is_o, ["k", "line"]].groupby("k", sort=False).sum().reset_index()
        m = o.merge(li, on="k")
        if m.empty:
            return pd.DataFrame(
                {
                    "n": pd.Series([], dtype=np.int64),
                    "n_within": pd.Series([], dtype=np.int64),
                    "abs_dev": pd.Series([], dtype=np.int64),
                }
            )
        hdr = m["hdr"].to_numpy(np.int64)
        dev = hdr - m["line"].to_numpy(np.int64)
        within = np.abs(dev) * 10_000 <= _REC_TOL_BP * hdr
        return pd.DataFrame(
            {
                "n": np.array([len(m)], np.int64),
                "n_within": np.array([int(within.sum())], np.int64),
                "abs_dev": np.array([int(np.abs(dev).sum())], np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o).groupby("_b").map_groups(merge, batch_format="pandas").to_pandas()
    )  # bounded: one scalar row per bucket
    n = int(part["n"].sum())
    w = int(part["n_within"].sum())
    s = int(part["abs_dev"].sum())
    return pd.DataFrame(
        {
            "n_orders": np.array([n], np.int64),
            "n_within_tol": np.array([w], np.int64),
            "within_bp": np.array([w * 10_000 // max(n, 1)], np.int64),
            "mad_micro": np.array([s * 1_000_000 // max(n, 1)], np.int64),
        }
    )


ORACLES116["orders_amount_reconciliation"] = f"""
WITH li AS (
  SELECT l_orderkey AS k,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT))
              AS HUGEINT) AS line
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT CAST(floor(o.o_totalprice * 100 + 0.5) AS HUGEINT) AS hdr, li.line
  FROM orders o JOIN li ON li.k = o.o_orderkey
),
s AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(count(*) FILTER (abs(hdr - line) * 10000
                               <= {_REC_TOL_BP} * hdr) AS HUGEINT) AS w,
         CAST(sum(abs(hdr - line)) AS HUGEINT) AS s
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(w AS BIGINT) AS n_within_tol,
       CAST(w * 10000 // greatest(n, 1) AS BIGINT) AS within_bp,
       CAST(s * 1000000 // greatest(n, 1) AS BIGINT) AS mad_micro
FROM s"""


# ---------------------------------------------------------------------------
# events_price_points — cents-ending profile per event type
# ---------------------------------------------------------------------------


def q_events_price_points(sf_dir: str):
    """Price points: per event type, the share of values ending in .00
    (round dollars) and .99 (charm pricing) in exact basis points — a
    spiking .00 share flags upstream rounding/truncation, a spiking .99
    flags injected retail data.

    Scale shape: per-batch (type, n, n00, n99) combiner partials — |types|
    rows per block — fold on the driver; no shuffle."""

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        e = cents % 100
        g = (
            pd.DataFrame(
                {
                    "event_type": et,
                    "n": 1,
                    "n00": (e == 0).astype(np.int64),
                    "n99": (e == 99).astype(np.int64),
                }
            )
            .groupby("event_type", sort=False)
            .sum()
            .reset_index()
        )
        return g.astype({"n": np.int64, "n00": np.int64, "n99": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type")[["n", "n00", "n99"]]
        .sum()
        .sort_index()
        .reset_index()
    )
    n = part["n"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "event_type": part["event_type"].to_numpy(object),
            "n": n,
            "pct00_bp": part["n00"].to_numpy(np.int64) * 10_000 // np.maximum(n, 1),
            "pct99_bp": part["n99"].to_numpy(np.int64) * 10_000 // np.maximum(n, 1),
        }
    )


ORACLES116["events_price_points"] = """
WITH e AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) % 100 AS ending
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (ending = 0) * 10000
            // greatest(count(*), 1) AS BIGINT) AS pct00_bp,
       CAST(count(*) FILTER (ending = 99) * 10000
            // greatest(count(*), 1) AS BIGINT) AS pct99_bp
FROM e GROUP BY 1"""


QUERIES116 = {
    "orders_amount_reconciliation": q_orders_amount_reconciliation,
    "events_price_points": q_events_price_points,
}
