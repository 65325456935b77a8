"""Driver-contract queries, wave 84 — Laspeyres monthly price index (fixed
base-month basket, ALL-INTEGER unit prices and products: the inflation-style
price monitor over lineitem) and HLL accuracy report (exact vs sketch
distinct counts with micro relative error — the sketch-evaluation readout
every approximate pipeline should ship). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES84: dict[str, str] = {}

_IDX_BASE = 199601  # base month YYYYMM
_IDX_BUCKETS = 32
_HLL_BUCKETS = 64


# ---------------------------------------------------------------------------
# lineitem_price_index — Laspeyres index vs the base month
# ---------------------------------------------------------------------------


def q_lineitem_price_index(sf_dir: str):
    """Laspeyres price index: per month t, over the parts traded BOTH in t
    and in the base month 1996-01,
    L_t = Σ p_t(p)·q₀(p) / Σ p₀(p)·q₀(p), with unit prices in exact milli
    units p(p) = (Σext_micro · 1000) // Σqty_micro and base quantities in
    whole units — every product and both sums are exact integers; one final
    integer floor-division yields index_micro.

    Scale shape: per-batch (part, month) integer partials share ONE
    partkey-bucket exchange; each bucket owns its parts, forms matched
    (t ∩ base) products locally and emits per-month (num, den) partials —
    the driver re-reduces |months| rows in Python ints (overflow-free)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        pk = t["l_partkey"].to_numpy().astype(np.int64)
        y = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(t["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        ext = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"pk": pk, "mon": y * 100 + m, "q": qty, "x": ext})
            .groupby(["pk", "mon"], sort=False, as_index=False)
            .sum()
        )
        return pd.DataFrame(
            {
                "pk": g["pk"].to_numpy(np.int64),
                "mon": g["mon"].to_numpy(np.int64),
                "q": g["q"].to_numpy(np.int64),
                "x": g["x"].to_numpy(np.int64),
                "_b": (g["pk"].to_numpy(np.int64) % _IDX_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["pk", "mon"], sort=False, as_index=False)[["q", "x"]].sum()
        s["p_milli"] = (s["x"].to_numpy(np.int64) * 1000) // s["q"].to_numpy(
            np.int64
        )
        base = s[s["mon"] == _IDX_BASE][["pk", "p_milli", "q"]].rename(
            columns={"p_milli": "p0", "q": "q0m"}
        )
        base["q0"] = base["q0m"].to_numpy(np.int64) // 1_000_000
        j = s.merge(base[["pk", "p0", "q0"]], on="pk")
        num = j["p_milli"].to_numpy(np.int64) * j["q0"].to_numpy(np.int64)
        den = j["p0"].to_numpy(np.int64) * j["q0"].to_numpy(np.int64)
        out = (
            pd.DataFrame({"mon": j["mon"].to_numpy(np.int64), "num": num,
                          "den": den})
            .groupby("mon", sort=False, as_index=False)
            .sum()
        )
        return pd.DataFrame(
            {
                "mon": out["mon"].to_numpy(np.int64),
                "num": out["num"].to_numpy(np.int64),
                "den": out["den"].to_numpy(np.int64),
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |months| rows per bucket
        .groupby("mon", as_index=False)[["num", "den"]]
        .sum()
        .sort_values("mon", kind="mergesort")
    )
    idx = [
        int(int(n) * 1_000_000 // int(d)) if d else 0
        for n, d in zip(part["num"], part["den"])
    ]
    return pd.DataFrame(
        {
            "ship_month": part["mon"].to_numpy(np.int64),
            "n_basket_value": part["den"].to_numpy(np.int64),
            "index_micro": np.array(idx, np.int64),
        }
    )


ORACLES84["lineitem_price_index"] = f"""
WITH s AS (
  SELECT l_partkey AS pk,
         CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS mon,
         sum(CAST(floor(l_quantity * 1000000 + 0.5) AS HUGEINT)) AS q,
         sum(CAST(floor(l_extendedprice * 1000000 + 0.5) AS HUGEINT)) AS x
  FROM lineitem GROUP BY 1, 2
),
p AS (SELECT pk, mon, q, (x * 1000) // q AS p_milli FROM s),
base AS (
  SELECT pk, p_milli AS p0, q // 1000000 AS q0
  FROM p WHERE mon = {_IDX_BASE}
),
j AS (
  SELECT p.mon, sum(p.p_milli * base.q0) AS num,
         sum(base.p0 * base.q0) AS den
  FROM p JOIN base ON base.pk = p.pk
  GROUP BY 1
)
SELECT mon AS ship_month, CAST(den AS BIGINT) AS n_basket_value,
       CAST(CASE WHEN den = 0 THEN 0
                 ELSE (num * 1000000) // den END AS BIGINT) AS index_micro
FROM j ORDER BY ship_month"""


# ---------------------------------------------------------------------------
# events_hll_error — sketch-accuracy report (exact vs HLL distinct)
# ---------------------------------------------------------------------------


def q_events_hll_error(sf_dir: str):
    """Sketch evaluation: per event type, the EXACT distinct-user count (a
    user-bucket distinct exchange), the HLL(p=6) estimate (the oracled
    sketch from stages/sketches.py), and the micro relative error
    floor(|est − exact| / exact · 1e6 + 0.5).

    Scale shape: exact side = per-batch distinct (type, user) partials →
    user-bucket exchange → per-type counts (types bounded); sketch side =
    the existing ≤ |types|·64-register merge. Driver joins two tiny
    tables."""
    from ..stages.sketches import hll_distinct

    def d_partial(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "typ": np.asarray(t["event_type"].to_numpy(zero_copy_only=False)),
                "u": t["user_id"].to_numpy().astype(np.int64),
            }
        ).drop_duplicates()
        g["_b"] = (g["u"].to_numpy(np.int64) % _HLL_BUCKETS).astype(np.int64)
        return g

    def d_merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g[["typ", "u"]].drop_duplicates()
        out = gg.groupby("typ", sort=False).size()
        return pd.DataFrame(
            {
                "typ": out.index.to_numpy(object),
                "n": out.to_numpy(np.int64),
            }
        )

    exact = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        )
        .map_batches(d_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(d_merge, batch_format="pandas")
        .to_pandas()  # bounded: |types| rows per bucket
        .groupby("typ", as_index=False)["n"]
        .sum()
    )
    est = hll_distinct(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        ),
        "event_type",
        "user_id",
    ).to_pandas()
    j = exact.merge(est, left_on="typ", right_on="event_type").sort_values(
        "typ", kind="mergesort"
    )
    ex = j["n"].to_numpy(np.int64)
    es = j["est_distinct"].to_numpy(np.float64)
    err = np.floor(np.abs(es - ex) / ex * 1_000_000.0 + 0.5).astype(np.int64)
    return pd.DataFrame(
        {
            "event_type": j["typ"].astype(object),
            "n_exact": ex,
            "est_distinct": es,
            "err_micro": err,
        }
    )


def _hll_error_oracle() -> str:
    from .queries5 import ORACLES5

    approx = ORACLES5["events_approx_distinct"]
    return f"""
WITH exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY 1
),
approx AS (SELECT * FROM ({approx}) t)
SELECT e.event_type, e.n_exact, a.est_distinct,
       CAST(floor(abs(a.est_distinct - e.n_exact) / e.n_exact * 1000000 + 0.5)
            AS BIGINT) AS err_micro
FROM exact e JOIN approx a ON a.event_type = e.event_type
ORDER BY e.event_type"""


ORACLES84["events_hll_error"] = _hll_error_oracle()


QUERIES84 = {
    "lineitem_price_index": q_lineitem_price_index,
    "events_hll_error": q_events_hll_error,
}
