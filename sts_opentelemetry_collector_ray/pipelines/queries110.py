"""Driver-contract queries, wave 110 — supplier scorecard (a rank composite
over revenue, return rate and mean discount: the vendor-management report
that needs three metrics reduced and ranked consistently) and priority
mix-shift decomposition (Oaxaca split of the YoY change in average order
value into mix vs within-group effects — the structural-change readout
finance reviews ask for). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES110: dict[str, str] = {}

_SC_BUCKETS = 32
_SC_TOPK = 20
_MS_Y1 = "1996"
_MS_Y2 = "1997"
_OFF = 1_000_000_000_000_000_000  # floor-vs-truncate offset (negative //)


# ---------------------------------------------------------------------------
# supplier_scorecard — composite rank over three lineitem metrics
# ---------------------------------------------------------------------------


def q_supplier_scorecard(sf_dir: str):
    """Vendor scorecard: per supplier, exact revenue micro-dollars, return
    share (l_returnflag='R') in bp, and mean discount in micro; each metric
    ranked (revenue DESC = good, returns ASC = good, discount ASC = good;
    ties → lower suppkey) and the top-{K} by composite rank sum (ties →
    suppkey) reported.

    Scale shape: per-batch (supp, rev, n, n_ret, disc) combiner partials →
    ONE suppkey-bucket exchange for the exact re-reduce; the supplier
    DIMENSION is bounded (reference operators treat it as the broadcast
    side), so the final rank runs on the driver over |suppliers|
    rows.""".format(K=_SC_TOPK)

    def partial(t: pa.Table) -> pd.DataFrame:
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        ret = (
            np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False)) == "R"
        ).astype(np.int64)
        rev = cents * (100 - dpct) * 100
        df = pd.DataFrame({"s": s, "rev": rev, "n": 1, "n_ret": ret, "disc": dpct})
        g = df.groupby("s", sort=False).sum().reset_index()
        g["_b"] = (g["s"] % _SC_BUCKETS).astype(np.int64)
        return g.astype(np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("s", sort=False)[["rev", "n", "n_ret", "disc"]]
            .sum()
            .reset_index()
            .astype(np.int64)
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_returnflag"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |suppliers| rows (dimension side)
        .groupby("s")[["rev", "n", "n_ret", "disc"]]
        .sum()
        .reset_index()
    )
    s = part["s"].to_numpy(np.int64)
    rev = part["rev"].to_numpy(np.int64)
    n = part["n"].to_numpy(np.int64)
    ret_bp = part["n_ret"].to_numpy(np.int64) * 10_000 // n
    disc_micro = part["disc"].to_numpy(np.int64) * 1_000_000 // n

    def rank(keys, asc: bool):
        order = np.lexsort((s, keys if asc else -keys))
        r = np.empty(len(s), np.int64)
        r[order] = np.arange(1, len(s) + 1)
        return r

    r_rev = rank(rev, asc=False)
    r_ret = rank(ret_bp, asc=True)
    r_disc = rank(disc_micro, asc=True)
    comp = r_rev + r_ret + r_disc
    top = np.lexsort((s, comp))[:_SC_TOPK]
    return pd.DataFrame(
        {
            "suppkey": s[top],
            "revenue_micro": rev[top],
            "return_bp": ret_bp[top],
            "disc_micro": disc_micro[top],
            "rank_rev": r_rev[top],
            "rank_ret": r_ret[top],
            "rank_disc": r_disc[top],
            "composite": comp[top],
        }
    ).astype(np.int64)


ORACLES110["supplier_scorecard"] = f"""
WITH m AS (
  SELECT l_suppkey AS suppkey,
         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                  * 100) AS BIGINT) AS revenue_micro,
         CAST(count(*) FILTER (l_returnflag = 'R') * 10000
              // count(*) AS BIGINT) AS return_bp,
         CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) * 1000000
              // count(*) AS BIGINT) AS disc_micro
  FROM lineitem GROUP BY 1
),
r AS (
  SELECT *,
         row_number() OVER (ORDER BY revenue_micro DESC, suppkey) AS rank_rev,
         row_number() OVER (ORDER BY return_bp ASC, suppkey) AS rank_ret,
         row_number() OVER (ORDER BY disc_micro ASC, suppkey) AS rank_disc
  FROM m
)
SELECT suppkey, revenue_micro, return_bp, disc_micro,
       CAST(rank_rev AS BIGINT) AS rank_rev,
       CAST(rank_ret AS BIGINT) AS rank_ret,
       CAST(rank_disc AS BIGINT) AS rank_disc,
       CAST(rank_rev + rank_ret + rank_disc AS BIGINT) AS composite
FROM r
ORDER BY composite, suppkey LIMIT {_SC_TOPK}"""


# ---------------------------------------------------------------------------
# orders_mix_shift — Oaxaca decomposition of YoY average order value
# ---------------------------------------------------------------------------


def q_orders_mix_shift(sf_dir: str):
    """Mix-shift: Δ(avg order cents {Y2} vs {Y1}) per priority splits into
    mix = (share₂ − share₁)·m₁ and within = share₂·(m₂ − m₁) — exact
    telescoping rationals (the kpi_tree technique), each floored to micro
    cents independently. Priorities missing from either year are excluded
    by contract (their m₁/m₂ is undefined).

    Scale shape: per-batch (year, priority, n, Σcents) combiner partials —
    bounded |priorities|×2 per block — fold on the driver with Python
    Fractions; no shuffle.""".format(Y1=_MS_Y1, Y2=_MS_Y2)
    from fractions import Fraction

    y1, y2 = int(_MS_Y1), int(_MS_Y2)

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t["o_orderdate"].cast(pa.int64()).to_numpy()
        yr = d.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
        m = (yr == y1) | (yr == y2)
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False)[m] * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "yr": yr[m],
                "pri": np.asarray(
                    t["o_orderpriority"].to_numpy(zero_copy_only=False)
                )[m],
                "v": cents,
            }
        )
        g = df.groupby(["yr", "pri"], sort=False)["v"].agg(["size", "sum"]).reset_index()
        g.columns = ["yr", "pri", "n", "s"]
        return g.astype({"n": np.int64, "s": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderpriority", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["yr", "pri"])[["n", "s"]]
        .sum()
    )
    n1 = int(part.xs(y1)["n"].sum()) if y1 in part.index.get_level_values(0) else 0
    n2 = int(part.xs(y2)["n"].sum()) if y2 in part.index.get_level_values(0) else 0
    rows = []
    if n1 and n2:
        p1 = part.xs(y1)
        p2 = part.xs(y2)
        for pri in sorted(set(p1.index) & set(p2.index)):
            n1p, s1p = int(p1.loc[pri, "n"]), int(p1.loc[pri, "s"])
            n2p, s2p = int(p2.loc[pri, "n"]), int(p2.loc[pri, "s"])
            mix = (Fraction(n2p, n2) - Fraction(n1p, n1)) * Fraction(s1p, n1p)
            within = Fraction(n2p, n2) * (Fraction(s2p, n2p) - Fraction(s1p, n1p))
            rows.append(
                {
                    "priority": pri,
                    "share1_bp": n1p * 10_000 // n1,
                    "share2_bp": n2p * 10_000 // n2,
                    "mix_micro": (mix.numerator * 1_000_000) // mix.denominator,
                    "within_micro": (within.numerator * 1_000_000)
                    // within.denominator,
                }
            )
    out = pd.DataFrame(
        rows, columns=["priority", "share1_bp", "share2_bp", "mix_micro", "within_micro"]
    )
    for c in ["share1_bp", "share2_bp", "mix_micro", "within_micro"]:
        out[c] = out[c].astype(np.int64)
    return out


ORACLES110["orders_mix_shift"] = f"""
WITH e AS (
  SELECT year(o_orderdate) AS yr, o_orderpriority AS priority,
         CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) AS v
  FROM orders WHERE year(o_orderdate) IN ({_MS_Y1}, {_MS_Y2})
),
p AS (
  SELECT yr, priority, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(v) AS HUGEINT) AS s
  FROM e GROUP BY 1, 2
),
tot AS (SELECT yr, CAST(sum(n) AS HUGEINT) AS nt FROM p GROUP BY 1),
j AS (
  SELECT a.priority,
         a.n AS n1p, a.s AS s1p, b.n AS n2p, b.s AS s2p,
         t1.nt AS n1, t2.nt AS n2
  FROM p a JOIN p b ON a.priority = b.priority
       AND a.yr = {_MS_Y1} AND b.yr = {_MS_Y2}
  JOIN tot t1 ON t1.yr = {_MS_Y1}
  JOIN tot t2 ON t2.yr = {_MS_Y2}
)
SELECT priority,
       CAST(n1p * 10000 // n1 AS BIGINT) AS share1_bp,
       CAST(n2p * 10000 // n2 AS BIGINT) AS share2_bp,
       CAST(((n2p * n1 - n1p * n2) * s1p * 1000000
             + {_OFF} * (n2 * n1 * n1p)) // (n2 * n1 * n1p)
            - {_OFF} AS BIGINT) AS mix_micro,
       CAST(((s2p * n1p - s1p * n2p) * 1000000
             + {_OFF} * (n2 * n1p)) // (n2 * n1p)
            - {_OFF} AS BIGINT) AS within_micro
FROM j"""


QUERIES110 = {
    "supplier_scorecard": q_supplier_scorecard,
    "orders_mix_shift": q_orders_mix_shift,
}
