"""Driver-contract queries, wave 290 — the Serrano disparity-filter
backbone of the directed nation trade graph (edge significance
alpha = (1-p)^(k-1) from exact integer flows) and the Lo-MacKinlay
variance-ratio test at q = 7 on the daily event series (exact integer
difference moments). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES290: dict[str, str] = {}

_BB_BUCKETS = 64


# ---------------------------------------------------------------------------
# nation_backbone — disparity filter over directed trade flows
# ---------------------------------------------------------------------------


def q_nation_backbone(sf_dir: str):
    """Serrano-Boguna-Vespignani disparity filter on the directed
    nation trade graph (w(s->c) = lineitem count): per edge the
    strength share p = w / s_out and significance
    alpha = (1 - p)^(k_out - 1); edges with alpha < 0.05 form the
    multiscale backbone (k_out = 1 edges get alpha = 1). Flows and
    degrees are EXACT integers; the power is the single float step.
    Per edge: src_nation, dst_nation, w, k_out, alpha_micro,
    significant.

    Scale shape: the `nation_trade_reciprocity` tagged orderkey-bucket
    count exchange; the |nations|^2 filter runs on the driver."""
    import ray
    import pyarrow.parquet as pq_mod

    cust = pq_mod.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    dims_ref = ray.put((c2n, s2n))

    def li_rows(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": t["l_suppkey"].to_numpy().astype(np.int64),
                "cust": np.int64(-1),
                "_b": (k % _BB_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "supp": np.int64(-1),
                "cust": t["o_custkey"].to_numpy().astype(np.int64),
                "_b": (k % _BB_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c2n_, s2n_ = ray.get(dims_ref)
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "supp"]]
        m = li.merge(o, on="k")
        s = m["supp"].map(s2n_).to_numpy(np.int64)
        c = m["cust"].map(c2n_).to_numpy(np.int64)
        keep = s != c
        out = (
            pd.DataFrame({"s": s[keep], "c": c[keep]})
            .groupby(["s", "c"], sort=False)
            .size()
            .rename("w")
            .reset_index()
        )
        out["w"] = out["w"].astype(np.int64)
        return out

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    w = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["s", "c"])["w"]
        .sum()
        .reset_index()
    )
    cols = [
        "src_nation", "dst_nation", "w", "k_out", "alpha_micro", "significant",
    ]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if w.empty:
        return empty
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    strength = w.groupby("s")["w"].sum()
    degree = w.groupby("s")["c"].size()
    rows = []
    for _, r in w.iterrows():
        s_key, c_key, wv = int(r["s"]), int(r["c"]), int(r["w"])
        st, k = int(strength.loc[s_key]), int(degree.loc[s_key])
        if k <= 1:
            alpha = 1.0
        else:
            p = float(wv) / float(st)
            alpha = (1.0 - p) ** (k - 1)
        rows.append(
            (
                names[s_key], names[c_key], np.int64(wv), np.int64(k),
                np.int64(np.floor(alpha * 1_000_000.0 + 0.5)),
                np.int64(1 if alpha < 0.05 else 0),
            )
        )
    out = pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[2:]}
    )
    return out.sort_values(["src_nation", "dst_nation"]).reset_index(drop=True)


ORACLES290["nation_backbone"] = """
WITH w AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
  GROUP BY 1, 2
),
st AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS k
  FROM w GROUP BY 1
),
e AS (
  SELECT w.src, w.dst, w.w, st.k,
         CASE WHEN st.k <= 1 THEN 1.0
              ELSE pow(1.0 - CAST(w.w AS DOUBLE) / CAST(st.s AS DOUBLE),
                       st.k - 1) END AS alpha
  FROM w JOIN st ON st.src = w.src
)
SELECT na.n_name AS src_nation, nb.n_name AS dst_nation, e.w,
       e.k AS k_out,
       CAST(floor(e.alpha * 1000000.0 + 0.5) AS BIGINT) AS alpha_micro,
       CAST(CASE WHEN e.alpha < 0.05 THEN 1 ELSE 0 END AS BIGINT)
         AS significant
FROM e
JOIN nation na ON na.n_nationkey = e.src
JOIN nation nb ON nb.n_nationkey = e.dst
ORDER BY src_nation, dst_nation"""


# ---------------------------------------------------------------------------
# events_variance_ratio — Lo-MacKinlay VR(7) on daily counts
# ---------------------------------------------------------------------------


def q_events_variance_ratio(sf_dir: str):
    """Lo-MacKinlay variance ratio at q = 7 on the zero-filled daily
    series: VR = [sum (y_t - y_{t-7})^2 / m7] / (7 sum (y_t -
    y_{t-1})^2 / m1) over overlapping differences — EXACT integer
    squared-difference sums, two divisions; the homoskedastic z uses
    Var = 2(2q-1)(q-1)/(3qn). One row: n_days, d1_sum, d7_sum,
    vr_micro, z_micro — VR < 1 means mean reversion at the weekly
    horizon."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "d1_sum", "d7_sum", "vr_micro", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    q = 7
    if n <= q:
        return empty
    d1 = y[1:] - y[:-1]
    d7 = y[q:] - y[:-q]
    s1 = int((d1.astype(object) * d1.astype(object)).sum())
    s7 = int((d7.astype(object) * d7.astype(object)).sum())
    if s1 == 0:
        return empty
    m1, m7 = n - 1, n - q
    vr = (float(s7) / float(m7)) / (float(q) * float(s1) / float(m1))
    var = 2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q * float(n))
    z = (vr - 1.0) / float(np.sqrt(var))
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(s1), np.int64(s7),
                np.int64(np.floor(vr * 1_000_000.0 + 0.5)),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES290["events_variance_ratio"] = """
WITH h AS (
  SELECT epoch_us(ts) // 86400000000 AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
d AS (
  SELECT y - lag(y, 1) OVER (ORDER BY t) AS dd1,
         y - lag(y, 7) OVER (ORDER BY t) AS dd7
  FROM x
),
s AS (
  SELECT CAST(sum(CASE WHEN dd1 IS NOT NULL THEN dd1 * dd1 END) AS BIGINT)
           AS s1,
         CAST(sum(CASE WHEN dd7 IS NOT NULL THEN dd7 * dd7 END) AS BIGINT)
           AS s7
  FROM d
),
vr AS (
  SELECT nn.n, s.s1, s.s7,
         (CAST(s.s7 AS DOUBLE) / CAST(nn.n - 7 AS DOUBLE))
           / (7.0 * CAST(s.s1 AS DOUBLE) / CAST(nn.n - 1 AS DOUBLE)) AS v
  FROM nn, s
  WHERE nn.n > 7 AND s.s1 > 0
)
SELECT n AS n_days, s1 AS d1_sum, s7 AS d7_sum,
       CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS vr_micro,
       CAST(floor((v - 1.0)
                  / sqrt(2.0 * 13.0 * 6.0 / (21.0 * CAST(n AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM vr"""


QUERIES290 = {
    "nation_backbone": q_nation_backbone,
    "events_variance_ratio": q_events_variance_ratio,
}
