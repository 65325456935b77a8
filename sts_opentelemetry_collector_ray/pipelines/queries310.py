"""Driver-contract queries, wave 310 — the Krugman specialization index
of each nation's brand export mix vs the world mix (trade-structure
classic) and the downside/upside semivariance decomposition of daily
event-count changes. Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES310: dict[str, str] = {}

_DAY_US = 86_400_000_000
_KS_BUCKETS = 64


# ---------------------------------------------------------------------------
# nation_krugman_specialization — export-mix divergence from the world
# ---------------------------------------------------------------------------


def q_nation_krugman_specialization(sf_dir: str):
    """Krugman specialization index per supplier nation:
    K_i = sum_b |s_{i,b} - s_{world minus i,b}| where s are brand shares
    of lineitem export counts (0 = identical mix, 2 = fully disjoint).
    Counts fold exactly; the share algebra is mirrored float. Per
    nation: nation, n_items, k_micro.

    Scale shape: (nation, brand) counts ride the tagged orderkey-free
    partkey broadcast combiner (the `nation_brand_nestedness` idiom
    with counts); the bounded matrix folds on the driver."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    supp = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    nat = pq_mod.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put((s2n, p2b))

    def partial(t: pa.Table) -> pd.DataFrame:
        s2n_, p2b_ = _ray.get(dims_ref)
        df = pd.DataFrame(
            {
                "nk": pd.Series(
                    t["l_suppkey"].to_numpy(zero_copy_only=False)
                ).map(s2n_).to_numpy(np.int64),
                "brand": pd.Series(
                    t["l_partkey"].to_numpy(zero_copy_only=False)
                ).map(p2b_).to_numpy(object),
            }
        )
        g = df.groupby(["nk", "brand"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["nk", "brand"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["nation", "n_items", "k_micro"]
    empty = pd.DataFrame(
        {
            "nation": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if m.empty:
        return empty
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    brands = sorted(m["brand"].unique())
    total_b = m.groupby("brand")["c"].sum()
    total = int(total_b.sum())
    rows = []
    for nk, sub in m.groupby("nk"):
        own = sub.set_index("brand")["c"]
        n_i = int(own.sum())
        rest_total = total - n_i
        if n_i == 0 or rest_total == 0:
            continue
        k = 0.0
        for b in brands:
            ci = int(own.get(b, 0))
            cw = int(total_b.get(b, 0)) - ci
            k += abs(
                float(ci) / float(n_i) - float(cw) / float(rest_total)
            )
        rows.append(
            (
                names[int(nk)], np.int64(n_i),
                np.int64(np.floor(k * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values("nation")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols[1:]})
    )


ORACLES310["nation_krugman_specialization"] = """
WITH inc AS (
  SELECT s.s_nationkey AS nk, p.p_brand AS brand,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
nations AS (SELECT nk, CAST(sum(c) AS BIGINT) AS ni FROM inc GROUP BY 1),
world AS (SELECT brand, CAST(sum(c) AS BIGINT) AS cw FROM inc GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM inc),
cells AS (
  SELECT n.nk, n.ni, w.brand, w.cw,
         CAST(coalesce(inc.c, 0) AS BIGINT) AS ci, tot.t
  FROM nations n CROSS JOIN world w
  LEFT JOIN inc ON inc.nk = n.nk AND inc.brand = w.brand, tot
),
k AS (
  SELECT nk, ni,
         sum(abs(CAST(ci AS DOUBLE) / ni
                 - CAST(cw - ci AS DOUBLE) / (t - ni))) AS kv
  FROM cells
  WHERE ni > 0 AND t - ni > 0
  GROUP BY 1, 2
)
SELECT na.n_name AS nation, k.ni AS n_items,
       CAST(floor(k.kv * 1000000.0 + 0.5) AS BIGINT) AS k_micro
FROM k JOIN nation na ON na.n_nationkey = k.nk
ORDER BY nation"""


# ---------------------------------------------------------------------------
# events_semivariance — downside/upside risk of daily changes
# ---------------------------------------------------------------------------


def q_events_semivariance(sf_dir: str):
    """Semivariance decomposition of day-over-day count changes d_t:
    with the EXACT integer mean comparison (d n vs S), downside
    semivariance averages (d - mean)^2 over below-mean changes and
    upside over above-mean (at-mean changes excluded from both, counted
    separately) — volatility skew = downside/upside. One row:
    n_changes, n_down, n_up, semivar_down_micro, semivar_up_micro,
    skew_ratio_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = [
        "n_changes", "n_down", "n_up", "semivar_down_micro",
        "semivar_up_micro", "skew_ratio_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    if len(y) < 3:
        return empty
    d = (y[1:] - y[:-1]).astype(object)
    n = len(d)
    s = int(d.sum())
    below = np.array([int(v) * n < s for v in d], bool)
    above = np.array([int(v) * n > s for v in d], bool)
    n_dn, n_up = int(below.sum()), int(above.sum())
    if n_dn == 0 or n_up == 0:
        return empty
    # (d - s/n)^2 = (d n - s)^2 / n^2 — exact integer numerators
    dev = d * n - s
    dn_num = int((dev[below] * dev[below]).sum())
    up_num = int((dev[above] * dev[above]).sum())
    sv_dn = float(dn_num) / (float(n) * float(n) * float(n_dn))
    sv_up = float(up_num) / (float(n) * float(n) * float(n_up))
    if sv_up <= 0.0:
        return empty
    ratio = sv_dn / sv_up
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(n_dn), np.int64(n_up),
                np.int64(np.floor(sv_dn * 1_000_000.0 + 0.5)),
                np.int64(np.floor(sv_up * 1_000_000.0 + 0.5)),
                np.int64(np.floor(ratio * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES310["events_semivariance"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
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
d AS (
  SELECT y - lag(y) OVER (ORDER BY t) AS dv FROM x
),
dd AS (SELECT CAST(dv AS BIGINT) AS dv FROM d WHERE dv IS NOT NULL),
m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dv) AS BIGINT) AS s
      FROM dd),
cls AS (
  SELECT dd.dv, m.n, m.s,
         CAST(dd.dv AS HUGEINT) * m.n - m.s AS dev,
         CASE WHEN CAST(dd.dv AS HUGEINT) * m.n < m.s THEN -1
              WHEN CAST(dd.dv AS HUGEINT) * m.n > m.s THEN 1
              ELSE 0 END AS side
  FROM dd, m
),
agg AS (
  SELECT max(n) AS n,
         CAST(sum(CASE WHEN side = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dn,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         CAST(sum(CASE WHEN side = -1 THEN dev * dev ELSE 0 END)
              AS HUGEINT) AS dn_num,
         CAST(sum(CASE WHEN side = 1 THEN dev * dev ELSE 0 END)
              AS HUGEINT) AS up_num
  FROM cls
)
SELECT n AS n_changes, n_dn AS n_down, n_up,
       CAST(floor(CAST(dn_num AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n_dn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         AS semivar_down_micro,
       CAST(floor(CAST(up_num AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n_up AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
         AS semivar_up_micro,
       CAST(floor((CAST(dn_num AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * CAST(n_dn AS DOUBLE)))
                  / (CAST(up_num AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                        * CAST(n_up AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS skew_ratio_micro
FROM agg
WHERE n_dn > 0 AND n_up > 0 AND up_num > 0"""


QUERIES310 = {
    "nation_krugman_specialization": q_nation_krugman_specialization,
    "events_semivariance": q_events_semivariance,
}
