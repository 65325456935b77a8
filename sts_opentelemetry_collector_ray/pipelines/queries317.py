"""Driver-contract queries, wave 317 — the Hidalgo-Hausmann method of
reflections (two iterations) over the RCA-filtered nation x brand
export matrix, and Deming errors-in-variables regression between daily
order and lineitem volumes. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES317: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# nation_economic_complexity — method of reflections, 2 iterations
# ---------------------------------------------------------------------------


def q_nation_economic_complexity(sf_dir: str):
    """Economic-complexity reflections on the binary RCA matrix
    (M[n,b] = 1 iff nation n's share of brand b exceeds its share of
    total exports — the RCA >= 1 rule as an EXACT integer
    cross-multiplication): k0 = diversity, k_b0 = ubiquity,
    k1 = mean ubiquity of the nation's brands, k2 = mean k1 of each
    brand's exporters averaged over the nation's brands. Per nation:
    nation, diversity, k1_milli, k2_milli.

    Scale shape: (nation, brand) counts ride the broadcast-map
    combiner; the bounded reflections run on the driver."""
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
    cols = ["nation", "diversity", "k1_milli", "k2_milli"]
    empty = pd.DataFrame(
        {
            "nation": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if m.empty:
        return empty
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    tot = int(m["c"].sum())
    nat_tot = m.groupby("nk")["c"].sum()
    brand_tot = m.groupby("brand")["c"].sum()
    # RCA >= 1 <=> c * tot >= nat_tot * brand_tot  (exact integers)
    keep = []
    for _, r in m.iterrows():
        nk, brand, c = int(r["nk"]), r["brand"], int(r["c"])
        if c * tot >= int(nat_tot.loc[nk]) * int(brand_tot.loc[brand]):
            keep.append((nk, brand))
    if not keep:
        return empty
    mm = pd.DataFrame(keep, columns=["nk", "brand"])
    k0 = mm.groupby("nk").size()  # diversity
    kb0 = mm.groupby("brand").size()  # ubiquity
    k1 = (
        mm.assign(u=mm["brand"].map(kb0).astype(np.int64))
        .groupby("nk")["u"]
        .mean()
    )
    kb1 = (
        mm.assign(d=mm["nk"].map(k1))
        .groupby("brand")["d"]
        .mean()
    )
    k2 = (
        mm.assign(v=mm["brand"].map(kb1))
        .groupby("nk")["v"]
        .mean()
    )
    rows = []
    for nk in sorted(k0.index):
        rows.append(
            (
                names[int(nk)], np.int64(int(k0.loc[nk])),
                np.int64(np.floor(float(k1.loc[nk]) * 1_000.0 + 0.5)),
                np.int64(np.floor(float(k2.loc[nk]) * 1_000.0 + 0.5)),
            )
        )
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values("nation")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols[1:]})
    )


ORACLES317["nation_economic_complexity"] = """
WITH inc AS (
  SELECT s.s_nationkey AS nk, p.p_brand AS brand,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM inc),
nt AS (SELECT nk, CAST(sum(c) AS BIGINT) AS s FROM inc GROUP BY 1),
bt AS (SELECT brand, CAST(sum(c) AS BIGINT) AS s FROM inc GROUP BY 1),
mm AS (
  SELECT inc.nk, inc.brand
  FROM inc JOIN nt ON nt.nk = inc.nk JOIN bt ON bt.brand = inc.brand, tot
  WHERE CAST(inc.c AS HUGEINT) * tot.t >= CAST(nt.s AS HUGEINT) * bt.s
),
k0 AS (SELECT nk, CAST(count(*) AS BIGINT) AS d FROM mm GROUP BY 1),
kb0 AS (SELECT brand, CAST(count(*) AS BIGINT) AS u FROM mm GROUP BY 1),
k1 AS (
  SELECT mm.nk, avg(CAST(kb0.u AS DOUBLE)) AS v
  FROM mm JOIN kb0 USING (brand) GROUP BY 1
),
kb1 AS (
  SELECT mm.brand, avg(k1.v) AS v
  FROM mm JOIN k1 USING (nk) GROUP BY 1
),
k2 AS (
  SELECT mm.nk, avg(kb1.v) AS v
  FROM mm JOIN kb1 USING (brand) GROUP BY 1
)
SELECT na.n_name AS nation, k0.d AS diversity,
       CAST(floor(k1.v * 1000.0 + 0.5) AS BIGINT) AS k1_milli,
       CAST(floor(k2.v * 1000.0 + 0.5) AS BIGINT) AS k2_milli
FROM k0
JOIN k1 USING (nk) JOIN k2 USING (nk)
JOIN nation na ON na.n_nationkey = k0.nk
ORDER BY nation"""


# ---------------------------------------------------------------------------
# orders_deming_regression — errors-in-variables daily volumes
# ---------------------------------------------------------------------------


def q_orders_deming_regression(sf_dir: str):
    """Deming regression (delta = 1, both variables noisy) between
    x = daily order count and y = daily lineitem count over the shared
    calendar grid: with centered moment cores from EXACT integers,
    slope = (syy - sxx + sqrt((syy - sxx)^2 + 4 sxy^2)) / (2 sxy) and
    intercept = ybar - slope xbar — the symmetric fit OLS cannot give.
    One row: n_days, slope_micro, intercept_milli."""

    def daily(path: str, date_col: str) -> pd.Series:
        def partial(t: pa.Table) -> pd.DataFrame:
            dy = (
                pa.compute.cast(t[date_col], pa.int64()).to_numpy() // _DAY_US
            )
            h = pd.Series(dy).groupby(dy).size()
            return pd.DataFrame(
                {"dy": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
            )

        return (
            ray.data.read_parquet(path, columns=[date_col])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby("dy")["c"]
            .sum()
        )

    o = daily(f"{sf_dir}/orders.parquet", "o_orderdate")
    li = daily(f"{sf_dir}/lineitem.parquet", "l_shipdate")
    cols = ["n_days", "slope_micro", "intercept_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if o.empty or li.empty:
        return empty
    d0 = min(int(o.index.min()), int(li.index.min()))
    d1 = max(int(o.index.max()), int(li.index.max()))
    n = d1 - d0 + 1
    if n < 3:
        return empty
    x = np.zeros(n, np.int64)
    y = np.zeros(n, np.int64)
    x[o.index.to_numpy(np.int64) - d0] = o.to_numpy(np.int64)
    y[li.index.to_numpy(np.int64) - d0] = li.to_numpy(np.int64)
    xo, yo = x.astype(object), y.astype(object)
    sx, sy = int(xo.sum()), int(yo.sum())
    sxx = int((xo * xo).sum())
    syy = int((yo * yo).sum())
    sxy = int((xo * yo).sum())
    cxx = float(n * sxx - sx * sx)
    cyy = float(n * syy - sy * sy)
    cxy = float(n * sxy - sx * sy)
    if cxy == 0.0:
        return empty
    slope = (cyy - cxx + float(np.sqrt(
        (cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy
    ))) / (2.0 * cxy)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(slope * 1_000_000.0 + 0.5)),
                np.int64(np.floor(intercept * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES317["orders_deming_regression"] = f"""
WITH od AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS dy,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
ld AS (
  SELECT epoch_us(l_shipdate) // {_DAY_US} AS dy,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1
),
g AS (
  SELECT least((SELECT min(dy) FROM od), (SELECT min(dy) FROM ld)) AS d0,
         greatest((SELECT max(dy) FROM od), (SELECT max(dy) FROM ld)) AS d1
),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
xy AS (
  SELECT CAST(coalesce(od.c, 0) AS BIGINT) AS x,
         CAST(coalesce(ld.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN od USING (dy) LEFT JOIN ld USING (dy)
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM xy
),
c AS (
  SELECT n,
         CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
              AS DOUBLE) AS cxx,
         CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
              AS DOUBLE) AS cyy,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
              AS DOUBLE) AS cxy,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM m WHERE n >= 3
),
s AS (
  SELECT n, sxd, syd,
         (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy))
           / (2.0 * cxy) AS slope
  FROM c WHERE cxy <> 0
)
SELECT n AS n_days,
       CAST(floor(slope * 1000000.0 + 0.5) AS BIGINT) AS slope_micro,
       CAST(floor((syd - slope * sxd) / n * 1000.0 + 0.5) AS BIGINT)
         AS intercept_milli
FROM s"""


QUERIES317 = {
    "nation_economic_complexity": q_nation_economic_complexity,
    "orders_deming_regression": q_orders_deming_regression,
}
