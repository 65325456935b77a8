"""Driver-contract queries, wave 313 — price-change synchronization
across brands (do brands reprice in the same calendar months?) and the
AR(2) pseudo-periodicity of the daily event series (Yule-Walker fit,
implied stochastic-cycle length when the roots are complex). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES313: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# part_price_synchronization — co-movement of brand repricing months
# ---------------------------------------------------------------------------


def q_part_price_synchronization(sf_dir: str):
    """Menu-cost synchronization: per (brand, ship month) the MEAN unit
    price in cents (exact integer cents sum / count, floored to an
    integer index level); a brand 'repriced' in month m when its level
    differs from month m-1 (both observed). Sync rate = over all month
    pairs of brands (a, b) and months where BOTH have change flags, the
    share where flags agree. Pure integer counting. One row: n_brands,
    n_flag_months, agree_micro.

    Scale shape: (brand, month) cent partials ride the broadcast
    part->brand map; the bounded matrix folds on the driver."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put(p2b)

    def partial(t: pa.Table) -> pd.DataFrame:
        p2b_ = _ray.get(dims_ref)
        df = t.to_pandas()
        cents = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            / df["l_quantity"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        ym = (
            df["l_shipdate"].dt.year.to_numpy(np.int64) * 12
            + df["l_shipdate"].dt.month.to_numpy(np.int64) - 1
        )
        brand = df["l_partkey"].map(p2b_).to_numpy(object)
        g = (
            pd.DataFrame({"brand": brand, "ym": ym, "n": 1, "s": cents})
            .groupby(["brand", "ym"], as_index=False)
            .sum()
        )
        return g.astype({"ym": np.int64, "n": np.int64, "s": np.int64})

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_quantity",
                     "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["brand", "ym"])[["n", "s"]]
        .sum()
        .reset_index()
    )
    cols = ["n_brands", "n_flag_months", "agree_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if m.empty:
        return empty
    m["lvl"] = (m["s"] // m["n"]).astype(np.int64)  # integer mean level
    flags: dict[str, dict[int, int]] = {}
    for brand, sub in m.groupby("brand"):
        sub = sub.sort_values("ym")
        ym = sub["ym"].to_numpy(np.int64)
        lvl = sub["lvl"].to_numpy(np.int64)
        adj = ym[1:] == ym[:-1] + 1
        ch = (lvl[1:] != lvl[:-1]).astype(np.int64)
        d = {int(y): int(c) for y, c, a in zip(ym[1:], ch, adj) if a}
        if d:
            flags[brand] = d
    brands = sorted(flags)
    if len(brands) < 2:
        return empty
    n_pairs_obs = 0
    n_agree = 0
    for i, a in enumerate(brands):
        for b in brands[i + 1:]:
            common = set(flags[a]) & set(flags[b])
            for ym_ in common:
                n_pairs_obs += 1
                if flags[a][ym_] == flags[b][ym_]:
                    n_agree += 1
    if n_pairs_obs == 0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(len(brands)), np.int64(n_pairs_obs),
                np.int64(np.floor(
                    float(n_agree) / float(n_pairs_obs) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES313["part_price_synchronization"] = """
WITH base AS (
  SELECT p.p_brand AS brand,
         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 AS BIGINT)
           AS ym,
         CAST(floor(l.l_extendedprice / l.l_quantity * 100.0 + 0.5)
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
lvl AS (
  SELECT brand, ym,
         CAST(sum(cents) // count(*) AS BIGINT) AS lvl
  FROM base GROUP BY 1, 2
),
fl AS (
  SELECT brand, ym,
         CAST(lvl <> lag(lvl) OVER (PARTITION BY brand ORDER BY ym)
              AS BIGINT) AS ch,
         ym - lag(ym) OVER (PARTITION BY brand ORDER BY ym) AS gap
  FROM lvl
),
flags AS (SELECT brand, ym, ch FROM fl WHERE gap = 1),
bs AS (SELECT DISTINCT brand FROM flags),
pairs AS (
  SELECT a.brand AS ba, b.brand AS bb FROM bs a JOIN bs b
    ON a.brand < b.brand
),
obs AS (
  SELECT p.ba, p.bb, fa.ym, fa.ch AS ca, fb.ch AS cb
  FROM pairs p
  JOIN flags fa ON fa.brand = p.ba
  JOIN flags fb ON fb.brand = p.bb AND fb.ym = fa.ym
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_obs,
         CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM obs
)
SELECT CAST((SELECT count(*) FROM bs) AS BIGINT) AS n_brands,
       agg.n_obs AS n_flag_months,
       CAST(floor(CAST(agg.n_agree AS DOUBLE) / CAST(agg.n_obs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS agree_micro
FROM agg
WHERE agg.n_obs > 0 AND (SELECT count(*) FROM bs) >= 2"""


# ---------------------------------------------------------------------------
# events_ar2_pseudo_period — Yule-Walker AR(2) implied cycle
# ---------------------------------------------------------------------------


def q_events_ar2_pseudo_period(sf_dir: str):
    """AR(2) Yule-Walker fit of the centered daily series: r1, r2 from
    exact integer moments, phi1 = r1 (1 - r2) / (1 - r1^2),
    phi2 = (r2 - r1^2) / (1 - r1^2). With complex roots
    (phi1^2 + 4 phi2 < 0) the implied stochastic-cycle period is
    2 pi / arccos(phi1 / (2 sqrt(-phi2))); real roots report 0. One
    row: n_days, phi1_micro, phi2_micro, complex_roots, period_milli."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "phi1_micro", "phi2_micro", "complex_roots",
            "period_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 5:
        return empty
    yo = y.astype(object)
    s = int(yo.sum())
    s2 = int((yo * yo).sum())
    c0 = float(n * s2 - s * s)
    if c0 <= 0.0:
        return empty

    def autocov_num(k: int) -> float:
        a, b = yo[:-k], yo[k:]
        m = n - k
        # centered cross-sum scaled by n^2: use the n-mean for all lags
        # (the standard biased ACF with the global mean)
        sab = int((a * b).sum())
        sa, sb = int(a.sum()), int(b.sum())
        return float(n * n * sab - n * s * (sa + sb) + m * s * s)

    # r_k = (n^2 sum (a-mu)(b-mu)) / (m/n-scaled c0): use the biased
    # estimator r_k = C_k / C_0 with C_k = sum_{t} (y_t-mu)(y_{t+k}-mu)
    c1 = autocov_num(1) / float(n * n)
    c2 = autocov_num(2) / float(n * n)
    c0f = c0 / float(n)
    r1 = c1 / c0f
    r2 = c2 / c0f
    den = 1.0 - r1 * r1
    if den == 0.0:
        return empty
    phi1 = r1 * (1.0 - r2) / den
    phi2 = (r2 - r1 * r1) / den
    disc = phi1 * phi1 + 4.0 * phi2
    if disc < 0.0 and phi2 < 0.0:
        period = (
            2.0 * np.pi
            / float(np.arccos(phi1 / (2.0 * np.sqrt(-phi2))))
        )
        cr, pm = 1, np.int64(np.floor(period * 1_000.0 + 0.5))
    else:
        cr, pm = 0, np.int64(0)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(phi1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(phi2 * 1_000_000.0 + 0.5)),
                np.int64(cr), pm,
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES313["events_ar2_pseudo_period"] = f"""
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
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM x
),
lag1 AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS sab,
         CAST(sum(a.y) AS BIGINT) AS sa, CAST(sum(b.y) AS BIGINT) AS sb
  FROM x a JOIN x b ON b.t = a.t + 1
),
lag2 AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CAST(a.y AS HUGEINT) * b.y) AS HUGEINT) AS sab,
         CAST(sum(a.y) AS BIGINT) AS sa, CAST(sum(b.y) AS BIGINT) AS sb
  FROM x a JOIN x b ON b.t = a.t + 2
),
r AS (
  SELECT nn.n,
         (CAST(nn.n AS DOUBLE) * nn.n * l1.sab
          - CAST(nn.n AS DOUBLE) * nn.s * (l1.sa + l1.sb)
          + CAST(l1.m AS DOUBLE) * nn.s * nn.s)
           / (CAST(nn.n AS DOUBLE) * nn.n)
           / ((CAST(nn.n AS DOUBLE) * nn.s2 - CAST(nn.s AS DOUBLE) * nn.s)
              / nn.n) AS r1,
         (CAST(nn.n AS DOUBLE) * nn.n * l2.sab
          - CAST(nn.n AS DOUBLE) * nn.s * (l2.sa + l2.sb)
          + CAST(l2.m AS DOUBLE) * nn.s * nn.s)
           / (CAST(nn.n AS DOUBLE) * nn.n)
           / ((CAST(nn.n AS DOUBLE) * nn.s2 - CAST(nn.s AS DOUBLE) * nn.s)
              / nn.n) AS r2
  FROM nn, lag1 l1, lag2 l2
  WHERE nn.n >= 5
    AND (CAST(nn.n AS DOUBLE) * nn.s2 - CAST(nn.s AS DOUBLE) * nn.s) > 0
),
fit AS (
  SELECT n, r1, r2,
         r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
  FROM r WHERE (1.0 - r1 * r1) <> 0
)
SELECT n AS n_days,
       CAST(floor(phi1 * 1000000.0 + 0.5) AS BIGINT) AS phi1_micro,
       CAST(floor(phi2 * 1000000.0 + 0.5) AS BIGINT) AS phi2_micro,
       CAST(CASE WHEN phi1 * phi1 + 4.0 * phi2 < 0 AND phi2 < 0
                 THEN 1 ELSE 0 END AS BIGINT) AS complex_roots,
       CAST(CASE WHEN phi1 * phi1 + 4.0 * phi2 < 0 AND phi2 < 0
                 THEN floor(2.0 * pi() / acos(phi1 / (2.0 * sqrt(-phi2)))
                            * 1000.0 + 0.5)
                 ELSE 0 END AS BIGINT) AS period_milli
FROM fit"""


QUERIES313 = {
    "part_price_synchronization": q_part_price_synchronization,
    "events_ar2_pseudo_period": q_events_ar2_pseudo_period,
}
