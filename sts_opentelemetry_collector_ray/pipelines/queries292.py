"""Driver-contract queries, wave 292 — the actuarial chain-ladder on
the order-year x ship-lag development triangle (volume-weighted
development factors, ultimates via exp-sum-log completion) and
leave-one-band-out slope influence for the discount -> returns
regression (exact integer jackknife over bounded strata). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES292: dict[str, str] = {}


# ---------------------------------------------------------------------------
# orders_chain_ladder — development triangle and ultimates
# ---------------------------------------------------------------------------


def q_orders_chain_ladder(sf_dir: str):
    """Chain-ladder completion of the shipment development triangle:
    origin = order year, lag = ship year - order year, C_{i,j} =
    cumulative shipped cents through lag j. Volume-weighted factors
    f_j = sum_i C_{i,j+1} / sum_i C_{i,j} over origins where lag j+1 is
    observed; each origin's ultimate = C_latest * exp(sum ln f_j) over
    its unobserved lags. Cent sums are EXACT integers; factors and the
    log-sum completion are the float steps. Per origin: origin_year,
    latest_lag, paid_cents, ultimate_cents.

    Scale shape: one (origin, lag -> cents) combiner rides the tagged
    orderkey-bucket exchange (lineitem needs the order date); the
    |years|^2 triangle folds on the driver."""
    import ray as _ray

    def li_rows(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        k = df["l_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "sy": df["l_shipdate"].dt.year.to_numpy(np.int64),
                "cents": np.floor(
                    df["l_extendedprice"].to_numpy(np.float64) * 100.0 + 0.5
                ).astype(np.int64),
                "oy": np.int64(-1),
                "_b": (k % 64).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        k = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "sy": np.int64(-1),
                "cents": np.int64(0),
                "oy": df["o_orderdate"].dt.year.to_numpy(np.int64),
                "_b": (k % 64).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["oy"] < 0][["k", "sy", "cents"]]
        o = g[g["oy"] >= 0][["k", "oy"]]
        m = li.merge(o, on="k")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "oy": pd.Series([], dtype=np.int64),
                    "lag": pd.Series([], dtype=np.int64),
                    "s": pd.Series([], dtype=np.int64),
                }
            )
        m["lag"] = (m["sy"] - m["oy"]).astype(np.int64)
        out = (
            m.groupby(["oy", "lag"])["cents"].sum().rename("s").reset_index()
        )
        return out.astype(np.int64)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice"],
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_rows, batch_format="pyarrow")
    tri = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["oy", "lag"])["s"]
        .sum()
    )
    _ = _ray  # tagged-exchange idiom; broadcast unused here
    cols = ["origin_year", "latest_lag", "paid_cents", "ultimate_cents"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if tri.empty:
        return empty
    origins = sorted({i for i, _ in tri.index})
    max_year = max(origins)
    max_lag = max_year - min(origins)
    # cumulative triangle
    cum: dict[tuple[int, int], int] = {}
    for i in origins:
        run = 0
        for j in range(0, max_year - i + 1):
            run += int(tri.get((i, j), 0))
            cum[(i, j)] = run
    # volume-weighted development factors
    f: dict[int, float] = {}
    for j in range(0, max_lag):
        num = sum(
            cum[(i, j + 1)] for i in origins if max_year - i >= j + 1
        )
        den = sum(
            cum[(i, j)] for i in origins if max_year - i >= j + 1
        )
        if den > 0:
            f[j] = float(num) / float(den)
    rows = []
    for i in origins:
        latest = max_year - i
        paid = cum[(i, latest)]
        lnsum = 0.0
        ok = True
        for j in range(latest, max_lag):
            if j not in f:
                ok = False
                break
            lnsum += float(np.log(f[j]))
        if not ok or paid <= 0:
            continue
        ult = float(paid) * float(np.exp(lnsum))
        rows.append(
            (
                np.int64(i), np.int64(latest), np.int64(paid),
                np.int64(np.floor(ult + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES292["orders_chain_ladder"] = """
WITH inc AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS oy,
         CAST(year(l.l_shipdate) - year(o.o_orderdate) AS BIGINT) AS lag,
         CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
bounds AS (SELECT min(oy) AS o0, max(oy) AS o1 FROM inc),
grid AS (
  SELECT i.oy, CAST(r.range AS BIGINT) AS lag
  FROM (SELECT DISTINCT oy FROM inc) i, bounds
  CROSS JOIN range(0, 200) r
  WHERE r.range <= bounds.o1 - i.oy
),
cum AS (
  SELECT g.oy, g.lag,
         CAST(sum(coalesce(inc.s, 0)) OVER (
           PARTITION BY g.oy ORDER BY g.lag
         ) AS BIGINT) AS c
  FROM grid g LEFT JOIN inc ON inc.oy = g.oy AND inc.lag = g.lag
),
fac AS (
  SELECT a.lag AS j,
         CAST(sum(b.c) AS DOUBLE) / CAST(sum(a.c) AS DOUBLE) AS f
  FROM cum a
  JOIN cum b ON b.oy = a.oy AND b.lag = a.lag + 1, bounds
  WHERE bounds.o1 - a.oy >= a.lag + 1
  GROUP BY 1
  HAVING sum(a.c) > 0
),
latest AS (
  SELECT cum.oy, cum.lag AS latest_lag, cum.c AS paid
  FROM cum, bounds WHERE cum.lag = bounds.o1 - cum.oy
),
compl AS (
  SELECT l.oy, l.latest_lag, l.paid,
         coalesce(sum(ln(fac.f)), 0.0) AS lnsum,
         count(fac.j) AS kf,
         (SELECT max(o1 - o0) FROM bounds) - l.latest_lag AS need
  FROM latest l
  LEFT JOIN fac ON fac.j >= l.latest_lag
  GROUP BY 1, 2, 3
)
SELECT oy AS origin_year, latest_lag, paid AS paid_cents,
       CAST(floor(CAST(paid AS DOUBLE) * exp(lnsum) + 0.5) AS BIGINT)
         AS ultimate_cents
FROM compl
WHERE paid > 0 AND kf = need
ORDER BY origin_year"""


# ---------------------------------------------------------------------------
# lineitem_band_influence — leave-one-band-out slope jackknife
# ---------------------------------------------------------------------------


def q_lineitem_band_influence(sf_dir: str):
    """Stratified jackknife influence: the discount(milli) -> returned
    OLS slope recomputed with each discount band excluded — all from
    the EXACT integer band moment table (n, Sx, Sy, Sxy, Sxx are sums
    of per-band integers), two float divisions per band. Per band:
    band, n, slope_full_micro, slope_wo_micro, delta_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        x = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        y = (
            t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        ).astype(np.int64)
        df = pd.DataFrame({"band": x, "n": 1, "sy": y})
        out = df.groupby("band", as_index=False).sum()
        return out.astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_returnflag"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("band")[["n", "sy"]]
        .sum()
        .sort_index()
    )
    cols = ["band", "n", "slope_full_micro", "slope_wo_micro", "delta_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(m) < 3:
        return empty
    bands = m.index.to_numpy(np.int64)
    ns = m["n"].to_numpy(np.int64)
    sys_ = m["sy"].to_numpy(np.int64)

    def slope(nb, sx, sy, sxy, sxx):
        den = nb * sxx - sx * sx
        if den == 0:
            return None
        return float(nb * sxy - sx * sy) / float(den)

    n_t = int(ns.sum())
    sx_t = int((bands * ns).sum())
    sy_t = int(sys_.sum())
    sxy_t = int((bands * sys_).sum())
    sxx_t = int((bands * bands * ns).sum())
    b_full = slope(n_t, sx_t, sy_t, sxy_t, sxx_t)
    if b_full is None:
        return empty
    rows = []
    for band, nb, syb in zip(bands, ns, sys_):
        b_wo = slope(
            n_t - int(nb), sx_t - int(band) * int(nb), sy_t - int(syb),
            sxy_t - int(band) * int(syb),
            sxx_t - int(band) * int(band) * int(nb),
        )
        if b_wo is None:
            continue
        rows.append(
            (
                np.int64(band), np.int64(nb),
                np.int64(np.floor(b_full * 1_000_000.0 + 0.5)),
                np.int64(np.floor(b_wo * 1_000_000.0 + 0.5)),
                np.int64(np.floor((b_wo - b_full) * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES292["lineitem_band_influence"] = """
WITH base AS (
  SELECT CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS band,
         CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT)
           AS y
  FROM lineitem
),
m AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(band * n) AS BIGINT) AS sx,
         CAST(sum(sy) AS BIGINT) AS sy,
         CAST(sum(band * sy) AS BIGINT) AS sxy,
         CAST(sum(band * band * n) AS BIGINT) AS sxx,
         CAST(count(*) AS BIGINT) AS k
  FROM m
),
full_s AS (
  SELECT CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b, n, sx, sy, sxy, sxx, k
  FROM tot WHERE n * sxx - sx * sx <> 0 AND k >= 3
),
wo AS (
  SELECT m.band, m.n AS nb, f.b AS b_full,
         CAST((f.n - m.n) * (f.sxy - m.band * m.sy)
              - (f.sx - m.band * m.n) * (f.sy - m.sy) AS DOUBLE)
           / CAST((f.n - m.n) * (f.sxx - m.band * m.band * m.n)
                  - (f.sx - m.band * m.n) * (f.sx - m.band * m.n)
                  AS DOUBLE) AS b_wo
  FROM m, full_s f
  WHERE (f.n - m.n) * (f.sxx - m.band * m.band * m.n)
        - (f.sx - m.band * m.n) * (f.sx - m.band * m.n) <> 0
)
SELECT band, nb AS n,
       CAST(floor(b_full * 1000000.0 + 0.5) AS BIGINT) AS slope_full_micro,
       CAST(floor(b_wo * 1000000.0 + 0.5) AS BIGINT) AS slope_wo_micro,
       CAST(floor((b_wo - b_full) * 1000000.0 + 0.5) AS BIGINT)
         AS delta_micro
FROM wo
ORDER BY band"""


QUERIES292 = {
    "orders_chain_ladder": q_orders_chain_ladder,
    "lineitem_band_influence": q_lineitem_band_influence,
}
