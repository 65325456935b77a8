"""Driver-contract queries, wave 243 — Kuiper's V test (1960) of
hour-of-day uniformity per event type (the rotation-invariant KS variant
for circular data) and Somers' D (1962) between ordinal discount band and
the return flag (both asymmetric directions, exact pair counts from the
contingency table).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES243: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_kuiper — circular uniformity of hour-of-day per type
# ---------------------------------------------------------------------------


def q_events_kuiper(sf_dir: str):
    """Per event type: Kuiper's V over the 24-bin hour-of-day histogram
    vs the uniform circular law — with F_k the empirical CDF after bin k
    and G_k = (k+1)/24, V = max_k(F_k−G_k) + max_k(G_k−F_k) and the
    finite-n statistic V·(√n + 0.155 + 0.24/√n). Output: event_type, n,
    v_micro, vstat_micro.

    Scale shape: per-batch (type, hour) count partials; the 24-bin CDF
    scan folds on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type"]).to_pandas()
        df["h"] = pd.Series(
            t["ts"].to_numpy(zero_copy_only=False)
        ).dt.hour.astype(np.int64)
        return (
            df.groupby(["event_type", "h"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n", "v_micro", "vstat_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    ct = part.groupby(["event_type", "h"])["c"].sum()
    rows = []
    for et in sorted(ct.index.get_level_values(0).unique()):
        h = ct.loc[et].reindex(range(24), fill_value=0).to_numpy(np.float64)
        n = float(h.sum())
        if n < 1:
            continue
        f = np.cumsum(h) / n
        g = (np.arange(24, dtype=np.float64) + 1.0) / 24.0
        v = float((f - g).max()) + float((g - f).max())
        vstat = v * (np.sqrt(n) + 0.155 + 0.24 / np.sqrt(n))
        rows.append(
            (et, np.int64(n),
             np.int64(np.floor(v * 1_000_000.0 + 0.5)),
             np.int64(np.floor(vstat * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES243["events_kuiper"] = """
WITH hours AS (SELECT unnest(range(0, 24)) AS h),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT types.event_type, hours.h FROM types, hours),
ct AS (
  SELECT event_type, hour(ts) AS h, CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
),
full_ct AS (
  SELECT grid.event_type, grid.h, coalesce(ct.c, 0.0) AS c
  FROM grid LEFT JOIN ct ON grid.event_type = ct.event_type
    AND grid.h = ct.h
),
tot AS (SELECT event_type, sum(c) AS n FROM full_ct GROUP BY 1),
cdf AS (
  SELECT f.event_type, f.h, tot.n,
         sum(f.c) OVER (PARTITION BY f.event_type ORDER BY f.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / tot.n
           - (f.h + 1.0) / 24.0 AS d
  FROM full_ct f JOIN tot ON f.event_type = tot.event_type
  WHERE tot.n >= 1
),
v AS (
  SELECT event_type, any_value(n) AS n, max(d) + max(-d) AS v
  FROM cdf GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS v_micro,
       CAST(floor(v * (sqrt(n) + 0.155 + 0.24 / sqrt(n)) * 1000000.0 + 0.5)
            AS BIGINT) AS vstat_micro
FROM v ORDER BY event_type"""


# ---------------------------------------------------------------------------
# lineitem_somers_d — asymmetric ordinal association band ↔ returned
# ---------------------------------------------------------------------------


def q_lineitem_somers_d(sf_dir: str):
    """Somers' D between discount band (ordinal) and the return flag:
    from the |bands|×2 contingency table, concordant C, discordant D and
    the tie masses T_Y (tied flag, different band) / T_X (tied band,
    different flag); d_YX = (C−D)/(C+D+T_Y), d_XY = (C−D)/(C+D+T_X).
    One row: n, n_conc, n_disc, d_yx_micro, d_xy_micro.

    Scale shape: (band, flag) combiner; the pair algebra runs over the
    bands² grid on the driver — exact integer products inside doubles."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["band"] = np.floor(
            df["l_discount"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        df["pos"] = (df["l_returnflag"] == "R").astype(np.int64)
        return (
            df.groupby(["band", "pos"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    part = (
        ray.data.read_parquet(
            path, columns=["l_discount", "l_returnflag"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "n_conc", "n_disc", "d_yx_micro", "d_xy_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if part.empty:
        return empty
    ct = part.groupby(["band", "pos"])["c"].sum().unstack("pos").fillna(0)
    for col in (0, 1):
        if col not in ct.columns:
            ct[col] = 0
    ct = ct.sort_index()
    n0 = ct[0].to_numpy(np.float64)
    n1 = ct[1].to_numpy(np.float64)
    k = len(ct)
    if k < 2:
        return empty
    # suffix sums: for band i, mass of bands j > i
    s0 = np.concatenate([np.cumsum(n0[::-1])[::-1][1:], [0.0]])
    s1 = np.concatenate([np.cumsum(n1[::-1])[::-1][1:], [0.0]])
    c = float((n0 * s1).sum())
    d = float((n1 * s0).sum())
    t_y = float((n0 * s0).sum() + (n1 * s1).sum())
    t_x = float((n0 * n1).sum())
    num = c - d
    d_yx = num / (c + d + t_y) if c + d + t_y > 0.0 else 0.0
    d_xy = num / (c + d + t_x) if c + d + t_x > 0.0 else 0.0
    n = float(n0.sum() + n1.sum())
    micro = lambda x: np.int64(np.floor(x * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {"n": [np.int64(n)], "n_conc": [np.int64(c)],
         "n_disc": [np.int64(d)],
         "d_yx_micro": [micro(d_yx)], "d_xy_micro": [micro(d_xy)]}
    )


ORACLES243["lineitem_somers_d"] = """
WITH ct AS (
  SELECT CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS band,
         CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
              AS DOUBLE) AS n0,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS DOUBLE) AS n1
  FROM lineitem GROUP BY 1
),
pairs AS (
  SELECT sum(a.n0 * b.n1) AS c, sum(a.n1 * b.n0) AS d,
         sum(a.n0 * b.n0 + a.n1 * b.n1) AS ty
  FROM ct a JOIN ct b ON b.band > a.band
),
tx AS (SELECT sum(n0 * n1) AS tx, sum(n0 + n1) AS n,
              CAST(count(*) AS BIGINT) AS k FROM ct)
SELECT CAST(tx.n AS BIGINT) AS n,
       CAST(pairs.c AS BIGINT) AS n_conc,
       CAST(pairs.d AS BIGINT) AS n_disc,
       CAST(floor((CASE WHEN pairs.c + pairs.d + pairs.ty > 0.0
                        THEN (pairs.c - pairs.d)
                             / (pairs.c + pairs.d + pairs.ty)
                        ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT)
         AS d_yx_micro,
       CAST(floor((CASE WHEN pairs.c + pairs.d + tx.tx > 0.0
                        THEN (pairs.c - pairs.d)
                             / (pairs.c + pairs.d + tx.tx)
                        ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT)
         AS d_xy_micro
FROM pairs, tx WHERE tx.k >= 2"""


QUERIES243 = {
    "events_kuiper": q_events_kuiper,
    "lineitem_somers_d": q_lineitem_somers_d,
}
