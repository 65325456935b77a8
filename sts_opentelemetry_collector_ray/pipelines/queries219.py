"""Driver-contract queries, wave 219 — matrix profile over the daily count
series (z-normalized length-7 windows: closest motif pair + top discord,
Yeh et al. 2016) and iterative proportional fitting (raking) of the
nation × segment contingency table to uniform margins (5 sweeps,
iteration-exact SQL replay). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES219: dict[str, str] = {}

_MP_W = 7
_IPF_ITERS = 5


# ---------------------------------------------------------------------------
# events_matrix_profile — motif pair and discord per type
# ---------------------------------------------------------------------------


def q_events_matrix_profile(sf_dir: str):
    """Per event type: over z-normalized length-7 day windows (σ > 0;
    trivial matches |i−j| < 7 excluded), the MOTIF = closest window pair
    (ties → smaller i, j) and the DISCORD = window whose nearest neighbor
    is farthest (ties → smaller i). Output: event_type, motif_i_day,
    motif_j_day, motif_dist_micro, discord_day, discord_dist_micro.

    Scale shape: bounded daily fold; the O(n²·w) pair scan evaluates from
    exact integer window sums and dot products on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        return (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = [
        "event_type", "motif_i_day", "motif_j_day", "motif_dist_micro",
        "discord_day", "discord_dist_micro",
    ]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    w = _MP_W
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        x = sub["n"].to_numpy(np.float64)
        day = sub["day"].to_numpy(np.int64)
        n = len(x)
        m = n - w + 1
        if m < w + 1:
            continue
        # sliding windows as a matrix (bounded days)
        win = np.lib.stride_tricks.sliding_window_view(x, w).astype(np.float64)
        mu = win.sum(axis=1) / w
        s2 = (win * win).sum(axis=1) / w - mu * mu
        ok = s2 > 0.0
        sd = np.sqrt(np.where(ok, s2, 1.0))
        z = (win - mu[:, None]) / sd[:, None]
        # pair distances via dot products of z rows
        g = z @ z.T
        d2 = np.maximum(
            g.diagonal()[:, None] + g.diagonal()[None, :] - 2.0 * g, 0.0
        )
        dist = np.sqrt(d2)
        i_idx = np.arange(m)[:, None]
        j_idx = np.arange(m)[None, :]
        valid = (np.abs(i_idx - j_idx) >= w) & ok[:, None] & ok[None, :]
        dist = np.where(valid, dist, np.inf)
        if not np.isfinite(dist).any():
            continue
        flat = np.argmin(np.where(i_idx < j_idx, dist, np.inf))
        mi, mj = np.unravel_index(flat, dist.shape)
        nn = dist.min(axis=1)
        nn_ok = np.isfinite(nn) & ok
        if not nn_ok.any():
            continue
        nn_masked = np.where(nn_ok, nn, -np.inf)
        di = int(np.argmax(nn_masked))
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append(
            (
                et, np.int64(day[mi]), np.int64(day[mj]),
                micro(dist[mi, mj]), np.int64(day[di]), micro(nn[di]),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES219["events_matrix_profile"] = f"""
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM daily
),
winstat AS (
  SELECT a.event_type, a.t AS i, a.day AS day,
         sum(b.n) / {_MP_W} AS mu,
         sum(b.n * b.n) / {_MP_W} - (sum(b.n) / {_MP_W}) * (sum(b.n) / {_MP_W})
           AS s2,
         any_value(a.nd) AS nd
  FROM idx a JOIN idx b ON a.event_type = b.event_type
        AND b.t BETWEEN a.t AND a.t + {_MP_W - 1}
  WHERE a.t + {_MP_W - 1} <= a.nd
  GROUP BY 1, 2, 3 HAVING count(*) = {_MP_W}
),
dots AS (
  SELECT wa.event_type, wa.i AS i, wb.i AS j,
         sum(((xa.n - wa.mu) / sqrt(wa.s2)) * ((xb.n - wb.mu) / sqrt(wb.s2)))
           AS zdot
  FROM winstat wa
  JOIN winstat wb ON wa.event_type = wb.event_type
       AND abs(wa.i - wb.i) >= {_MP_W}
       AND wa.s2 > 0.0 AND wb.s2 > 0.0
  JOIN range(0, {_MP_W}) o ON true
  JOIN idx xa ON xa.event_type = wa.event_type AND xa.t = wa.i + o.range
  JOIN idx xb ON xb.event_type = wb.event_type AND xb.t = wb.i + o.range
  GROUP BY 1, 2, 3
),
dist AS (
  SELECT event_type, i, j,
         sqrt(greatest({_MP_W}.0 + {_MP_W}.0 - 2.0 * zdot, 0.0)) AS d
  FROM dots
),
motif AS (
  SELECT event_type, i, j, d,
         row_number() OVER (PARTITION BY event_type ORDER BY d, i, j) AS r
  FROM dist WHERE i < j
),
nn AS (
  SELECT event_type, i, min(d) AS nd FROM dist GROUP BY 1, 2
),
disc AS (
  SELECT event_type, i, nd,
         row_number() OVER (PARTITION BY event_type ORDER BY nd DESC, i) AS r
  FROM nn
)
SELECT m.event_type,
       (SELECT day FROM winstat WHERE winstat.event_type = m.event_type
          AND winstat.i = m.i) AS motif_i_day,
       (SELECT day FROM winstat WHERE winstat.event_type = m.event_type
          AND winstat.i = m.j) AS motif_j_day,
       CAST(floor(m.d * 1000000.0 + 0.5) AS BIGINT) AS motif_dist_micro,
       (SELECT day FROM winstat WHERE winstat.event_type = d2.event_type
          AND winstat.i = d2.i) AS discord_day,
       CAST(floor(d2.nd * 1000000.0 + 0.5) AS BIGINT) AS discord_dist_micro
FROM motif m JOIN disc d2 ON m.event_type = d2.event_type
WHERE m.r = 1 AND d2.r = 1 ORDER BY m.event_type"""


# ---------------------------------------------------------------------------
# customer_ipf_raking — iterative proportional fitting to uniform margins
# ---------------------------------------------------------------------------


def q_customer_ipf_raking(sf_dir: str):
    """IPF/raking (Deming & Stephan 1940): rake the nation × segment
    customer counts to UNIFORM row and column margins (total preserved),
    5 full sweeps (rows then columns). Output: top-10 cells by raked
    weight (ties → nation, segment) plus the residual row-margin gap
    max|rowsum − target| as a constant column. Output: c_nationkey,
    c_mktsegment, weight_micro, gap_micro.

    Scale shape: one bounded (nation, segment, n) combiner; the 25×5 IPF
    runs on the driver — no shuffle."""
    path = f"{sf_dir}/customer.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["c_nationkey", "c_mktsegment"]).to_pandas()
        df["n"] = 1
        return df.groupby(
            ["c_nationkey", "c_mktsegment"], sort=False, as_index=False
        )["n"].sum().astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["c_nationkey", "c_mktsegment"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["c_nationkey", "c_mktsegment", "weight_micro", "gap_micro"]
    if part.empty:
        return pd.DataFrame(
            {"c_nationkey": pd.Series([], dtype=np.int64),
             "c_mktsegment": pd.Series([], dtype=object),
             "weight_micro": pd.Series([], dtype=np.int64),
             "gap_micro": pd.Series([], dtype=np.int64)}
        )
    g = part.groupby(["c_nationkey", "c_mktsegment"])["n"].sum()
    nats = np.sort(g.index.get_level_values(0).unique().to_numpy(np.int64))
    segs = sorted(g.index.get_level_values(1).unique())
    wmat = np.zeros((len(nats), len(segs)), np.float64)
    ni = np.searchsorted(nats, g.index.get_level_values(0).to_numpy(np.int64))
    si = np.array([segs.index(s) for s in g.index.get_level_values(1)])
    wmat[ni, si] = g.to_numpy(np.int64)
    total = wmat.sum()
    tr = total / len(nats)
    tc = total / len(segs)
    for _ in range(_IPF_ITERS):
        rs = wmat.sum(axis=1)
        wmat = wmat * (tr / rs)[:, None]
        cs_ = wmat.sum(axis=0)
        wmat = wmat * (tc / cs_)[None, :]
    gap = float(np.abs(wmat.sum(axis=1) - tr).max())
    rows = []
    for i, nk in enumerate(nats):
        for j, sg in enumerate(segs):
            rows.append(
                (np.int64(nk), sg,
                 np.int64(np.floor(wmat[i, j] * 1_000_000.0 + 0.5)))
            )
    df = pd.DataFrame(rows, columns=cols[:3])
    df = df.sort_values(
        ["weight_micro", "c_nationkey", "c_mktsegment"],
        ascending=[False, True, True], kind="mergesort",
    ).head(10)
    df["gap_micro"] = np.int64(np.floor(gap * 1_000_000.0 + 0.5))
    return df.reset_index(drop=True).astype(
        {"c_nationkey": np.int64, "weight_micro": np.int64, "gap_micro": np.int64}
    )


def _ipf_oracle() -> str:
    steps = []
    prev = "w0"
    for k in range(1, _IPF_ITERS + 1):
        steps.append(f""",
r{k} AS MATERIALIZED (
  SELECT nk, sg, w * ((SELECT tr FROM tgt)
         / sum(w) OVER (PARTITION BY nk)) AS w
  FROM {prev}
),
w{k} AS MATERIALIZED (
  SELECT nk, sg, w * ((SELECT tc FROM tgt)
         / sum(w) OVER (PARTITION BY sg)) AS w
  FROM r{k}
)""")
        prev = f"w{k}"
    return f"""
WITH c AS (
  SELECT c_nationkey AS nk, c_mktsegment AS sg,
         CAST(count(*) AS DOUBLE) AS w
  FROM customer GROUP BY 1, 2
),
grid AS (
  SELECT n.nk, s.sg, coalesce(c.w, 0.0) AS w
  FROM (SELECT DISTINCT nk FROM c) n
  CROSS JOIN (SELECT DISTINCT sg FROM c) s
  LEFT JOIN c ON c.nk = n.nk AND c.sg = s.sg
),
tgt AS (
  SELECT sum(w) / (SELECT count(DISTINCT nk) FROM c) AS tr,
         sum(w) / (SELECT count(DISTINCT sg) FROM c) AS tc
  FROM grid
),
w0 AS MATERIALIZED (SELECT nk, sg, w FROM grid){"".join(steps)},
gap AS (
  SELECT max(abs(rs - (SELECT tr FROM tgt))) AS g
  FROM (SELECT nk, sum(w) AS rs FROM {prev} GROUP BY 1)
)
SELECT CAST(nk AS BIGINT) AS c_nationkey, sg AS c_mktsegment,
       CAST(floor(w * 1000000.0 + 0.5) AS BIGINT) AS weight_micro,
       CAST(floor(gap.g * 1000000.0 + 0.5) AS BIGINT) AS gap_micro
FROM {prev}, gap
ORDER BY weight_micro DESC, c_nationkey ASC, c_mktsegment ASC LIMIT 10"""


ORACLES219["customer_ipf_raking"] = _ipf_oracle()


QUERIES219 = {
    "events_matrix_profile": q_events_matrix_profile,
    "customer_ipf_raking": q_customer_ipf_raking,
}
