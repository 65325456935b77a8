"""Driver-contract queries, wave 197 — Benjamini-Hochberg FDR over per-type
weekend-effect z-tests (normal CDF via the Abramowitz-Stegun 26.2.17
polynomial, implemented IDENTICALLY in numpy and SQL) and an exponential
goodness-of-fit for inter-event gaps (MLE rate + fixed-grid KS distance).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES197: dict[str, str] = {}

_BH_ALPHA = 0.10
_AS_A = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_T = 0.2316419
_GOF_BUCKETS = 64
_GOF_GRID = 150


def _phi_upper(z_abs: np.ndarray) -> np.ndarray:
    """1 − Φ(z) for z ≥ 0 via Abramowitz-Stegun 26.2.17 (Horner form —
    the SQL oracle evaluates the same polynomial in the same order)."""
    t = 1.0 / (1.0 + _AS_T * z_abs)
    a1, a2, a3, a4, a5 = _AS_A
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    pdf = np.exp(-z_abs * z_abs / 2.0) / np.sqrt(2.0 * np.pi)
    return pdf * poly


def _phi_upper_sql(z: str) -> str:
    a1, a2, a3, a4, a5 = _AS_A
    t = f"(1.0 / (1.0 + {_AS_T} * {z}))"
    poly = f"((((({a5} * {t} + {a4}) * {t} + {a3}) * {t} + {a2}) * {t} + {a1}) * {t})"
    return f"(exp(-{z} * {z} / 2.0) / sqrt(2.0 * pi()) * {poly})"


# ---------------------------------------------------------------------------
# events_bh_fdr — BH step-up over weekend-effect z-tests
# ---------------------------------------------------------------------------


def q_events_bh_fdr(sf_dir: str):
    """Per event type: Welch z for weekend vs weekday mean value, two-sided
    p (A&S normal approximation) and the Benjamini-Hochberg step-up
    q-value over the |types| tests; reject = q ≤ 0.10. Output: event_type,
    z_micro, p_micro, q_micro, reject.

    Scale shape: one (type, is_weekend) cell combiner (n, Σv, Σv²); driver
    folds 2·|types| rows, the BH scan is a |types|-length cummin — no
    shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts", "value"]).to_pandas()
        df["we"] = (df["ts"].dt.dayofweek >= 5).astype(np.int64)
        v = df["value"].to_numpy(np.float64)
        df["s"] = v
        df["s2"] = v * v
        return (
            df.groupby(["event_type", "we"], sort=False, as_index=False)
            .agg(n=("s", "size"), s=("s", "sum"), s2=("s2", "sum"))
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "z_micro", "p_micro", "q_micro", "reject"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    cells = part.groupby(["event_type", "we"]).sum()
    rows = []
    for et in sorted(cells.index.get_level_values(0).unique()):
        sub = cells.loc[et]
        if 0 not in sub.index or 1 not in sub.index:
            continue
        stats = []
        for we in (0, 1):
            n = float(sub.loc[we, "n"])
            m = sub.loc[we, "s"] / n
            v = sub.loc[we, "s2"] / n - m * m
            stats.append((n, m, v))
        (n0, m0, v0), (n1, m1, v1) = stats
        se = np.sqrt(v1 / n1 + v0 / n0)
        if se <= 0.0:
            continue
        z = (m1 - m0) / se
        rows.append((et, z))
    if not rows:
        return empty
    df = pd.DataFrame(rows, columns=["event_type", "z"])
    df["p"] = 2.0 * _phi_upper(np.abs(df["z"].to_numpy(np.float64)))
    k = len(df)
    df = df.sort_values(["p", "event_type"], kind="mergesort").reset_index(drop=True)
    rank = np.arange(1, k + 1, dtype=np.float64)
    q_raw = df["p"].to_numpy(np.float64) * k / rank
    q = np.minimum.accumulate(q_raw[::-1])[::-1]
    q = np.minimum(q, 1.0)
    df["q"] = q
    df["reject"] = (q <= _BH_ALPHA).astype(np.int64)
    df = df.sort_values("event_type", kind="mergesort").reset_index(drop=True)
    micro = lambda a: np.floor(a * 1_000_000.0 + 0.5).astype(np.int64)  # noqa: E731
    return pd.DataFrame(
        {
            "event_type": df["event_type"].to_numpy(object),
            "z_micro": micro(df["z"].to_numpy(np.float64)),
            "p_micro": micro(df["p"].to_numpy(np.float64)),
            "q_micro": micro(df["q"].to_numpy(np.float64)),
            "reject": df["reject"].to_numpy(np.int64),
        }
    )


ORACLES197["events_bh_fdr"] = f"""
WITH c AS (
  SELECT event_type,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we,
         count(*) AS n, sum(value) AS s, sum(value * value) AS s2
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         sum(CASE WHEN we = 0 THEN n END) AS n0,
         sum(CASE WHEN we = 0 THEN s END) / sum(CASE WHEN we = 0 THEN n END) AS m0,
         sum(CASE WHEN we = 0 THEN s2 END) / sum(CASE WHEN we = 0 THEN n END)
           - (sum(CASE WHEN we = 0 THEN s END)
              / sum(CASE WHEN we = 0 THEN n END))
           * (sum(CASE WHEN we = 0 THEN s END)
              / sum(CASE WHEN we = 0 THEN n END)) AS v0,
         sum(CASE WHEN we = 1 THEN n END) AS n1,
         sum(CASE WHEN we = 1 THEN s END) / sum(CASE WHEN we = 1 THEN n END) AS m1,
         sum(CASE WHEN we = 1 THEN s2 END) / sum(CASE WHEN we = 1 THEN n END)
           - (sum(CASE WHEN we = 1 THEN s END)
              / sum(CASE WHEN we = 1 THEN n END))
           * (sum(CASE WHEN we = 1 THEN s END)
              / sum(CASE WHEN we = 1 THEN n END)) AS v1
  FROM c GROUP BY 1
  HAVING sum(CASE WHEN we = 0 THEN n END) IS NOT NULL
     AND sum(CASE WHEN we = 1 THEN n END) IS NOT NULL
),
z AS (
  SELECT event_type,
         (m1 - m0) / sqrt(v1 / n1 + v0 / n0) AS z
  FROM g WHERE sqrt(v1 / n1 + v0 / n0) > 0.0
),
p AS (
  SELECT event_type, z, 2.0 * {_phi_upper_sql('abs(z)')} AS p,
         count(*) OVER () AS k
  FROM z
),
r AS (
  SELECT event_type, z, p, k,
         row_number() OVER (ORDER BY p, event_type) AS rk
  FROM p
),
q AS (
  SELECT event_type, z, p,
         least(min(p * k / rk) OVER (ORDER BY rk
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0) AS q
  FROM r
)
SELECT event_type,
       CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) AS z_micro,
       CAST(floor(p * 1000000.0 + 0.5) AS BIGINT) AS p_micro,
       CAST(floor(q * 1000000.0 + 0.5) AS BIGINT) AS q_micro,
       CAST(CASE WHEN q <= {_BH_ALPHA} THEN 1 ELSE 0 END AS BIGINT) AS reject
FROM q ORDER BY event_type"""


# ---------------------------------------------------------------------------
# events_exp_gof — exponential fit + fixed-grid KS over inter-event gaps
# ---------------------------------------------------------------------------


def q_events_exp_gof(sf_dir: str):
    """Per event type: pooled per-user inter-event gaps (seconds), the MLE
    exponential rate λ = n/Σgap, and a grid Kolmogorov-Smirnov distance
    D = max_{j=1..150} |#(gap < j·step)/n − (1 − e^{−λ·j·step})| at
    step = mean/50. Output: event_type, n_gaps, lambda_micro, ks_d_micro.

    Scale shape: gaps derive inside ONE user-bucket exchange (a user's
    events co-locate; vectorized sorted diff); pass 1 folds (type, n, Σ)
    partials, pass 2 folds |types|×151 grid-histogram partials."""
    path = f"{sf_dir}/events.parquet"

    def gaps_frame(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["user_id", "event_type", "ts"], kind="mergesort")
        us = d["user_id"].to_numpy(np.int64)
        et = d["event_type"].to_numpy(object)
        ts = d["ts"].astype("datetime64[us]").to_numpy("datetime64[us]").astype(np.int64)
        same = np.zeros(len(d), dtype=bool)
        same[1:] = (us[1:] == us[:-1]) & (et[1:] == et[:-1])
        gap = np.empty(len(d), np.float64)
        gap[1:] = (ts[1:] - ts[:-1]) / 1_000_000.0
        return pd.DataFrame({"event_type": et[same], "gap": gap[same]})

    def bucketed(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "user_id", "ts"]).to_pandas()
        df["_b"] = (df["user_id"].to_numpy(np.int64) % _GOF_BUCKETS).astype(np.int32)
        return df

    ds = ray.data.read_parquet(path, columns=["event_type", "user_id", "ts"])
    gaps = (
        ds.map_batches(bucketed, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(gaps_frame, batch_format="pandas")
        .materialize()  # consumed by pass 1 (sums) and pass 2 (grid)
    )

    def sum_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["n"] = 1
        return df.groupby("event_type", sort=False, as_index=False).agg(
            n=("n", "sum"), s=("gap", "sum")
        ).astype({"n": np.int64})

    sp = gaps.map_batches(sum_partial, batch_format="pyarrow").to_pandas()
    cols = ["event_type", "n_gaps", "lambda_micro", "ks_d_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if sp.empty:
        return empty
    st = sp.groupby("event_type").sum()
    st = st[(st["n"] >= 2) & (st["s"] > 0.0)]
    if st.empty:
        return empty
    types = np.asarray(st.index.to_numpy(object))
    order = np.argsort(types)
    tkeys = types[order]
    n_arr = st["n"].to_numpy(np.float64)[order]
    s_arr = st["s"].to_numpy(np.float64)[order]
    mean = s_arr / n_arr
    lam_arr = n_arr / s_arr  # SAME op order as the SQL n/sg
    step = mean / 50.0

    def grid_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        et = df["event_type"].to_numpy(object)
        keep = np.isin(et, tkeys)
        if not keep.any():
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "idx": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        et = et[keep]
        gp = df["gap"].to_numpy(np.float64)[keep]
        stp = step[np.searchsorted(tkeys, et)]
        idx = np.minimum(np.floor(gp / stp), float(_GOF_GRID)).astype(np.int64)
        out = pd.DataFrame({"event_type": et, "idx": idx, "n": 1})
        return out.groupby(["event_type", "idx"], sort=False, as_index=False).sum().astype(
            {"n": np.int64}
        )

    gp = gaps.map_batches(grid_partial, batch_format="pyarrow").to_pandas()
    hist = gp.groupby(["event_type", "idx"])["n"].sum()
    rows = []
    for i, et in enumerate(tkeys):
        h = np.zeros(_GOF_GRID + 1, np.int64)
        if et in hist.index.get_level_values(0):
            sub = hist.loc[et]
            h[np.minimum(sub.index.to_numpy(np.int64), _GOF_GRID)] += sub.to_numpy(
                np.int64
            )
        n = int(h.sum())
        lam = float(lam_arr[i])
        cum = np.cumsum(h)[: _GOF_GRID]  # #gaps < j*step for j=1..150
        j = np.arange(1, _GOF_GRID + 1, dtype=np.float64)
        f = 1.0 - np.exp(-lam * (j * step[i]))
        d = float(np.max(np.abs(cum.astype(np.float64) / n - f)))
        rows.append(
            (et, np.int64(n),
             np.int64(np.floor(lam * 1_000_000.0 + 0.5)),
             np.int64(np.floor(d * 1_000_000.0 + 0.5)))
        )
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES197["events_exp_gof"] = f"""
WITH s AS (
  SELECT event_type, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts) AS prev
  FROM events
),
gaps AS (
  SELECT event_type,
         date_diff('microsecond', prev, ts) / 1000000.0 AS gap
  FROM s WHERE prev IS NOT NULL
),
st AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum(gap) AS sg
  FROM gaps GROUP BY 1 HAVING count(*) >= 2 AND sum(gap) > 0.0
),
grid AS (
  SELECT st.event_type, st.n, st.sg, st.sg / st.n / 50.0 AS step,
         CAST(u.range AS BIGINT) AS j
  FROM st, range(1, {_GOF_GRID + 1}) u
),
cnt AS (
  SELECT grid.event_type, grid.j,
         sum(CASE WHEN gaps.gap < grid.j * grid.step THEN 1 ELSE 0 END) AS c
  FROM grid JOIN gaps ON grid.event_type = gaps.event_type
  GROUP BY 1, 2
),
d AS (
  SELECT cnt.event_type,
         max(abs(CAST(cnt.c AS DOUBLE) / st.n
                 - (1.0 - exp(-(CAST(st.n AS DOUBLE) / st.sg)
                              * (cnt.j * (st.sg / st.n / 50.0)))))) AS ks
  FROM cnt JOIN st ON cnt.event_type = st.event_type
  GROUP BY 1
)
SELECT st.event_type, st.n AS n_gaps,
       CAST(floor(CAST(st.n AS DOUBLE) / st.sg * 1000000.0 + 0.5) AS BIGINT)
         AS lambda_micro,
       CAST(floor(d.ks * 1000000.0 + 0.5) AS BIGINT) AS ks_d_micro
FROM st JOIN d ON st.event_type = d.event_type
ORDER BY st.event_type"""


QUERIES197 = {
    "events_bh_fdr": q_events_bh_fdr,
    "events_exp_gof": q_events_exp_gof,
}
