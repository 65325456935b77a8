"""Driver-contract queries, wave 70 — embedding anisotropy (how far the
cloud's mean sits from the origin relative to its energy; the common-
direction pathology that hurts cosine retrieval) and DAU/MAU stickiness
(the engagement ratio, with EXACT distributed distinct counting). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES70: dict[str, str] = {}

_AN_SCALE = 1 << 20
_AN_DIM = 64
_ST_BUCKETS = 64
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# emb_anisotropy — ‖Σx‖² / (n·Σ‖x‖²) in exact integers
# ---------------------------------------------------------------------------


def q_emb_anisotropy(sf_dir: str):
    """Anisotropy score: with 2⁻²⁰-quantized components,
    score = ‖Σᵢ xᵢ‖² / (n · Σᵢ ‖xᵢ‖²) ∈ [0, 1] — 0 for a balanced cloud,
    → 1 when every vector shares one direction. Both numerator and
    denominator are EXACT integer folds (arbitrary precision), one float
    division at the end.

    Scale shape: per-batch (per-dim sum vector, Σ‖x‖², n) partials — d+2
    scalars per block; ONE tiny exchange; driver fold."""
    from ..functions.vectors import stack_list_column

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _AN_SCALE + 0.5).astype(np.int64)
        ss = sum(int(x) for x in (q.astype(object) * q.astype(object)).sum(axis=1).tolist())
        # ss can exceed int64 on a large block: ship it as (hi, lo) int64s
        ss_hi, ss_lo = ss >> 60, ss & ((1 << 60) - 1)
        extra = np.zeros(_AN_DIM - 1, np.int64)
        return pd.DataFrame(
            {
                "dim": np.arange(_AN_DIM, dtype=np.int64),
                "s": q.sum(axis=0),
                "ss_hi": np.concatenate([[ss_hi], extra]),
                "ss_lo": np.concatenate([[ss_lo], extra]),
                "n": np.concatenate([[len(q)], extra]),
            }
        )

    parts = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: d rows per block
    )
    s = parts.groupby("dim")["s"].apply(lambda col: sum(int(v) for v in col))
    num = sum(int(v) * int(v) for v in s)
    ss = sum(int(v) << 60 for v in parts["ss_hi"]) + sum(int(v) for v in parts["ss_lo"])
    n = int(parts["n"].sum())
    den = n * ss
    score = float(num) / float(den) if den else 0.0
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "anisotropy_micro": [np.int64(np.floor(score * 1e6 + 0.5))],
        }
    )


ORACLES70["emb_anisotropy"] = f"""
WITH u AS (
  SELECT CAST(g.i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(g.i AS INT) + 1] AS DOUBLE)
                    * {_AN_SCALE} + 0.5) AS HUGEINT) AS q
  FROM embeddings CROSS JOIN range(0, {_AN_DIM}) g(i)
),
dims AS (SELECT dim, sum(q) AS s FROM u GROUP BY 1),
num AS (SELECT sum(s * s) AS num FROM dims),
den AS (SELECT sum(q * q) AS ss FROM u),
n AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings)
SELECT CAST(n.n AS BIGINT) AS n,
       CAST(floor(CASE WHEN n.n * den.ss = 0 THEN 0.0
                       ELSE CAST(num.num AS DOUBLE)
                            / CAST(n.n * den.ss AS DOUBLE)
                  END * 1000000 + 0.5) AS BIGINT) AS anisotropy_micro
FROM n, num, den"""


# ---------------------------------------------------------------------------
# events_stickiness — DAU/MAU engagement ratio, exact distincts
# ---------------------------------------------------------------------------


def q_events_stickiness(sf_dir: str):
    """Stickiness per calendar month: MAU (exact distinct users), the sum of
    daily DAUs, active-day count, and stickiness = mean(DAU)/MAU in EXACT
    integer basis points (round-half-up).

    Scale shape: per-batch distinct (user, day) partials → ONE user-bucket
    exchange (a user lives in exactly one bucket, so per-bucket distinct
    counts SUM exactly) → bounded (month/day, count) partials → driver
    fold."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // _DAY_US
        )
        out = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(np.int64), "day": day}
        ).drop_duplicates()
        out["_b"] = (out["user_id"].to_numpy(np.int64) % _ST_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ud = g[["user_id", "day"]].drop_duplicates()
        month = pd.to_datetime(ud["day"].to_numpy(np.int64) * 86_400, unit="s").strftime(
            "%Y-%m"
        )
        ud = ud.assign(month=month)
        dau = (
            ud.groupby("day", sort=False)
            .size()
            .rename("cnt")
            .reset_index()
            .assign(kind="d")
            .rename(columns={"day": "key"})
        )
        mau = (
            ud[["user_id", "month"]]
            .drop_duplicates()
            .groupby("month", sort=False)
            .size()
            .rename("cnt")
            .reset_index()
            .assign(kind="m")
            .rename(columns={"month": "key"})
        )
        dau["key"] = dau["key"].astype(str)
        out = pd.concat([dau, mau], ignore_index=True)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[["kind", "key", "cnt"]]

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: days + months per bucket
        .groupby(["kind", "key"])["cnt"]
        .sum()
    )
    dau = parts.loc["d"]
    dau.index = dau.index.astype(np.int64)  # merge ships day keys as strings
    mau = parts.loc["m"]
    day_keys = dau.index.to_numpy(np.int64)
    day_month = pd.Series(
        pd.to_datetime(day_keys * 86_400, unit="s").strftime("%Y-%m"),
        index=day_keys,
    )
    rows = []
    for month in sorted(mau.index):
        days = day_month[day_month == month].index
        sum_dau = int(dau.loc[days].sum())
        n_days = len(days)
        m = int(mau.loc[month])
        bp = (20_000 * sum_dau + m * n_days) // (2 * m * n_days)
        rows.append((month, m, sum_dau, n_days, bp))
    return pd.DataFrame(
        {
            "month": [r[0] for r in rows],
            "mau": np.array([r[1] for r in rows], np.int64),
            "sum_dau": np.array([r[2] for r in rows], np.int64),
            "n_days": np.array([r[3] for r in rows], np.int64),
            "stickiness_bp": np.array([r[4] for r in rows], np.int64),
        }
    )


ORACLES70["events_stickiness"] = """
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day,
         strftime(ts, '%Y-%m') AS month
  FROM events
),
dau AS (SELECT month, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM ud GROUP BY 1, 2),
mau AS (SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        FROM ud GROUP BY 1),
a AS (
  SELECT dau.month, CAST(sum(dau.dau) AS BIGINT) AS sum_dau,
         CAST(count(*) AS BIGINT) AS n_days
  FROM dau GROUP BY 1
)
SELECT a.month, mau.mau, a.sum_dau, a.n_days,
       CAST((20000 * a.sum_dau + mau.mau * a.n_days)
            // (2 * mau.mau * a.n_days) AS BIGINT) AS stickiness_bp
FROM a JOIN mau USING (month) ORDER BY a.month"""


QUERIES70 = {
    "emb_anisotropy": q_emb_anisotropy,
    "events_stickiness": q_events_stickiness,
}
