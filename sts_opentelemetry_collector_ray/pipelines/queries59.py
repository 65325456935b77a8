"""Driver-contract queries, wave 59 — bot-regularity screening (inter-arrival
coefficient-of-variation, the "too regular to be human" detector) and the
stationary distribution of the event-type Markov chain (integer power
iteration — where user behavior settles). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES59: dict[str, str] = {}

_BOT_MIN_GAPS = 5
_BOT_BUCKETS = 64
_MKV_TOTAL = 10**12
_MKV_ITERS = 10


# ---------------------------------------------------------------------------
# events_bot_regularity — inter-arrival CV² screen, pure integer
# ---------------------------------------------------------------------------


def q_events_bot_regularity(sf_dir: str):
    """Bot screen: per user with ≥ 5 inter-arrival gaps (whole seconds,
    ordered by (ts, event_id)), squared coefficient of variation
    CV² = n·Σg²/(Σg)² − 1; flag when CV² < 0.1 — evaluated as the EXACT
    integer predicate 10·n·Σg² < 11·(Σg)² (arbitrary-precision ints, no
    float). Reports scored/flagged counts and the most-regular user's CV² in
    micro units.

    Scale shape: ONE user-bucket exchange; per-bucket lexsort + vectorized
    diff; per-user (n, Σg, Σg²) folds in object-int arithmetic (bounded by
    the bucket's user count); only |buckets| partial rows reach the
    driver."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _b=(df["user_id"].to_numpy(np.int64) % _BOT_BUCKETS).astype(np.int64)
        )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                g["event_id"].to_numpy(np.int64),
                g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                g["user_id"].to_numpy(np.int64),
            )
        )
        uid = g["user_id"].to_numpy(np.int64)[order]
        ts_s = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[order]
            // 1_000_000
        )
        same = np.empty(len(uid), dtype=bool)
        same[0] = False
        same[1:] = uid[1:] == uid[:-1]
        gaps = np.diff(ts_s)
        gu = uid[1:][same[1:]]
        gv = gaps[same[1:]]
        agg = (
            pd.DataFrame({"u": gu, "g": gv, "g2": gv.astype(object) * gv.astype(object)})
            .groupby("u", sort=False)
            .agg(n=("g", "size"), s=("g", "sum"), s2=("g2", "sum"))
        )
        ok = (agg["n"].to_numpy(np.int64) >= _BOT_MIN_GAPS) & (
            agg["s"].to_numpy(np.int64) > 0
        )
        n_o = agg["n"].to_numpy()[ok].astype(object)
        s_o = agg["s"].to_numpy()[ok].astype(object)
        s2_o = agg["s2"].to_numpy()[ok].astype(object)  # already exact ints
        flags = 10 * n_o * s2_o < 11 * s_o * s_o  # object ints: no overflow
        cv2 = (1_000_000 * n_o * s2_o) // (s_o * s_o) - 1_000_000
        return pd.DataFrame(
            {
                "n_scored": [np.int64(len(n_o))],
                "n_flagged": [np.int64(int(flags.sum()) if len(n_o) else 0)],
                "min_cv2_micro": [
                    np.int64(min(cv2) if len(cv2) else -1)
                ],
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
        )
        .map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(score, batch_format="pandas")
        .to_pandas()  # bounded: one row per bucket
    )
    scored = parts[parts["min_cv2_micro"] >= 0]
    return pd.DataFrame(
        {
            "n_scored": [np.int64(parts["n_scored"].sum())],
            "n_flagged": [np.int64(parts["n_flagged"].sum())],
            "min_cv2_micro": [
                np.int64(scored["min_cv2_micro"].min() if len(scored) else -1)
            ],
        }
    )


ORACLES59["events_bot_regularity"] = f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS ts_s,
         lag(epoch_us(ts) // 1000000)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
  FROM events
),
gaps AS (
  SELECT user_id, CAST(ts_s - prev_s AS HUGEINT) AS g
  FROM o WHERE prev_s IS NOT NULL
),
agg AS (
  SELECT user_id, CAST(count(*) AS HUGEINT) AS n, sum(g) AS s,
         sum(g * g) AS s2
  FROM gaps GROUP BY 1
),
scored AS (
  SELECT n, s, s2,
         (1000000 * n * s2) // (s * s) - 1000000 AS cv2_micro,
         (10 * n * s2 < 11 * s * s) AS flagged
  FROM agg WHERE n >= {_BOT_MIN_GAPS} AND s > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_scored,
       CAST(coalesce(count(*) FILTER (flagged), 0) AS BIGINT) AS n_flagged,
       CAST(coalesce(min(cv2_micro), -1) AS BIGINT) AS min_cv2_micro
FROM scored"""


# ---------------------------------------------------------------------------
# events_markov_stationary — integer power iteration on the type chain
# ---------------------------------------------------------------------------


def q_events_markov_stationary(sf_dir: str):
    """Stationary distribution of the per-user event-type transition chain:
    (prev → next) counts over (ts, event_id)-ordered per-user streams, then
    10 integer power-iteration steps — v⁰ = TOTAL//k per state;
    flow(i→j) = (v(i)·cnt(i,j)) // out(i), states with no outgoing
    transitions self-loop — the pagerank-style EXACT arithmetic that a
    recursive CTE replays byte-for-byte.

    Scale shape: ONE user-bucket exchange; per-bucket vectorized shift emits
    (prev, next) count partials — the exchange and the driver fold are both
    bounded by the |types|² grid; iteration is driver-side over that tiny
    grid."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _b=(df["user_id"].to_numpy(np.int64) % _BOT_BUCKETS).astype(np.int64)
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (
                g["event_id"].to_numpy(np.int64),
                g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                g["user_id"].to_numpy(np.int64),
            )
        )
        uid = g["user_id"].to_numpy(np.int64)[order]
        et = g["event_type"].to_numpy()[order]
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame({"a": et[:-1][same], "b": et[1:][same]})
        c = df.groupby(["a", "b"], sort=False).size().rename("cnt").reset_index()
        c["cnt"] = c["cnt"].astype(np.int64)
        return c

    cnt = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(transitions, batch_format="pandas")
        .to_pandas()  # bounded: |types|^2 per bucket
        .groupby(["a", "b"])["cnt"]
        .sum()
        .reset_index()
    )
    states = sorted(set(cnt["a"]) | set(cnt["b"]))
    k = len(states)
    idx = {s: i for i, s in enumerate(states)}
    C = np.zeros((k, k), dtype=np.int64)
    for a, b, c in zip(cnt["a"], cnt["b"], cnt["cnt"]):
        C[idx[a], idx[b]] = c
    out = C.sum(axis=1)
    v = [int(_MKV_TOTAL) // k] * k
    for _ in range(_MKV_ITERS):
        nv = [0] * k
        for i in range(k):
            if out[i] == 0:
                nv[i] += v[i]  # absorbing: self-loop keeps the mass
                continue
            for j in range(k):
                if C[i, j]:
                    nv[j] += (v[i] * int(C[i, j])) // int(out[i])
        v = nv
    return pd.DataFrame(
        {
            "state": states,
            "stationary_int": np.array(v, np.int64),
        }
    )


def _markov_oracle(iters: int = _MKV_ITERS, total: int = _MKV_TOTAL) -> str:
    # iteration UNROLLED into chained CTEs (recursive members may not
    # aggregate + self-reference more than once); E carries real edges with
    # (num=cnt, den=outdeg) plus (s, s, 1, 1) self-loops for absorbing states
    steps = []
    prev = "v0"
    for r in range(1, iters + 1):
        steps.append(
            f"""v{r} AS (
  SELECT st.s, coalesce(f.val, 0) AS val
  FROM states st LEFT JOIN (
    SELECT e.b AS s, sum((v.val * e.num) // e.den) AS val
    FROM {prev} v JOIN e ON e.a = v.s GROUP BY 1
  ) f USING (s)
)"""
        )
        prev = f"v{r}"
    chained = ",\n".join(steps)
    return f"""
WITH o AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
c AS (
  SELECT prev AS a, event_type AS b, CAST(count(*) AS BIGINT) AS cnt
  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2
),
states AS (SELECT DISTINCT a AS s FROM c UNION SELECT DISTINCT b AS s FROM c),
outd AS (
  SELECT s.s, coalesce(sum(c.cnt), 0) AS od
  FROM states s LEFT JOIN c ON c.a = s.s GROUP BY 1
),
e AS (
  SELECT c.a, c.b, c.cnt AS num, outd.od AS den
  FROM c JOIN outd ON outd.s = c.a WHERE outd.od > 0
  UNION ALL
  SELECT s, s, 1, 1 FROM outd WHERE od = 0
),
k AS (SELECT count(*) AS k FROM states),
v0 AS (SELECT s.s, {total} // k.k AS val FROM states s CROSS JOIN k),
{chained}
SELECT s AS state, CAST(val AS BIGINT) AS stationary_int
FROM {prev} ORDER BY s"""


ORACLES59["events_markov_stationary"] = _markov_oracle()


QUERIES59 = {
    "events_bot_regularity": q_events_bot_regularity,
    "events_markov_stationary": q_events_markov_stationary,
}
