"""Driver-contract queries, wave 192 — Roaring-bitmap container census over
per-type user-id sets (array/bitmap/run container selection + byte estimate)
and rendezvous (highest-random-weight) hashing with a shard-addition remap
audit. Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES192: dict[str, str] = {}

_RB_BUCKETS = 64
_HRW_BUCKETS = 64
_HRW_SHARDS = 4  # s0..s3; the remap audit adds s4
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xBF58476D1CE4E5B9)
_TWO64_SQL = "18446744073709551616"


# ---------------------------------------------------------------------------
# events_roaring_census — Roaring container selection audit
# ---------------------------------------------------------------------------


def q_events_roaring_census(sf_dir: str):
    """Per event type, chunk the distinct user-id set by 2¹⁶ (Roaring's key
    split, Chambi et al. 2016) and pick each container's encoding: array
    (2n bytes, only if n ≤ 4096), run (2+4·runs bytes) or bitmap (8192);
    ties prefer array, then run. Output per type: container counts by kind
    and the total byte estimate.

    Scale shape: per-batch distinct (type, chunk, uid) → ONE chunk-bucket
    exchange (a chunk's ids co-locate; per-bucket distinct is global) →
    vectorized sorted-diff run counting; driver folds |types|×4 rows."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "user_id"]).to_pandas().drop_duplicates()
        uid = df["user_id"].to_numpy(np.int64)
        df["chunk"] = uid // 65536
        df["_b"] = (df["chunk"].to_numpy() % _RB_BUCKETS).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["event_type", "chunk", "user_id"]).sort_values(
            ["event_type", "chunk", "user_id"], kind="mergesort"
        )
        et = d["event_type"].to_numpy(object)
        ck = d["chunk"].to_numpy(np.int64)
        uid = d["user_id"].to_numpy(np.int64)
        new = np.ones(len(d), dtype=bool)
        new[1:] = (et[1:] != et[:-1]) | (ck[1:] != ck[:-1])
        run_start = new.copy()
        run_start[1:] |= uid[1:] != uid[:-1] + 1
        grp = np.cumsum(new) - 1
        n = np.bincount(grp)
        runs = np.bincount(grp, weights=run_start.astype(np.int64)).astype(np.int64)
        first = np.flatnonzero(new)
        size_arr = np.where(n <= 4096, 2 * n, np.iinfo(np.int64).max)
        size_run = 2 + 4 * runs
        size_bmp = np.full(len(n), 8192, np.int64)
        best = np.minimum(np.minimum(size_arr, size_run), size_bmp)
        kind = np.where(
            size_arr == best, "array", np.where(size_run == best, "run", "bitmap")
        )
        return pd.DataFrame(
            {
                "event_type": et[first],
                "kind": kind,
                "n_containers": np.ones(len(n), np.int64),
                "bytes_est": best.astype(np.int64),
            }
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["event_type", "n_chunks", "n_array", "n_run", "n_bitmap", "bytes_total"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    g = part.groupby(["event_type", "kind"], as_index=False).agg(
        n=("n_containers", "sum"), b=("bytes_est", "sum")
    )
    p = g.pivot_table(
        index="event_type", columns="kind", values="n", fill_value=0, aggfunc="sum"
    )
    for k in ("array", "run", "bitmap"):
        if k not in p.columns:
            p[k] = 0
    tot = g.groupby("event_type").agg(nc=("n", "sum"), bt=("b", "sum"))
    out = pd.DataFrame(
        {
            "event_type": np.asarray(p.index.to_numpy(object)),
            "n_chunks": tot["nc"].to_numpy(np.int64),
            "n_array": p["array"].to_numpy(np.int64),
            "n_run": p["run"].to_numpy(np.int64),
            "n_bitmap": p["bitmap"].to_numpy(np.int64),
            "bytes_total": tot["bt"].to_numpy(np.int64),
        }
    ).sort_values("event_type", kind="mergesort")
    return out.reset_index(drop=True)


ORACLES192["events_roaring_census"] = """
WITH d AS (
  SELECT DISTINCT event_type, user_id // 65536 AS chunk, user_id FROM events
),
r AS (
  SELECT event_type, chunk, user_id,
         CASE WHEN user_id <> lag(user_id) OVER
                (PARTITION BY event_type, chunk ORDER BY user_id) + 1
              OR lag(user_id) OVER
                (PARTITION BY event_type, chunk ORDER BY user_id) IS NULL
              THEN 1 ELSE 0 END AS run_start
  FROM d
),
c AS (
  SELECT event_type, chunk,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(run_start) AS BIGINT) AS runs
  FROM r GROUP BY 1, 2
),
k AS (
  SELECT event_type,
         CASE WHEN n <= 4096 THEN 2 * n ELSE 9223372036854775807 END AS sa,
         2 + 4 * runs AS sr,
         8192 AS sb
  FROM c
),
k2 AS (
  SELECT event_type,
         least(sa, sr, sb) AS best,
         CASE WHEN sa = least(sa, sr, sb) THEN 'array'
              WHEN sr = least(sa, sr, sb) THEN 'run'
              ELSE 'bitmap' END AS kind
  FROM k
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN kind = 'array' THEN 1 ELSE 0 END) AS BIGINT) AS n_array,
       CAST(sum(CASE WHEN kind = 'run' THEN 1 ELSE 0 END) AS BIGINT) AS n_run,
       CAST(sum(CASE WHEN kind = 'bitmap' THEN 1 ELSE 0 END) AS BIGINT) AS n_bitmap,
       CAST(sum(best) AS BIGINT) AS bytes_total
FROM k2 GROUP BY 1 ORDER BY 1"""


# ---------------------------------------------------------------------------
# events_rendezvous_hash — HRW shard assignment + remap audit
# ---------------------------------------------------------------------------


def _hrw_weight(uid: np.ndarray, shard: int) -> np.ndarray:
    """Deterministic HRW weight: xorshift-mixed multiplicative hash of
    (uid, shard) — wraps mod 2⁶⁴ on both sides (SQL replays in HUGEINT)."""
    with np.errstate(over="ignore"):
        h = (uid.astype(np.uint64) ^ (np.uint64(shard + 1) * _P2)) * _P1
        return h ^ (h >> np.uint64(33))


def q_events_rendezvous_hash(sf_dir: str):
    """Rendezvous (highest-random-weight) hashing audit (Thaler & Ravishankar
    1996): assign each distinct user to argmax over shards s0..s3 of a
    deterministic 64-bit weight; re-run with shard s4 added. Output per shard:
    users before, users after, and how many of its users MOVED when s4 joined
    (HRW guarantees moves only land on the new shard). ORDER BY shard.

    Scale shape: per-batch distinct users → ONE user-bucket exchange
    (per-bucket distinct is global, weights vectorized per shard) → driver
    folds buckets × |shards| count rows."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["user_id"]).to_pandas().drop_duplicates()
        df["_b"] = (df["user_id"].to_numpy(np.int64) % _HRW_BUCKETS).astype(np.int32)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = np.unique(g["user_id"].to_numpy(np.int64))
        w = np.stack(
            [_hrw_weight(uid, s) for s in range(_HRW_SHARDS + 1)], axis=1
        )
        before = np.argmax(w[:, :_HRW_SHARDS], axis=1)
        after = np.argmax(w, axis=1)
        moved = (before != after).astype(np.int64)
        df = pd.DataFrame({"before": before, "after": after, "moved": moved})
        b = df.groupby("before", as_index=False).agg(
            n_before=("before", "size"), n_moved=("moved", "sum")
        ).rename(columns={"before": "shard"})
        a = df.groupby("after", as_index=False).size().rename(
            columns={"after": "shard", "size": "n_after"}
        )
        out = b.merge(a, on="shard", how="outer").fillna(0)
        return out.astype(
            {"shard": np.int64, "n_before": np.int64,
             "n_moved": np.int64, "n_after": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["shard", "n_before", "n_after", "n_moved"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    g = part.groupby("shard", as_index=False).sum().sort_values("shard")
    return g[cols].reset_index(drop=True).astype(np.int64)


def _hrw_sql(shard: int) -> str:
    # 64×64-bit multiply mod 2^64 in INT128-safe pieces: split P1 into
    # 32-bit halves so every intermediate stays below 2^97
    bh, bl = int(_P1) >> 32, int(_P1) & 0xFFFFFFFF
    u = f"xor(CAST(user_id AS HUGEINT), CAST({int(_P2) * (shard + 1) % (1 << 64)} AS HUGEINT))"
    h = (
        f"((({u} * {bl}) % {_TWO64_SQL}"
        f" + (({u} * {bh}) % 4294967296) * 4294967296) % {_TWO64_SQL})"
    )
    return f"xor({h}, {h} // 8589934592)"


_HRW_W = ", ".join(
    f"{_hrw_sql(s)} AS w{s}" for s in range(_HRW_SHARDS + 1)
)
_HRW_BEFORE = "".join(
    f"WHEN w{s} = greatest(w0, w1, w2, w3) THEN {s} "
    for s in range(_HRW_SHARDS)
)
_HRW_AFTER = "".join(
    f"WHEN w{s} = greatest(w0, w1, w2, w3, w4) THEN {s} "
    for s in range(_HRW_SHARDS + 1)
)

ORACLES192["events_rendezvous_hash"] = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
w AS (SELECT user_id, {_HRW_W} FROM u),
a AS (
  SELECT user_id,
         CASE {_HRW_BEFORE}END AS before,
         CASE {_HRW_AFTER}END AS after
  FROM w
),
b AS (
  SELECT before AS shard, CAST(count(*) AS BIGINT) AS n_before,
         CAST(sum(CASE WHEN before <> after THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved
  FROM a GROUP BY 1
),
c AS (SELECT after AS shard, CAST(count(*) AS BIGINT) AS n_after
      FROM a GROUP BY 1)
SELECT CAST(coalesce(b.shard, c.shard) AS BIGINT) AS shard,
       coalesce(b.n_before, 0) AS n_before,
       coalesce(c.n_after, 0) AS n_after,
       coalesce(b.n_moved, 0) AS n_moved
FROM b FULL OUTER JOIN c ON b.shard = c.shard
ORDER BY shard"""


QUERIES192 = {
    "events_roaring_census": q_events_roaring_census,
    "events_rendezvous_hash": q_events_rendezvous_hash,
}
