"""Driver-contract queries, wave 104 — point-in-time SCD2 enrichment (join
every event to the status interval that was valid AT its timestamp — the
warehouse PIT-join pattern, closing the loop on wave-94's SCD2 build) and
leave-one-out target encoding (the category-encoder feature that avoids
self-leakage, exact integer rationals). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES104: dict[str, str] = {}

_PIT_BUCKETS = 16
_SCD2_OPEN = 4_611_686_018_427_387_904  # shared sentinel with queries94


# ---------------------------------------------------------------------------
# events_scd2_pit — status as-of each event's timestamp
# ---------------------------------------------------------------------------


def q_events_scd2_pit(sf_dir: str):
    """Point-in-time join: every event annotated with the SCD2 status whose
    [valid_from, valid_to) interval contains its timestamp — same-instant
    boundary rows resolve to the interval that STARTS at the event's ts
    (latest valid_from wins, the SCD2 convention; the wave-94 build's
    change-at-ts semantics make this the version the event itself created).
    Events derive their own dimension here, so every event matches.

    Scale shape: the SCD2 intervals rebuild inside the SAME user-bucket
    exchange as the probe rows (events tagged probe/build share ONE
    exchange); each bucket runs run-collapse + a per-user backward
    searchsorted — no second shuffle, no driver materialization."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "u": u,
                "ts": t["ts"].cast(pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy().astype(np.int64),
                "st": np.asarray(t["event_type"].to_numpy(zero_copy_only=False)),
                "_b": (u % _PIT_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        eid = g["eid"].to_numpy(np.int64)
        st = g["st"].to_numpy(object)
        order = np.lexsort((eid, ts, u))
        u, ts, eid, st = u[order], ts[order], eid[order], st[order]
        newu = np.r_[True, u[1:] != u[:-1]]
        change = newu.copy()
        change[1:] |= st[1:] != st[:-1]
        # for each row, index of the latest change row at-or-before it —
        # a cumulative maximum over change positions (rows are user-sorted,
        # and a user's first row is always a change row)
        idx = np.arange(len(u), dtype=np.int64)
        src = np.maximum.accumulate(np.where(change, idx, 0))
        # per-user version = rank of the change row among the user's changes
        cums = np.cumsum(change)
        first_pos = np.flatnonzero(newu)
        base = np.repeat(cums[first_pos] - 1, np.diff(np.r_[first_pos, len(u)]))
        version = (cums - base)[src]
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": u,
                "status_at": st[src],
                "status_version": version.astype(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES104["events_scd2_pit"] = f"""
WITH e AS (
  SELECT user_id, event_type AS status, epoch_us(ts) AS ts_us, event_id
  FROM events
),
ordered AS (
  SELECT *, lag(status) OVER w AS prev
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
changes AS (
  SELECT user_id, status, ts_us, event_id
  FROM ordered WHERE prev IS NULL OR prev <> status
),
v AS (
  SELECT user_id, status, ts_us AS valid_from_us, event_id AS from_eid,
         coalesce(lead(ts_us) OVER w, {_SCD2_OPEN}) AS valid_to_us,
         coalesce(lead(event_id) OVER w, {_SCD2_OPEN}) AS to_eid,
         row_number() OVER w AS version
  FROM changes WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT e.event_id, e.user_id, v.status AS status_at,
       CAST(v.version AS BIGINT) AS status_version
FROM e JOIN v
  ON v.user_id = e.user_id
 AND (v.valid_from_us < e.ts_us
      OR (v.valid_from_us = e.ts_us AND v.from_eid <= e.event_id))
 AND (e.ts_us < v.valid_to_us
      OR (e.ts_us = v.valid_to_us AND e.event_id < v.to_eid))"""


# ---------------------------------------------------------------------------
# events_target_encoding — leave-one-out mean encoding per event type
# ---------------------------------------------------------------------------


def q_events_target_encoding(sf_dir: str):
    """Leave-one-out target encoding: each event's feature is the mean
    target (value cents) of its event type EXCLUDING itself —
    (S_type − xᵢ)·10⁶ // (n_type − 1) — the leakage-free categorical
    encoding; singleton categories fall back to the global LOO mean. PURE
    integer floor division on both sides.

    Scale shape: a tiny (type, S, n) pre-pass broadcast via ray.put; the
    encode pass is a stateless per-batch transform — no shuffle."""
    import ray

    def stats(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"event_type": et, "x": cents})
            .groupby("event_type", sort=False)["x"]
            .agg(["sum", "size"])
            .reset_index()
        )
        g.columns = ["event_type", "s", "n"]
        return g.astype({"s": np.int64, "n": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(stats, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type")[["s", "n"]]
        .sum()
    )
    tys = np.array(sorted(part.index), dtype=object)
    s_arr = part.loc[tys, "s"].to_numpy(np.int64)
    n_arr = part.loc[tys, "n"].to_numpy(np.int64)
    s_all, n_all = int(s_arr.sum()), int(n_arr.sum())
    ref = ray.put((tys, s_arr, n_arr, s_all, n_all))

    def encode(t: pa.Table) -> pd.DataFrame:
        tys_, s_, n_, s_all_, n_all_ = ray.get(ref)
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        idx = np.searchsorted(tys_, et)
        s_t, n_t = s_[idx], n_[idx]
        loo = np.where(
            n_t > 1,
            (s_t - cents) * 1_000_000 // np.maximum(n_t - 1, 1),
            (s_all_ - cents) * 1_000_000 // max(n_all_ - 1, 1),
        )
        return pd.DataFrame(
            {
                "event_id": t["event_id"].to_numpy().astype(np.int64),
                "event_type": et,
                "loo_micro": loo.astype(np.int64),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(encode, batch_format="pyarrow")


ORACLES104["events_target_encoding"] = """
WITH t AS (
  SELECT event_type,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS HUGEINT) AS s,
         CAST(count(*) AS HUGEINT) AS n
  FROM events GROUP BY 1
),
g AS (SELECT CAST(sum(s) AS HUGEINT) AS s_all,
             CAST(sum(n) AS HUGEINT) AS n_all FROM t)
SELECT e.event_id, e.event_type,
       CAST(CASE WHEN t.n > 1
                 THEN (t.s - CAST(floor(e.value * 100 + 0.5) AS HUGEINT))
                      * 1000000 // (t.n - 1)
                 ELSE (g.s_all - CAST(floor(e.value * 100 + 0.5) AS HUGEINT))
                      * 1000000 // greatest(g.n_all - 1, 1) END AS BIGINT)
         AS loo_micro
FROM events e JOIN t USING (event_type), g"""


QUERIES104 = {
    "events_scd2_pit": q_events_scd2_pit,
    "events_target_encoding": q_events_target_encoding,
}
