"""Driver-contract queries, wave 93 — difference-in-differences (treatment
vs control event types around a cutoff on the dense day grid: the causal
pre/post estimator with zero-count days included) and LOCF daily resample
(last-observation-carried-forward per type on the dense grid — the gap-fill
mode linear interpolation can't give you when values must never be
invented). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES93: dict[str, str] = {}

_DID_T = "click"
_DID_C = "view"
_DID_CUTOFF = "1998-07-01"
_LOCF_BUCKETS = 8
_DAY_US = 86_400_000_000


def _day_const(date_str: str) -> int:
    return int(np.datetime64(date_str).astype("datetime64[D]").astype(np.int64))


# ---------------------------------------------------------------------------
# events_diff_in_diff — treatment/control daily-rate DiD around the cutoff
# ---------------------------------------------------------------------------


def q_events_diff_in_diff(sf_dir: str):
    """DiD: mean daily '{T}' count minus mean daily '{C}' count, post minus
    pre the {X} cutoff, on the DENSE global day grid (zero days count):
    did = (T_post − T_pre) − (C_post − C_pre), every mean an exact
    (Σ·1e6)//n_days integer.

    Scale shape: a tiny pre-pass reduces to two day-bound scalars; per-batch
    (type, window) count partials — FOUR integers per block — reach the
    driver, which divides by the grid-derived day counts.""".format(
        T=_DID_T, C=_DID_C, X=_DID_CUTOFF
    )
    cut = _day_const(_DID_CUTOFF)

    def bounds(t: pa.Table) -> pd.DataFrame:
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        return pd.DataFrame({"lo": [int(d.min())], "hi": [int(d.max())]})

    b = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(bounds, batch_format="pyarrow")
        .to_pandas()
    )
    lo, hi = int(b["lo"].min()), int(b["hi"].max())
    n_pre = max(min(cut, hi + 1) - lo, 0)
    n_post = max(hi + 1 - max(cut, lo), 0)

    def partial(t: pa.Table) -> pd.DataFrame:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        rows = []
        for typ in (_DID_T, _DID_C):
            m = et == typ
            rows.append(
                {
                    "typ": typ,
                    "pre": int((m & (d < cut)).sum()),
                    "post": int((m & (d >= cut)).sum()),
                }
            )
        return pd.DataFrame(rows)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: 2 rows per block
        .groupby("typ")[["pre", "post"]]
        .sum()
    )
    tp = int(part.loc[_DID_T, "pre"]) * 1_000_000 // max(n_pre, 1)
    tq = int(part.loc[_DID_T, "post"]) * 1_000_000 // max(n_post, 1)
    cp = int(part.loc[_DID_C, "pre"]) * 1_000_000 // max(n_pre, 1)
    cq = int(part.loc[_DID_C, "post"]) * 1_000_000 // max(n_post, 1)
    return pd.DataFrame(
        {
            "t_pre_micro": np.array([tp], np.int64),
            "t_post_micro": np.array([tq], np.int64),
            "c_pre_micro": np.array([cp], np.int64),
            "c_post_micro": np.array([cq], np.int64),
            "did_micro": np.array([(tq - tp) - (cq - cp)], np.int64),
        }
    )


ORACLES93["events_diff_in_diff"] = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS d FROM events
),
b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
w AS (
  SELECT greatest(least({_day_const(_DID_CUTOFF)}, hi + 1) - lo, 0) AS n_pre,
         greatest(hi + 1 - greatest({_day_const(_DID_CUTOFF)}, lo), 0)
           AS n_post
  FROM b
),
c AS (
  SELECT
    CAST(count(*) FILTER (event_type = '{_DID_T}'
                          AND d < {_day_const(_DID_CUTOFF)}) AS HUGEINT) AS tp,
    CAST(count(*) FILTER (event_type = '{_DID_T}'
                          AND d >= {_day_const(_DID_CUTOFF)}) AS HUGEINT) AS tq,
    CAST(count(*) FILTER (event_type = '{_DID_C}'
                          AND d < {_day_const(_DID_CUTOFF)}) AS HUGEINT) AS cp,
    CAST(count(*) FILTER (event_type = '{_DID_C}'
                          AND d >= {_day_const(_DID_CUTOFF)}) AS HUGEINT) AS cq
  FROM e
)
SELECT CAST(tp * 1000000 // greatest(n_pre, 1) AS BIGINT) AS t_pre_micro,
       CAST(tq * 1000000 // greatest(n_post, 1) AS BIGINT) AS t_post_micro,
       CAST(cp * 1000000 // greatest(n_pre, 1) AS BIGINT) AS c_pre_micro,
       CAST(cq * 1000000 // greatest(n_post, 1) AS BIGINT) AS c_post_micro,
       CAST((tq * 1000000 // greatest(n_post, 1)
             - tp * 1000000 // greatest(n_pre, 1))
            - (cq * 1000000 // greatest(n_post, 1)
               - cp * 1000000 // greatest(n_pre, 1)) AS BIGINT) AS did_micro
FROM c, w"""


# ---------------------------------------------------------------------------
# events_locf_daily — last-observation-carried-forward on the day grid
# ---------------------------------------------------------------------------


def q_events_locf_daily(sf_dir: str):
    """LOCF resample: per (type, day) from the type's first event day to the
    global max day, the cents value of the LAST event on-or-before that day
    (ties by ts then event_id); is_carried = 1 on days with no event.

    Scale shape: per-batch combiner keeps only each (type, day)'s last
    observation (drop_duplicates keep-last after a stable sort); partials
    share ONE type-bucket exchange whose per-bucket kernel re-resolves
    per-day lasts and carries forward across the bounded day grid with one
    maximum.accumulate — no per-day Python."""

    def bounds(t: pa.Table) -> pd.DataFrame:
        d = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        return pd.DataFrame({"hi": [int(d.max())]})

    hi = int(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(bounds, batch_format="pyarrow")
        .to_pandas()["hi"]
        .max()
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "typ": np.asarray(t["event_type"].to_numpy(zero_copy_only=False)),
                "day": ts // _DAY_US,
                "ts": ts,
                "eid": t["event_id"].to_numpy().astype(np.int64),
                "v": np.floor(
                    t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        last = df.sort_values(["typ", "day", "ts", "eid"], kind="mergesort")
        last = last.drop_duplicates(["typ", "day"], keep="last")
        from ..functions.hashing import fnv1a64_array

        last = last.copy()
        last["_b"] = (
            fnv1a64_array(last["typ"].astype(str).to_numpy(object))
            % np.uint64(_LOCF_BUCKETS)
        ).astype(np.int64)
        return last[["typ", "day", "ts", "eid", "v", "_b"]]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for typ, grp in g.groupby("typ", sort=False):
            last = grp.sort_values(["day", "ts", "eid"], kind="mergesort")
            last = last.drop_duplicates("day", keep="last")
            days = last["day"].to_numpy(np.int64)
            vals = last["v"].to_numpy(np.int64)
            grid = np.arange(days.min(), hi + 1, dtype=np.int64)
            # index of the last observation on-or-before each grid day
            pos = np.searchsorted(days, grid, side="right") - 1
            carried = np.ones(len(grid), np.int64)
            carried[np.searchsorted(grid, days)] = 0
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": typ,
                        "day": grid,
                        "value_cents": vals[pos],
                        "is_carried": carried,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES93["events_locf_daily"] = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, epoch_us(ts) AS ts,
         event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
last AS (
  SELECT event_type, day, v
  FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type, day
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM e
  ) WHERE rn = 1
),
grid AS (
  SELECT event_type,
         CAST(unnest(generate_series(lo, (SELECT max(day) FROM e)))
              AS BIGINT) AS day
  FROM (SELECT event_type, min(day) AS lo FROM e GROUP BY 1)
),
f AS (
  SELECT g.event_type, g.day,
         max(l.day) AS src_day
  FROM grid g JOIN last l
    ON l.event_type = g.event_type AND l.day <= g.day
  GROUP BY 1, 2
)
SELECT f.event_type, f.day,
       l.v AS value_cents,
       CAST(CASE WHEN f.src_day = f.day THEN 0 ELSE 1 END AS BIGINT)
         AS is_carried
FROM f JOIN last l ON l.event_type = f.event_type AND l.day = f.src_day
ORDER BY f.event_type, f.day"""


QUERIES93 = {
    "events_diff_in_diff": q_events_diff_in_diff,
    "events_locf_daily": q_events_locf_daily,
}
