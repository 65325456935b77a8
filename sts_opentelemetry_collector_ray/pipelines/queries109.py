"""Driver-contract queries, wave 109 — zonemap pruning effectiveness (how
many fixed logical chunks a `value ≥ T` scan could skip under an id-ordered
vs a time-ordered layout — the quantified why-sort-your-data report) and
alert flap rate (threshold-crossing counts per event type in stream order —
the alert-fatigue diagnostic). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES109: dict[str, str] = {}

_PR_CHUNK = 512  # events per id-chunk (layout A)
_PR_T = 450.0  # pruning predicate: value >= T
_FLAP_T = 250.0
_FLAP_BUCKETS = 8
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_pruning_eval — zonemap skip rate under two physical layouts
# ---------------------------------------------------------------------------


def q_events_pruning_eval(sf_dir: str):
    """Pruning effectiveness for `value ≥ {T}`: chunk the table two ways —
    layout 'id' (event_id // {C}: arrival-order proxy) and layout 'ts'
    (calendar day: the time-sorted layout) — and count chunks whose zonemap
    max falls below the predicate (skippable without reading). The spread
    between layouts is the measured value of sorting before writing.

    Scale shape: per-batch (layout, chunk, max) partials — bounded by
    distinct chunks per batch — fold through ONE bounded chunk-key groupby
    on the driver; rows never shuffle.""".format(T=_PR_T, C=_PR_CHUNK)

    def partial(t: pa.Table) -> pd.DataFrame:
        v = t["value"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy().astype(np.int64)
        day = t["ts"].cast(pa.int64()).to_numpy() // _DAY_US
        a = pd.DataFrame({"layout": "id", "chunk": eid // _PR_CHUNK, "v": v})
        b = pd.DataFrame({"layout": "ts", "chunk": day, "v": v})
        df = pd.concat([a, b], ignore_index=True)
        g = df.groupby(["layout", "chunk"], sort=False)["v"].max().reset_index()
        return g

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["layout", "chunk"])["v"]
        .max()
        .reset_index()
    )
    rows = []
    for layout, grp in sorted(part.groupby("layout")):
        n = len(grp)
        pr = int((grp["v"] < _PR_T).sum())
        rows.append(
            {
                "layout": layout,
                "n_chunks": n,
                "n_prunable": pr,
                "prunable_bp": pr * 10_000 // max(n, 1),
            }
        )
    out = pd.DataFrame(rows, columns=["layout", "n_chunks", "n_prunable", "prunable_bp"])
    return out.astype({"n_chunks": np.int64, "n_prunable": np.int64, "prunable_bp": np.int64})


ORACLES109["events_pruning_eval"] = f"""
WITH c AS (
  SELECT 'id' AS layout, event_id // {_PR_CHUNK} AS chunk, max(value) AS mx
  FROM events GROUP BY 1, 2
  UNION ALL
  SELECT 'ts', epoch_us(ts) // {_DAY_US}, max(value)
  FROM events GROUP BY 1, 2
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (mx < {_PR_T}) AS BIGINT) AS n_prunable,
       CAST(count(*) FILTER (mx < {_PR_T}) * 10000
            // greatest(count(*), 1) AS BIGINT) AS prunable_bp
FROM c GROUP BY 1"""


# ---------------------------------------------------------------------------
# events_flap_rate — threshold-crossing churn per event type
# ---------------------------------------------------------------------------


def q_events_flap_rate(sf_dir: str):
    """Alert flapping: per event type, in global (ts, event_id) stream
    order, how often the `value ≥ {T}` state FLIPS — a high flip share per
    observation is the alert-fatigue signature that hysteresis fixes.
    flaps_bp = flips·10⁴ // (n−1), exact integers.

    Scale shape: type keys are bounded, so rows co-locate through ONE
    type-hash bucket exchange (the bounded-group map_groups rule); the
    per-bucket kernel is a lexsort + one vectorized state-diff per
    type.""".format(T=_FLAP_T)
    from ..functions.hashing import fnv1a64_array

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "ty": et,
                "ts": t["ts"].cast(pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy().astype(np.int64),
                "hot": (
                    t["value"].to_numpy(zero_copy_only=False) >= _FLAP_T
                ).astype(np.int64),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["ty"].astype(str).to_numpy(object))
            % np.uint64(_FLAP_BUCKETS)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ty = g["ty"].to_numpy(object)
        ts = g["ts"].to_numpy(np.int64)
        eid = g["eid"].to_numpy(np.int64)
        hot = g["hot"].to_numpy(np.int64)
        # lexsort needs a sortable primary key; types are few per bucket —
        # factorize to codes
        codes, uniq = pd.factorize(ty, sort=True)
        order = np.lexsort((eid, ts, codes))
        codes, hot = codes[order], hot[order]
        same = np.r_[False, codes[1:] == codes[:-1]]
        flips = (hot != np.r_[np.int64(0), hot[:-1]]) & same
        df = pd.DataFrame({"ty": np.asarray(uniq, object)[codes], "flip": flips})
        out = (
            df.groupby("ty", sort=False)["flip"]
            .agg(n="size", n_flaps="sum")
            .reset_index()
        )
        return out.astype({"n": np.int64, "n_flaps": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |types| rows
    )
    g = part.groupby("ty")[["n", "n_flaps"]].sum().sort_index().reset_index()
    n = g["n"].to_numpy(np.int64)
    f = g["n_flaps"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "event_type": g["ty"].to_numpy(object),
            "n": n,
            "n_flaps": f,
            "flaps_bp": f * 10_000 // np.maximum(n - 1, 1),
        }
    )


ORACLES109["events_flap_rate"] = f"""
WITH e AS (
  SELECT event_type,
         CASE WHEN value >= {_FLAP_T} THEN 1 ELSE 0 END AS hot,
         epoch_us(ts) AS ts_us, event_id
  FROM events
),
d AS (
  SELECT event_type, hot,
         lag(hot) OVER (PARTITION BY event_type
                        ORDER BY ts_us, event_id) AS prev
  FROM e
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (prev IS NOT NULL AND hot <> prev) AS BIGINT)
         AS n_flaps,
       CAST(count(*) FILTER (prev IS NOT NULL AND hot <> prev) * 10000
            // greatest(count(*) - 1, 1) AS BIGINT) AS flaps_bp
FROM d GROUP BY 1"""


QUERIES109 = {
    "events_pruning_eval": q_events_pruning_eval,
    "events_flap_rate": q_events_flap_rate,
}
