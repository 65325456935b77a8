"""Driver-contract queries, wave 297 — TTL-dedup window sensitivity
(how many events a per-key suppression cache would drop at 1m/10m/1h
windows) and reorder-buffer sizing (lateness of each arrival vs the
running event-time maximum of the ingestion sequence). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES297: dict[str, str] = {}

_DW_WINDOWS_US = (60_000_000, 600_000_000, 3_600_000_000)
_RB_GROUP = 65_536  # fixed event_id range per reorder group


# ---------------------------------------------------------------------------
# events_dedup_window_curve — TTL suppression yield vs window size
# ---------------------------------------------------------------------------


def q_events_dedup_window_curve(sf_dir: str):
    """TTL-dedup sensitivity: with key = (user_id, event_type) and
    events ordered by (ts, event_id) within key, an event would be
    SUPPRESSED by a TTL cache of window W when its gap to the previous
    same-key event is <= W. Per window {1m, 10m, 1h}: w_us, n_dups,
    dup_rate_micro (of all events) — the curve that prices the
    reference's dedup-cache TTL. Pure integer gap counting.

    Scale shape: ONE user-bucket exchange; per-bucket vectorized
    lexsort + shifted same-key gaps; each bucket emits 3 scalars."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "et": t["event_type"].to_numpy(zero_copy_only=False),
                "ts": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        )
        df["_b"] = (df["u"] % 64).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "n": pd.Series([], dtype=np.int64),
                    **{f"d{i}": pd.Series([], dtype=np.int64)
                       for i in range(len(_DW_WINDOWS_US))},
                }
            )
        g = g.sort_values(["u", "et", "ts", "eid"], kind="stable")
        same = (
            (g["u"].to_numpy()[1:] == g["u"].to_numpy()[:-1])
            & (g["et"].to_numpy(object)[1:] == g["et"].to_numpy(object)[:-1])
        )
        gaps = (g["ts"].to_numpy(np.int64)[1:] - g["ts"].to_numpy(np.int64)[:-1])[
            same
        ]
        row = {"n": np.int64(len(g))}
        for i, w in enumerate(_DW_WINDOWS_US):
            row[f"d{i}"] = np.int64(int((gaps <= w).sum()))
        return pd.DataFrame([row])

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["w_us", "n_dups", "dup_rate_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    n = int(parts["n"])
    if n == 0:
        return empty
    rows = []
    for i, w in enumerate(_DW_WINDOWS_US):
        d = int(parts[f"d{i}"])
        rows.append(
            (
                np.int64(w), np.int64(d),
                np.int64(np.floor(float(d) / float(n) * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES297["events_dedup_window_curve"] = f"""
WITH s AS (
  SELECT epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS prev
  FROM events
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
w AS (SELECT CAST(u.w AS BIGINT) AS w
      FROM (SELECT unnest([{", ".join(str(w) for w in _DW_WINDOWS_US)}])
              AS w) u),
agg AS (
  SELECT w.w,
         CAST(sum(CASE WHEN s.prev IS NOT NULL AND s.us - s.prev <= w.w
                       THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM w CROSS JOIN s
  GROUP BY 1
)
SELECT agg.w AS w_us, agg.d AS n_dups,
       CAST(floor(CAST(agg.d AS DOUBLE) / CAST(nn.n AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS dup_rate_micro
FROM agg, nn
WHERE nn.n > 0
ORDER BY agg.w"""


# ---------------------------------------------------------------------------
# events_reorder_buffer — lateness vs the running event-time maximum
# ---------------------------------------------------------------------------


def q_events_reorder_buffer(sf_dir: str):
    """Reorder-buffer sizing: in arrival order (event_id), each event's
    lateness is (running max event-ts before it) - own ts when
    positive — the allowed-lateness a streaming window would need to
    never drop it. Pure integer folds. One row: n_events, n_late,
    max_lateness_us, sum_lateness_us, late_rate_micro.

    Scale shape: deterministic fixed-range id groups (event_id // 64Ki)
    ride one bucket exchange; pass 1 emits per-group maxima, the driver
    prefix-maxes the bounded group list into carries, and pass 2
    re-maps groups against the broadcast carry — two bounded exchanges,
    no driver row data."""
    import ray as _ray

    def partial(t: pa.Table) -> pd.DataFrame:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "g": eid // _RB_GROUP,
                "eid": eid,
                "us": pa.compute.cast(t["ts"], pa.int64()).to_numpy(),
            }
        )

    ds = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
    )

    def gmax(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("g")["us"].max().rename("mx").reset_index()
        return out.astype(np.int64)

    maxes = (
        ds.groupby("g")
        .map_groups(gmax, batch_format="pandas")
        .to_pandas()
        .groupby("g")["mx"]
        .max()
        .sort_index()
    )
    cols = [
        "n_events", "n_late", "max_lateness_us", "sum_lateness_us",
        "late_rate_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if maxes.empty:
        return empty
    carry: dict[int, int] = {}
    run = -1
    for gk, mx in maxes.items():
        carry[int(gk)] = run
        run = max(run, int(mx))
    carry_ref = _ray.put(carry)

    def late(g: pd.DataFrame) -> pd.DataFrame:
        c = _ray.get(carry_ref)
        rows = []
        for gk, sub in g.groupby("g", sort=False):
            sub = sub.sort_values("eid", kind="stable")
            us = sub["us"].to_numpy(np.int64)
            prev = np.maximum.accumulate(us)
            runmax_before = np.concatenate([[c.get(int(gk), -1)], prev[:-1]])
            runmax_before = np.maximum(runmax_before, c.get(int(gk), -1))
            has_prev = runmax_before >= 0
            lateness = np.where(
                has_prev & (runmax_before > us), runmax_before - us, 0
            ).astype(np.int64)
            rows.append(
                (
                    np.int64(len(us)),
                    np.int64(int((lateness > 0).sum())),
                    np.int64(int(lateness.max()) if len(lateness) else 0),
                    np.int64(int(lateness.sum())),
                )
            )
        return pd.DataFrame(
            rows, columns=["n", "nl", "mx", "sm"]
        )

    parts = (
        ds.groupby("g")
        .map_groups(late, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return empty
    n = int(parts["n"].sum())
    if n == 0:
        return empty
    nl = int(parts["nl"].sum())
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(nl),
                np.int64(int(parts["mx"].max())),
                np.int64(int(parts["sm"].sum())),
                np.int64(np.floor(float(nl) / float(n) * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES297["events_reorder_buffer"] = """
WITH s AS (
  SELECT epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS runmax
  FROM events
),
l AS (
  SELECT CASE WHEN runmax IS NOT NULL AND runmax > us
              THEN runmax - us ELSE 0 END AS late,
         CASE WHEN runmax IS NOT NULL AND runmax > us THEN 1 ELSE 0 END
           AS is_late
  FROM s
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(is_late) AS BIGINT) AS n_late,
       CAST(max(late) AS BIGINT) AS max_lateness_us,
       CAST(sum(late) AS BIGINT) AS sum_lateness_us,
       CAST(floor(CAST(sum(is_late) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS late_rate_micro
FROM l
HAVING count(*) > 0"""


QUERIES297 = {
    "events_dedup_window_curve": q_events_dedup_window_curve,
    "events_reorder_buffer": q_events_reorder_buffer,
}
