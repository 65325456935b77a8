"""Driver-contract queries, wave 120 — column encoding advisor (exact
distinct ratios per column with a dictionary-vs-plain recommendation: the
storage-layout advisory a writer consults before flushing parquet) and
weekly periodicity flags (users whose entire history sits on one day of
week — the cron-job / synthetic-traffic signature). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES120: dict[str, str] = {}

_ENC_BUCKETS = 32
_ENC_DICT_BP = 500  # advise dictionary when distinct/total ≤ 5%
_WP_BUCKETS = 32
_DAY_US = 86_400_000_000
_WP_MIN_EVENTS = 4


# ---------------------------------------------------------------------------
# events_encoding_advisor — distinct ratios + dictionary advisory per column
# ---------------------------------------------------------------------------


def q_events_encoding_advisor(sf_dir: str):
    """Encoding advisory: per column (event_type, user_id, value-cents,
    props), the exact distinct-value count, the distinct share in bp, and
    'dict' when the share is ≤ {T} bp else 'plain' — low-cardinality
    columns dictionary-encode to a fraction of their plain size.

    Scale shape: the row total is a parquet-metadata count; per-batch
    per-column distinct partials → ONE (column, value-hash) bucket exchange
    — a value's occurrences co-locate, so per-bucket distincts SUM exactly;
    only (column, n_distinct) scalars leave each bucket.""".format(
        T=_ENC_DICT_BP
    )
    from ..functions.hashing import fnv1a64_array

    cols = ("event_type", "props", "user_id", "value")
    total = int(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"]).count()
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        vals = {
            "event_type": np.asarray(
                t["event_type"].to_numpy(zero_copy_only=False)
            ).astype(object),
            "props": np.asarray(t["props"].to_numpy(zero_copy_only=False)).astype(
                object
            ),
            "user_id": t["user_id"].to_numpy().astype(np.int64).astype(str).astype(
                object
            ),
            "value": np.floor(
                t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            )
            .astype(np.int64)
            .astype(str)
            .astype(object),
        }
        frames = [
            pd.DataFrame({"col": c, "v": pd.unique(vals[c])}) for c in cols
        ]
        df = pd.concat(frames, ignore_index=True)
        df["_b"] = (
            fnv1a64_array((df["col"] + "\x1f" + df["v"]).to_numpy(object))
            % np.uint64(_ENC_BUCKETS)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col", "v"])
        out = d.groupby("col", sort=False).size().rename("nd").reset_index()
        out["nd"] = out["nd"].astype(np.int64)
        return out

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_type", "props", "user_id", "value"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |cols| rows per bucket
        .groupby("col")["nd"]
        .sum()
        .sort_index()
    )
    nd = part.to_numpy(np.int64)
    share = nd * 10_000 // max(total, 1)
    return pd.DataFrame(
        {
            "col": part.index.to_numpy(object),
            "n_rows": np.full(len(part), total, np.int64),
            "n_distinct": nd,
            "distinct_bp": share,
            "advice": np.where(share <= _ENC_DICT_BP, "dict", "plain").astype(
                object
            ),
        }
    )


ORACLES120["events_encoding_advisor"] = f"""
WITH t AS (SELECT count(*) AS n FROM events),
d AS (
  SELECT 'event_type' AS col, count(DISTINCT event_type) AS nd FROM events
  UNION ALL
  SELECT 'props', count(DISTINCT props) FROM events
  UNION ALL
  SELECT 'user_id', count(DISTINCT user_id) FROM events
  UNION ALL
  SELECT 'value', count(DISTINCT CAST(floor(value * 100 + 0.5) AS BIGINT))
  FROM events
)
SELECT col, CAST(t.n AS BIGINT) AS n_rows, CAST(nd AS BIGINT) AS n_distinct,
       CAST(nd * 10000 // greatest(t.n, 1) AS BIGINT) AS distinct_bp,
       CASE WHEN nd * 10000 // greatest(t.n, 1) <= {_ENC_DICT_BP}
            THEN 'dict' ELSE 'plain' END AS advice
FROM d, t"""


# ---------------------------------------------------------------------------
# events_weekly_periodicity — single-day-of-week user flags
# ---------------------------------------------------------------------------


def q_events_weekly_periodicity(sf_dir: str):
    """Cron signature: users with at least {M} events whose ENTIRE history
    falls on a single day of week ((day+3) % 7, Monday=0 — epoch day 0 was a Thursday) — human traffic never does this. Emits the flagged users with
    their day and event count.

    Scale shape: per-batch per-(user, dow) counts → ONE user-bucket
    exchange; per-bucket exact re-reduce keeps users with exactly one
    distinct dow and enough events.""".format(M=_WP_MIN_EVENTS)

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        dow = ((t["ts"].cast(pa.int64()).to_numpy() // _DAY_US) + 3) % 7
        g = (
            pd.DataFrame({"u": u, "dow": dow.astype(np.int64)})
            .groupby(["u", "dow"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        g["_b"] = (g["u"] % _WP_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["u", "dow"], sort=False)["n"].sum().reset_index()
        agg = m.groupby("u", sort=False).agg(
            n=("n", "sum"), ndow=("dow", "size"), dow=("dow", "first")
        )
        keep = (agg["ndow"] == 1) & (agg["n"] >= _WP_MIN_EVENTS)
        out = agg.loc[keep].reset_index()[["u", "dow", "n"]]
        out.columns = ["user_id", "dow", "n_events"]
        return out.astype(np.int64)

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # flagged users only (bounded output)
    )
    if out.empty or "user_id" not in out.columns:
        # all-empty blocks drop the schema (the known Ray empty-block rule)
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype=np.int64),
                "dow": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
            }
        )
    return out


ORACLES120["events_weekly_periodicity"] = f"""
WITH e AS (
  SELECT user_id, ((epoch_us(ts) // {_DAY_US}) + 3) % 7 AS dow FROM events
),
u AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         count(DISTINCT dow) AS ndow, CAST(min(dow) AS BIGINT) AS dow
  FROM e GROUP BY 1
)
SELECT user_id, dow, n_events
FROM u WHERE ndow = 1 AND n_events >= {_WP_MIN_EVENTS}"""


QUERIES120 = {
    "events_encoding_advisor": q_events_encoding_advisor,
    "events_weekly_periodicity": q_events_weekly_periodicity,
}
