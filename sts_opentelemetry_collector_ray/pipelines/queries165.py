"""Driver-contract queries, wave 165 — dormancy histogram (per-user
inter-event gaps in exponential day buckets: how long do users sleep between
visits?) and shard balance (the router's fnv1a32 %4 shard split audited per
sink — the keyed-Kafka-partition balance check, message_builder.go:259-263).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES165: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# users_dormancy_histogram — per-user inter-event day gaps, exp buckets
# ---------------------------------------------------------------------------


def q_users_dormancy_histogram(sf_dir: str):
    """Per exponential bucket of the gap in WHOLE DAYS between a user's
    consecutive events (same-day gaps land in bucket 0, else
    bit_length(days)): gap counts and distinct users contributing at least
    one such gap.

    Scale shape: (user, day) rows ride ONE user-bucket exchange; per-bucket
    lexsort + shifted diffs + frexp bucketize emit bounded (bucket, n_gaps)
    partials plus per-bucket distinct-user flags — ≤ 40 rows per bucket —
    folded on the driver."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
        )
        df = pd.DataFrame(
            {
                "u": t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                "day": day,
            }
        )
        df["_b"] = (df["u"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return df.astype({"day": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "bucket": pd.Series([], dtype=np.int64),
                "n_gaps": pd.Series([], dtype=np.int64),
                "n_users": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["u", "day"], kind="mergesort")
        u = g["u"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        gaps = (day[1:] - day[:-1])[same]
        gu = u[1:][same]
        if len(gaps) == 0:
            return empty
        _, e = np.frexp(gaps.astype(np.float64))
        bucket = np.where(gaps == 0, 0, e).astype(np.int64)
        df = pd.DataFrame({"bucket": bucket, "u": gu})
        out = (
            df.groupby("bucket", sort=False)
            .agg(n_gaps=("u", "size"), n_users=("u", "nunique"))
            .reset_index()
        )
        return out.astype(np.int64)

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "bucket": pd.Series([], dtype=np.int64),
            "n_gaps": pd.Series([], dtype=np.int64),
            "n_users": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "bucket" not in part.columns:
        return empty
    return (
        part.groupby("bucket", sort=True)[["n_gaps", "n_users"]]
        .sum()  # users are disjoint across exchange buckets: sums are exact
        .reset_index()
        .astype(np.int64)
    )


ORACLES165["users_dormancy_histogram"] = f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
),
p AS (
  -- tie order among equal days is irrelevant: those gaps are 0 either way
  SELECT user_id,
         day - lag(day) OVER (PARTITION BY user_id ORDER BY day) AS gap
  FROM d
),
b AS (
  SELECT user_id,
         CASE WHEN gap = 0 THEN 0
              ELSE CAST(length(bin(gap)) AS BIGINT) END AS bucket
  FROM p WHERE gap IS NOT NULL
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM b GROUP BY 1"""


# ---------------------------------------------------------------------------
# route_shard_balance — the router's fnv %4 shard split per sink
# ---------------------------------------------------------------------------


def q_route_shard_balance(sf_dir: str):
    """Per (sink, shard_id) over exporter-facing routed rows (error rows
    excluded — their shard is 'unknown' by contract): row count and the
    shard's share within the sink in micro units — the keyed-partition
    balance audit (reference message_builder.go:259-263).

    Scale shape: the oracled router + a bounded (sink, shard) combiner."""
    import pyarrow.compute as pc

    from ..pipelines.flagship import routed_dataset
    from ..sources.transcripts import derive_transcripts_from_events

    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        dedup=False,
        enrich_concurrency=2,
        route_concurrency=None,
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_null(t["error"]))
        g = (
            pd.DataFrame(
                {
                    "sink": np.asarray(t["sink"].to_numpy(zero_copy_only=False)),
                    "shard_id": np.asarray(
                        t["shard_id"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                }
            )
            .groupby(["sink", "shard_id"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype({"n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "sink": pd.Series([], dtype=object),
            "shard_id": pd.Series([], dtype=object),
            "n_rows": pd.Series([], dtype=np.int64),
            "in_sink_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["sink", "shard_id"], sort=True)["n"]
        .sum()
        .reset_index(name="n_rows")
    )
    stot = out.groupby("sink")["n_rows"].transform("sum")
    out["in_sink_micro"] = np.floor(
        out["n_rows"].to_numpy(np.float64)
        / stot.to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_rows": np.int64})


def _shard_balance_oracle() -> str:
    from .queries import _FNV_SHARD, _ROUTES_SQL

    return (
        _ROUTES_SQL
        + f""",
ok AS (
  SELECT sink,
         CASE WHEN external_id IS NULL THEN 'unknown'
              ELSE {_FNV_SHARD.format(col='external_id')} END AS shard_id
  FROM routes WHERE data_source <> 'urn:mapping:bad-required'
),
g AS (
  SELECT sink, shard_id, CAST(count(*) AS BIGINT) AS n_rows
  FROM ok GROUP BY 1, 2
),
st AS (SELECT sink, CAST(sum(n_rows) AS BIGINT) AS tot FROM g GROUP BY 1)
SELECT g.sink, g.shard_id, g.n_rows,
       CAST(floor(CAST(g.n_rows AS DOUBLE) / CAST(st.tot AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS in_sink_micro
FROM g JOIN st USING (sink)"""
    )


ORACLES165["route_shard_balance"] = _shard_balance_oracle()


QUERIES165 = {
    "users_dormancy_histogram": q_users_dormancy_histogram,
    "route_shard_balance": q_route_shard_balance,
}
