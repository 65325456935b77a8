"""Driver-contract queries, wave 21 — distinct-set operations (INTERSECT /
EXCEPT over derived key sets) and per-group min-max normalization (broadcast
bounds + stateless scaling). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES21: dict[str, str] = {}

_SO_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_setops — INTERSECT / EXCEPT over behavior-derived user sets
# ---------------------------------------------------------------------------


def q_users_setops(sf_dir: str):
    """Relational set operations over derived key sets: users who clicked AND
    purchased (INTERSECT) and users who clicked but never purchased (EXCEPT).
    ONE streaming pass emits per-batch-distinct (user, clicked, purchased)
    flag partials; one bounded key-bucket exchange ORs the flags per user;
    the driver sees two scalars. Never two full scans, never a join — the
    flag-union form is how set ops stay one-pass at corpus scale."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        m = (et == "click") | (et == "purchase")
        u, et = u[m], et[m]
        df = (
            pd.DataFrame({"user_id": u, "c": et == "click", "p": et == "purchase"})
            .groupby("user_id", sort=False)[["c", "p"]]
            .any()
            .reset_index()
        )
        df["_b"] = (df["user_id"].to_numpy().astype(np.uint64) % _SO_BUCKETS).astype(
            np.int32
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("user_id", sort=False)[["c", "p"]].any()
        both = np.int64((f["c"] & f["p"]).sum())
        only = np.int64((f["c"] & ~f["p"]).sum())
        return pd.DataFrame({"both": [both], "only": [only]})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    return pd.DataFrame(
        {
            "op": ["clicked_and_purchased", "clicked_not_purchased"],
            "n_users": np.array([out["both"], out["only"]], dtype=np.int64),
        }
    )


ORACLES21["users_setops"] = """
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT 'clicked_and_purchased' AS op,
       CAST((SELECT count(*) FROM c WHERE user_id IN (SELECT user_id FROM p))
            AS BIGINT) AS n_users
UNION ALL
SELECT 'clicked_not_purchased',
       CAST((SELECT count(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p))
            AS BIGINT)"""


# ---------------------------------------------------------------------------
# events_minmax_scale — per-type min-max normalization of value
# ---------------------------------------------------------------------------


def q_events_minmax_scale(sf_dir: str):
    """Per-group min-max feature scaling: a tiny first pass reduces per-type
    (min, max) cents bounds (|types|×|batches| partials, driver residue
    |types| rows), the bounds broadcast in the closure, and a stateless
    second pass scales every row with one index_in + takes — rows never
    shuffle. Scaled values round via floor(x*1e6 + 0.5) like every score
    column (CLAUDE.md half-even/half-away rule); degenerate groups
    (max == min) scale to 0 by contract on both sides."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/events.parquet"

    def bounds_partial(t: pa.Table) -> pa.Table:
        c = np.round(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(), "c": c})
        out = (
            df.groupby("event_type", sort=False)["c"]
            .agg(mn="min", mx="max")
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    b = (
        ray.data.read_parquet(path, columns=["event_type", "value"])
        .map_batches(bounds_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type")
        .agg(mn=("mn", "min"), mx=("mx", "max"))
        .reset_index()
    )
    types = pa.array(b["event_type"].tolist())
    mn = b["mn"].to_numpy()
    mx = b["mx"].to_numpy()

    def scale(t: pa.Table) -> pa.Table:
        c = np.round(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        i = pc.index_in(t["event_type"], value_set=types).to_numpy(
            zero_copy_only=False
        )
        lo, hi = mn[i], mx[i]
        span = (hi - lo).astype(np.float64)
        raw = np.where(
            hi > lo, (c - lo).astype(np.float64) / np.where(span == 0, 1.0, span), 0.0
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "scaled": np.floor(raw * 1000000.0 + 0.5) / 1000000.0,
            }
        )

    return ray.data.read_parquet(
        path, columns=["event_id", "event_type", "value"]
    ).map_batches(scale, batch_format="pyarrow")


ORACLES21["events_minmax_scale"] = """
WITH e AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
b AS (SELECT event_type, min(c) AS mn, max(c) AS mx FROM e GROUP BY event_type)
SELECT event_id,
       floor((CASE WHEN b.mx > b.mn
                   THEN CAST(e.c - b.mn AS DOUBLE) / CAST(b.mx - b.mn AS DOUBLE)
                   ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS scaled
FROM e JOIN b USING (event_type)"""


QUERIES21 = {
    "users_setops": q_users_setops,
    "events_minmax_scale": q_events_minmax_scale,
}
