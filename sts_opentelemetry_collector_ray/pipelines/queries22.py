"""Driver-contract queries, wave 22 — grouped mode (most-frequent value per
key) and exact percentile winsorization (outlier clipping at P05/P95 from a
value-domain histogram, no sort). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES22: dict[str, str] = {}

_MODE_BUCKETS = 64
_WZ_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_modal_type — MODE() per user with deterministic tie-break
# ---------------------------------------------------------------------------


def q_users_modal_type(sf_dir: str):
    """Grouped mode: each user's most frequent event_type (ties → smallest
    type string — MODE() with a deterministic tie-break). Per-batch (user,
    type) count combiner → ONE bounded user-bucket exchange → per-bucket
    vectorized re-sum + sort + drop_duplicates head — the argmax-per-key
    window without per-user Python."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                    "event_type": t["event_type"].to_pandas(),
                }
            )
            .groupby(["user_id", "event_type"], sort=False)
            .size()
            .rename("pn")
            .reset_index()
        )
        df["pn"] = df["pn"].astype(np.int64)
        df["_b"] = (df["user_id"].to_numpy().astype(np.uint64) % _MODE_BUCKETS).astype(
            np.int32
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    def modal(g: pd.DataFrame) -> pd.DataFrame:
        c = (
            g.groupby(["user_id", "event_type"], sort=False)["pn"]
            .sum()
            .rename("n")
            .reset_index()
        )
        c = c.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("user_id")
        return pd.DataFrame(
            {
                "user_id": c["user_id"].to_numpy(),
                "modal_type": c["event_type"].to_numpy(dtype=object),
                "n": c["n"].to_numpy().astype(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(modal, batch_format="pandas")
    )


ORACLES22["users_modal_type"] = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) AS rk
  FROM c)
SELECT user_id, event_type AS modal_type, n FROM r WHERE rk = 1"""


# ---------------------------------------------------------------------------
# events_winsorize — clip values at exact P05/P95 (histogram, no sort)
# ---------------------------------------------------------------------------


def q_events_winsorize(sf_dir: str):
    """Winsorization at exact P05/P95: the thresholds come from the same
    value-domain histogram trick as `events_quantiles_exact` (the exchange
    carries DISTINCT cents counts, never rows; exact for fixed-precision
    domains), broadcast as two ints, and a stateless clip pass bounds every
    row — outlier treatment before feature scaling, corpus never sorted.
    Rank rule: smallest value whose cumulative count ≥ ceil(n·q), identical
    to the grouped-quantiles contract."""
    path = f"{sf_dir}/events.parquet"

    def hist_partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100 + 0.5
        ).astype(np.int64)
        u, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {
                "_b": pa.array((u.astype(np.uint64) % _WZ_BUCKETS).astype(np.int32)),
                "cents": pa.array(u),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cents", sort=False)["cnt"].sum().reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    hist = (
        ray.data.read_parquet(path, columns=["value"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_sum, batch_format="pandas")
        .to_pandas()
        .sort_values("cents")
        .reset_index(drop=True)
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy()
    cents_sorted = hist["cents"].to_numpy()
    lo = int(cents_sorted[np.searchsorted(cum, (n * 1 + 19) // 20)])
    hi = int(cents_sorted[np.searchsorted(cum, (n * 19 + 19) // 20)])

    def clip(t: pa.Table) -> pa.Table:
        c = np.floor(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "clipped_cents": np.minimum(np.maximum(c, lo), hi),
            }
        )

    return ray.data.read_parquet(path, columns=["event_id", "value"]).map_batches(
        clip, batch_format="pyarrow"
    )


ORACLES22["events_winsorize"] = """
WITH b AS (
  SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
c AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
cum AS (SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cum FROM c),
lo AS (SELECT min(cents) AS v FROM cum, t WHERE cum >= (t.n * 1 + 19) // 20),
hi AS (SELECT min(cents) AS v FROM cum, t WHERE cum >= (t.n * 19 + 19) // 20)
SELECT b.event_id, least(greatest(b.cents, lo.v), hi.v) AS clipped_cents
FROM b, lo, hi"""


QUERIES22 = {
    "users_modal_type": q_users_modal_type,
    "events_winsorize": q_events_winsorize,
}
