"""Driver-contract queries, wave 95 — exact heavy-user detection (the
frequent-items primitive behind abuse caps and hot-key diagnosis, reduced to
combiner partials + ONE bucket exchange so rows never shuffle) and Markov
conditional entropy (per-prev-type next-event entropy — the sequence
predictability readout that complements wave-59's stationary distribution).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES95: dict[str, str] = {}

_HH_K = 140  # heavy = strictly more than 1/K of all events
_HH_BUCKETS = 32
_ME_BUCKETS = 16
_ME_TYPES = ("click", "error", "purchase", "signup", "view")  # fixed term order


# ---------------------------------------------------------------------------
# events_heavy_users — exact frequent-items above a 1/K share threshold
# ---------------------------------------------------------------------------


def q_events_heavy_users(sf_dir: str):
    """Exact heavy hitters over user_id: every user with strictly more than
    total/K of all events, with the exact count and floor-division micro
    share. (A Misra–Gries candidate pass was considered and rejected: the
    per-block survivor union is O(blocks·K) with no sound prune, while
    combiner partials + one bucket exchange move strictly less data AND stay
    exact.)

    Scale shape: the total is a parquet-metadata count (no data read);
    per-batch np.unique combiner partials (≤ distinct users per batch) enter
    ONE user-bucket exchange; each bucket re-reduces exactly and filters
    against the broadcast total, so only heavy rows leave — rows themselves
    never shuffle."""
    total = int(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"]).count()
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        uu, cc = np.unique(u, return_counts=True)
        return pd.DataFrame(
            {
                "u": uu,
                "c": cc.astype(np.int64),
                "_b": (uu % _HH_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("u", sort=False)["c"].sum()
        cnt = c.to_numpy(np.int64)
        heavy = cnt * _HH_K > total
        cnt = cnt[heavy]
        return pd.DataFrame(
            {
                "user_id": c.index.to_numpy(np.int64)[heavy],
                "cnt": cnt,
                "share_micro": cnt * 1_000_000 // max(total, 1),
            }
        )

    out = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: < K heavy hitters by the share property
    )
    if "user_id" not in out.columns:
        # no user clears total/K (the sf0.1 corpus): Ray drops the schema of
        # an all-empty Dataset — restore the typed frame for the strict gate
        out = pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "cnt": pd.Series(dtype=np.int64),
                "share_micro": pd.Series(dtype=np.int64),
            }
        )
    return out


ORACLES95["events_heavy_users"] = f"""
WITH tot AS (SELECT count(*) AS n FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS cnt,
       CAST(count(*) * 1000000 // (SELECT greatest(n, 1) FROM tot) AS BIGINT)
         AS share_micro
FROM events GROUP BY user_id
HAVING count(*) * {_HH_K} > (SELECT n FROM tot)"""


# ---------------------------------------------------------------------------
# events_markov_entropy — H(next | prev) per previous event type
# ---------------------------------------------------------------------------


def q_events_markov_entropy(sf_dir: str):
    """Conditional next-event entropy per previous type: transitions are
    consecutive (prev, next) pairs within each user's (ts, event_id)-ordered
    stream; per prev type, H = −Σ p·ln p over the FIXED next-type order so
    the float terms accumulate identically to the SQL replay (the
    users_entropy technique).

    Scale shape: ONE user-bucket exchange (ordering needs per-user
    co-location — the sessionize shape); each bucket emits only its bounded
    |types|² transition grid; the driver folds grids and evaluates 5 entropy
    terms per row."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "u": u,
                "ts": t["ts"].cast(pa.int64()).to_numpy(),
                "eid": t["event_id"].to_numpy().astype(np.int64),
                "st": np.asarray(t["event_type"].to_numpy(zero_copy_only=False)),
                "_b": (u % _ME_BUCKETS).astype(np.int64),
            }
        )

    def grid(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        eid = g["eid"].to_numpy(np.int64)
        st = g["st"].to_numpy(object)
        order = np.lexsort((eid, ts, u))
        u, st = u[order], st[order]
        same = u[1:] == u[:-1]
        prev, nxt = st[:-1][same], st[1:][same]
        if len(prev) == 0:
            return pd.DataFrame(
                {
                    "prev": pd.Series([], dtype=object),
                    "nxt": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        df = (
            pd.DataFrame({"prev": prev, "nxt": nxt})
            .groupby(["prev", "nxt"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        df["n"] = df["n"].astype(np.int64)
        return df

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(grid, batch_format="pandas")
        .to_pandas()  # bounded: |types|² per bucket
    )
    if part.empty or "prev" not in part.columns:
        # no transitions anywhere (all users single-event): typed empty
        return pd.DataFrame(
            {
                "prev_type": pd.Series([], dtype=object),
                "n_transitions": pd.Series([], dtype=np.int64),
                "entropy": pd.Series([], dtype=np.float64),
            }
        )
    c = (
        part.groupby(["prev", "nxt"])["n"]
        .sum()
        .unstack(fill_value=0)
        .reindex(columns=list(_ME_TYPES), fill_value=0)
        .sort_index()
    )
    tot = c.to_numpy().sum(axis=1).astype(np.float64)
    h = np.zeros(len(c), dtype=np.float64)
    for ty in _ME_TYPES:  # fixed order → same float accumulation as SQL
        n = c[ty].to_numpy().astype(np.float64)
        p = n / tot
        term = np.where(n > 0, p * np.log(np.where(n > 0, p, 1.0)), 0.0)
        h = h - term
    return pd.DataFrame(
        {
            "prev_type": c.index.to_numpy(object),
            "n_transitions": c.to_numpy().sum(axis=1).astype(np.int64),
            "entropy": np.floor(h * 1_000_000.0 + 0.5) / 1_000_000.0,
        }
    )


def _me_term_sql(ty: str) -> str:
    n = f"count(*) FILTER (WHERE nxt = '{ty}')"
    return (
        f"CASE WHEN {n} > 0 THEN (CAST({n} AS DOUBLE) / CAST(count(*) AS DOUBLE))"
        f" * ln(CAST({n} AS DOUBLE) / CAST(count(*) AS DOUBLE)) ELSE 0.0 END"
    )


ORACLES95["events_markov_entropy"] = (
    """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
p AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS prev,
         event_type AS nxt
  FROM e
)
SELECT prev AS prev_type, CAST(count(*) AS BIGINT) AS n_transitions,
       floor((0.0"""
    + "".join(f" - ({_me_term_sql(ty)})" for ty in _ME_TYPES)
    + """) * 1000000.0 + 0.5) / 1000000.0 AS entropy
FROM p WHERE prev IS NOT NULL GROUP BY prev"""
)


QUERIES95 = {
    "events_heavy_users": q_events_heavy_users,
    "events_markov_entropy": q_events_markov_entropy,
}
