"""Driver-contract queries, wave 26 — ordered grouped string aggregation
(string_agg as a vectorized Arrow list-join, no per-group Python) and per-user
behavioral entropy (distribution features with fixed-order float terms). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

ORACLES26: dict[str, str] = {}

_TP_BUCKETS = 64
_UE_BUCKETS = 64
_UE_TYPES = ("click", "error", "purchase", "signup", "view")  # fixed term order

_TOOL_MAP26 = {
    "error": "bash",
    "purchase": "search",
    "signup": "",
    "click": "",
    "view": "browser",
}


# ---------------------------------------------------------------------------
# conv_tool_path — ordered tool call path per conversation (string_agg)
# ---------------------------------------------------------------------------


def q_conv_tool_path(sf_dir: str):
    """Ordered grouped string aggregation: each conversation's tool-call path
    as a space-joined string in turn order (conversations with no tool calls
    are absent). The join is FULLY vectorized: per bucket one mergesort, a
    boundary scan, then `pa.ListArray.from_arrays` + `pc.binary_join` build
    every path in two Arrow kernel calls — string_agg without per-group
    Python (the groupby().apply(''.join) trap)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        tool = df["event_type"].map(_TOOL_MAP26)
        out = pd.DataFrame(
            {
                "conv": df["user_id"].to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "ts": df["ts"].to_numpy(),
                "tool": tool.to_numpy(dtype=object),
            }
        )
        out = out[out["tool"] != ""]
        out["_b"] = (out["conv"].to_numpy().astype(np.uint64) % _TP_BUCKETS).astype(
            np.int32
        )
        return out

    def join_paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "ts", "event_id"], kind="mergesort")
        conv = g["conv"].to_numpy()
        n = len(g)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = conv[1:] != conv[:-1]
        starts = np.nonzero(new)[0]
        offsets = np.concatenate([starts, [n]]).astype(np.int32)
        tools = pa.array(g["tool"].to_numpy(dtype=object), pa.string())
        paths = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), tools), " "
        )
        out = pd.DataFrame(
            {
                "conv_id": pd.Series(conv[starts]).astype(str).str.zfill(8),
                "tool_path": paths.to_pandas().to_numpy(dtype=object),
                "n_calls": (np.diff(offsets)).astype(np.int64),
            }
        )
        out["conv_id"] = "conv-" + out["conv_id"]
        return out

    return (
        ds.map_batches(prep, batch_format="pandas")
        .groupby("_b")
        .map_groups(join_paths, batch_format="pandas")
    )


ORACLES26["conv_tool_path"] = (
    TRANSCRIPTS_FROM_EVENTS_SQL
    + """
SELECT conv_id,
       string_agg(tool, ' ' ORDER BY turn_idx) AS tool_path,
       count(*) AS n_calls
FROM transcripts
WHERE tool <> ''
GROUP BY conv_id"""
)


# ---------------------------------------------------------------------------
# users_entropy — behavioral entropy of each user's event-type distribution
# ---------------------------------------------------------------------------


def q_users_entropy(sf_dir: str):
    """Per-user Shannon entropy over the event-type distribution — the
    behavioral-diversity feature for cohorting/curriculum. Counts reduce
    exactly per (user, type); the entropy terms evaluate in a FIXED type
    order with the same double expression on both sides (−Σ (n/t)·ln(n/t)),
    so the float result hashes. ONE bounded user-bucket exchange + a
    vectorized per-bucket pivot."""
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
        df["_b"] = (df["user_id"].to_numpy().astype(np.uint64) % _UE_BUCKETS).astype(
            np.int32
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        c = (
            g.groupby(["user_id", "event_type"], sort=False)["pn"]
            .sum()
            .unstack(fill_value=0)
            .reindex(columns=list(_UE_TYPES), fill_value=0)
        )
        tot = c.to_numpy().sum(axis=1).astype(np.float64)
        h = np.zeros(len(c), dtype=np.float64)
        for ty in _UE_TYPES:  # fixed order → same float accumulation as SQL
            n = c[ty].to_numpy().astype(np.float64)
            p = n / tot
            term = np.where(n > 0, p * np.log(np.where(n > 0, p, 1.0)), 0.0)
            h = h - term
        return pd.DataFrame(
            {
                "user_id": c.index.to_numpy(),
                "n_events": c.to_numpy().sum(axis=1).astype(np.int64),
                "entropy": np.floor(h * 1000000.0 + 0.5) / 1000000.0,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(entropy, batch_format="pandas")
    )


def _entropy_term_sql(ty: str) -> str:
    n = f"count(*) FILTER (WHERE event_type = '{ty}')"
    return (
        f"CASE WHEN {n} > 0 THEN (CAST({n} AS DOUBLE) / CAST(count(*) AS DOUBLE))"
        f" * ln(CAST({n} AS DOUBLE) / CAST(count(*) AS DOUBLE)) ELSE 0.0 END"
    )


ORACLES26["users_entropy"] = (
    """
SELECT user_id, count(*) AS n_events,
       floor((0.0"""
    + "".join(f" - ({_entropy_term_sql(ty)})" for ty in _UE_TYPES)
    + """) * 1000000.0 + 0.5) / 1000000.0 AS entropy
FROM events GROUP BY user_id"""
)


QUERIES26 = {
    "conv_tool_path": q_conv_tool_path,
    "users_entropy": q_users_entropy,
}
