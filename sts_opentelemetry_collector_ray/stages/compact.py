"""Last-wins upsert compaction — keep only the newest row per key.

The batch analogue of a CDC / changelog compaction (and of the reference's
"latest snapshot wins" settings handling, internal/settings_provider: the newest
snapshot for a key replaces earlier ones): per key, the surviving row is the one
with the greatest (ts, tie_col).

Scale shape (mirrors stages/dedup.py's bucketed first-wins):

1. per-batch COMBINER — each `map_batches` task reduces its batch to at most one
   row per key it saw (vectorized sort + drop_duplicates, no per-row Python), so
   the exchange carries ≤ |keys|·|batches| rows, not |rows|;
2. ONE bounded exchange on ``hash(key) % num_buckets`` co-locates every
   surviving candidate for a key;
3. per-bucket final pass applies the same vectorized last-wins kernel.

Keys never leave their bucket, so the result is bucket-count independent; the
tie column makes the winner deterministic when timestamps collide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _last_wins(df: pd.DataFrame, key_cols: list[str], ts_col: str, tie_col: str) -> pd.DataFrame:
    if df.empty:
        return df
    df = df.sort_values(
        key_cols + [ts_col, tie_col],
        ascending=[True] * len(key_cols) + [False, False],
        kind="mergesort",
    )
    return df.drop_duplicates(key_cols, keep="first")


def upsert_latest(
    ds: "ray.data.Dataset",
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    tie_col: str = "event_id",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """One row per key: the latest by (ts_col desc, tie_col desc)."""
    keys = list(key_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = _last_wins(df, keys, ts_col, tie_col)
        if out.empty:
            return out.assign(_bucket=pd.Series([], dtype=np.int32))
        # hash_pandas_object over the key frame combines per-column hashes
        # row-wise in C — no per-row Python
        return out.assign(
            _bucket=(
                pd.util.hash_pandas_object(out[keys], index=False) % num_buckets
            ).astype(np.int32)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return _last_wins(g, keys, ts_col, tie_col).drop(columns=["_bucket"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(final, batch_format="pandas")
    )


def snapshot_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key_col: str = "doc_id",
    hash_col: str = "content_h",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Corpus snapshot diff — the reference's snapshot-swap tombstone diff
    (rules/diff.py::diff_rulesets, D2) generalized to DATA: given two corpus
    versions carrying (key, content-hash), emit one row per key whose state
    changed: 'added' (new only), 'removed' (old only), 'changed' (both, hash
    differs). Unchanged keys are silent — the incremental-training recipe
    (reprocess only the delta between crawls).

    Scale shape: both sides ship ONLY (key, hash) — 16 bytes/row — through ONE
    bounded bucket exchange on ``hash(key) % num_buckets``; the per-bucket
    classifier is a vectorized pandas merge. Content equality is judged by the
    64-bit hash (the standard CDC contract: collisions mean a missed change,
    ~2⁻⁶⁴ per pair); hash upstream with ``fnv1a64_arrow`` over the exact bytes
    the oracle hashes."""

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            k = df[key_col].to_numpy()
            return pd.DataFrame(
                {
                    key_col: k.astype(np.int64),
                    "_h": df[hash_col].to_numpy().astype(np.int64),
                    "_side": np.full(len(df), side, dtype=np.int8),
                    "_b": (k.astype(np.uint64) % np.uint64(num_buckets)).astype(
                        np.int32
                    ),
                }
            )

        return fn

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["_side"] == 0][[key_col, "_h"]]
        n = g[g["_side"] == 1][[key_col, "_h"]]
        m = o.merge(n, on=key_col, how="outer", suffixes=("_o", "_n"), indicator=True)
        change = np.where(
            m["_merge"].to_numpy() == "right_only",
            "added",
            np.where(m["_merge"].to_numpy() == "left_only", "removed", "changed"),
        )
        keep = (m["_merge"] != "both").to_numpy() | (
            m["_h_o"].to_numpy() != m["_h_n"].to_numpy()
        )
        return pd.DataFrame(
            {key_col: m[key_col].to_numpy()[keep].astype(np.int64),
             "change": change[keep]}
        )

    merged = old.map_batches(tag(0), batch_format="pandas").union(
        new.map_batches(tag(1), batch_format="pandas")
    )
    return merged.groupby("_b").map_groups(
        lambda g: classify(g.drop(columns=["_b"])), batch_format="pandas"
    )
