"""TTL re-emit deduplication — the reference's dedup cache with EXPIRY.

The flagship dedup (stages/dedup.py, D1) is first-wins per run: one emission
per projection hash, matching a cache whose TTL exceeds the batch window
(`processor/stsusageprocessor` keeps a hash → deadline map and re-admits an
entry once `now > deadline`). This stage implements the other half of that
contract: a row is SUPPRESSED only while its key's last emission is younger
than ``ttl``; once the TTL lapses, the next row re-emits and restarts the
clock. That is a greedy per-key chain over time:

    emit(k) = { first row of k } ∪ { first row with ts >= last_emit + ttl }*

Scale shape: ONE bounded bucket exchange (hash(key) % B) co-locates each key's
rows, then a vectorized round loop resolves every key's chain simultaneously —
round j finds every active key's (j+1)-th emission with ONE ``np.searchsorted``
over a composite (key, ts) sort key, so the per-bucket work is
O(rows · log rows · max_emits_per_key) numpy, never Python-per-row. The round
count is bounded by span/ttl + 1, independent of corpus size.

Determinism: rows sort by (key, ts, id); ties at the same timestamp emit the
smallest id and suppress the rest (ttl > 0). The DuckDB oracle replays the
chain with a recursive CTE (row_number() per step).
"""
from __future__ import annotations

import numpy as np
import pandas as pd

import ray


def ttl_dedup(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    ttl_us: int = 86_400_000_000,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Greedy TTL re-emit dedup. Returns the emitted rows
    (key_cols + [ts_col, id_col])."""
    B = np.uint64(num_buckets)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = np.zeros(len(df), dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(1_000_003) + pd.util.hash_array(df[c].to_numpy())
        return df.assign(_b=(h % B).astype(np.int32))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*key_cols, ts_col, id_col], kind="mergesort")
        ts = g[ts_col].to_numpy()
        ts_i = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" else ts.astype(np.int64)
        # factorize the (possibly composite) key in sorted order
        kf = pd.MultiIndex.from_frame(g[key_cols]) if len(key_cols) > 1 else g[key_cols[0]]
        k_idx, _ = pd.factorize(kf, sort=False)  # already key-sorted ⇒ contiguous
        k_idx = k_idx.astype(np.int64)
        n = len(g)
        if n == 0:
            return g.loc[[], [*key_cols, ts_col, id_col]]
        t0 = int(ts_i.min())
        span = int(ts_i.max()) - t0 + int(ttl_us) + 1
        comp = k_idx * span + (ts_i - t0)
        # first row of each key (k_idx contiguous ascending)
        starts = np.flatnonzero(np.r_[True, k_idx[1:] != k_idx[:-1]])
        ends = np.r_[starts[1:], n]
        emit = np.zeros(n, dtype=bool)
        pos = starts.copy()
        emit[pos] = True
        active = np.arange(len(starts))
        while len(active):
            last_ts = ts_i[pos[active]]
            targets = k_idx[pos[active]] * span + (last_ts - t0) + int(ttl_us)
            nxt = np.searchsorted(comp, targets, side="left")
            ok = nxt < ends[active]
            active = active[ok]
            if not len(active):
                break
            pos[active] = nxt[ok]
            emit[pos[active]] = True
        return g.loc[emit, [*key_cols, ts_col, id_col]]

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(resolve, batch_format="pandas")
    )
