"""Event-analytics operators: deterministic uniform sampling, cohort retention,
and per-key z-score anomaly flags.

All three follow the repo's scale contract: per-batch combiners reduce what the
exchange carries to a bounded partial (k rows, (user,day) distincts, |keys|
moment triples), the only shuffles are over those partials or a bounded bucket
column, and broadcast state is a tiny driver-merged table — never row data.

The z-score pass mirrors the reference's metric-accumulator shape (per-series
integer accumulators merged at export, stsservicegraphconnector/connector.go's
reqTotal maps): moments are exact integer cents, the float math happens once per
key at merge time, and the flag pass streams.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import fnv1a32_arrow

# --- deterministic uniform k-sample ------------------------------------------


def uniform_sample_k(
    ds: "ray.data.Dataset", id_col: str, k: int, keep_cols: list[str]
) -> "ray.data.Dataset":
    """k rows chosen uniformly (over the id hash) with zero RNG state — the
    batch equivalent of reservoir sampling, but deterministic and mergeable:
    each batch forwards only its k smallest (fnv32(id), id) candidates, so the
    final exact sort runs over ≤ k·|blocks| rows regardless of corpus size.
    Ties (32-bit collisions) break on the id itself, so the result is a set,
    not an ordering artifact."""

    def partial(t: pa.Table) -> pa.Table:
        h = fnv1a32_arrow(pc.cast(t[id_col], pa.string()).combine_chunks()).astype(
            np.int64
        )
        t = t.append_column("h", pa.array(h, pa.int64()))
        if t.num_rows > k:
            # top-k smallest by (h, id): partition on h alone can split a tie
            # group, so keep EVERY row at or below the kth h, then exact-sort
            # that (k + ties)-sized subset
            kth = np.partition(h, k - 1)[k - 1]
            sub = t.filter(pa.array(h <= kth))
            order = pc.sort_indices(
                sub, sort_keys=[("h", "ascending"), (id_col, "ascending")]
            )
            t = sub.take(order[:k])
        return t.select(keep_cols + ["h"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .sort(["h", id_col])
        .limit(k)
    )


# --- cohort retention ---------------------------------------------------------

_US_PER_DAY = 86_400_000_000


def cohort_retention(
    ds: "ray.data.Dataset", num_buckets: int = 64
) -> "ray.data.Dataset":
    """(cohort_day_us, offset_days, n_users): how many users first seen on
    cohort day D were active again D+offset days later.

    Shape: per-batch distinct-(user, day) combiner → ONE bounded user-bucket
    exchange (all of a user's days co-locate, so the in-bucket min IS the
    global cohort) → per-bucket (cohort, offset) partial counts (≤ days² rows)
    → tiny sum aggregate. User cardinality never hits the driver."""

    def partial(t: pa.Table) -> pa.Table:
        # normalize to µs first — ns-resolution inputs (e.g. from_pandas)
        # would otherwise silently emit ns epoch values
        ts = pc.cast(t["ts"], pa.timestamp("us"))
        day_us = pc.cast(pc.floor_temporal(ts, unit="day"), pa.int64())
        d = (
            pa.table({"user_id": t["user_id"], "day_us": day_us})
            .group_by(["user_id", "day_us"])
            .aggregate([])
        )
        bucket = pc.cast(
            pc.bit_wise_and(d["user_id"], num_buckets - 1), pa.int32()
        )
        return d.append_column("_bucket", bucket)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day_us"])
        cohort = df.groupby("user_id")["day_us"].transform("min")
        off = ((df["day_us"].to_numpy() - cohort.to_numpy()) // _US_PER_DAY).astype(
            np.int64
        )
        out = (
            pd.DataFrame({"cohort_day_us": cohort.to_numpy(), "offset_days": off})
            .groupby(["cohort_day_us", "offset_days"], sort=False)
            .size()
            .reset_index(name="pn")
        )
        out["pn"] = out["pn"].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby(["cohort_day_us", "offset_days"])
        .aggregate(Sum("pn", alias_name="n_users"))
    )


# --- per-key z-score anomaly flags ---------------------------------------------


def zscore_flags(
    ds: "ray.data.Dataset", key_col: str = "event_type", sigma: float = 2.0
) -> "ray.data.Dataset":
    """Two-pass streaming z-score per key: pass 1 reduces to exact integer-cent
    moments (n, Σcents, Σcents²) per key — |keys|·|blocks| partial rows, merged
    to |keys| on the driver; pass 2 streams the flag over broadcast (μ, σ).

    The float path is fixed-order (s/n, (q − s·s/n)/n, sqrt, (c − μ)/σ — all
    IEEE-correctly-rounded ops), so DuckDB replays it bit-for-bit; the z score
    is rounded to 6dp and the flag compares the ROUNDED value, keeping the
    boundary decision ulp-proof. Keys with σ = 0 yield NULL z and false."""
    import ray

    def moments(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5)), pa.int64()
        )
        m = (
            pa.table(
                {
                    key_col: t[key_col],
                    "s": cents,
                    "q": pc.multiply_checked(cents, cents),
                    "n": pa.array(np.ones(len(cents), dtype=np.int64)),
                }
            )
            .group_by(key_col)
            .aggregate([("s", "sum"), ("q", "sum"), ("n", "sum")])
        )
        return m.rename_columns([key_col, "s", "q", "n"])

    merged = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(
            Sum("s", alias_name="s"), Sum("q", alias_name="q"), Sum("n", alias_name="n")
        )
        .to_pandas()  # bounded: |keys| rows
    )
    keys_np = merged[key_col].to_numpy()
    mu_np = np.empty(len(keys_np), dtype=np.float64)
    sd_np = np.empty(len(keys_np), dtype=np.float64)
    for i, (s, q, n) in enumerate(
        merged[["s", "q", "n"]].itertuples(index=False)
    ):  # |keys| iterations — driver-side, bounded
        s_f, q_f, n_i = float(s), float(q), int(n)
        mu_np[i] = s_f / n_i
        var = (q_f - s_f * s_f / n_i) / n_i
        sd_np[i] = math.sqrt(var) if var > 0 else 0.0
    stats_ref = ray.put((pa.array(keys_np), mu_np, sd_np))

    def flag(t: pa.Table) -> pa.Table:
        key_arr, mu_lut, sd_lut = ray.get(stats_ref)
        idx = pc.index_in(t[key_col], key_arr).to_numpy(zero_copy_only=False)
        mu, sd = mu_lut[idx], sd_lut[idx]
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5)
        ok = sd > 0.0
        z = np.zeros(len(cents), dtype=np.float64)
        z[ok] = (cents[ok] - mu[ok]) / sd[ok]
        z = np.floor(z * 1e6 + 0.5) / 1e6
        anom = ok & (np.abs(z) > sigma)
        return pa.table(
            {
                "event_id": t["event_id"],
                key_col: t[key_col],
                "value": t["value"],
                "zscore": pa.array(z, pa.float64(), mask=~ok),
                "is_anomaly": pa.array(anom),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def global_row_number(
    ds: "ray.data.Dataset",
    group_col: str = "lang",
    id_col: str = "doc_id",
    range_width: int = 1024,
) -> "ray.data.Dataset":
    """Contiguous global row numbers in (group, id) order — the training-shard
    id assignment step (loaders want dense 0..N-1 positions after a corpus
    sort) WITHOUT a global sort: row_number() OVER (ORDER BY group, id).

    Two passes. (1) A (group, id//W) range-histogram combiner → tiny shuffle →
    the driver prefix-sums the bucket counts in order and broadcasts the
    offsets (driver state = |groups|·|id-range|/W rows — pick ``range_width``
    so that stays ≤ ~10⁶ at your corpus size). (2) ONE bounded bucket exchange
    co-locates each range bucket; a vectorized in-bucket argsort assigns
    offset + local rank. Every bucket holds ≤ W rows by construction, so task
    memory is bounded no matter the corpus. Requires ``id_col`` unique."""
    import ray

    W = int(range_width)

    def counts(t: pa.Table) -> pa.Table:
        rng = pc.cast(
            pc.floor(pc.divide(pc.cast(t[id_col], pa.float64()), float(W))),
            pa.int64(),
        )
        g = (
            pa.table({"g": t[group_col], "rng": rng})
            .group_by(["g", "rng"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["g", "rng", "cnt"]).replace_schema_metadata(None)

    agg = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby(["g", "rng"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values(["g", "rng"])
    )
    csum = np.concatenate([[0], np.cumsum(agg["cnt"].to_numpy(np.int64))[:-1]])
    offsets = {
        (g, int(r)): int(o)
        for g, r, o in zip(agg["g"], agg["rng"], csum)
    }
    off_ref = ray.put(offsets)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_rng=(df[id_col].to_numpy(np.int64) // W).astype(np.int64))

    def number(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        grp = g[group_col].iloc[0]
        rng = int(g["_rng"].iloc[0])
        g = g.sort_values(id_col, kind="mergesort")
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(np.int64),
                group_col: g[group_col].to_numpy(),
                "row_num": off[(grp, rng)] + np.arange(len(g), dtype=np.int64),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby([group_col, "_rng"])
        .map_groups(number, batch_format="pandas")
    )


def percentile_rank(
    ds: "ray.data.Dataset",
    value_col: str = "value",
    key_col: str = "event_type",
    id_col: str = "event_id",
) -> "ray.data.Dataset":
    """Per-key percentile rank of every row — feature normalization for
    training (rank-gauss / quantile-uniform transforms start exactly here):
    pr_micro = (10⁶ · |{rows of key with value < mine}|) // n, all-integer.

    Same bounded-domain histogram trick as grouped_quantiles_exact: ONE
    (key, cents) histogram aggregate (≤ |keys|·|distinct cents| rows) lands on
    the driver, the per-key (sorted cents, exclusive-cumulative counts, n)
    arrays broadcast via ray.put, and a second streaming pass ranks each row
    with one np.searchsorted per (batch, key) — rows never shuffle."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t[value_col].to_numpy(zero_copy_only=False).astype(np.float64) * 100 + 0.5
        ).astype(np.int64)
        g = (
            pa.table({key_col: t[key_col], "cents": pa.array(cents, pa.int64())})
            .group_by([key_col, "cents"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([key_col, "cents", "cnt"]).replace_schema_metadata(None)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values([key_col, "cents"])
    )
    hist: dict = {}
    for k, g in agg.groupby(key_col, sort=False):
        cnt = g["cnt"].to_numpy(np.int64)
        less = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        hist[k] = (g["cents"].to_numpy(np.int64), less, int(cnt.sum()))
    hist_ref = ray.put(hist)

    def score(t: pa.Table) -> pa.Table:
        h = ray.get(hist_ref)
        cents = np.floor(
            t[value_col].to_numpy(zero_copy_only=False).astype(np.float64) * 100 + 0.5
        ).astype(np.int64)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        pr = np.zeros(len(cents), dtype=np.int64)
        for k in pd.unique(keys):
            m = keys == k
            kc, less, n = h[k]
            idx = np.searchsorted(kc, cents[m], side="left")
            pr[m] = (1_000_000 * less[idx]) // n
        return pa.table(
            {
                id_col: t[id_col],
                key_col: t[key_col],
                value_col: t[value_col],
                "pr_micro": pa.array(pr, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def pivot_dow_counts(
    ds: "ray.data.Dataset",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> "ray.data.Dataset":
    """Pivot to a dense (key × day-of-week) count matrix — the feature-table
    shape (one row per key, one fixed column per category) classifiers and
    dashboards consume. Fixed 7-column schema; dow convention matches DuckDB's
    ``dayofweek`` (Sunday = 0), derived from integer epoch days (1970-01-01 is
    a Thursday ⇒ (days + 4) % 7).

    Scale shape: per-batch (key, dow) count combiner → ≤ |keys|·7·|batches|
    partial shuffle → per-key vectorized pivot (key is a bounded dimension)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        days = ts.astype("datetime64[D]").astype(np.int64)
        dow = ((days + 4) % 7).astype(np.int64)
        g = (
            pa.table({"k": t[key_col], "dow": pa.array(dow, pa.int64())})
            .group_by(["k", "dow"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["k", "dow", "cnt"]).replace_schema_metadata(None)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["k", "dow"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def pivot(g: pd.DataFrame) -> pd.DataFrame:
        row = np.zeros(7, dtype=np.int64)
        row[g["dow"].to_numpy(np.int64)] = g["cnt"].to_numpy(np.int64)
        return pd.DataFrame(
            {key_col: [g["k"].iloc[0]],
             **{f"dow_{d}": np.array([row[d]], dtype=np.int64) for d in range(7)}}
        )

    return agg.groupby("k").map_groups(pivot, batch_format="pandas")


def interarrival_deltas(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-key lag delta — time since the key's previous event (ordered by
    (ts, id); a key's first event gets NULL). The lag/lead window family as a
    Ray stage: ONE bounded key-bucket exchange co-locates each key's rows,
    then a vectorized lexsort + shifted diff resolves every key at once (the
    sessionize kernel's shape, emitting the raw gaps instead of window ids)."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df[key_col].to_numpy())
        return df.assign(_b=(h % np.uint64(num_buckets)).astype(np.int32))

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {id_col: np.array([], np.int64), key_col: [],
                 "delta_us": np.array([], np.float64)}
            )
        ts = g[ts_col].to_numpy()
        ts_i = (
            ts.astype("datetime64[us]").astype(np.int64)
            if ts.dtype.kind == "M"
            else ts.astype(np.int64)
        )
        ids = g[id_col].to_numpy(np.int64)
        keys = g[key_col].to_numpy()
        order = np.lexsort((ids, ts_i, keys))
        k_s, t_s, i_s = keys[order], ts_i[order], ids[order]
        d = np.empty(len(g), dtype=np.float64)
        d[0] = np.nan
        if len(g) > 1:
            same = k_s[1:] == k_s[:-1]
            d[1:] = np.where(same, (t_s[1:] - t_s[:-1]).astype(np.float64), np.nan)
        # float64 with NaN for the per-key first row: deltas are < 2^53 µs so
        # the float is exact, and it matches what any SQL NULLable lag column
        # round-trips to in pandas
        return pd.DataFrame({id_col: i_s, key_col: k_s, "delta_us": d})

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(lambda g: deltas(g.drop(columns=["_b"])), batch_format="pandas")
    )
