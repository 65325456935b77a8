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
