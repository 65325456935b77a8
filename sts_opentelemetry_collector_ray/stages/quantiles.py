"""Mergeable quantile sketch — approximate percentiles without a global sort.

The guide's sketch pattern: each `map_batches` task emits ONE fixed-size sketch per
key (here: log-spaced bin counts), the sketches merge by vector addition in a tiny
`groupby().aggregate(Sum)` — so a p50/p95/p99 over 10^12 latencies costs one small
shuffle of (keys × batches) rows of 128 ints instead of a full sort. Error is
bounded by the bin ratio (~2.8% per bin edge with 128 bins over 1µs..10^7s).

The reference's fixed-bound histograms (A2) are the exact-bucket analogue; this
operator adds the *quantile estimation* layer a training-data pipeline wants for
latency/length distributions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

NUM_BINS = 128
_LO, _HI = 1.0, 1e13  # value domain (e.g. latency in µs); clamped outside
_EDGES = np.logspace(np.log10(_LO), np.log10(_HI), NUM_BINS - 1)


def _sketch_batch(values: np.ndarray) -> np.ndarray:
    v = np.clip(values.astype(np.float64), _LO, _HI - 1)
    idx = np.searchsorted(_EDGES, v, side="right")
    return np.bincount(idx, minlength=NUM_BINS).astype(np.int64)


def _quantile_from_bins(bins: np.ndarray, qs: list[float]) -> list[float]:
    total = bins.sum()
    if total == 0:
        return [float("nan")] * len(qs)
    cum = np.cumsum(bins)
    out = []
    for q in qs:
        target = q * total
        b = int(np.searchsorted(cum, target, side="left"))
        lo = _EDGES[b - 1] if b > 0 else _LO
        hi = _EDGES[b] if b < len(_EDGES) else _HI
        out.append(float(np.sqrt(lo * hi)))  # geometric midpoint of the bin
    return out


def quantile_sketch(
    ds: "ray.data.Dataset",
    value_col: str,
    key_cols: list[str] | None = None,
    qs: list[float] | None = None,
) -> pd.DataFrame:
    """(keys..., q, estimate) — approximate quantiles per key group."""
    qs = qs or [0.5, 0.9, 0.99]
    key_cols = key_cols or []

    def partial(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False)
        if key_cols:
            df = pd.DataFrame({k: t[k].to_numpy(zero_copy_only=False) for k in key_cols})
            df["_v"] = vals
            rows = {k: [] for k in key_cols}
            rows.update({f"b{i}": [] for i in range(NUM_BINS)})
            for kv, g in df.groupby(key_cols, sort=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                sk = _sketch_batch(g["_v"].to_numpy())
                for k, val in zip(key_cols, kv):
                    rows[k].append(val)
                for i in range(NUM_BINS):
                    rows[f"b{i}"].append(int(sk[i]))
            return pa.table(rows)
        sk = _sketch_batch(vals)
        return pa.table(
            {**{f"b{i}": pa.array([int(sk[i])], pa.int64()) for i in range(NUM_BINS)},
             "_k": pa.array([0], pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    group_keys = key_cols or ["_k"]
    merged = partials.groupby(group_keys).aggregate(
        *[Sum(f"b{i}", alias_name=f"b{i}") for i in range(NUM_BINS)]
    ).to_pandas()

    out_rows = []
    for _, row in merged.iterrows():
        bins = np.array([row[f"b{i}"] for i in range(NUM_BINS)], dtype=np.int64)
        ests = _quantile_from_bins(bins, qs)
        for q, e in zip(qs, ests):
            rec = {k: row[k] for k in key_cols}
            rec["q"] = q
            rec["estimate"] = e
            out_rows.append(rec)
    return pd.DataFrame(out_rows)


def grouped_quantiles_exact(
    ds: "ray.data.Dataset",
    value_col: str,
    key_col: str,
    qs: list[tuple[int, int, str]] | None = None,
) -> "ray.data.Dataset":
    """EXACT per-key quantiles via value-domain histograms — no global sort.

    The sketch above trades exactness for a fixed bin count; this operator is
    exact for FIXED-PRECISION domains (money, latencies in integer units):
    values quantize to integer cents, each batch emits an Arrow group_by
    (key, cents) count combiner, one bounded shuffle lands |keys| x |distinct
    cents| count rows, and a per-key cumulative scan picks the discrete
    quantile. At 100 TB the exchange is the DISTINCT-VALUE histogram, never
    the rows — exact quantiles without sorting the corpus. (Documented
    contract: the domain must be bounded for the histogram to be; float
    payloads with unbounded precision belong in `quantile_sketch`.)

    Quantiles are specified as RATIONALS (num, den, label) and picked at rank
    ceil(n*num/den) = (n*num + den - 1) // den — all-integer, so the DuckDB
    replay is byte-exact (no float rank arithmetic)."""
    import pyarrow.compute as pc

    qs = qs or [(1, 2, "p50"), (9, 10, "p90")]

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

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "cents"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        cnt = g["cnt"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        rows = []
        for num, den, label in qs:
            rank = (n * num + den - 1) // den
            i = int(np.searchsorted(cum, rank, side="left"))
            rows.append((g[key_col].iloc[0], label, n, cents[i] / 100.0))
        return pd.DataFrame(rows, columns=[key_col, "q_label", "n", "value"])

    # key_col is a BOUNDED dimension (metric/event type) — per-key map_groups
    # walks |distinct cents| rows, not corpus rows
    return hist.groupby(key_col).map_groups(pick, batch_format="pandas")
