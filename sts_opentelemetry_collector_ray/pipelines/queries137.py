"""Driver-contract queries, wave 137 — OTel-style base-2 exponential value
histograms per event type (the batch analogue of the reference's
exponential-histogram metric model, exporter/clickhousestsexporter/internal/
exponential_histogram_metrics.go:36-41: scale-0 buckets (2^(k-1), 2^k] with a
dedicated zero bucket, computed in EXACT integer arithmetic) and per-brand
supplier revenue concentration (HHI — the supply-chain-risk audit companion
to supplier_hhi_by_nation). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES137: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_exp_histogram — scale-0 exponential buckets over value cents
# ---------------------------------------------------------------------------


def q_events_exp_histogram(sf_dir: str):
    """Per (event_type, bucket): count of events whose value in integer cents
    (floor-half-up) falls in the scale-0 exponential bucket — bucket k > 0
    covers cents in (2^(k-1), 2^k] ... i.e. k = bit_length(cents); cents = 0
    is the zero bucket (k = 0); negative cents mirror to -bit_length(|cents|).
    Bucket bounds ship as lo_cents/hi_cents so the table reads as the
    reference's ExponentialHistogram rows. All-integer: the bucket index is
    the exact float64 exponent from np.frexp (cents < 2^53), never a libm
    log2 — so Ray and DuckDB (length(bin(x))) agree bit-for-bit.

    Scale shape: per-batch (event_type, bucket) count combiner — bounded
    |types| × ~40 buckets per block — folds on the driver; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        mag = np.abs(cents)
        # exact bit_length via frexp: for int 0 < x < 2^53, frexp exponent
        # equals bit_length(x) with zero float error.
        _, e = np.frexp(mag.astype(np.float64))
        bucket = np.sign(cents) * e.astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "bucket": bucket,
                    "n": 1,
                }
            )
            .groupby(["event_type", "bucket"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"bucket": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "bucket": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "lo_cents": pd.Series([], dtype=np.int64),
            "hi_cents": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["event_type", "bucket"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    b = out["bucket"].to_numpy(np.int64)
    mag = np.abs(b)
    lo_pos = np.where(mag > 0, np.left_shift(np.int64(1), np.maximum(mag - 1, 0)), 0)
    hi_pos = np.where(mag > 0, np.left_shift(np.int64(1), mag) - 1, 0)
    # bucket k>0 covers [2^(k-1), 2^k - 1] in cents; negatives mirror.
    out["lo_cents"] = np.where(b >= 0, lo_pos, -hi_pos).astype(np.int64)
    out["hi_cents"] = np.where(b >= 0, hi_pos, -lo_pos).astype(np.int64)
    return out.astype({"bucket": np.int64, "n": np.int64})


ORACLES137["events_exp_histogram"] = """
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
k AS (
  SELECT event_type,
         CASE WHEN cents = 0 THEN 0
              WHEN cents > 0 THEN CAST(length(bin(cents)) AS BIGINT)
              ELSE -CAST(length(bin(-cents)) AS BIGINT) END AS bucket
  FROM c
),
g AS (
  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
  FROM k GROUP BY 1, 2
)
SELECT event_type, bucket, n,
       CAST(CASE WHEN bucket = 0 THEN 0
                 WHEN bucket > 0 THEN (CAST(1 AS BIGINT) << (bucket - 1))
                 ELSE -((CAST(1 AS BIGINT) << (-bucket)) - 1) END
            AS BIGINT) AS lo_cents,
       CAST(CASE WHEN bucket = 0 THEN 0
                 WHEN bucket > 0 THEN (CAST(1 AS BIGINT) << bucket) - 1
                 ELSE -(CAST(1 AS BIGINT) << (-bucket - 1)) END
            AS BIGINT) AS hi_cents
FROM g"""


# ---------------------------------------------------------------------------
# part_brand_supplier_hhi — per-brand supplier revenue concentration
# ---------------------------------------------------------------------------


def q_part_brand_supplier_hhi(sf_dir: str):
    """Supply-chain risk: per part brand, the number of distinct suppliers
    with sales, the exact revenue total (extendedprice cents, floor-half-up)
    and the Herfindahl–Hirschman index of supplier revenue shares in micro
    units — HHI = Σ share² over suppliers, 1e6 = a single-supplier brand.
    Squares are exact arbitrary-precision integers; the finish is ONE shared
    double expression on both engines.

    Scale shape: the part→brand map broadcasts once (`ray.put`, bounded
    dimension side); per-batch (brand, supplier) cents combiner, ONE
    pair-hash bucket exchange (a pair's total completes in one bucket),
    per-bucket exact-int squares fold to ≤ |brands| partial rows per bucket;
    the driver folds ≤ 64 × |brands| partials with Python bigints."""
    import pyarrow.parquet as pq_mod

    from ..functions.hashing import fnv1a32_arrow

    part = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    pk = part["p_partkey"].to_numpy()
    order = np.argsort(pk)
    ref = ray.put(
        (pk[order], part["p_brand"].to_numpy(zero_copy_only=False)[order])
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        keys, brands = ray.get(ref)
        lpk = t["l_partkey"].to_numpy()
        idx = np.searchsorted(keys, lpk)
        b = brands[np.minimum(idx, len(keys) - 1)]
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "p_brand": b,
                    "supp": t["l_suppkey"].to_numpy(zero_copy_only=False),
                    "cents": cents,
                }
            )
            .groupby(["p_brand", "supp"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        h = fnv1a32_arrow(
            pa.array(
                g["p_brand"].astype(str) + "|" + g["supp"].astype(str),
                type=pa.string(),
            )
        )
        g["_b"] = (h % 64).astype(np.int64)
        return g.astype({"supp": np.int64, "cents": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        pair = (
            g.groupby(["p_brand", "supp"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        # exact squares: int64 cents → Python bigints on the bounded partials
        sq = [int(c) * int(c) for c in pair["cents"].to_numpy(np.int64)]
        pair = pair.assign(sq=pd.Series(sq, dtype=object, index=pair.index))
        out = (
            pair.groupby("p_brand", sort=False)
            .agg(
                n_suppliers=("supp", "nunique"),
                total_cents=("cents", "sum"),
                sum_sq=("sq", "sum"),
            )
            .reset_index()
        )
        return out.astype({"n_suppliers": np.int64, "total_cents": np.int64})

    part_rows = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= 64 buckets × |brands| partial rows
    )
    empty = pd.DataFrame(
        {
            "p_brand": pd.Series([], dtype=object),
            "n_suppliers": pd.Series([], dtype=np.int64),
            "total_cents": pd.Series([], dtype=np.int64),
            "hhi_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part_rows.empty or "p_brand" not in part_rows.columns:
        return empty
    rows = []
    for brand, grp in part_rows.groupby("p_brand", sort=True):
        total = int(grp["total_cents"].sum())
        s2 = sum(int(x) for x in grp["sum_sq"])
        hhi = int(
            np.floor(
                float(s2) / (float(total) * float(total)) * 1_000_000.0 + 0.5
            )
        )
        rows.append((brand, int(grp["n_suppliers"].sum()), total, hhi))
    return pd.DataFrame(
        rows, columns=["p_brand", "n_suppliers", "total_cents", "hhi_micro"]
    ).astype(
        {"n_suppliers": np.int64, "total_cents": np.int64, "hhi_micro": np.int64}
    )


ORACLES137["part_brand_supplier_hhi"] = """
WITH r AS (
  SELECT p.p_brand, l.l_suppkey AS supp,
         CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
g AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS s2
  FROM r GROUP BY 1
)
SELECT p_brand, n_suppliers, total_cents,
       CAST(floor(CAST(s2 AS DOUBLE)
                  / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS hhi_micro
FROM g"""


QUERIES137 = {
    "events_exp_histogram": q_events_exp_histogram,
    "part_brand_supplier_hhi": q_part_brand_supplier_hhi,
}
