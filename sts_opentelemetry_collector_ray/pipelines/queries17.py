"""Driver-contract queries, wave 17 — data-quality constraint checking (the
Deequ-style pre-training validation suite) and Z-order clustering keys (the
lakehouse multi-column locality transform). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES17: dict[str, str] = {}

_QC_BUCKETS = 64
_QC_VAL_LO, _QC_VAL_HI = 0.0, 400.0
_QC_ENUM = ("click", "view", "purchase", "signup", "error")


# ---------------------------------------------------------------------------
# events_quality_checks — Deequ-style constraint suite over the event stream
# ---------------------------------------------------------------------------


def q_events_quality_checks(sf_dir: str):
    """Data-quality constraint checking before the data is trusted (the Deequ
    /Great-Expectations operator family): uniqueness(event_id),
    completeness(ts), range(value), enum(event_type) — one row per
    constraint with its violation count. Scale shape: ONE streaming pass
    computes per-batch violation partials (4 counters per batch); uniqueness
    needs a distinct count, which ships ids once through a bounded hash-bucket
    exchange (the events_distinct_daily idiom) — duplicate ids are counted
    exactly, never estimated. Driver residue: a handful of scalars."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts_null = t["ts"].null_count
        v = t["value"].to_numpy(zero_copy_only=False)
        # NULL values compare false on both sides (SQL FILTER skips NULLs,
        # NaN comparisons are False here)
        rng = int(
            np.count_nonzero((v < _QC_VAL_LO) | (v > _QC_VAL_HI))
        )
        et = t["event_type"]
        en = int(
            pc.sum(
                pc.cast(
                    pc.is_null(
                        pc.index_in(et, value_set=pa.array(list(_QC_ENUM)))
                    ),
                    pa.int64(),
                )
            ).as_py()
            or 0
        )
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "ts_null": pa.array([ts_null], pa.int64()),
                "rng": pa.array([rng], pa.int64()),
                "en": pa.array([en], pa.int64()),
            }
        )

    ds = ray.data.read_parquet(
        path, columns=["event_id", "ts", "value", "event_type"]
    )
    scalars = (
        ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    )

    # exact distinct(event_id): per-batch distinct partial → bucket exchange →
    # per-bucket unique count → one tiny sum
    ids = ray.data.read_parquet(path, columns=["event_id"])

    def id_partial(t: pa.Table) -> pa.Table:
        u = np.unique(t["event_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "_b": pa.array((u.astype(np.uint64) % _QC_BUCKETS).astype(np.int32)),
                "event_id": pa.array(u),
            }
        )

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"d": [np.int64(g["event_id"].nunique())]}
        )

    d = int(
        ids.map_batches(id_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()["d"]
        .sum()
    )

    n = int(scalars["n"])
    rows = [
        ("unique_event_id", n - d),
        ("ts_complete", int(scalars["ts_null"])),
        ("value_in_range", int(scalars["rng"])),
        ("event_type_enum", int(scalars["en"])),
    ]
    return pd.DataFrame(
        {
            "check_name": [r[0] for r in rows],
            "violations": np.array([r[1] for r in rows], dtype=np.int64),
            "passed": np.array([r[1] == 0 for r in rows], dtype=bool),
        }
    )


ORACLES17["events_quality_checks"] = f"""
WITH t AS (
  SELECT count(*) AS n, count(DISTINCT event_id) AS d,
         count(*) FILTER (WHERE ts IS NULL) AS ts_null,
         count(*) FILTER (WHERE value < {_QC_VAL_LO} OR value > {_QC_VAL_HI}) AS rng,
         count(*) FILTER (WHERE event_type IS NULL OR event_type NOT IN
           ({", ".join(repr(e) for e in _QC_ENUM)})) AS en
  FROM events)
SELECT 'unique_event_id' AS check_name, CAST(n - d AS BIGINT) AS violations,
       (n - d) = 0 AS passed FROM t
UNION ALL SELECT 'ts_complete', CAST(ts_null AS BIGINT), ts_null = 0 FROM t
UNION ALL SELECT 'value_in_range', CAST(rng AS BIGINT), rng = 0 FROM t
UNION ALL SELECT 'event_type_enum', CAST(en AS BIGINT), en = 0 FROM t"""


# ---------------------------------------------------------------------------
# events_zorder — Morton (Z-order) clustering key over (user_id, time)
# ---------------------------------------------------------------------------

_Z_BITS = 16


def q_events_zorder(sf_dir: str):
    """Z-order (Morton) key computation — the lakehouse OPTIMIZE ZORDER BY
    transform that co-locates rows sharing prefixes of BOTH user and time so
    two-column range predicates prune files: interleave the low 16 bits of
    user_id (even positions) with the low 16 bits of epoch-seconds (odd
    positions). Stateless, vectorized bit ops, zero shuffles; downstream a
    plain sort by zkey yields the clustered layout."""

    def zkey(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ).astype(np.int64) // 1_000_000
        z = np.zeros(len(u), dtype=np.int64)
        for i in range(_Z_BITS):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((s >> i) & 1) << (2 * i + 1)
        return pa.table({"event_id": t["event_id"], "zkey": pa.array(z)})

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return ds.map_batches(zkey, batch_format="pyarrow")


ORACLES17["events_zorder"] = (
    "SELECT event_id, CAST("
    + " + ".join(
        f"(((user_id >> {i}) & 1) << {2 * i})" for i in range(_Z_BITS)
    )
    + " + "
    + " + ".join(
        f"(((epoch_us(ts) // 1000000 >> {i}) & 1) << {2 * i + 1})"
        for i in range(_Z_BITS)
    )
    + " AS BIGINT) AS zkey FROM events"
)


QUERIES17 = {
    "events_quality_checks": q_events_quality_checks,
    "events_zorder": q_events_zorder,
}
