"""Driver-contract queries, wave 52 — watermark late-arrival accounting (the
streaming-ingest operational report: how much telemetry arrives behind the
high-water mark, per signal type) and RFM customer segmentation (the classic
recency/frequency/monetary quintile scoring behind retention pipelines).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES52: dict[str, str] = {}

_LATE_US = 300_000_000  # allowed lateness: 5 minutes
_WM_WIDTH = 65_536  # event_id range per watermark bucket
_RFM_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_late_arrivals — watermark lateness scan (distributed prefix max)
# ---------------------------------------------------------------------------


def q_events_late_arrivals(sf_dir: str):
    """Watermark late-arrival report: treating ``event_id`` as arrival order
    and ``ts`` as event time, the watermark after each arrival is the running
    max of event time; a row is late when it arrives more than 5 minutes
    behind it. The reference's collector faces exactly this ingest-order vs
    event-time skew (late spans against an advancing high-water mark).

    Distributed scan, no global sort: (1) per-(event_id//W) bucket max-ts
    partials → tiny exchange → driver exclusive prefix-max → broadcast
    carry-ins (driver state = N/W scalars); (2) ONE bounded bucket exchange,
    per-bucket argsort + ``np.maximum.accumulate`` with the carry-in, then a
    per-(bucket, type) partial aggregate — rows never leave their bucket and
    only |buckets|x|types| partial rows reach the driver."""
    import ray

    path = f"{sf_dir}/events.parquet"
    W = _WM_WIDTH

    def bucket_max(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rng = pc.cast(pc.divide(t["event_id"], W), pa.int64())
        ts_us = pc.cast(t["ts"], pa.int64())
        g = (
            pa.table({"rng": rng, "ts_us": ts_us})
            .group_by(["rng"])
            .aggregate([("ts_us", "max")])
        )
        return g.rename_columns(["rng", "mx"]).replace_schema_metadata(None)

    agg = (
        ray.data.read_parquet(path, columns=["event_id", "ts"])
        .map_batches(bucket_max, batch_format="pyarrow")
        .to_pandas()  # bounded: N/W rows
        .groupby("rng")["mx"]
        .max()
        .sort_index()
    )
    run = np.maximum.accumulate(agg.to_numpy(np.int64))
    # exclusive prefix: carry into bucket k = max over buckets < k
    carry = {
        int(r): int(v)
        for r, v in zip(agg.index.to_numpy(), np.concatenate([[np.iinfo(np.int64).min], run[:-1]]))
    }
    carry_ref = ray.put(carry)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _rng=(df["event_id"].to_numpy(np.int64) // W).astype(np.int64)
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        cin = ray.get(carry_ref)[int(g["_rng"].iloc[0])]
        order = np.argsort(g["event_id"].to_numpy(np.int64), kind="stable")
        ts_us = (
            g["ts"].to_numpy()[order].astype("datetime64[us]").astype(np.int64)
        )
        late = np.maximum(np.maximum.accumulate(ts_us), cin) - ts_us
        et = g["event_type"].to_numpy()[order]
        is_late = late > _LATE_US
        out = pd.DataFrame(
            {
                "event_type": et,
                "late": is_late,
                "late_amt": np.where(is_late, late, 0),
            }
        )
        part = (
            out.groupby("event_type", sort=False)
            .agg(
                n_events=("late", "size"),
                n_late=("late", "sum"),
                max_late_us=("late_amt", "max"),
            )
            .reset_index()
        )
        part["n_events"] = part["n_events"].astype(np.int64)
        part["n_late"] = part["n_late"].astype(np.int64)
        part["max_late_us"] = part["max_late_us"].astype(np.int64)
        return part

    parts = (
        ray.data.read_parquet(path, columns=["event_id", "ts", "event_type"])
        .map_batches(bucket, batch_format="pandas")
        .groupby("_rng")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()  # bounded: |buckets| x |types| rows
    )
    out = (
        parts.groupby("event_type")
        .agg(
            n_events=("n_events", "sum"),
            n_late=("n_late", "sum"),
            max_late_us=("max_late_us", "max"),
        )
        .reset_index()
        .sort_values("event_type", kind="mergesort")
        .reset_index(drop=True)
    )
    out["n_events"] = out["n_events"].astype(np.int64)
    out["n_late"] = out["n_late"].astype(np.int64)
    out["max_late_us"] = out["max_late_us"].astype(np.int64)
    return out


ORACLES52["events_late_arrivals"] = f"""
WITH w AS (
  SELECT event_type,
         max(epoch_us(ts)) OVER (ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING) - epoch_us(ts)
           AS late_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (late_us > {_LATE_US}) AS BIGINT) AS n_late,
       CAST(coalesce(max(late_us) FILTER (late_us > {_LATE_US}), 0) AS BIGINT)
         AS max_late_us
FROM w GROUP BY event_type ORDER BY event_type"""


# ---------------------------------------------------------------------------
# customer_rfm — recency/frequency/monetary quintile segmentation
# ---------------------------------------------------------------------------


def q_customer_rfm(sf_dir: str):
    """RFM segmentation over orders: per-customer (last order date, order
    count, total cents), each dimension scored into quintiles by
    strictly-better count — tile = 1 + (5 * |better|) // n, ties share a tile
    (rank(), not ntile(), so the score is order-independent and exactly
    SQL-replayable).

    Scale shape: per-batch pandas partials → ONE custkey-bucket exchange for
    the exact per-customer re-reduce (bounded buckets, vectorized) →
    materialized small side (customers << orders) → distinct-value histograms
    per dimension (date domain and count domain are bounded; cents domain
    follows the repo's bounded-cents-histogram precedent, see
    ``analytics.py::percentile_rank``) → broadcast sorted arrays →
    streaming ``np.searchsorted`` tile scoring. Rows shuffle once."""
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5).astype(
            np.int64
        )
        dt_us = df["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = (
            pd.DataFrame(
                {"o_custkey": df["o_custkey"].to_numpy(np.int64), "c": cents, "d": dt_us}
            )
            .groupby("o_custkey", sort=False)
            .agg(freq=("c", "size"), mon_cents=("c", "sum"), last_us=("d", "max"))
            .reset_index()
        )
        g["freq"] = g["freq"].astype(np.int64)
        g["_b"] = (g["o_custkey"].to_numpy(np.int64) % _RFM_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("o_custkey", sort=False)
            .agg(
                freq=("freq", "sum"),
                mon_cents=("mon_cents", "sum"),
                last_us=("last_us", "max"),
            )
            .reset_index()
        )
        out["freq"] = out["freq"].astype(np.int64)
        return out

    cust = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .materialize()  # corpus-reduced small side; safe to branch
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for dim, col in (("r", "last_us"), ("f", "freq"), ("m", "mon_cents")):
            h = df.groupby(col, sort=False).size().rename("cnt").reset_index()
            frames.append(
                pd.DataFrame(
                    {
                        "dim": dim,
                        "val": h[col].to_numpy(np.int64),
                        "cnt": h["cnt"].to_numpy(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    hs = (
        cust.map_batches(hist, batch_format="pandas")
        .to_pandas()  # bounded: distinct values per dimension
        .groupby(["dim", "val"])["cnt"]
        .sum()
        .reset_index()
    )
    n = int(hs.loc[hs["dim"] == "r", "cnt"].sum())
    better: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for dim in ("r", "f", "m"):
        h = hs[hs["dim"] == dim].sort_values("val")
        vals = h["val"].to_numpy(np.int64)
        cnts = h["cnt"].to_numpy(np.int64)
        # strictly-better = strictly GREATER value count (all dims rank DESC)
        suffix = np.concatenate([np.cumsum(cnts[::-1])[::-1][1:], [0]])
        better[dim] = (vals, suffix)
    better_ref = ray.put((n, better))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        n_, b = ray.get(better_ref)
        tiles = {}
        for dim, col in (("r", "last_us"), ("f", "freq"), ("m", "mon_cents")):
            vals, suffix = b[dim]
            idx = np.searchsorted(vals, df[col].to_numpy(np.int64))
            tiles[dim] = (1 + (5 * suffix[idx]) // n_).astype(np.int64)
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"].to_numpy(np.int64),
                "freq": df["freq"].to_numpy(np.int64),
                "mon_cents": df["mon_cents"].to_numpy(np.int64),
                "r_tile": tiles["r"],
                "f_tile": tiles["f"],
                "m_tile": tiles["m"],
                "rfm": tiles["r"] * 100 + tiles["f"] * 10 + tiles["m"],
            }
        )

    return cust.map_batches(score, batch_format="pandas")


ORACLES52["customer_rfm"] = """
WITH agg AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_dt,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS mon_cents
  FROM orders GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM agg),
t AS (
  SELECT o_custkey, freq, mon_cents,
         CAST(1 + (5 * (rank() OVER (ORDER BY last_dt DESC) - 1)) // n.n
              AS BIGINT) AS r_tile,
         CAST(1 + (5 * (rank() OVER (ORDER BY freq DESC) - 1)) // n.n
              AS BIGINT) AS f_tile,
         CAST(1 + (5 * (rank() OVER (ORDER BY mon_cents DESC) - 1)) // n.n
              AS BIGINT) AS m_tile
  FROM agg CROSS JOIN n
)
SELECT o_custkey, freq, mon_cents, r_tile, f_tile, m_tile,
       CAST(r_tile * 100 + f_tile * 10 + m_tile AS BIGINT) AS rfm
FROM t"""


QUERIES52 = {
    "events_late_arrivals": q_events_late_arrivals,
    "customer_rfm": q_customer_rfm,
}
