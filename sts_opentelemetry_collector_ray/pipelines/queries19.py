"""Driver-contract queries, wave 19 — time-bucketed OHLC aggregation (ordered
first/last + min/max per window, exact integer cents) and per-group linear
trend fitting (least-squares slope from order-independent integer sums). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES19: dict[str, str] = {}

_OHLC_BUCKETS = 64
# days between 1970-01-01 and 2024-01-01: rebases x so n·Σx² stays in int64
_TREND_DAY0 = 19723


# ---------------------------------------------------------------------------
# events_ohlc — per (event_type, day): open/high/low/close/count
# ---------------------------------------------------------------------------


def q_events_ohlc(sf_dir: str):
    """OHLC windowed aggregate: per (event_type, day) the first and last
    value in (ts, event_id) order plus min/max — the ordered-selection
    aggregate family (first_value/last_value windows) that a plain hash
    aggregate can't express. ONE bounded (type, day)-hash bucket exchange,
    then a single mergesort + boundary scan per bucket: open/close by
    boundary index, high/low by np.maximum/minimum.reduceat. Values are
    exact integer cents."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type", "value"],
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.floor("d")
        h = pd.util.hash_array(
            (df["event_type"].astype(str) + "|").to_numpy(dtype=object)
        ) + day.to_numpy("datetime64[us]").astype(np.uint64)
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": day,
                "ts": df["ts"],
                "event_id": df["event_id"],
                "c": np.round(
                    df["value"].to_numpy(dtype=np.float64) * 100
                ).astype(np.int64),
                "_b": (h % _OHLC_BUCKETS).astype(np.int32),
            }
        )

    def ohlc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["event_type", "day", "ts", "event_id"], kind="mergesort"
        )
        et = g["event_type"].to_numpy(dtype=object)
        day = g["day"].to_numpy("datetime64[us]")
        c = g["c"].to_numpy()
        n = len(g)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (et[1:] != et[:-1]) | (day[1:] != day[:-1])
        starts = np.nonzero(new)[0]
        ends = np.concatenate([starts[1:], [n]]) - 1
        return pd.DataFrame(
            {
                "event_type": et[starts],
                "day": day[starts],
                "open_cents": c[starts],
                "close_cents": c[ends],
                "high_cents": np.maximum.reduceat(c, starts),
                "low_cents": np.minimum.reduceat(c, starts),
                "n": (ends - starts + 1).astype(np.int64),
            }
        )

    b = ds.map_batches(bucketize, batch_format="pandas")
    return b.groupby("_b").map_groups(ohlc, batch_format="pandas")


ORACLES19["events_ohlc"] = """
WITH e AS (
  SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
w AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, day
                               ORDER BY ts, event_id) AS rn,
            count(*) OVER (PARTITION BY event_type, day) AS cnt
  FROM e)
SELECT event_type, day,
       max(CASE WHEN rn = 1 THEN c END) AS open_cents,
       max(CASE WHEN rn = cnt THEN c END) AS close_cents,
       max(c) AS high_cents, min(c) AS low_cents, count(*) AS n
FROM w GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# events_trend — per-type least-squares trend of value over days
# ---------------------------------------------------------------------------


def q_events_trend(sf_dir: str):
    """Per-group linear trend (cents per day): ordinary least squares from
    the order-independent integer sums (n, Σx, Σy, Σxy, Σx²) with x = days
    since 2024-01-01 (rebasing keeps n·Σx² inside int64; DuckDB's side is
    HUGEINT-exact regardless) — the drift-detection primitive over metric
    streams. One per-batch Arrow/pandas combiner → |types|-row aggregate →
    float derivation mirroring the SQL expression order bit-for-bit."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(t: pa.Table) -> pa.Table:
        x = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
            - _TREND_DAY0
        )
        y = np.round(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "pn": np.ones(len(x), dtype=np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        out = (
            df.groupby("event_type", sort=False)[["pn", "sx", "sy", "sxy", "sxx"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
    )

    def derive(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        sx = t["sx"].to_numpy()
        sy = t["sy"].to_numpy()
        sxy = t["sxy"].to_numpy()
        sxx = t["sxx"].to_numpy()
        num = (n * sxy - sx * sy).astype(np.float64)
        den = (n * sxx - sx * sx).astype(np.float64)
        slope = num / den
        intercept = (sy.astype(np.float64) - slope * sx.astype(np.float64)) / n.astype(
            np.float64
        )
        return pa.table(
            {
                "event_type": t["event_type"],
                "n": t["n"],
                "slope_cents_per_day": slope,
                "intercept_cents": intercept,
            }
        )

    return agg.map_batches(derive, batch_format="pyarrow")


ORACLES19["events_trend"] = f"""
WITH e AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 - {_TREND_DAY0} AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events),
m AS (
  SELECT event_type, count(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM e GROUP BY event_type)
SELECT event_type, n,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS slope_cents_per_day,
       (CAST(sy AS DOUBLE) -
        (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents
FROM m"""


QUERIES19 = {
    "events_ohlc": q_events_ohlc,
    "events_trend": q_events_trend,
}
