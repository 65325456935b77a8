"""Driver-contract queries, wave 30 — exact grouped weighted averages
(revenue-weighted discount, integer numerator/denominator) and the calendar
activity heatmap (day-of-week × hour profile). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES30: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_weighted_discount — exact revenue-weighted average discount
# ---------------------------------------------------------------------------


def q_lineitem_weighted_discount(sf_dir: str):
    """Grouped weighted average with exact integer moments: per return flag
    the revenue-weighted mean discount — numerator Σ(price_cents · disc_bp)
    and denominator Σ(price_cents) reduce as order-independent int64, the
    ratio derives with the same double ops as the SQL. (The numerator reaches
    int64 limits around 10^8 rows per group at TPC-H magnitudes; DuckDB's
    side is HUGEINT-exact and the upgrade path is a second modulus limb —
    same note as `events_moments`.)"""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        pc_ = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100
        ).astype(np.int64)
        bp = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64) * 10000
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_pandas(),
                "num": pc_ * bp,
                "den": pc_,
                "pn": np.ones(len(pc_), dtype=np.int64),
            }
        )
        out = (
            df.groupby("l_returnflag", sort=False)[["num", "den", "pn"]]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("num", alias_name="num"),
            Sum("den", alias_name="den"),
            Sum("pn", alias_name="n"),
        )
    )

    def derive(t: pa.Table) -> pa.Table:
        num = t["num"].to_numpy().astype(np.float64)
        den = t["den"].to_numpy().astype(np.float64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n": t["n"],
                "weighted_disc_bp": num / den,
            }
        )

    return agg.map_batches(derive, batch_format="pyarrow")


ORACLES30["lineitem_weighted_discount"] = """
WITH m AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_discount * 10000) AS BIGINT)) AS BIGINT) AS num,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS den,
         count(*) AS n
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, n,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS weighted_disc_bp
FROM m"""


# ---------------------------------------------------------------------------
# events_dow_hour_heatmap — calendar activity profile
# ---------------------------------------------------------------------------


def q_events_dow_hour_heatmap(sf_dir: str):
    """Calendar heatmap: event counts per (day-of-week, hour-of-day) — the
    seasonality profile capacity planning reads. Constant 7×24 output at any
    corpus size; per-batch combiner → tiny aggregate. Dow convention matches
    analytics.py::pivot_dow_counts ((epoch_days+4)%7 = DuckDB dayofweek)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        us = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        days = us // 86_400_000_000
        dow = ((days + 4) % 7).astype(np.int64)
        hour = (us // 3_600_000_000 % 24).astype(np.int64)
        g = (
            pa.table({"dow": pa.array(dow), "hour": pa.array(hour)})
            .group_by(["dow", "hour"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["dow", "hour", "pn"]).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "hour"])
        .aggregate(Sum("pn", alias_name="n"))
    )


ORACLES30["events_dow_hour_heatmap"] = """
SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       count(*) AS n
FROM events GROUP BY 1, 2"""


QUERIES30 = {
    "lineitem_weighted_discount": q_lineitem_weighted_discount,
    "events_dow_hour_heatmap": q_events_dow_hour_heatmap,
}
