"""Driver-contract queries, wave 163 — open-order aging (age of still-open
orders relative to the corpus's last order date, exponential day buckets:
the receivables-aging classic) and tool latency by outcome (do failed tool
calls take longer or fail fast?). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES163: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# orders_open_aging — age of open orders in exponential day buckets
# ---------------------------------------------------------------------------


def q_orders_open_aging(sf_dir: str):
    """For orders with o_orderstatus = 'O': age in days relative to the
    newest order date in the WHOLE table, bucketed exponentially (0 =
    same-day, else bit_length(age)), with order counts and exact value cents
    per bucket.

    Scale shape: ONE pass emits a bounded (status-filtered day → n, cents)
    histogram per batch plus each batch's global max day; the driver folds
    the bounded day grid — ages never require a second scan."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderdate", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (
            t["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view("i8")
            // _DAY_US
        )
        status = np.asarray(t["o_orderstatus"].to_numpy(zero_copy_only=False))
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        is_open = status == "O"
        g = (
            pd.DataFrame(
                {"day": day[is_open], "n": 1, "cents": cents[is_open]}
            )
            .groupby("day", sort=False, as_index=False)
            .sum()
        )
        # the batch's overall max day rides along as a sentinel row (n = 0)
        g = pd.concat(
            [
                g,
                pd.DataFrame(
                    {"day": [int(day.max())], "n": [0], "cents": [0]}
                ),
            ],
            ignore_index=True,
        )
        return g.astype(np.int64)

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "bucket": pd.Series([], dtype=np.int64),
            "n_orders": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    max_day = int(part["day"].max())
    grid = (
        part.groupby("day", sort=True)[["n", "cents"]].sum().reset_index()
    )
    grid = grid[grid["n"] > 0]
    if grid.empty:
        return empty
    age = (max_day - grid["day"].to_numpy(np.int64)).astype(np.int64)
    _, e = np.frexp(age.astype(np.float64))
    bucket = np.where(age == 0, 0, e).astype(np.int64)
    out = (
        pd.DataFrame(
            {"bucket": bucket, "n_orders": grid["n"], "sum_cents": grid["cents"]}
        )
        .groupby("bucket", sort=True, as_index=False)
        .sum()
    )
    return out.astype(np.int64)


ORACLES163["orders_open_aging"] = f"""
WITH d AS (
  SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_DAY_US} AS day,
         o_orderstatus,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
),
mx AS (SELECT max(day) AS max_day FROM d),
b AS (
  SELECT CASE WHEN mx.max_day - d.day = 0 THEN 0
              ELSE CAST(length(bin(mx.max_day - d.day)) AS BIGINT) END
           AS bucket,
         d.cents
  FROM d CROSS JOIN mx WHERE d.o_orderstatus = 'O'
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY 1"""


# ---------------------------------------------------------------------------
# sg_latency_by_status — tool-call latency split by outcome
# ---------------------------------------------------------------------------


def q_sg_latency_by_status(sf_dir: str):
    """Two rows ('ok', 'error'): span-pair edges, exact summed latency µs,
    and average latency in micro-µs — fail-fast or fail-slow?

    Scale shape: the oracled span-pair edge join + a two-slot combiner;
    driver fold."""
    from ..stages.servicegraph import edge_table
    from .queries2 import _parsed_transcripts

    edges = edge_table(_parsed_transcripts(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        failed = t["failed"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "status": np.where(failed == 1, "error", "ok"),
                    "n": 1,
                    "lat": t["latency_us"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby("status", sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "lat": np.int64})

    part = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "status": pd.Series([], dtype=object),
            "n_edges": pd.Series([], dtype=np.int64),
            "sum_latency_us": pd.Series([], dtype=np.int64),
            "avg_latency_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("status", sort=True)
        .agg(n_edges=("n", "sum"), sum_latency_us=("lat", "sum"))
        .reset_index()
    )
    out["avg_latency_micro"] = np.floor(
        out["sum_latency_us"].to_numpy(np.float64)
        / out["n_edges"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"n_edges": np.int64, "sum_latency_us": np.int64})


def _latency_by_status_oracle() -> str:
    from .queries2 import _EDGES_SQL

    return (
        _EDGES_SQL
        + """
SELECT CASE WHEN failed = 1 THEN 'error' ELSE 'ok' END AS status,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(latency_us) AS BIGINT) AS sum_latency_us,
       CAST(floor(CAST(sum(latency_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS avg_latency_micro
FROM edges GROUP BY 1"""
    )


ORACLES163["sg_latency_by_status"] = _latency_by_status_oracle()


QUERIES163 = {
    "orders_open_aging": q_orders_open_aging,
    "sg_latency_by_status": q_sg_latency_by_status,
}
