"""Driver-contract queries, wave 129 — corpus composition by (lang, source)
(the mixture table a pretraining-data curator reads before setting sampling
weights), and the per-year order-status mix over orders (fulfilment health
drift year over year). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES129: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_lang_source_mix — corpus composition by (lang, source)
# ---------------------------------------------------------------------------


def q_docs_lang_source_mix(sf_dir: str):
    """Pretraining-mixture census: per (lang, source) cell, document count,
    total character mass, and the cell's share of its language's documents in
    micro units (floor-half-up; ONE double division over exact int64 counts,
    so both engines compute the identical IEEE double).

    Scale shape: per-batch (lang, source, n, chars) combiner partials —
    at most |langs| x |sources| rows per block — fold on the driver; no
    shuffle."""

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "lang": np.asarray(t["lang"].to_numpy(zero_copy_only=False)),
                    "source": np.asarray(
                        t["source"].to_numpy(zero_copy_only=False)
                    ),
                    "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
                    "n": 1,
                }
            )
            .groupby(["lang", "source"], sort=False)
            .agg(n_docs=("n", "sum"), chars=("n_chars", "sum"))
            .reset_index()
        )
        return g.astype({"n_docs": np.int64, "chars": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: <= |langs| x |sources| rows per block
    )
    if part.empty:
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype=object),
                "source": pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "chars": pd.Series([], dtype=np.int64),
                "lang_share_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby(["lang", "source"], sort=True)
        .agg(n_docs=("n_docs", "sum"), chars=("chars", "sum"))
        .reset_index()
    )
    tot = out.groupby("lang")["n_docs"].transform("sum").to_numpy(np.int64)
    n = out["n_docs"].to_numpy(np.int64)
    out["lang_share_micro"] = np.floor(
        n.astype(np.float64) / tot.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    for c in ("n_docs", "chars"):
        out[c] = out[c].astype(np.int64)
    return out[["lang", "source", "n_docs", "chars", "lang_share_micro"]]


ORACLES129["docs_lang_source_mix"] = """
WITH g AS (
  SELECT lang, source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY 1, 2
)
SELECT lang, source, n_docs, chars,
       CAST(floor(CAST(n_docs AS DOUBLE)
                  / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS lang_share_micro
FROM g"""


# ---------------------------------------------------------------------------
# orders_status_mix_by_year — per-year order-status mix with exact cents
# ---------------------------------------------------------------------------


def q_orders_status_mix_by_year(sf_dir: str):
    """Fulfilment-health drift: per (order year, o_orderstatus), order count,
    total price in exact integer cents (floor-half-up on the 2-decimal
    double), and the status's share of its year's orders in micro units
    (ONE double division over exact int64 counts on both sides).

    Scale shape: per-batch (year, status, n, cents) combiner partials —
    |years| x |statuses| rows per block — fold on the driver; no shuffle."""

    def partial(t: pa.Table) -> pd.DataFrame:
        yr = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "order_year": yr,
                    "o_orderstatus": np.asarray(
                        t["o_orderstatus"].to_numpy(zero_copy_only=False)
                    ),
                    "cents": cents,
                    "n": 1,
                }
            )
            .groupby(["order_year", "o_orderstatus"], sort=False)
            .agg(n_orders=("n", "sum"), total_cents=("cents", "sum"))
            .reset_index()
        )
        return g.astype(
            {"order_year": np.int64, "n_orders": np.int64, "total_cents": np.int64}
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderdate", "o_orderstatus", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: <= |years| x |statuses| rows per block
    )
    if part.empty:
        return pd.DataFrame(
            {
                "order_year": pd.Series([], dtype=np.int64),
                "o_orderstatus": pd.Series([], dtype=object),
                "n_orders": pd.Series([], dtype=np.int64),
                "total_cents": pd.Series([], dtype=np.int64),
                "year_share_micro": pd.Series([], dtype=np.int64),
            }
        )
    out = (
        part.groupby(["order_year", "o_orderstatus"], sort=True)
        .agg(n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
        .reset_index()
    )
    tot = out.groupby("order_year")["n_orders"].transform("sum").to_numpy(np.int64)
    n = out["n_orders"].to_numpy(np.int64)
    out["year_share_micro"] = np.floor(
        n.astype(np.float64) / tot.astype(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    for c in ("order_year", "n_orders", "total_cents"):
        out[c] = out[c].astype(np.int64)
    return out[
        ["order_year", "o_orderstatus", "n_orders", "total_cents", "year_share_micro"]
    ]


ORACLES129["orders_status_mix_by_year"] = """
WITH g AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
         o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents
  FROM orders GROUP BY 1, 2
)
SELECT order_year, o_orderstatus, n_orders, total_cents,
       CAST(floor(CAST(n_orders AS DOUBLE)
                  / CAST(sum(n_orders) OVER (PARTITION BY order_year) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS year_share_micro
FROM g"""


QUERIES129 = {
    "docs_lang_source_mix": q_docs_lang_source_mix,
    "orders_status_mix_by_year": q_orders_status_mix_by_year,
}
