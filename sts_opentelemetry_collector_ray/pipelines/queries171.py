"""Driver-contract queries, wave 171 — near-dup cluster-size histogram (how
big do duplicate families get? sizes of the MinHash connected components)
and customer debt reliability (share of negative-balance customers per
segment with the 95% Wilson lower bound — the ranking that won't promote a
tiny noisy segment). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES171: dict[str, str] = {}

_WZ = 1.959963984540054  # z for the 95% Wilson interval (same as queries96)


# ---------------------------------------------------------------------------
# docs_cluster_size_histogram — sizes of the near-dup components
# ---------------------------------------------------------------------------


def q_docs_cluster_size_histogram(sf_dir: str):
    """Histogram over near-dup component sizes (>= 2 members — singletons
    are not clusters): how many duplicate families of each size exist and
    how many documents they absorb.

    Scale shape: the oracled distributed connected components
    (stages/clusters.py — bounded bucket exchanges per round), then a
    per-batch (component → size) combiner via ONE component-bucket exchange
    and a bounded size histogram fold on the driver."""
    from ..stages.clusters import connected_components_distributed
    from ..stages.dedup_docs import minhash_lsh_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    comp = connected_components_distributed(pairs, a_col="a", b_col="b")

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "component": t["label"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "n": 1,
                }
            )
            .groupby("component", sort=False, as_index=False)["n"]
            .sum()
        )
        g["_b"] = (
            g["component"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)
        ).astype(np.int64)
        return g.astype({"n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("component", sort=False, as_index=False)["n"].sum()
        hist = (
            sizes.groupby("n", sort=False)
            .size()
            .reset_index(name="n_clusters")
            .rename(columns={"n": "cluster_size"})
        )
        return hist.astype(np.int64)

    part = (
        comp.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "cluster_size": pd.Series([], dtype=np.int64),
            "n_clusters": pd.Series([], dtype=np.int64),
            "n_docs": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "cluster_size" not in part.columns:
        return empty
    out = (
        part.groupby("cluster_size", sort=True)["n_clusters"].sum().reset_index()
    )
    out = out[out["cluster_size"] >= 2]
    out["n_docs"] = out["cluster_size"] * out["n_clusters"]
    return out.astype(np.int64)


def _cluster_hist_oracle() -> str:
    from .queries3 import _components_sql

    return _components_sql(
        """SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sz * count(*) AS BIGINT) AS n_docs
FROM (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
WHERE sz >= 2 GROUP BY sz"""
    )


ORACLES171["docs_cluster_size_histogram"] = _cluster_hist_oracle()


# ---------------------------------------------------------------------------
# customer_debt_wilson — negative-balance share per segment w/ Wilson LB
# ---------------------------------------------------------------------------


def q_customer_debt_wilson(sf_dir: str):
    """Per market segment: customers, negative-balance customers, the debt
    rate, and its 95% Wilson lower bound — the fixed-parenthesization double
    expression mirrored token-for-token in SQL (IEEE ops + correctly-rounded
    sqrt ⇒ bit-equal), rounded half-up at 1e-6.

    Scale shape: per-batch (segment, n, n_neg) combiner over the bounded
    segment grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        neg = (t["c_acctbal"].to_numpy(zero_copy_only=False) < 0.0).astype(
            np.int64
        )
        g = (
            pd.DataFrame(
                {
                    "c_mktsegment": np.asarray(
                        t["c_mktsegment"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                    "n_neg": neg,
                }
            )
            .groupby("c_mktsegment", sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "n_neg": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "c_mktsegment": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "n_neg": pd.Series([], dtype=np.int64),
            "debt_rate": pd.Series([], dtype=np.float64),
            "wilson_lb": pd.Series([], dtype=np.float64),
        }
    )
    if part.empty:
        return empty
    g = part.groupby("c_mktsegment", sort=True)[["n", "n_neg"]].sum().reset_index()
    n = g["n"].to_numpy(np.int64).astype(np.float64)
    e = g["n_neg"].to_numpy(np.int64).astype(np.float64)
    z = _WZ
    p = e / n
    lb = (
        p
        + (z * z) / (2.0 * n)
        - z * np.sqrt((p * (1.0 - p)) / n + (z * z) / (4.0 * (n * n)))
    ) / (1.0 + (z * z) / n)
    return pd.DataFrame(
        {
            "c_mktsegment": g["c_mktsegment"].to_numpy(object),
            "n": g["n"].to_numpy(np.int64),
            "n_neg": g["n_neg"].to_numpy(np.int64),
            "debt_rate": np.floor(p * 1_000_000.0 + 0.5) / 1_000_000.0,
            "wilson_lb": np.floor(lb * 1_000_000.0 + 0.5) / 1_000_000.0,
        }
    )


ORACLES171["customer_debt_wilson"] = f"""
WITH t AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (c_acctbal < 0.0) AS BIGINT) AS n_neg
  FROM customer GROUP BY 1
),
w AS (
  SELECT c_mktsegment, n, n_neg,
         CAST(n_neg AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         CAST(n AS DOUBLE) AS nd
  FROM t
)
SELECT c_mktsegment, n, n_neg,
       floor(p * 1000000.0 + 0.5) / 1000000.0 AS debt_rate,
       floor(((p + ({_WZ} * {_WZ}) / (2.0 * nd)
               - {_WZ} * sqrt((p * (1.0 - p)) / nd
                              + ({_WZ} * {_WZ}) / (4.0 * (nd * nd))))
              / (1.0 + ({_WZ} * {_WZ}) / nd)) * 1000000.0 + 0.5) / 1000000.0
         AS wilson_lb
FROM w"""


QUERIES171 = {
    "docs_cluster_size_histogram": q_docs_cluster_size_histogram,
    "customer_debt_wilson": q_customer_debt_wilson,
}
