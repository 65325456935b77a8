"""Driver-contract queries, wave 73 — Q10-shaped returned-item revenue (top-20
customers by revenue on returned lineitems in a quarter, with nation names) and
Q15-shaped top supplier (the supplier(s) achieving the maximum windowed
revenue). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly.

Revenue sums use per-row integer-micro quantization
(floor(ext·(1−disc)·1e6 + 0.5), identical association in numpy and SQL) so the
distributed sums are order-free integers — no float-association drift between
Ray's partial order and DuckDB's scan order."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

ORACLES73: dict[str, str] = {}

_Q10_BUCKETS = 64
_Q10_TOPK = 20
_Q10_LO = "1996-01-01"
_Q10_HI = "1996-04-01"
_Q15_BUCKETS = 64
_DAY_US = 86_400_000_000


def _rev_micro(t: pa.Table, mask: np.ndarray | None = None) -> np.ndarray:
    """floor(ext·(1−disc)·1e6 + 0.5) with the exact association the oracle
    uses: (ext * (1 - disc)) * 1e6 + 0.5, all in float64."""
    ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = t["l_discount"].to_numpy(zero_copy_only=False)
    if mask is not None:
        ext, disc = ext[mask], disc[mask]
    return np.floor(ext * (1.0 - disc) * 1_000_000.0 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# q10_returned_revenue — top-20 customers by returned-item revenue
# ---------------------------------------------------------------------------


def q_q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape: customers ranked by revenue lost to returns —
    lineitems with l_returnflag='R' joined to orders placed in
    [1996-01-01, 1996-04-01), revenue summed per customer, top-20 by
    (revenue DESC, custkey ASC), decorated with customer + nation names.

    Scale shape: R-lineitems pre-aggregate per (orderkey) inside each batch
    and share ONE orderkey-bucket exchange with the window-filtered orders
    (the big×big join pattern); per-bucket merge emits per-customer integer
    partials — the driver re-reduces |customers∩buckets| partial rows, keeps
    20, and decorates them via a key-filtered parquet read (predicate
    pushdown — the customer table never loads)."""

    def li_partial(t: pa.Table) -> pd.DataFrame:
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        m = flag == "R"
        k = t["l_orderkey"].to_numpy()[m].astype(np.int64)
        rev = _rev_micro(t, m)
        g = pd.DataFrame({"k": k, "m": rev, "n": np.int64(1)}).groupby(
            "k", sort=False, as_index=False
        ).sum()
        return pd.DataFrame(
            {
                "k": g["k"].to_numpy(np.int64),
                "m": g["m"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
                "cust": np.int64(-1),
                "_b": (g["k"].to_numpy(np.int64) % _Q10_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        lo = np.datetime64(_Q10_LO).astype("datetime64[D]").astype(np.int64)
        hi = np.datetime64(_Q10_HI).astype("datetime64[D]").astype(np.int64)
        m = (d >= lo) & (d < hi)
        k = t["o_orderkey"].to_numpy()[m].astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "m": np.int64(0),
                "n": np.int64(0),
                "cust": t["o_custkey"].to_numpy()[m].astype(np.int64),
                "_b": (k % _Q10_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["cust"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "cust"]]
        li = g.loc[~is_o, ["k", "m", "n"]]
        j = li.merge(o, on="k")
        out = j.groupby("cust", sort=False, as_index=False)[["m", "n"]].sum()
        return pd.DataFrame(
            {
                "cust": out["cust"].to_numpy(np.int64),
                "m": out["m"].to_numpy(np.int64),
                "n": out["n"].to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: per-customer partials from ≤64 buckets
    )
    agg = (
        part.groupby("cust", as_index=False)[["m", "n"]]
        .sum()
        .sort_values(["m", "cust"], ascending=[False, True], kind="mergesort")
        .head(_Q10_TOPK)
    )
    keys = agg["cust"].to_numpy(np.int64)
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=[("c_custkey", "in", keys.tolist())],
    ).to_pandas()
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = (
        agg.merge(cust, left_on="cust", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .sort_values(["m", "cust"], ascending=[False, True], kind="mergesort")
    )
    return pd.DataFrame(
        {
            "c_custkey": out["cust"].to_numpy(np.int64),
            "c_name": out["c_name"].astype(object),
            "n_name": out["n_name"].astype(object),
            "revenue_micro": out["m"].to_numpy(np.int64),
            "n_items": out["n"].to_numpy(np.int64),
        }
    )


ORACLES73["q10_returned_revenue"] = f"""
WITH rl AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
              AS HUGEINT) AS m
  FROM lineitem WHERE l_returnflag = 'R'
),
j AS (
  SELECT o_custkey, sum(m) AS rev, CAST(count(*) AS BIGINT) AS n
  FROM rl JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderdate >= DATE '{_Q10_LO}' AND o_orderdate < DATE '{_Q10_HI}'
  GROUP BY 1
)
SELECT c_custkey, c_name, n_name,
       CAST(rev AS BIGINT) AS revenue_micro, n AS n_items
FROM j JOIN customer ON c_custkey = o_custkey
       JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_micro DESC, c_custkey LIMIT {_Q10_TOPK}"""


# ---------------------------------------------------------------------------
# q15_top_supplier — supplier(s) with the maximum windowed revenue
# ---------------------------------------------------------------------------


def q_q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: total revenue per supplier over shipments in
    [1996-01-01, 1996-04-01); return every supplier achieving the global
    maximum (ties all surface, suppkey ASC).

    Scale shape: per-batch (suppkey → Σmicro, n) combiner partials bucket by
    suppkey so each bucket owns its suppliers COMPLETELY; each bucket
    re-reduces and emits only its LOCAL-max rows (≤ ties per bucket) — the
    driver sees ≤ |buckets|·ties candidate rows, takes the global max, and
    decorates via a key-filtered supplier read."""

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t["l_shipdate"].cast(pa.int64()).to_numpy() // _DAY_US
        lo = np.datetime64(_Q10_LO).astype("datetime64[D]").astype(np.int64)
        hi = np.datetime64(_Q10_HI).astype("datetime64[D]").astype(np.int64)
        m = (d >= lo) & (d < hi)
        supp = t["l_suppkey"].to_numpy()[m].astype(np.int64)
        rev = _rev_micro(t, m)
        g = pd.DataFrame({"supp": supp, "m": rev, "n": np.int64(1)}).groupby(
            "supp", sort=False, as_index=False
        ).sum()
        return pd.DataFrame(
            {
                "supp": g["supp"].to_numpy(np.int64),
                "m": g["m"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
                "_b": (g["supp"].to_numpy(np.int64) % _Q15_BUCKETS).astype(np.int64),
            }
        )

    def local_max(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("supp", sort=False, as_index=False)[["m", "n"]].sum()
        mx = tot["m"].max()
        w = tot[tot["m"] == mx]
        return pd.DataFrame(
            {
                "supp": w["supp"].to_numpy(np.int64),
                "m": w["m"].to_numpy(np.int64),
                "n": w["n"].to_numpy(np.int64),
            }
        )

    cand = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(local_max, batch_format="pandas")
        .to_pandas()  # bounded: ≤ |buckets| · ties rows
    )
    mx = cand["m"].max()
    win = cand[cand["m"] == mx].sort_values("supp", kind="mergesort")
    keys = win["supp"].to_numpy(np.int64)
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys.tolist())],
    ).to_pandas()
    out = win.merge(supp, left_on="supp", right_on="s_suppkey").sort_values(
        "supp", kind="mergesort"
    )
    return pd.DataFrame(
        {
            "s_suppkey": out["supp"].to_numpy(np.int64),
            "s_name": out["s_name"].astype(object),
            "total_revenue_micro": out["m"].to_numpy(np.int64),
            "n_items": out["n"].to_numpy(np.int64),
        }
    )


ORACLES73["q15_top_supplier"] = f"""
WITH r AS (
  SELECT l_suppkey AS s,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
                  AS HUGEINT)) AS rev,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem
  WHERE l_shipdate >= DATE '{_Q10_LO}' AND l_shipdate < DATE '{_Q10_HI}'
  GROUP BY 1
)
SELECT s AS s_suppkey, s_name, CAST(rev AS BIGINT) AS total_revenue_micro,
       n AS n_items
FROM r JOIN supplier ON s_suppkey = s
WHERE rev = (SELECT max(rev) FROM r)
ORDER BY s_suppkey"""


QUERIES73 = {
    "q10_returned_revenue": q_q10_returned_revenue,
    "q15_top_supplier": q_q15_top_supplier,
}
