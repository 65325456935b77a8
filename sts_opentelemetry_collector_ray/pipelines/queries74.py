"""Driver-contract queries, wave 74 — Q17-shaped small-quantity revenue loss
(parts of one brand: revenue on lineitems below 20% of the part's average
quantity, divided by 7 years) and Q18-shaped large-volume customers (orders
whose total quantity exceeds a threshold, top-100 by order value). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly.

Both use per-row integer-micro quantization for the summed money/quantity
columns (exact association shared with the SQL), so distributed partial sums
are order-free. The Q17 per-part average is sum/count over INTEGRAL doubles —
exact in float64 regardless of accumulation order — and the SQL spells it
``sum(x)/count(*)`` rather than ``avg(x)`` to pin the same single division."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

ORACLES74: dict[str, str] = {}

_Q17_BRAND = "Brand#13"
_Q17_BUCKETS = 32
_Q18_MIN_QTY = 250.0
_Q18_BUCKETS = 64
_Q18_TOPK = 100


# ---------------------------------------------------------------------------
# q17_small_qty_revenue — revenue loss if small-quantity orders discontinued
# ---------------------------------------------------------------------------


def q_q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: for parts of brand ``Brand#13``, sum the extended
    price of lineitems whose quantity is below 20% of that part's average
    quantity; report the 7-year average (integer division of the micro sum)
    and the count of qualifying lineitems.

    Scale shape: the brand's partkeys load once on the driver (predicate-
    pushdown read of the small `part` side) and ship in the task closure as a
    broadcast filter; matching lineitems — a few percent of the corpus —
    bucket by partkey so each bucket owns its parts completely; the per-bucket
    merge computes each part's exact avg (sum/count of integral quantities)
    and the below-threshold micro sum, emitting ONE partial row per bucket.
    The driver adds ≤ |buckets| integers."""
    brand_keys = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_brand", "==", _Q17_BRAND)],
    )["p_partkey"].to_numpy()
    keys = set(brand_keys.tolist())

    def partial(t: pa.Table) -> pd.DataFrame:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        m = np.isin(pk, brand_keys)
        pk = pk[m]
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)[m]
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        pm = np.floor(ext * 1_000_000.0 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "pk": pk,
                "qty": qty,
                "pm": pm,
                "_b": (pk % _Q17_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("pk", sort=False)["qty"].agg(["sum", "count"])
        aq = (a["sum"] / a["count"]).reindex(g["pk"]).to_numpy()
        small = g["qty"].to_numpy() < 0.2 * aq
        return pd.DataFrame(
            {
                "tot": np.array([g.loc[small, "pm"].sum()], np.int64),
                "n": np.array([int(small.sum())], np.int64),
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: one partial row per bucket
    )
    tot = int(part["tot"].sum()) if len(part) else 0
    n = int(part["n"].sum()) if len(part) else 0
    _ = keys  # closure documentation: broadcast set, never re-read per batch
    return pd.DataFrame(
        {
            "avg_yearly_micro": np.array([tot // 7], np.int64),
            "n_small": np.array([n], np.int64),
        }
    )


ORACLES74["q17_small_qty_revenue"] = f"""
WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = '{_Q17_BRAND}'),
l AS (
  SELECT l_partkey, l_quantity,
         CAST(floor(l_extendedprice * 1000000 + 0.5) AS HUGEINT) AS pm
  FROM lineitem JOIN bp ON p_partkey = l_partkey
),
a AS (
  SELECT l_partkey, sum(l_quantity) / count(*) AS aq FROM l GROUP BY 1
),
s AS (
  SELECT COALESCE(sum(pm), 0) AS tot, CAST(count(*) AS BIGINT) AS n
  FROM l JOIN a USING (l_partkey) WHERE l_quantity < 0.2 * aq
)
SELECT CAST(tot // 7 AS BIGINT) AS avg_yearly_micro, n AS n_small FROM s"""


# ---------------------------------------------------------------------------
# q18_volume_customers — orders whose total quantity exceeds the threshold
# ---------------------------------------------------------------------------


def q_q18_volume_customers(sf_dir: str):
    """TPC-H Q18 shape: orders with sum(l_quantity) > 250, decorated with the
    customer name, top-100 by (o_totalprice DESC, o_orderdate ASC,
    o_orderkey ASC).

    Scale shape: lineitems pre-aggregate per-orderkey quantity micros inside
    each batch and share ONE orderkey-bucket exchange with the orders rows;
    the per-bucket merge re-reduces, applies the threshold, and emits only
    QUALIFYING orders (the rare tail) — the driver sorts that tail, keeps
    100, and decorates names via a key-filtered customer read."""

    def li_partial(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        qm = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        g = pd.DataFrame({"k": k, "qm": qm}).groupby(
            "k", sort=False, as_index=False
        ).sum()
        return pd.DataFrame(
            {
                "k": g["k"].to_numpy(np.int64),
                "qm": g["qm"].to_numpy(np.int64),
                "cust": np.int64(-1),
                "od": np.int64(0),
                "tp": np.float64(0.0),
                "_b": (g["k"].to_numpy(np.int64) % _Q18_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "qm": np.int64(-1),
                "cust": t["o_custkey"].to_numpy().astype(np.int64),
                "od": t["o_orderdate"].cast(pa.int64()).to_numpy(),
                "tp": t["o_totalprice"].to_numpy(zero_copy_only=False),
                "_b": (k % _Q18_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["qm"] < 0).to_numpy()
        qs = (
            g.loc[~is_o, ["k", "qm"]]
            .groupby("k", sort=False, as_index=False)
            .sum()
        )
        thr = int(_Q18_MIN_QTY * 1_000_000)
        qs = qs[qs["qm"] > thr]
        j = g.loc[is_o, ["k", "cust", "od", "tp"]].merge(qs, on="k")
        return pd.DataFrame(
            {
                "k": j["k"].to_numpy(np.int64),
                "cust": j["cust"].to_numpy(np.int64),
                "od": j["od"].to_numpy(np.int64),
                "tp": j["tp"].to_numpy(np.float64),
                "qm": j["qm"].to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(li_partial, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(o_rows, batch_format="pyarrow")
    hit = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: only the over-threshold tail leaves buckets
    )
    hit = hit.sort_values(
        ["tp", "od", "k"], ascending=[False, True, True], kind="mergesort"
    ).head(_Q18_TOPK)
    keys = np.unique(hit["cust"].to_numpy(np.int64))
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in", keys.tolist())],
    ).to_pandas()
    out = hit.merge(cust, left_on="cust", right_on="c_custkey")
    return pd.DataFrame(
        {
            "c_custkey": out["cust"].to_numpy(np.int64),
            "c_name": out["c_name"].astype(object),
            "o_orderkey": out["k"].to_numpy(np.int64),
            "o_orderdate": pd.Series(out["od"].to_numpy(np.int64)).astype(
                "datetime64[us]"
            ),
            "o_totalprice": out["tp"].to_numpy(np.float64),
            "sum_qty_micro": out["qm"].to_numpy(np.int64),
        }
    )


ORACLES74["q18_volume_customers"] = f"""
WITH s AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_quantity * 1000000 + 0.5) AS HUGEINT)) AS qm
  FROM lineitem GROUP BY 1
  HAVING qm > {int(_Q18_MIN_QTY * 1_000_000)}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(qm AS BIGINT) AS sum_qty_micro
FROM s JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT {_Q18_TOPK}"""


QUERIES74 = {
    "q17_small_qty_revenue": q_q17_small_qty_revenue,
    "q18_volume_customers": q_q18_volume_customers,
}
