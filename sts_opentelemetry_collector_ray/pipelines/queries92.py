"""Driver-contract queries, wave 92 — business-day ship latency (calendar-
aware SLA: weekdays between order date and the order's last shipment,
closed-form weekday counting — no calendar table) and bag-of-words dedup
(word-order-insensitive fingerprints: sorted-token-multiset FNV keys catch
shuffled near-copies exact dedup misses). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly.

Weekday math: with epoch day 0 = Thursday, B(d) = 5·(d//7) + T[d%7]
(T = [0,1,2,2,2,3,4]) counts weekdays in [0, d); business days in (d0, d1]
= B(d1+1) − B(d0+1) — pure integer ops on both engines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES92: dict[str, str] = {}

_BD_BUCKETS = 64
_BOW_BUCKETS = 64
_BOW_TOPK = 20
_DAY_US = 86_400_000_000
_BD_T = np.array([0, 1, 2, 2, 2, 3, 4], np.int64)  # weekdays in [0, r) from Thu


def _busdays_upto(d: np.ndarray) -> np.ndarray:
    """Weekdays in [0, d) for epoch-day d (day 0 = Thursday 1970-01-01)."""
    return 5 * (d // 7) + _BD_T[d % 7]


# ---------------------------------------------------------------------------
# orders_busday_latency — weekday latency to the last shipment, by month
# ---------------------------------------------------------------------------


def q_orders_busday_latency(sf_dir: str):
    """Calendar-aware SLA: per order, the number of BUSINESS days in
    (order day, last-ship day]; per order month the order count, the exact
    floor-mean in micro units and the maximum.

    Scale shape: lineitems pre-reduce per-orderkey max-shipday inside each
    batch and share ONE orderkey-bucket exchange with the orders rows; each
    bucket emits per-month integer partials (Σ busdays, max, n) and the
    driver re-reduces |months| rows."""

    def li_partial(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        d = t["l_shipdate"].cast(pa.int64()).to_numpy() // _DAY_US
        g = pd.DataFrame({"k": k, "msd": d}).groupby(
            "k", sort=False, as_index=False
        ).max()
        return pd.DataFrame(
            {
                "k": g["k"].to_numpy(np.int64),
                "msd": g["msd"].to_numpy(np.int64),
                "od": np.int64(-1),
                "mon": np.int64(-1),
                "_b": (g["k"].to_numpy(np.int64) % _BD_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        k = t["o_orderkey"].to_numpy().astype(np.int64)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "msd": np.int64(-1),
                "od": d,
                "mon": y * 100 + m,
                "_b": (k % _BD_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["od"] >= 0).to_numpy()
        ms = (
            g.loc[~is_o, ["k", "msd"]]
            .groupby("k", sort=False, as_index=False)
            .max()
        )
        j = g.loc[is_o, ["k", "od", "mon"]].merge(ms, on="k")
        bd = _busdays_upto(j["msd"].to_numpy(np.int64) + 1) - _busdays_upto(
            j["od"].to_numpy(np.int64) + 1
        )
        out = (
            pd.DataFrame({"mon": j["mon"].to_numpy(np.int64), "bd": bd})
            .groupby("mon", sort=False)["bd"]
            .agg(["sum", "max", "size"])
            .reset_index()
        )
        return pd.DataFrame(
            {
                "mon": out["mon"].to_numpy(np.int64),
                "s": out["sum"].to_numpy(np.int64),
                "mx": out["max"].to_numpy(np.int64),
                "n": out["size"].to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |months| rows per bucket
        .groupby("mon", as_index=False)
        .agg(s=("s", "sum"), mx=("mx", "max"), n=("n", "sum"))
        .sort_values("mon", kind="mergesort")
    )
    s = part["s"].to_numpy(np.int64)
    n = part["n"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "order_month": part["mon"].to_numpy(np.int64),
            "n_orders": n,
            "mean_busdays_micro": (s * 1_000_000) // np.maximum(n, 1),
            "max_busdays": part["mx"].to_numpy(np.int64),
        }
    )


_BD_T_SQL = "CASE d % 7 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 " \
    "WHEN 3 THEN 2 WHEN 4 THEN 2 WHEN 5 THEN 3 ELSE 4 END"
ORACLES92["orders_busday_latency"] = f"""
WITH ls AS (
  SELECT l_orderkey AS k, max(epoch_us(l_shipdate) // {_DAY_US}) AS msd
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS order_month,
         msd + 1 AS d1, epoch_us(o_orderdate) // {_DAY_US} + 1 AS d0
  FROM orders JOIN ls ON k = o_orderkey
),
b AS (
  SELECT order_month,
         (5 * (d1 // 7) + ({_BD_T_SQL.replace("d %", "d1 %")}))
         - (5 * (d0 // 7) + ({_BD_T_SQL.replace("d %", "d0 %")})) AS bd
  FROM j
),
a AS (
  SELECT order_month, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(bd) AS HUGEINT) AS s, CAST(max(bd) AS BIGINT) AS mx
  FROM b GROUP BY 1
)
SELECT order_month, n_orders,
       CAST(((s * 1000000 + CAST(n_orders AS HUGEINT) * 1099511627776)
             // CAST(greatest(n_orders, 1) AS HUGEINT)) - 1099511627776
            AS BIGINT) AS mean_busdays_micro,
       mx AS max_busdays
FROM a ORDER BY order_month"""


# ---------------------------------------------------------------------------
# docs_bow_dedup — sorted-token-multiset fingerprints
# ---------------------------------------------------------------------------


def q_docs_bow_dedup(sf_dir: str):
    """Order-insensitive dedup: each document's fingerprint is
    fnv1a64(sorted tokens joined by a space) — identical word MULTISETS
    collide regardless of order; the report is the top-20 fingerprint groups
    by (size DESC, key ASC), so duplicates always surface first (key as
    signed int64, group size, smallest doc_id).

    Scale shape: per-batch vectorized tokenize + per-row sort + one Arrow-
    buffer FNV; rows share ONE key-hash bucket exchange where each bucket
    owns its keys completely and emits its LOCAL top-20 groups — the driver
    merges ≤ buckets·20 rows (dups always rank first)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_array

    def rows(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        # within-row sort: ONE stable (row, token) sort over the flat values,
        # then rebuild the ListArray on the unchanged offsets and join
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False),
                          dtype=object)
        row = np.repeat(np.arange(len(counts)), counts)
        idx = (
            pd.DataFrame({"r": row, "t": flat})
            .sort_values(["r", "t"], kind="mergesort")
            .index.to_numpy()
        )
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        sorted_l = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(flat[idx], pa.string())
        )
        joined = pc.binary_join(sorted_l, " ")
        h = fnv1a64_array(joined).view(np.int64)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "key": h,
                "doc_id": ids,
                "_b": (h.view(np.uint64) % np.uint64(_BOW_BUCKETS)).astype(
                    np.int64
                ),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("key", sort=False).agg(
            n_docs=("doc_id", "size"), min_doc_id=("doc_id", "min")
        ).reset_index()
        out = out.sort_values(
            ["n_docs", "key"], ascending=[False, True], kind="mergesort"
        ).head(_BOW_TOPK)
        return pd.DataFrame(
            {
                "key": out["key"].to_numpy(np.int64),
                "n_docs": out["n_docs"].to_numpy(np.int64),
                "min_doc_id": out["min_doc_id"].to_numpy(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(rows, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ≤ buckets·20 rows
        .sort_values(["n_docs", "key"], ascending=[False, True],
                     kind="mergesort")
        .head(_BOW_TOPK)
        .reset_index(drop=True)
    )


_BOW_FNV = (
    "list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), "
    "list_transform(string_split(array_to_string("
    "list_sort(string_split_regex(lower(text), '\\s+')), ' '), ''), "
    "c -> CAST(unicode(c) AS HUGEINT))), "
    "(acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616)"
)
ORACLES92["docs_bow_dedup"] = f"""
WITH k AS (
  SELECT doc_id,
         {_BOW_FNV} AS hv
  FROM documents
),
s AS (
  SELECT CAST(CASE WHEN hv >= 9223372036854775808
                   THEN hv - 18446744073709551616 ELSE hv END AS BIGINT)
           AS key,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(doc_id) AS BIGINT) AS min_doc_id
  FROM k GROUP BY 1
)
SELECT key, n_docs, min_doc_id FROM s
ORDER BY n_docs DESC, key ASC LIMIT 20"""


QUERIES92 = {
    "orders_busday_latency": q_orders_busday_latency,
    "docs_bow_dedup": q_docs_bow_dedup,
}
