"""Driver-contract queries, wave 60 — duplicate-invoice screening (the
same-customer same-amount close-date fraud/dedup audit) and the Zipf
rank-frequency slope of the corpus vocabulary (the power-law health check
tokenizer work starts from). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES60: dict[str, str] = {}

_DUP_WINDOW_DAYS = 7
_DUP_BUCKETS = 64
_ZIPF_TOPK = 20


# ---------------------------------------------------------------------------
# orders_duplicate_invoices — same customer, same cents, within 7 days
# ---------------------------------------------------------------------------


def q_orders_duplicate_invoices(sf_dir: str):
    """Duplicate-invoice audit: pairs of DISTINCT orders by the same customer
    with identical total cents whose order dates are ≤ 7 days apart — the
    double-billing screen every AP pipeline runs. Reports the pair count and
    the number of distinct orders involved in at least one pair.

    Scale shape: ONE (custkey-bucket) exchange; within each bucket rows
    lexsort by (cust, cents, day) and the pair count per (cust, cents) run is
    a vectorized two-pointer — `np.searchsorted(day, day + 7, 'right')`
    bounded to the run — so no all-pairs blowup outside the duplicate
    candidate groups; |buckets| partial rows reach the driver."""

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            _b=(df["o_custkey"].to_numpy(np.int64) % _DUP_BUCKETS).astype(np.int64)
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            g["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        day = (
            g["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        cust = g["o_custkey"].to_numpy(np.int64)
        order = np.lexsort((day, cents, cust))
        cust, cents, day = cust[order], cents[order], day[order]
        n = len(cust)
        if n == 0:
            return pd.DataFrame({"n_pairs": [np.int64(0)], "n_orders": [np.int64(0)]})
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (cust[1:] != cust[:-1]) | (cents[1:] != cents[:-1])
        run_id = np.cumsum(new_run) - 1
        # two-pointer inside runs: partner j > i with day_j <= day_i + W
        hi = np.searchsorted(day + run_id * 10**9, day + run_id * 10**9 + _DUP_WINDOW_DAYS, side="right")
        pos = np.arange(n)
        cnt = hi - pos - 1
        n_pairs = int(cnt.sum())
        in_pair = cnt > 0
        # a row is also involved if an EARLIER row pairs with it
        starts = np.where(new_run)[0]
        run_start = starts[run_id]
        lo = np.searchsorted(day + run_id * 10**9, day + run_id * 10**9 - _DUP_WINDOW_DAYS, side="left")
        has_earlier = np.maximum(lo, run_start) < pos
        n_orders = int((in_pair | has_earlier).sum())
        return pd.DataFrame(
            {"n_pairs": [np.int64(n_pairs)], "n_orders": [np.int64(n_orders)]}
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(bucket, batch_format="pandas")
        .groupby("_b")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()  # bounded: one row per bucket
    )
    return pd.DataFrame(
        {
            "n_pairs": [np.int64(parts["n_pairs"].sum())],
            "n_orders": [np.int64(parts["n_orders"].sum())],
        }
    )


ORACLES60["orders_duplicate_invoices"] = f"""
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
),
p AS (
  SELECT a.o_orderkey AS ka, b.o_orderkey AS kb
  FROM c a JOIN c b
    ON a.o_custkey = b.o_custkey AND a.cents = b.cents
   AND a.o_orderkey < b.o_orderkey
   AND abs(a.day - b.day) <= {_DUP_WINDOW_DAYS}
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST((SELECT count(DISTINCT k) FROM
             (SELECT ka AS k FROM p UNION ALL SELECT kb FROM p)) AS BIGINT)
         AS n_orders
FROM p"""


# ---------------------------------------------------------------------------
# docs_zipf_slope — Theil–Sen slope of the log-log rank-frequency curve
# ---------------------------------------------------------------------------


def q_docs_zipf_slope(sf_dir: str):
    """Zipf health check: the top-20 vocabulary (the oracled wordcount
    pipeline) on log-log axes, slope estimated by Theil–Sen — the lower
    median of the 190 pairwise slopes (ln fⱼ − ln fᵢ)/(ln j − ln i). A
    healthy natural-language corpus sits near −1. Each slope is a fixed
    expression over two (rank, count) pairs — no float accumulation.

    Scale shape: Arrow wordcount combiner → hash aggregate → top-20 (the
    docs_vocab pipeline); the slope math runs on those 20 driver rows."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def local_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"token": flat}).group_by(["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "pn"])

    top = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(_ZIPF_TOPK)
        .to_pandas()
    )
    f = top["n"].to_numpy(np.int64).astype(np.float64)
    r = np.arange(1, len(f) + 1, dtype=np.float64)
    i, j = np.triu_indices(len(f), k=1)
    slopes = (np.log(f[j]) - np.log(f[i])) / (np.log(r[j]) - np.log(r[i]))
    m = len(slopes)
    slopes.sort()
    med = float(slopes[(m + 1) // 2 - 1]) if m else 0.0
    return pd.DataFrame(
        {
            "n_ranks": [np.int64(len(f))],
            "n_pairs": [np.int64(m)],
            "zipf_slope_micro": [np.int64(np.floor(med * 1e6 + 0.5))],
        }
    )


ORACLES60["docs_zipf_slope"] = f"""
WITH v AS (
  SELECT token, COUNT(*) AS n
  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS token
        FROM documents)
  GROUP BY token ORDER BY n DESC, token LIMIT {_ZIPF_TOPK}
),
rk AS (
  SELECT row_number() OVER (ORDER BY n DESC, token) AS r, n FROM v
),
s AS (
  SELECT (ln(b.n * 1.0) - ln(a.n * 1.0)) / (ln(b.r * 1.0) - ln(a.r * 1.0))
           AS slope
  FROM rk a JOIN rk b ON a.r < b.r
),
o AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS m FROM s)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_ranks,
       CAST(any_value(m) AS BIGINT) AS n_pairs,
       CAST(floor(any_value(slope) * 1000000 + 0.5) AS BIGINT)
         AS zipf_slope_micro
FROM o WHERE rn = (m + 1) // 2"""


QUERIES60 = {
    "orders_duplicate_invoices": q_orders_duplicate_invoices,
    "docs_zipf_slope": q_docs_zipf_slope,
}
