"""Driver-contract queries, wave 318 — customer brand loyalty (share of
a customer's lineitems in their modal brand, censused by decile) and
the Nigrini second-order Benford test (first digits of differences
between sorted order amounts). Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES318: dict[str, str] = {}

_BL_BUCKETS = 64


# ---------------------------------------------------------------------------
# customer_brand_loyalty — modal-brand share census
# ---------------------------------------------------------------------------


def q_customer_brand_loyalty(sf_dir: str):
    """Brand loyalty: per customer with at least 2 lineitems, the share
    of their items in their MODAL brand (ties take the max count — a
    deterministic integer), censused into deciles
    (bucket = min(share * 10, 9) decided by the EXACT comparison
    10 * modal >= k * total). Per bucket: loyalty_decile, n_customers,
    share_micro.

    Scale shape: lineitems resolve custkeys through the tagged
    orderkey-bucket exchange, then (cust, brand) counts re-reduce on a
    custkey-bucket exchange; each bucket emits its bounded decile
    census."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put(p2b)

    def li_rows(t: pa.Table) -> pd.DataFrame:
        p2b_ = _ray.get(dims_ref)
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "brand": pd.Series(
                    t["l_partkey"].to_numpy(zero_copy_only=False)
                ).map(p2b_).to_numpy(object),
                "cust": np.int64(-1),
                "_b": (k % _BL_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "brand": "",
                "cust": t["o_custkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "_b": (k % _BL_BUCKETS).astype(np.int64),
            }
        )

    def join_merge(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["cust"] < 0][["k", "brand"]]
        o = g[g["cust"] >= 0][["k", "cust"]]
        m = li.merge(o, on="k")
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "cust": pd.Series([], dtype=np.int64),
                    "brand": pd.Series([], dtype=object),
                    "c": pd.Series([], dtype=np.int64),
                    "_b2": pd.Series([], dtype=np.int64),
                }
            )
        out = (
            m.groupby(["cust", "brand"]).size().rename("c").reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        out["_b2"] = (out["cust"].to_numpy(np.int64) % _BL_BUCKETS).astype(
            np.int64
        )
        return out

    def census(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "d": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        per = g.groupby(["cust", "brand"])["c"].sum().reset_index()
        agg = per.groupby("cust")["c"].agg(total="sum", modal="max")
        agg = agg[agg["total"] >= 2]
        if len(agg) == 0:
            return pd.DataFrame(
                {
                    "d": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        tot = agg["total"].to_numpy(np.int64)
        mod = agg["modal"].to_numpy(np.int64)
        # decile = min(floor(10 * modal / total), 9) via exact integers
        dec = np.minimum((10 * mod) // tot, 9).astype(np.int64)
        h = pd.Series(dec).groupby(dec).size()
        return pd.DataFrame(
            {"d": h.index.to_numpy(np.int64), "n": h.to_numpy(np.int64)}
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    h = (
        li.union(o)
        .groupby("_b")
        .map_groups(join_merge, batch_format="pandas")
        .groupby("_b2")
        .map_groups(census, batch_format="pandas")
        .to_pandas()
        .groupby("d")["n"]
        .sum()
        .sort_index()
    )
    cols = ["loyalty_decile", "n_customers", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    total = int(h.sum())
    out = pd.DataFrame(
        {
            "loyalty_decile": h.index.to_numpy(np.int64),
            "n_customers": h.to_numpy(np.int64),
            "share_micro": np.floor(
                h.to_numpy(np.int64).astype(np.float64) / float(total)
                * 1_000_000.0 + 0.5
            ).astype(np.int64),
        }
    )
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES318["customer_brand_loyalty"] = """
WITH cb AS (
  SELECT o.o_custkey AS cust, p.p_brand AS brand,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
per AS (
  SELECT cust, CAST(sum(c) AS BIGINT) AS total,
         CAST(max(c) AS BIGINT) AS modal
  FROM cb GROUP BY 1
  HAVING sum(c) >= 2
),
dec AS (
  SELECT least((10 * modal) // total, 9) AS d FROM per
),
h AS (
  SELECT CAST(d AS BIGINT) AS loyalty_decile,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM dec GROUP BY 1
),
tot AS (SELECT CAST(sum(n_customers) AS BIGINT) AS t FROM h)
SELECT h.loyalty_decile, h.n_customers,
       CAST(floor(CAST(h.n_customers AS DOUBLE) / CAST(tot.t AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM h, tot
ORDER BY h.loyalty_decile"""


# ---------------------------------------------------------------------------
# orders_benford_second_order — first digits of sorted differences
# ---------------------------------------------------------------------------


def q_orders_benford_second_order(sf_dir: str):
    """Nigrini's second-order Benford test: the nonzero differences of
    the SORTED order amounts (cents) — equal to consecutive distinct
    cent values' gaps — should have Benford-distributed first digits.
    Per digit: digit, n, obs_share_micro, exp_share_micro; chi2_micro
    repeated. Counting exact; logs float.

    Scale shape: bounded cents-histogram combiner; diffs are one
    vectorized pass over the sorted distinct values."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        h = pd.Series(cents).groupby(cents).size()
        return pd.DataFrame(
            {"y": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("y")["c"]
        .sum()
        .sort_index()
    )
    cols = ["digit", "n", "obs_share_micro", "exp_share_micro", "chi2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(hist) < 2:
        return empty
    v = hist.index.to_numpy(np.int64)
    d = np.diff(v)
    d = d[d > 0]
    if len(d) == 0:
        return empty
    first = np.array(
        [int(str(int(x))[0]) for x in d], np.int64
    )
    n = len(first)
    counts = {k: int((first == k).sum()) for k in range(1, 10)}
    chi2 = 0.0
    rows = []
    for k in range(1, 10):
        e_share = float(np.log10(1.0 + 1.0 / float(k)))
        o = counts[k]
        e = e_share * float(n)
        if e > 0.0:
            chi2 += (float(o) - e) * (float(o) - e) / e
        rows.append((k, o, e_share))
    cm = np.int64(np.floor(chi2 * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        [
            (
                np.int64(k), np.int64(o),
                np.int64(np.floor(
                    float(o) / float(n) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(es * 1_000_000.0 + 0.5)),
                cm,
            )
            for k, o, es in rows
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES318["orders_benford_second_order"] = """
WITH b AS (
  SELECT DISTINCT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM orders
),
d AS (
  SELECT y - lag(y) OVER (ORDER BY y) AS dv FROM b
),
dd AS (SELECT dv FROM d WHERE dv IS NOT NULL AND dv > 0),
fd AS (
  SELECT CAST(substr(CAST(dv AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM dd
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fd),
digits AS (SELECT CAST(r.range AS BIGINT) + 1 AS digit FROM range(0, 9) r),
h AS (
  SELECT digits.digit,
         CAST(coalesce(sum(CASE WHEN fd.digit = digits.digit THEN 1 END),
                       0) AS BIGINT) AS o
  FROM digits LEFT JOIN fd ON fd.digit = digits.digit
  GROUP BY 1
),
chi AS (
  SELECT sum((CAST(h.o AS DOUBLE) - log10(1.0 + 1.0 / h.digit) * nn.n)
             * (CAST(h.o AS DOUBLE) - log10(1.0 + 1.0 / h.digit) * nn.n)
             / (log10(1.0 + 1.0 / h.digit) * nn.n)) AS chi2
  FROM h, nn WHERE nn.n > 0
)
SELECT h.digit, h.o AS n,
       CAST(floor(CAST(h.o AS DOUBLE) / nn.n * 1000000.0 + 0.5) AS BIGINT)
         AS obs_share_micro,
       CAST(floor(log10(1.0 + 1.0 / h.digit) * 1000000.0 + 0.5) AS BIGINT)
         AS exp_share_micro,
       CAST(floor(chi.chi2 * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
FROM h, nn, chi
WHERE nn.n > 0
ORDER BY h.digit"""


QUERIES318 = {
    "customer_brand_loyalty": q_customer_brand_loyalty,
    "orders_benford_second_order": q_orders_benford_second_order,
}
