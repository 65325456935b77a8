"""Driver-contract queries, wave 277 — Spearman rank correlation of
token frequencies between the top-2 document sources over their shared
vocabulary (exact doubled-rank moments), and the van den Broek score
test for zero inflation of per-customer order counts vs Poisson. Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES277: dict[str, str] = {}

_ZI_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_vocab_rank_corr — Spearman of shared-vocab frequency ranks
# ---------------------------------------------------------------------------


def q_docs_vocab_rank_corr(sf_dir: str):
    """Spearman correlation of token-frequency ranks between the top-2
    sources (doc count desc, name asc) over the SHARED vocabulary:
    within the shared set each source's counts get doubled average ranks
    (EXACT integers), and rho is the Pearson formula on those integer
    rank moments — one float composition at the end. One row: source_a,
    source_b, n_shared, rho_micro.

    Scale shape: the `docs_yule_k` wordcount exchange; the driver fold
    is vocabulary-bounded."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def local_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(
            np.repeat(t["source"].to_numpy(zero_copy_only=False), n_per),
            pa.string(),
        )
        flat = toks.combine_chunks().flatten()
        keep = pc.not_equal(flat, "")
        g = (
            pa.table({"source": src.filter(keep), "token": flat.filter(keep)})
            .group_by(["source", "token"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["source", "token", "pn"])

    counts = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("pn", alias_name="c"))
        .to_pandas()  # vocabulary-bounded (|sources| x |vocab|)
    )
    cols = ["source_a", "source_b", "n_shared", "rho_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if counts.empty:
        return empty
    doc_counts = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
        .to_pandas()
        .groupby("source")
        .size()
        .reset_index(name="n")
        .sort_values(["n", "source"], ascending=[False, True])
    )
    if len(doc_counts) < 2:
        return empty
    sa, sb = doc_counts["source"].tolist()[:2]
    ca = counts[counts["source"] == sa].set_index("token")["c"]
    cb = counts[counts["source"] == sb].set_index("token")["c"]
    shared = ca.index.intersection(cb.index)
    n = len(shared)
    if n < 2:
        return empty
    va = ca.reindex(shared).to_numpy(np.int64)
    vb = cb.reindex(shared).to_numpy(np.int64)

    def r2(v: np.ndarray) -> np.ndarray:
        vals, cnts = np.unique(v, return_counts=True)
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        r2v = 2 * below + cnts + 1
        return r2v[np.searchsorted(vals, v)]

    ra, rb = r2(va).astype(object), r2(vb).astype(object)
    sx, sy = int(ra.sum()), int(rb.sum())
    sxx, syy = int((ra * ra).sum()), int((rb * rb).sum())
    sxy = int((ra * rb).sum())
    num = float(n * sxy - sx * sy)
    den = float(np.sqrt(float(n * sxx - sx * sx))) * float(
        np.sqrt(float(n * syy - sy * sy))
    )
    if den == 0.0:
        return empty
    rho = num / den
    return pd.DataFrame(
        [
            (
                sa, sb, np.int64(n),
                np.int64(np.floor(rho * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


ORACLES277["docs_vocab_rank_corr"] = r"""
WITH dc AS (
  SELECT source, row_number() OVER (ORDER BY count(*) DESC, source) AS rk
  FROM documents GROUP BY 1
),
top2 AS (SELECT source, rk FROM dc WHERE rk <= 2),
tok AS (
  SELECT top2.rk, unnest(list_filter(
           string_split_regex(lower(d.text), '\s+'), x -> x <> '')) AS token
  FROM documents d JOIN top2 ON top2.source = d.source
),
c AS (
  SELECT rk, token, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
shared AS (
  SELECT a.token, a.c AS ca, b.c AS cb
  FROM (SELECT token, c FROM c WHERE rk = 1) a
  JOIN (SELECT token, c FROM c WHERE rk = 2) b USING (token)
),
ra AS (
  SELECT token,
         2 * (rank() OVER (ORDER BY ca)) + (count(*) OVER (PARTITION BY ca))
           - 1 AS r2
  FROM shared
),
rb AS (
  SELECT token,
         2 * (rank() OVER (ORDER BY cb)) + (count(*) OVER (PARTITION BY cb))
           - 1 AS r2
  FROM shared
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(ra.r2 AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(rb.r2 AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(ra.r2 AS HUGEINT) * ra.r2) AS HUGEINT) AS sxx,
         CAST(sum(CAST(rb.r2 AS HUGEINT) * rb.r2) AS HUGEINT) AS syy,
         CAST(sum(CAST(ra.r2 AS HUGEINT) * rb.r2) AS HUGEINT) AS sxy
  FROM ra JOIN rb USING (token)
)
SELECT (SELECT source FROM top2 WHERE rk = 1) AS source_a,
       (SELECT source FROM top2 WHERE rk = 2) AS source_b,
       m.n AS n_shared,
       CAST(floor(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                  / (sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE))
                     * sqrt(CAST(m.n * m.syy - m.sy * m.sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS rho_micro
FROM m
WHERE m.n >= 2
  AND (m.n * m.sxx - m.sx * m.sx) > 0
  AND (m.n * m.syy - m.sy * m.sy) > 0"""


# ---------------------------------------------------------------------------
# customer_zero_inflation — van den Broek score test vs Poisson
# ---------------------------------------------------------------------------


def q_customer_zero_inflation(sf_dir: str):
    """van den Broek (1995) score test for zero inflation of
    per-customer order counts against Poisson(lambda-hat): with
    p0 = exp(-lambda), S = (n0/p0 - n)^2 / (n (1-p0)/p0 - n lambda)
    ~ chi-square(1). Counts are EXACT integers (zero-order customers
    from the full customer table); exp and the quotient are the float
    steps. One row: n_cust, n_zero, lambda_micro, s_micro, reject_5pct.

    Scale shape: the `customer_mahalanobis` bucketed count reduce, but
    each bucket emits two scalars (customers-with-orders, total
    orders) — only buckets x 2 scalars reach the driver."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("o_custkey", sort=False)
            .size()
            .rename("pn")
            .reset_index()
        )
        g["pn"] = g["pn"].astype(np.int64)
        g["_b"] = (g["o_custkey"].to_numpy(np.int64) % _ZI_BUCKETS).astype(
            np.int64
        )
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("o_custkey", sort=False)["pn"].sum()
        return pd.DataFrame(
            {
                "n_with": [np.int64(len(per))],
                "n_orders": [np.int64(int(per.sum()))],
            }
        )

    parts = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n_cust = int(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey"]
        ).count()
    )
    cols = ["n_cust", "n_zero", "lambda_micro", "s_micro", "reject_5pct"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if n_cust == 0 or parts.empty:
        return empty
    n_with = int(parts["n_with"])
    n_orders = int(parts["n_orders"])
    n0 = n_cust - n_with
    lam = float(n_orders) / float(n_cust)
    if lam <= 0.0:
        return empty
    p0 = float(np.exp(-lam))
    den = float(n_cust) * (1.0 - p0) / p0 - float(n_cust) * lam
    if den <= 0.0:
        return empty
    s = (float(n0) / p0 - float(n_cust)) ** 2 / den
    return pd.DataFrame(
        [
            (
                np.int64(n_cust), np.int64(n0),
                np.int64(np.floor(lam * 1_000_000.0 + 0.5)),
                np.int64(np.floor(s * 1_000_000.0 + 0.5)),
                np.int64(1 if s > 3.841458820694124 else 0),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES277["customer_zero_inflation"] = """
WITH oc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS k
  FROM orders GROUP BY 1
),
feat AS (
  SELECT c.c_custkey, CAST(coalesce(oc.k, 0) AS BIGINT) AS k
  FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(k) AS BIGINT) AS tot
  FROM feat
),
s AS (
  SELECT n, n0, CAST(tot AS DOUBLE) / CAST(n AS DOUBLE) AS lam,
         exp(-(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))) AS p0
  FROM m
),
stat AS (
  SELECT n, n0, lam,
         (CAST(n0 AS DOUBLE) / p0 - CAST(n AS DOUBLE))
           * (CAST(n0 AS DOUBLE) / p0 - CAST(n AS DOUBLE))
           / (CAST(n AS DOUBLE) * (1.0 - p0) / p0
              - CAST(n AS DOUBLE) * lam) AS s,
         CAST(n AS DOUBLE) * (1.0 - p0) / p0 - CAST(n AS DOUBLE) * lam
           AS den
  FROM s
  WHERE lam > 0
)
SELECT n AS n_cust, n0 AS n_zero,
       CAST(floor(lam * 1000000.0 + 0.5) AS BIGINT) AS lambda_micro,
       CAST(floor(s * 1000000.0 + 0.5) AS BIGINT) AS s_micro,
       CAST(CASE WHEN s > 3.841458820694124 THEN 1 ELSE 0 END AS BIGINT)
         AS reject_5pct
FROM stat
WHERE den > 0"""


QUERIES277 = {
    "docs_vocab_rank_corr": q_docs_vocab_rank_corr,
    "customer_zero_inflation": q_customer_zero_inflation,
}
