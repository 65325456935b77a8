"""Driver-contract queries, wave 361 — Kruskal-Wallis rank test of
customer account balance across market segments (exact rational rank
core with tie correction) and the returned-flag odds ratio across the
tax median split of lineitem. Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES361: dict[str, str] = {}


# ---------------------------------------------------------------------------
# customer_mktsegment_kruskal — Kruskal-Wallis H across segments
# ---------------------------------------------------------------------------


def q_customer_mktsegment_kruskal(sf_dir: str):
    """Kruskal-Wallis: do account balances differ across market
    segments? Doubled average ranks off the global cents histogram keep
    every rank-sum integer; Sum S2g^2/n_g is carried as the EXACT
    rational num/den (den = prod n_g via cofactors) so the only floats
    are the final composition, mirrored in SQL. Tie correction from
    the cents multiplicity histogram. One row: n, n_groups, h_micro,
    h_tied_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        seg = t["c_mktsegment"].to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"seg": seg, "y": cents})
            .groupby(["seg", "y"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["seg", "y"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n", "n_groups", "h_micro", "h_tied_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    # global doubled average ranks per cents value
    glob = hist.groupby("y")["c"].sum().sort_index()
    vals = glob.index.to_numpy(np.int64)
    cnts = glob.to_numpy(np.int64).astype(object)
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    r2 = 2 * below + cnts + 1  # doubled average rank per value
    r2_map = dict(zip(vals.tolist(), r2.tolist()))
    n = int(sum(int(x) for x in cnts))
    segs = sorted(hist["seg"].unique())
    k = len(segs)
    if k < 2 or n < k + 1:
        return empty
    ng = []
    s2g = []
    for s_ in segs:
        sub = hist[hist["seg"] == s_]
        ng.append(int(sub["c"].sum()))
        s2g.append(
            int(sum(int(c_) * r2_map[int(y_)]
                    for y_, c_ in zip(sub["y"], sub["c"])))
        )
    den = 1
    for m in ng:
        den *= m
    num = sum(s * s * (den // m) for s, m in zip(s2g, ng))
    h = (
        3.0 * float(num) / float(den) / float(n) / float(n + 1)
        - 3.0 * float(n + 1)
    )
    t_sum = int(sum(int(c_) ** 3 - int(c_) for c_ in cnts))
    c_corr = 1.0 - float(t_sum) / (float(n) ** 3 - float(n))
    if c_corr <= 0.0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(k),
                np.int64(np.floor(h * 1_000_000.0 + 0.5)),
                np.int64(np.floor(h / c_corr * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES361["customer_mktsegment_kruskal"] = """
WITH b AS (
  SELECT c_mktsegment AS seg,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS y
  FROM customer
),
r AS (
  SELECT seg, y,
         2 * (rank() OVER (ORDER BY y)) + (count(*) OVER (PARTITION BY y))
           - 1 AS r2
  FROM b
),
g AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(r2) AS BIGINT) AS s2
  FROM r GROUP BY 1
),
nn AS (SELECT CAST(sum(m) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS k FROM g),
den AS (
  SELECT list_reduce(list(CAST(m AS HUGEINT) ORDER BY seg),
                     (a, b) -> a * b) AS d
  FROM g
),
num AS (
  SELECT CAST(sum(CAST(g.s2 AS HUGEINT) * g.s2 * (den.d // g.m))
              AS HUGEINT) AS v
  FROM g, den
),
ties AS (
  SELECT CAST(sum(CAST(c AS HUGEINT) * c * c - c) AS HUGEINT) AS t
  FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM b GROUP BY y)
),
h AS (
  SELECT nn.n, nn.k,
         3.0 * CAST(num.v AS DOUBLE) / CAST(den.d AS DOUBLE)
           / nn.n / (nn.n + 1) - 3.0 * (nn.n + 1) AS h,
         1.0 - CAST(ties.t AS DOUBLE)
           / (CAST(nn.n AS DOUBLE) * nn.n * nn.n - nn.n) AS c
  FROM nn, den, num, ties
)
SELECT n, k AS n_groups,
       CAST(floor(h * 1000000.0 + 0.5) AS BIGINT) AS h_micro,
       CAST(floor(h / c * 1000000.0 + 0.5) AS BIGINT) AS h_tied_micro
FROM h
WHERE k >= 2 AND n >= k + 1 AND c > 0"""


# ---------------------------------------------------------------------------
# lineitem_return_odds_by_tax — 2x2 odds ratio across tax median split
# ---------------------------------------------------------------------------


def q_lineitem_return_odds_by_tax(sf_dir: str):
    """Does a higher tax rate co-occur with returns? Tax (milli) split
    at the lower median; 2x2 table against l_returnflag = 'R'; odds
    ratio and per-side return rates. Counts exact off the (tax,
    returned) fold. One row: med_tax_milli, n_high_ret, n_high_ok,
    n_low_ret, n_low_ok, rate_high_micro, rate_low_micro, or_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        tax = np.floor(
            t["l_tax"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        ret = (
            t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        ).astype(np.int64)
        g = (
            pd.DataFrame({"tax": tax, "ret": ret})
            .groupby(["tax", "ret"])
            .size()
            .rename("c")
            .reset_index()
        )
        return g.astype(np.int64)

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_tax", "l_returnflag"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["tax", "ret"])["c"]
        .sum()
        .reset_index()
        .sort_values("tax")
    )
    cols = [
        "med_tax_milli", "n_high_ret", "n_high_ok", "n_low_ret", "n_low_ok",
        "rate_high_micro", "rate_low_micro", "or_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    n = int(h["c"].sum())
    per_tax = h.groupby("tax")["c"].sum().sort_index()
    cum = per_tax.cumsum()
    med = int(per_tax.index[int(np.searchsorted(
        cum.to_numpy(np.int64), (n + 1) // 2, side="left"
    ))])
    hi = h["tax"] > med
    a = int(h[hi & (h["ret"] == 1)]["c"].sum())
    b = int(h[hi & (h["ret"] == 0)]["c"].sum())
    c_ = int(h[~hi & (h["ret"] == 1)]["c"].sum())
    d = int(h[~hi & (h["ret"] == 0)]["c"].sum())
    if a + b == 0 or c_ + d == 0 or b * c_ == 0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(med), np.int64(a), np.int64(b), np.int64(c_),
                np.int64(d),
                np.int64(np.floor(
                    float(a) / float(a + b) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(c_) / float(c_ + d) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(a * d) / float(b * c_) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES361["lineitem_return_odds_by_tax"] = """
WITH b AS (
  SELECT CAST(floor(l_tax * 1000.0 + 0.5) AS BIGINT) AS tax,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
per AS (
  SELECT tax, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1
),
cum AS (
  SELECT tax, sum(c) OVER (ORDER BY tax) AS cc FROM per
),
med AS (
  SELECT min(tax) AS m FROM cum, nn WHERE cc >= (nn.n + 1) // 2
),
cell AS (
  SELECT
    CAST(sum(CASE WHEN tax > med.m AND ret = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS a,
    CAST(sum(CASE WHEN tax > med.m AND ret = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS bb,
    CAST(sum(CASE WHEN tax <= med.m AND ret = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS c,
    CAST(sum(CASE WHEN tax <= med.m AND ret = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS d
  FROM b, med
)
SELECT med.m AS med_tax_milli,
       a AS n_high_ret, bb AS n_high_ok, c AS n_low_ret, d AS n_low_ok,
       CAST(floor(CAST(a AS DOUBLE) / (a + bb) * 1000000.0 + 0.5)
            AS BIGINT) AS rate_high_micro,
       CAST(floor(CAST(c AS DOUBLE) / (c + d) * 1000000.0 + 0.5)
            AS BIGINT) AS rate_low_micro,
       CAST(floor(CAST(a * d AS DOUBLE) / CAST(bb * c AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS or_micro
FROM cell, med
WHERE a + bb > 0 AND c + d > 0 AND bb * c > 0"""


QUERIES361 = {
    "customer_mktsegment_kruskal": q_customer_mktsegment_kruskal,
    "lineitem_return_odds_by_tax": q_lineitem_return_odds_by_tax,
}
