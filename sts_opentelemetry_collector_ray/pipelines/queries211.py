"""Driver-contract queries, wave 211 — Balassa revealed comparative
advantage over the supplier-nation × part-type export matrix, and a
2-component Gaussian mixture fit by 5 fixed EM iterations (deterministic
half-split init, iteration-exact SQL replay).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES211: dict[str, str] = {}

_EM_ITERS = 5


# ---------------------------------------------------------------------------
# supplier_rca_index — Balassa RCA over nation × part-type exports
# ---------------------------------------------------------------------------


def q_supplier_rca_index(sf_dir: str):
    """Balassa (1965) revealed comparative advantage: over the
    supplier-nation × part-type revenue matrix f, RCA_ij = (f_ij/f_i·) /
    (f·_j/f··). Top-10 cells by RCA (ties → nation, type). Output:
    s_nationkey, p_type, rca_micro.

    Scale shape: supplier-nation and part-type maps broadcast (dimension
    tables) into ONE (nation, type, Σrev) combiner; the bounded matrix
    folds on the driver."""
    import pyarrow.parquet as pq

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = np.asarray(supp["s_suppkey"].to_numpy(zero_copy_only=False), np.int64)
    sn = np.asarray(supp["s_nationkey"].to_numpy(zero_copy_only=False), np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    part_t = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pk = np.asarray(part_t["p_partkey"].to_numpy(zero_copy_only=False), np.int64)
    pt = np.asarray(part_t["p_type"].to_numpy(zero_copy_only=False), object)
    po = np.argsort(pk)
    pk, pt = pk[po], pt[po]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        rev = df["l_extendedprice"].to_numpy(np.float64) * (
            1.0 - df["l_discount"].to_numpy(np.float64)
        )
        nk = sn[np.searchsorted(sk, df["l_suppkey"].to_numpy(np.int64))]
        ty = pt[np.searchsorted(pk, df["l_partkey"].to_numpy(np.int64))]
        out = pd.DataFrame({"nk": nk, "ty": ty, "f": rev})
        return out.groupby(["nk", "ty"], sort=False, as_index=False).sum()

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["s_nationkey", "p_type", "rca_micro"]
    if part.empty:
        return pd.DataFrame(
            {"s_nationkey": pd.Series([], dtype=np.int64),
             "p_type": pd.Series([], dtype=object),
             "rca_micro": pd.Series([], dtype=np.int64)}
        )
    fm = part.groupby(["nk", "ty"])["f"].sum()
    row = fm.groupby(level=0).sum()
    col = fm.groupby(level=1).sum()
    tot = float(fm.sum())
    nk = fm.index.get_level_values(0).to_numpy(np.int64)
    ty = np.asarray(fm.index.get_level_values(1).to_numpy(object))
    rca = (fm.to_numpy(np.float64) / row.loc[nk].to_numpy(np.float64)) / (
        col.loc[ty].to_numpy(np.float64) / tot
    )
    df = pd.DataFrame(
        {
            "s_nationkey": nk,
            "p_type": ty,
            "rca_micro": np.floor(rca * 1_000_000.0 + 0.5).astype(np.int64),
        }
    )
    df = df.sort_values(
        ["rca_micro", "s_nationkey", "p_type"],
        ascending=[False, True, True], kind="mergesort",
    ).head(10)
    return df.reset_index(drop=True).astype(
        {"s_nationkey": np.int64, "rca_micro": np.int64}
    )


ORACLES211["supplier_rca_index"] = """
WITH f AS (
  SELECT s.s_nationkey AS nk, p.p_type AS ty,
         sum(l_extendedprice * (1.0 - l_discount)) AS f
  FROM lineitem
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN part p ON l_partkey = p.p_partkey
  GROUP BY 1, 2
),
rm AS (SELECT nk, sum(f) AS m FROM f GROUP BY 1),
cm AS (SELECT ty, sum(f) AS m FROM f GROUP BY 1),
tot AS (SELECT sum(f) AS t FROM f)
SELECT CAST(f.nk AS BIGINT) AS s_nationkey, f.ty AS p_type,
       CAST(floor((f.f / rm.m) / (cm.m / tot.t) * 1000000.0 + 0.5) AS BIGINT)
         AS rca_micro
FROM f JOIN rm ON f.nk = rm.nk JOIN cm ON f.ty = cm.ty, tot
ORDER BY rca_micro DESC, s_nationkey ASC, p_type ASC LIMIT 10"""


# ---------------------------------------------------------------------------
# customer_gmm_em — 2-component Gaussian mixture, 5 EM iterations
# ---------------------------------------------------------------------------


def q_customer_gmm_em(sf_dir: str):
    """2-component Gaussian mixture over account balances: deterministic
    init (sorted lower/upper half means, pooled σ, π = ½) then 5 EM
    iterations (Dempster et al. 1977) — the SQL oracle replays every
    iteration with the identical expressions. One row: n, pi1_micro,
    mu1_micro, mu2_micro, sigma1_micro, sigma2_micro, loglik_int.

    Scale shape: customer is dimension-sized; the EM loop is 5 vectorized
    passes over a driver array (at corpus scale each E/M step is one
    map_batches moment combiner — same algebra)."""
    import pyarrow.parquet as pq

    x = np.sort(
        pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_acctbal"])
        ["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
    )
    cols = ["n", "pi1_micro", "mu1_micro", "mu2_micro",
            "sigma1_micro", "sigma2_micro", "loglik_int"]
    n = len(x)
    if n < 4:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    h = n // 2
    mu1 = x[:h].sum() / h
    mu2 = x[h:].sum() / (n - h)
    mall = x.sum() / n
    s_all = np.sqrt(max((x * x).sum() / n - mall * mall, 1e-9))
    s1 = s2 = s_all
    pi1 = 0.5
    for _ in range(_EM_ITERS):
        e1 = pi1 * np.exp(-(x - mu1) * (x - mu1) / (2.0 * s1 * s1)) / s1
        e2 = (1.0 - pi1) * np.exp(-(x - mu2) * (x - mu2) / (2.0 * s2 * s2)) / s2
        r = e1 / (e1 + e2)
        sr = r.sum()
        sr2 = (1.0 - r).sum()
        mu1 = (r * x).sum() / sr
        mu2 = ((1.0 - r) * x).sum() / sr2
        s1 = np.sqrt(max((r * x * x).sum() / sr - mu1 * mu1, 1e-9))
        s2 = np.sqrt(max(((1.0 - r) * x * x).sum() / sr2 - mu2 * mu2, 1e-9))
        pi1 = sr / n
    mix = (
        pi1 * np.exp(-(x - mu1) * (x - mu1) / (2.0 * s1 * s1)) / s1
        + (1.0 - pi1) * np.exp(-(x - mu2) * (x - mu2) / (2.0 * s2 * s2)) / s2
    )
    ll = float((np.log(mix) - np.log(np.sqrt(2.0 * np.pi))).sum())
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "pi1_micro": [micro(pi1)],
            "mu1_micro": [micro(mu1)],
            "mu2_micro": [micro(mu2)],
            "sigma1_micro": [micro(s1)],
            "sigma2_micro": [micro(s2)],
            "loglik_int": [np.int64(np.floor(ll + 0.5))],
        }
    )


def _gmm_oracle() -> str:
    resp = (
        "(p.pi1 * exp(-(x - p.mu1) * (x - p.mu1) / (2.0 * p.s1 * p.s1)) / p.s1)"
        " / ((p.pi1 * exp(-(x - p.mu1) * (x - p.mu1) / (2.0 * p.s1 * p.s1)) / p.s1)"
        " + ((1.0 - p.pi1) * exp(-(x - p.mu2) * (x - p.mu2)"
        " / (2.0 * p.s2 * p.s2)) / p.s2))"
    )
    its = []
    prev = "p0"
    for k in range(1, _EM_ITERS + 1):
        its.append(f""",
r{k} AS MATERIALIZED (
  SELECT x, {resp.replace('p.', prev + '.')} AS r FROM xs, {prev}
),
p{k} AS MATERIALIZED (
  SELECT sum(r) / count(*) AS pi1,
         sum(r * x) / sum(r) AS mu1,
         sum((1.0 - r) * x) / sum(1.0 - r) AS mu2,
         sqrt(greatest(sum(r * x * x) / sum(r)
              - (sum(r * x) / sum(r)) * (sum(r * x) / sum(r)), 1e-9)) AS s1,
         sqrt(greatest(sum((1.0 - r) * x * x) / sum(1.0 - r)
              - (sum((1.0 - r) * x) / sum(1.0 - r))
              * (sum((1.0 - r) * x) / sum(1.0 - r)), 1e-9)) AS s2
  FROM r{k}
)""")
        prev = f"p{k}"
    mix = (
        f"({prev}.pi1 * exp(-(x - {prev}.mu1) * (x - {prev}.mu1)"
        f" / (2.0 * {prev}.s1 * {prev}.s1)) / {prev}.s1"
        f" + (1.0 - {prev}.pi1) * exp(-(x - {prev}.mu2) * (x - {prev}.mu2)"
        f" / (2.0 * {prev}.s2 * {prev}.s2)) / {prev}.s2)"
    )
    return f"""
WITH xs AS MATERIALIZED (SELECT c_acctbal AS x FROM customer),
o AS (
  SELECT x, row_number() OVER (ORDER BY x) AS r, count(*) OVER () AS n
  FROM xs
),
p0 AS MATERIALIZED (
  SELECT 0.5 AS pi1,
         sum(CASE WHEN r <= n // 2 THEN x END)
           / (SELECT count(*) FROM o WHERE r <= n // 2) AS mu1,
         sum(CASE WHEN r > n // 2 THEN x END)
           / (SELECT count(*) FROM o WHERE r > n // 2) AS mu2,
         sqrt(greatest(sum(x * x) / count(*)
              - (sum(x) / count(*)) * (sum(x) / count(*)), 1e-9)) AS s1,
         sqrt(greatest(sum(x * x) / count(*)
              - (sum(x) / count(*)) * (sum(x) / count(*)), 1e-9)) AS s2
  FROM o HAVING count(*) >= 4
){"".join(its)},
ll AS (
  SELECT sum(ln({mix}) - ln(sqrt(2.0 * pi()))) AS ll,
         count(*) AS n
  FROM xs, {prev}
)
SELECT CAST(ll.n AS BIGINT) AS n,
       CAST(floor({prev}.pi1 * 1000000.0 + 0.5) AS BIGINT) AS pi1_micro,
       CAST(floor({prev}.mu1 * 1000000.0 + 0.5) AS BIGINT) AS mu1_micro,
       CAST(floor({prev}.mu2 * 1000000.0 + 0.5) AS BIGINT) AS mu2_micro,
       CAST(floor({prev}.s1 * 1000000.0 + 0.5) AS BIGINT) AS sigma1_micro,
       CAST(floor({prev}.s2 * 1000000.0 + 0.5) AS BIGINT) AS sigma2_micro,
       CAST(floor(ll.ll + 0.5) AS BIGINT) AS loglik_int
FROM ll, {prev}"""


ORACLES211["customer_gmm_em"] = _gmm_oracle()


QUERIES211 = {
    "supplier_rca_index": q_supplier_rca_index,
    "customer_gmm_em": q_customer_gmm_em,
}
