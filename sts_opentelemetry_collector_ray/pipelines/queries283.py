"""Driver-contract queries, wave 283 — source purity of MinHash near-dup
clusters (how often near-duplicates cross source boundaries) and the
negative-binomial vs Poisson likelihood-ratio test for overdispersion of
per-user event counts (method-of-moments NB, exact count histogram).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES283: dict[str, str] = {}

_NB_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_cluster_purity — source homogeneity of near-dup components
# ---------------------------------------------------------------------------


def q_docs_cluster_purity(sf_dir: str):
    """Source purity of near-duplicate clusters: MinHash-LSH pairs →
    distributed min-label components (the `neardup_components`
    machinery), then per component of size >= 2 the member-source
    census: cluster_size, n_sources, maj_n (largest source count —
    a deterministic integer even under ties), purity_micro = maj_n /
    size. Cross-source near-dups signal template reuse between crawls.

    Scale shape: components run fully in-cluster; only member doc_ids
    (pair-graph-bounded, << corpus) reach the driver, and their sources
    arrive via a broadcast-membership filter, never a full-table
    collect."""
    import ray
    from ..stages.clusters import connected_components_distributed
    from ..stages.dedup_docs import minhash_lsh_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = minhash_lsh_pairs(ds, jaccard_threshold=0.5)
    labels = (
        connected_components_distributed(pairs)
        .map_batches(
            lambda t: t.rename_columns(["node", "component"]),
            batch_format="pyarrow",
        )
        .to_pandas()  # pair-graph-bounded
    )
    cols = ["component", "cluster_size", "n_sources", "maj_n", "purity_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if labels.empty:
        return empty
    members = set(int(x) for x in labels["node"])
    mem_ref = ray.put(members)

    def pick(t: pa.Table) -> pd.DataFrame:
        mem = ray.get(mem_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.fromiter((int(i) in mem for i in ids), bool, len(ids))
        return pd.DataFrame(
            {
                "node": ids[keep],
                "source": np.asarray(
                    t["source"].to_numpy(zero_copy_only=False)
                )[keep],
            }
        )

    srcs = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        )
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    df = labels.merge(srcs, on="node")
    g = df.groupby(["component", "source"]).size().rename("c").reset_index()
    agg = g.groupby("component").agg(
        cluster_size=("c", "sum"), n_sources=("c", "size"), maj_n=("c", "max")
    )
    agg = agg[agg["cluster_size"] >= 2]
    if agg.empty:
        return empty
    out = agg.reset_index()
    out["purity_micro"] = np.floor(
        out["maj_n"].to_numpy(np.float64)
        / out["cluster_size"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.sort_values("component").reset_index(drop=True).astype(
        {c: np.int64 for c in cols}
    )[cols]


def _cluster_purity_oracle() -> str:
    from .queries3 import _components_sql

    return _components_sql(
        """
, mem AS (
  SELECT comp.component, d.source, CAST(count(*) AS BIGINT) AS c
  FROM comp JOIN documents d ON d.doc_id = comp.node
  GROUP BY 1, 2
),
agg AS (
  SELECT component, CAST(sum(c) AS BIGINT) AS cluster_size,
         CAST(count(*) AS BIGINT) AS n_sources,
         CAST(max(c) AS BIGINT) AS maj_n
  FROM mem GROUP BY 1
)
SELECT component, cluster_size, n_sources, maj_n,
       CAST(floor(CAST(maj_n AS DOUBLE) / CAST(cluster_size AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS purity_micro
FROM agg
WHERE cluster_size >= 2
ORDER BY component"""
    )


# ---------------------------------------------------------------------------
# users_nb_vs_poisson — overdispersion likelihood-ratio test
# ---------------------------------------------------------------------------


def q_users_nb_vs_poisson(sf_dir: str):
    """Overdispersion of per-user event counts: Poisson(lambda-hat) vs
    method-of-moments negative binomial (r = lambda^2/(var - lambda)).
    Log-likelihoods fold over the EXACT (count -> users) histogram:
    llP = sum c_k (k ln lam - lam - lgamma(k+1)), llNB = sum c_k
    (lgamma(k+r) - lgamma(r) - lgamma(k+1) + r ln(r/(r+lam))
    + k ln(lam/(r+lam))); LLR = 2 (llNB - llP). Emitted only when the
    sample is overdispersed (var > lambda). One row: n_users,
    lambda_micro, var_micro, r_micro, llr_milli.

    Scale shape: per-user counts reduce via ONE user-bucket exchange;
    each bucket emits its bounded count histogram; lgamma folds run
    over |distinct k| rows on the driver."""
    from math import lgamma

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.Series(u).groupby(u).size()
        out = pd.DataFrame(
            {"u": g.index.to_numpy(np.int64), "k": g.to_numpy(np.int64)}
        )
        out["_b"] = (out["u"] % _NB_BUCKETS).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("u")["k"].sum()
        h = per.groupby(per.values).size()
        return pd.DataFrame(
            {"k": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("k")["c"]
        .sum()
    )
    cols = ["n_users", "lambda_micro", "var_micro", "r_micro", "llr_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hist.empty:
        return empty
    k = hist.index.to_numpy(np.int64)
    c = hist.to_numpy(np.int64)
    n = int(c.sum())
    s1 = int((k * c).sum())
    s2 = int((k.astype(object) * k.astype(object) * c.astype(object)).sum())
    lam = float(s1) / float(n)
    var = float(s2) / float(n) - lam * lam
    if n < 2 or lam <= 0.0 or var <= lam:
        return empty
    r = lam * lam / (var - lam)
    ll_p = 0.0
    ll_nb = 0.0
    ln_lam = float(np.log(lam))
    ln_r_rl = float(np.log(r / (r + lam)))
    ln_l_rl = float(np.log(lam / (r + lam)))
    lg_r = lgamma(r)
    for ki, ci in zip(k.tolist(), c.tolist()):
        lg_k1 = lgamma(float(ki) + 1.0)
        ll_p += float(ci) * (float(ki) * ln_lam - lam - lg_k1)
        ll_nb += float(ci) * (
            lgamma(float(ki) + r) - lg_r - lg_k1
            + r * ln_r_rl + float(ki) * ln_l_rl
        )
    llr = 2.0 * (ll_nb - ll_p)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(lam * 1_000_000.0 + 0.5)),
                np.int64(np.floor(var * 1_000_000.0 + 0.5)),
                np.int64(np.floor(r * 1_000_000.0 + 0.5)),
                np.int64(np.floor(llr * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES283["users_nb_vs_poisson"] = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS k
  FROM events GROUP BY 1
),
h AS (SELECT k, CAST(count(*) AS BIGINT) AS c FROM per GROUP BY 1),
m AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(k * c) AS BIGINT) AS s1,
         CAST(sum(CAST(k AS HUGEINT) * k * c) AS HUGEINT) AS s2
  FROM h
),
p AS (
  SELECT n, CAST(s1 AS DOUBLE) / n AS lam,
         CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS var
  FROM m
),
fit AS (
  SELECT n, lam, var, lam * lam / (var - lam) AS r
  FROM p WHERE n >= 2 AND lam > 0 AND var > lam
),
ll AS (
  SELECT fit.n, fit.lam, fit.var, fit.r,
         sum(CAST(h.c AS DOUBLE)
             * (CAST(h.k AS DOUBLE) * ln(fit.lam) - fit.lam
                - lgamma(CAST(h.k AS DOUBLE) + 1.0))) AS ll_p,
         sum(CAST(h.c AS DOUBLE)
             * (lgamma(CAST(h.k AS DOUBLE) + fit.r) - lgamma(fit.r)
                - lgamma(CAST(h.k AS DOUBLE) + 1.0)
                + fit.r * ln(fit.r / (fit.r + fit.lam))
                + CAST(h.k AS DOUBLE) * ln(fit.lam / (fit.r + fit.lam))))
           AS ll_nb
  FROM h, fit
  GROUP BY 1, 2, 3, 4
)
SELECT n AS n_users,
       CAST(floor(lam * 1000000.0 + 0.5) AS BIGINT) AS lambda_micro,
       CAST(floor(var * 1000000.0 + 0.5) AS BIGINT) AS var_micro,
       CAST(floor(r * 1000000.0 + 0.5) AS BIGINT) AS r_micro,
       CAST(floor(2.0 * (ll_nb - ll_p) * 1000.0 + 0.5) AS BIGINT)
         AS llr_milli
FROM ll"""


def _register_dynamic() -> None:
    ORACLES283["docs_cluster_purity"] = _cluster_purity_oracle()


_register_dynamic()

QUERIES283 = {
    "docs_cluster_purity": q_docs_cluster_purity,
    "users_nb_vs_poisson": q_users_nb_vs_poisson,
}
