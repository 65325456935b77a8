"""Driver-contract queries, wave 223 — HITS hubs/authorities over the
weighted nation→nation trade digraph (5 power iterations, L2-normalized,
iteration-exact SQL replay) and pairwise Jensen-Shannon divergence between
source unigram distributions (closest pairs).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES223: dict[str, str] = {}

_HITS_ITERS = 5


# ---------------------------------------------------------------------------
# nation_hits — hubs and authorities over trade flows
# ---------------------------------------------------------------------------


def q_nation_hits(sf_dir: str):
    """HITS (Kleinberg 1999) over the customer-nation → supplier-nation
    revenue digraph: 5 iterations of a ← Wᵀh, h ← Wa with L2
    normalization after each update (init h = 1/√n). Top-5 nations by
    authority (ties → nation). Output: nationkey, authority_micro,
    hub_micro.

    Scale shape: the (ci, sj, Σrev) combiner folds the bounded |nations|²
    matrix; the power iterations are dense driver matvecs."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = np.asarray(cust["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
    cn = np.asarray(cust["c_nationkey"].to_numpy(zero_copy_only=False), np.int64)
    co = np.argsort(ck)
    ck, cn = ck[co], cn[co]
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = np.asarray(supp["s_suppkey"].to_numpy(zero_copy_only=False), np.int64)
    sn = np.asarray(supp["s_nationkey"].to_numpy(zero_copy_only=False), np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    ords = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    ok = np.asarray(ords["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    oc = np.asarray(ords["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
    oo = np.argsort(ok)
    ok, oc = ok[oo], oc[oo]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        rev = df["l_extendedprice"].to_numpy(np.float64) * (
            1.0 - df["l_discount"].to_numpy(np.float64)
        )
        ci = cn[np.searchsorted(ck, oc[np.searchsorted(ok, df["l_orderkey"].to_numpy(np.int64))])]
        sj = sn[np.searchsorted(sk, df["l_suppkey"].to_numpy(np.int64))]
        out = pd.DataFrame({"ci": ci, "sj": sj, "w": rev})
        return out.groupby(["ci", "sj"], sort=False, as_index=False).sum()

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["nationkey", "authority_micro", "hub_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    fm = part.groupby(["ci", "sj"])["w"].sum()
    nodes = np.sort(
        np.union1d(
            fm.index.get_level_values(0).unique().to_numpy(np.int64),
            fm.index.get_level_values(1).unique().to_numpy(np.int64),
        )
    )
    n = len(nodes)
    w = np.zeros((n, n), np.float64)
    ci = np.searchsorted(nodes, fm.index.get_level_values(0).to_numpy(np.int64))
    sj = np.searchsorted(nodes, fm.index.get_level_values(1).to_numpy(np.int64))
    w[ci, sj] = fm.to_numpy(np.float64)
    h = np.full(n, 1.0 / np.sqrt(float(n)))
    a = np.zeros(n)
    for _ in range(_HITS_ITERS):
        a = w.T @ h
        a = a / np.sqrt((a * a).sum())
        h = w @ a
        h = h / np.sqrt((h * h).sum())
    df = pd.DataFrame(
        {
            "nationkey": nodes,
            "authority_micro": np.floor(a * 1_000_000.0 + 0.5).astype(np.int64),
            "hub_micro": np.floor(h * 1_000_000.0 + 0.5).astype(np.int64),
        }
    )
    df = df.sort_values(
        ["authority_micro", "nationkey"], ascending=[False, True],
        kind="mergesort",
    ).head(5)
    return df.reset_index(drop=True).astype(np.int64)


def _hits_oracle() -> str:
    steps = []
    prev_h = "h0"
    for k in range(1, _HITS_ITERS + 1):
        steps.append(f""",
a{k}r AS MATERIALIZED (
  SELECT e.sj AS node, sum(e.w * {prev_h}.v) AS v
  FROM e JOIN {prev_h} ON e.ci = {prev_h}.node GROUP BY 1
),
a{k}f AS MATERIALIZED (
  SELECT nodes.node, coalesce(a{k}r.v, 0.0) AS v
  FROM nodes LEFT JOIN a{k}r ON nodes.node = a{k}r.node
),
a{k} AS MATERIALIZED (
  SELECT node, v / (SELECT sqrt(sum(v * v)) FROM a{k}f) AS v FROM a{k}f
),
h{k}r AS MATERIALIZED (
  SELECT e.ci AS node, sum(e.w * a{k}.v) AS v
  FROM e JOIN a{k} ON e.sj = a{k}.node GROUP BY 1
),
h{k}f AS MATERIALIZED (
  SELECT nodes.node, coalesce(h{k}r.v, 0.0) AS v
  FROM nodes LEFT JOIN h{k}r ON nodes.node = h{k}r.node
),
h{k} AS MATERIALIZED (
  SELECT node, v / (SELECT sqrt(sum(v * v)) FROM h{k}f) AS v FROM h{k}f
)""")
        prev_h = f"h{k}"
    return f"""
WITH e AS MATERIALIZED (
  SELECT c.c_nationkey AS ci, s.s_nationkey AS sj,
         sum(l_extendedprice * (1.0 - l_discount)) AS w
  FROM lineitem
  JOIN orders o ON l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM
    (SELECT ci AS node FROM e UNION SELECT sj AS node FROM e)
),
h0 AS MATERIALIZED (
  SELECT node, 1.0 / sqrt((SELECT CAST(count(*) AS DOUBLE) FROM nodes)) AS v
  FROM nodes
){"".join(steps)}
SELECT CAST(a{_HITS_ITERS}.node AS BIGINT) AS nationkey,
       CAST(floor(a{_HITS_ITERS}.v * 1000000.0 + 0.5) AS BIGINT)
         AS authority_micro,
       CAST(floor(h{_HITS_ITERS}.v * 1000000.0 + 0.5) AS BIGINT) AS hub_micro
FROM a{_HITS_ITERS} JOIN h{_HITS_ITERS}
  ON a{_HITS_ITERS}.node = h{_HITS_ITERS}.node
ORDER BY authority_micro DESC, nationkey ASC LIMIT 5"""


ORACLES223["nation_hits"] = _hits_oracle()


# ---------------------------------------------------------------------------
# docs_jsd_pairs — pairwise Jensen-Shannon divergence between sources
# ---------------------------------------------------------------------------


def q_docs_jsd_pairs(sf_dir: str):
    """The 5 CLOSEST source pairs by Jensen-Shannon divergence between
    unigram distributions (nats): JSD = ½Σp·ln(p/m) + ½Σq·ln(q/m),
    m = (p+q)/2 (zero-probability terms drop). Output: s1, s2, jsd_micro —
    ORDER BY jsd ASC, s1, s2.

    Scale shape: one bounded-vocabulary (source, word, n) combiner; the
    |sources|² pair scan is dense driver numpy."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False), object), counts
        )
        df = pd.DataFrame({"source": src, "w": flat})
        df = df[df["w"] != ""]
        return (
            df.groupby(["source", "w"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["s1", "s2", "jsd_micro"]
    if part.empty:
        return pd.DataFrame(
            {"s1": pd.Series([], dtype=object),
             "s2": pd.Series([], dtype=object),
             "jsd_micro": pd.Series([], dtype=np.int64)}
        )
    tw = part.groupby(["source", "w"])["n"].sum()
    sources = sorted(tw.index.get_level_values(0).unique())
    vocab = sorted(tw.index.get_level_values(1).unique())
    mat = np.zeros((len(sources), len(vocab)), np.float64)
    si = np.array([sources.index(s) for s in tw.index.get_level_values(0)])
    wi = np.array([vocab.index(w) for w in tw.index.get_level_values(1)])
    mat[si, wi] = tw.to_numpy(np.int64)
    p = mat / mat.sum(axis=1)[:, None]
    rows = []
    for i in range(len(sources)):
        for j in range(i + 1, len(sources)):
            pi, qj = p[i], p[j]
            m = (pi + qj) / 2.0
            with np.errstate(invalid="ignore", divide="ignore"):
                t1 = np.where(pi > 0.0, pi * np.log(pi / m), 0.0)
                t2 = np.where(qj > 0.0, qj * np.log(qj / m), 0.0)
            jsd = 0.5 * t1.sum() + 0.5 * t2.sum()
            rows.append(
                (sources[i], sources[j],
                 np.int64(np.floor(jsd * 1_000_000.0 + 0.5)))
            )
    df = pd.DataFrame(rows, columns=cols)
    df = df.sort_values(
        ["jsd_micro", "s1", "s2"], ascending=[True, True, True],
        kind="mergesort",
    ).head(5)
    return df.reset_index(drop=True).astype({"jsd_micro": np.int64})


ORACLES223["docs_jsd_pairs"] = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
tw AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS n
  FROM tok WHERE w <> '' GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n) AS DOUBLE) AS t FROM tw GROUP BY 1),
p AS (
  SELECT tw.source, tw.w, tw.n / tot.t AS p
  FROM tw JOIN tot ON tw.source = tot.source
),
pairs AS (
  SELECT a.source AS s1, b.source AS s2,
         coalesce(a.p, 0.0) AS pa, coalesce(b.p, 0.0) AS pb
  FROM (SELECT x.source, v.w, p.p
        FROM (SELECT DISTINCT source FROM tw) x
        CROSS JOIN (SELECT DISTINCT w FROM tw) v
        LEFT JOIN p ON p.source = x.source AND p.w = v.w) a
  JOIN (SELECT x.source, v.w, p.p
        FROM (SELECT DISTINCT source FROM tw) x
        CROSS JOIN (SELECT DISTINCT w FROM tw) v
        LEFT JOIN p ON p.source = x.source AND p.w = v.w) b
    ON a.w = b.w AND a.source < b.source
),
jsd AS (
  SELECT s1, s2,
         0.5 * sum(CASE WHEN pa > 0.0
                        THEN pa * ln(pa / ((pa + pb) / 2.0)) ELSE 0.0 END)
         + 0.5 * sum(CASE WHEN pb > 0.0
                          THEN pb * ln(pb / ((pa + pb) / 2.0)) ELSE 0.0 END)
           AS j
  FROM pairs GROUP BY 1, 2
)
SELECT s1, s2, CAST(floor(j * 1000000.0 + 0.5) AS BIGINT) AS jsd_micro
FROM jsd ORDER BY jsd_micro ASC, s1 ASC, s2 ASC LIMIT 5"""


QUERIES223 = {
    "nation_hits": q_nation_hits,
    "docs_jsd_pairs": q_docs_jsd_pairs,
}
