"""Driver-contract queries, wave 89 — stylometry outliers (function-word
frequency profiles vs the corpus profile, exact micro L1 distance: the
authorship/style-drift screen) and degree assortativity of the
customer↔supplier graph (the single-number mixing coefficient — do
high-degree nodes trade with high-degree nodes?). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES89: dict[str, str] = {}

_STY_WORDS = ["the", "of", "and", "to", "in", "a", "is", "that", "it", "for"]
_STY_TOPK = 20
_ASSORT_BUCKETS = 32


# ---------------------------------------------------------------------------
# docs_stylometry_outliers — function-word profile distance, top-20
# ---------------------------------------------------------------------------


def q_docs_stylometry_outliers(sf_dir: str):
    """Stylometry screen: per document, the micro frequency of ten function
    words ((count·1e6)//n_tokens) and the corpus-wide profile from GLOBAL
    integer sums; the L1 distance Σ|f_doc − f_corpus| ranks the top-20
    style outliers (distance DESC, doc_id ASC). Empty docs are excluded.

    Scale shape: pass 1 reduces the corpus to 11 integers (Σ count per word,
    Σ tokens) via per-batch partials; the micro profile broadcasts in the
    closure; pass 2 computes per-batch distances with ten vectorized mask
    bincounts and emits LOCAL top-20 partials — the driver merges
    blocks×20 rows."""
    import pyarrow.compute as pc

    def tok_counts(t: pa.Table):
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        flat_np = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        keep = flat_np != ""
        row = np.repeat(np.arange(len(counts)), counts)[keep]
        flat_np = flat_np[keep]
        n_tok = np.bincount(row, minlength=len(counts)).astype(np.int64)
        per_word = np.zeros((len(counts), len(_STY_WORDS)), np.int64)
        for i, w in enumerate(_STY_WORDS):
            m = flat_np == w
            if m.any():
                per_word[:, i] = np.bincount(row[m], minlength=len(counts))
        return n_tok, per_word

    def prof_partial(t: pa.Table) -> pd.DataFrame:
        n_tok, per_word = tok_counts(t)
        return pd.DataFrame(
            {
                "w": np.arange(len(_STY_WORDS) + 1, dtype=np.int64),
                "s": np.concatenate(
                    [per_word.sum(axis=0), [int(n_tok.sum())]]
                ).astype(np.int64),
            }
        )

    prof = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(prof_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: 11 rows per block
        .groupby("w")["s"]
        .sum()
    )
    tot = int(prof.loc[len(_STY_WORDS)])
    corpus = np.array(
        [int(prof.loc[i]) * 1_000_000 // tot for i in range(len(_STY_WORDS))],
        np.int64,
    )

    def dist_partial(t: pa.Table) -> pd.DataFrame:
        n_tok, per_word = tok_counts(t)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        nz = n_tok > 0
        f = (per_word[nz] * 1_000_000) // np.maximum(n_tok[nz, None], 1)
        dist = np.abs(f - corpus[None, :]).sum(axis=1)
        ids, n = ids[nz], n_tok[nz]
        o = np.lexsort((ids, -dist))[: _STY_TOPK]
        return pd.DataFrame(
            {
                "doc_id": ids[o],
                "n_tokens": n[o],
                "l1_micro": dist[o].astype(np.int64),
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(dist_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ 20 rows per block
        .sort_values(["l1_micro", "doc_id"], ascending=[False, True],
                     kind="mergesort")
        .head(_STY_TOPK)
        .reset_index(drop=True)
    )
    for c in part.columns:
        part[c] = part[c].astype(np.int64)
    return part


def _stylometry_oracle() -> str:
    wc = ",\n         ".join(
        f"CAST(count(*) FILTER (token = '{w}') AS HUGEINT) AS c{i}"
        for i, w in enumerate(_STY_WORDS)
    )
    corp = ", ".join(
        f"sum(c{i}) * 1000000 // sum(n) AS f{i}"
        for i in range(len(_STY_WORDS))
    )
    dist = " + ".join(
        f"abs(d.c{i} * 1000000 // d.n - p.f{i})" for i in range(len(_STY_WORDS))
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
d AS (
  SELECT doc_id, CAST(count(*) AS HUGEINT) AS n,
         {wc}
  FROM toks GROUP BY 1
),
p AS (SELECT {corp} FROM d),
l AS (
  SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
         CAST({dist} AS BIGINT) AS l1_micro
  FROM d, p WHERE d.n > 0
)
SELECT doc_id, n_tokens, l1_micro
FROM l ORDER BY l1_micro DESC, doc_id ASC LIMIT {_STY_TOPK}"""


ORACLES89["docs_stylometry_outliers"] = _stylometry_oracle()


# ---------------------------------------------------------------------------
# graph_assortativity — degree mixing of the customer↔supplier graph
# ---------------------------------------------------------------------------


def q_graph_assortativity(sf_dir: str):
    """Degree assortativity r of the undirected bipartite trade graph
    (distinct customer↔supplier pairs): Pearson correlation of endpoint
    degrees over directed edge ends, computed from EXACT integer sums
    (Python ints on the ≤|buckets| driver partials — overflow-free), one
    float division at the end, micro-floored.

    Scale shape: distinct pairs form via an orderkey-bucket join then a
    pair-hash dedup exchange; node degrees come from a node-bucket count;
    two more bounded exchanges attach deg(src)/deg(dst) to each edge and
    emit FOUR integer partials per bucket."""

    def li_rows(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "k": t["l_orderkey"].to_numpy().astype(np.int64),
                "s": t["l_suppkey"].to_numpy().astype(np.int64),
            }
        ).drop_duplicates()
        g["c"] = np.int64(-1)
        g["_b"] = (g["k"].to_numpy(np.int64) % _ASSORT_BUCKETS).astype(np.int64)
        return g

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "k": k,
                "s": np.int64(-1),
                "c": t["o_custkey"].to_numpy().astype(np.int64),
                "_b": (k % _ASSORT_BUCKETS).astype(np.int64),
            }
        )

    def join_pairs(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[(g["c"] >= 0).to_numpy(), ["k", "c"]]
        li = g.loc[(g["c"] < 0).to_numpy(), ["k", "s"]]
        j = li.merge(o, on="k")[["c", "s"]].drop_duplicates()
        j["_b"] = (
            (j["c"].to_numpy(np.int64) * 1_000_003 + j["s"].to_numpy(np.int64))
            % _ASSORT_BUCKETS
        ).astype(np.int64)
        return j

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        j = g[["c", "s"]].drop_duplicates()
        return pd.DataFrame(
            {
                "c": j["c"].to_numpy(np.int64),
                "s": j["s"].to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(li_rows, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(o_rows, batch_format="pyarrow")
    pairs = (
        li.union(o)
        .groupby("_b")
        .map_groups(join_pairs, batch_format="pandas")
        .groupby("_b")
        .map_groups(dedup_pairs, batch_format="pandas")
        .materialize()
    )

    # attach deg(c): bucket exchange 1 owns customers, exchange 2 owns
    # suppliers — transform('size') inside a bucket IS the global degree and
    # nunique sums across buckets are exact.
    def by_c(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["c", "s"]].copy()
        out["_b"] = (out["c"].to_numpy(np.int64) % _ASSORT_BUCKETS).astype(
            np.int64
        )
        return out

    def attach_du(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("c", sort=False)["s"].transform("size").to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "c": g["c"].to_numpy(np.int64),
                "s": g["s"].to_numpy(np.int64),
                "du": d,
            }
        )
        out["_b"] = (out["s"].to_numpy(np.int64) % _ASSORT_BUCKETS).astype(
            np.int64
        )
        return out

    def attach_dv_and_sum(g: pd.DataFrame) -> pd.DataFrame:
        dv = g.groupby("s", sort=False)["c"].transform("size").to_numpy(np.int64)
        du = g["du"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "sxy": [int((du * dv).sum())],
                "sx": [int((du + dv).sum())],
                "sx2": [int((du * du + dv * dv).sum())],
                "m": [2 * len(g)],
                "ns": [int(g["s"].nunique())],
            }
        )

    part = (
        pairs.map_batches(by_c, batch_format="pandas")
        .groupby("_b")
        .map_groups(attach_du, batch_format="pandas")
        .groupby("_b")
        .map_groups(attach_dv_and_sum, batch_format="pandas")
        .to_pandas()  # bounded: one row per bucket
    )
    M = int(part["m"].sum())
    Sxy = 2 * int(part["sxy"].sum())
    Sx = int(part["sx"].sum())
    Sx2 = int(part["sx2"].sum())
    n_supp = int(part["ns"].sum())
    n_cust = int(
        pairs.map_batches(by_c, batch_format="pandas")
        .groupby("_b")
        .map_groups(
            lambda g: pd.DataFrame({"n": [int(g["c"].nunique())]}),
            batch_format="pandas",
        )
        .to_pandas()["n"]
        .sum()
    )
    num = M * Sxy - Sx * Sx
    den = M * Sx2 - Sx * Sx
    r = float(num) / float(den) if den else 0.0
    return pd.DataFrame(
        {
            "n_edges": np.array([M // 2], np.int64),
            "n_customers": np.array([n_cust], np.int64),
            "n_suppliers": np.array([n_supp], np.int64),
            "assortativity_micro": np.array(
                [int(np.floor(r * 1_000_000 + 0.5))], np.int64
            ),
        }
    )


ORACLES89["graph_assortativity"] = """
WITH p AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
dc AS (SELECT c, CAST(count(*) AS HUGEINT) AS d FROM p GROUP BY 1),
ds AS (SELECT s, CAST(count(*) AS HUGEINT) AS d FROM p GROUP BY 1),
e AS (
  SELECT dc.d AS du, ds.d AS dv
  FROM p JOIN dc ON dc.c = p.c JOIN ds ON ds.s = p.s
),
a AS (
  SELECT CAST(2 * count(*) AS HUGEINT) AS m,
         2 * sum(du * dv) AS sxy,
         sum(du + dv) AS sx,
         sum(du * du + dv * dv) AS sx2
  FROM e
)
SELECT CAST(m // 2 AS BIGINT) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM dc) AS n_customers,
       (SELECT CAST(count(*) AS BIGINT) FROM ds) AS n_suppliers,
       CAST(floor(CASE WHEN m * sx2 - sx * sx = 0 THEN 0.0
                       ELSE CAST(m * sxy - sx * sx AS DOUBLE)
                            / CAST(m * sx2 - sx * sx AS DOUBLE) END
                  * 1000000 + 0.5) AS BIGINT) AS assortativity_micro
FROM a"""


QUERIES89 = {
    "docs_stylometry_outliers": q_docs_stylometry_outliers,
    "graph_assortativity": q_graph_assortativity,
}
