"""Driver-contract queries, wave 377 — Burrows' Delta stylometric
distance between document sources (top-50 corpus words, z-scored
relative frequencies) and the supplier-part bipartite degree census
from distinct lineitem pairs. Same contract as queries.py: column
names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES377: dict[str, str] = {}

_BD_TOP = 50


# ---------------------------------------------------------------------------
# docs_burrows_delta_src — stylometric distance between sources
# ---------------------------------------------------------------------------


def q_docs_burrows_delta_src(sf_dir: str):
    """Burrows' Delta: over the top-50 corpus words (count desc, word
    asc), each source's relative frequency is z-scored against the
    across-source population mean/std of that word (folds in source
    order); Delta(a, b) = mean |z_a - z_b| over usable words (std >
    0). Counts exact, floats mirrored. Per pair: source_a, source_b,
    n_words_used, delta_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), lens)
        keep = flat != ""
        g = (
            pd.DataFrame({"src": src[keep], "w": flat[keep]})
            .groupby(["src", "w"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    wc = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["src", "w"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["source_a", "source_b", "n_words_used", "delta_milli"]
    empty = pd.DataFrame(
        {
            "source_a": pd.Series([], dtype=object),
            "source_b": pd.Series([], dtype=object),
            "n_words_used": pd.Series([], dtype=np.int64),
            "delta_milli": pd.Series([], dtype=np.int64),
        }
    )
    if wc.empty:
        return empty
    srcs = sorted(wc["src"].unique())
    k = len(srcs)
    if k < 2:
        return empty
    totals = wc.groupby("src")["c"].sum()
    corpus = wc.groupby("w")["c"].sum().reset_index()
    corpus = corpus.sort_values(
        ["c", "w"], ascending=[False, True]
    ).head(_BD_TOP)
    top = list(corpus["w"])
    freq = {
        (s_, w_): int(c_)
        for s_, w_, c_ in zip(wc["src"], wc["w"], wc["c"])
    }
    # per top word: rel freqs per source (source order), mean/std
    z = {}
    used = []
    for w_ in top:
        fs = [
            float(freq.get((s_, w_), 0)) / float(int(totals[s_]))
            for s_ in srcs
        ]
        mu = 0.0
        for f in fs:
            mu = mu + f
        mu = mu / float(k)
        var = 0.0
        for f in fs:
            var = var + (f - mu) * (f - mu)
        var = var / float(k)
        if var <= 0.0:
            continue
        sd = float(np.sqrt(var))
        z[w_] = {s_: (f - mu) / sd for s_, f in zip(srcs, fs)}
        used.append(w_)
    if not used:
        return empty
    rows = []
    for a, b in itertools.combinations(srcs, 2):
        acc = 0.0
        for w_ in used:  # top-list order (count desc, word asc)
            acc = acc + abs(z[w_][a] - z[w_][b])
        rows.append(
            (
                a, b, np.int64(len(used)),
                np.int64(np.floor(
                    acc / float(len(used)) * 1_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_words_used": np.int64, "delta_milli": np.int64}
    )


ORACLES377["docs_burrows_delta_src"] = rf"""
WITH tok AS (
  SELECT source AS src,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
wc AS (
  SELECT src, w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
),
totals AS (SELECT src, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY 1),
kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM totals),
top AS (
  SELECT w, row_number() OVER (ORDER BY sum(c) DESC, w) AS ord
  FROM wc GROUP BY w
  QUALIFY ord <= {_BD_TOP}
),
rel AS (
  SELECT top.w, top.ord, totals.src,
         CAST(coalesce(wc.c, 0) AS DOUBLE) / totals.n AS f
  FROM top CROSS JOIN totals
  LEFT JOIN wc ON wc.src = totals.src AND wc.w = top.w
),
mu AS (
  SELECT w, ord,
         list_reduce(list_prepend(0.0, list(f ORDER BY src)),
                     (a, b) -> a + b) / kk.k AS mu
  FROM rel, kk GROUP BY w, ord, kk.k
),
sd AS (
  SELECT rel.w, rel.ord, mu.mu,
         sqrt(list_reduce(list_prepend(0.0,
                list((rel.f - mu.mu) * (rel.f - mu.mu) ORDER BY rel.src)),
                (a, b) -> a + b) / kk.k) AS sd
  FROM rel JOIN mu USING (w, ord), kk
  GROUP BY rel.w, rel.ord, mu.mu, kk.k
),
z AS (
  SELECT rel.src, rel.w, rel.ord, (rel.f - sd.mu) / sd.sd AS z
  FROM rel JOIN sd USING (w, ord)
  WHERE sd.sd > 0
),
pairs AS (
  SELECT a.src AS sa, b.src AS sb
  FROM totals a JOIN totals b ON a.src < b.src
),
delta AS (
  SELECT p.sa, p.sb,
         CAST(count(*) AS BIGINT) AS nw,
         list_reduce(list_prepend(0.0,
           list(abs(za.z - zb.z) ORDER BY za.ord)),
           (x, y) -> x + y) AS acc
  FROM pairs p
  JOIN z za ON za.src = p.sa
  JOIN z zb ON zb.src = p.sb AND zb.w = za.w
  GROUP BY 1, 2
)
SELECT sa AS source_a, sb AS source_b, nw AS n_words_used,
       CAST(floor(acc / nw * 1000.0 + 0.5) AS BIGINT) AS delta_milli
FROM delta
WHERE nw > 0
ORDER BY source_a, source_b"""


# ---------------------------------------------------------------------------
# supplier_part_degree_census — bipartite degree distributions
# ---------------------------------------------------------------------------


def q_supplier_part_degree_census(sf_dir: str):
    """Bipartite structure: distinct (supplier, part) edges from
    lineitem; the degree histogram on each side. Pure integers. Per
    row: side, degree, n_nodes."""

    def partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "sk": t["l_suppkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "pk": t["l_partkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
            }
        ).drop_duplicates()

    edges = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["side", "degree", "n_nodes"]
    empty = pd.DataFrame(
        {
            "side": pd.Series([], dtype=object),
            "degree": pd.Series([], dtype=np.int64),
            "n_nodes": pd.Series([], dtype=np.int64),
        }
    )
    if edges.empty:
        return empty
    sdeg = edges.groupby("sk").size()
    pdeg = edges.groupby("pk").size()
    rows = []
    for side, deg in (("part", pdeg), ("supplier", sdeg)):
        h = deg.groupby(deg).size()
        for d_ in sorted(h.index):
            rows.append((side, np.int64(int(d_)), np.int64(int(h[d_]))))
    return pd.DataFrame(rows, columns=cols).astype(
        {"degree": np.int64, "n_nodes": np.int64}
    )


ORACLES377["supplier_part_degree_census"] = """
WITH e AS (
  SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem
),
sdeg AS (SELECT sk, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
pdeg AS (SELECT pk, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1)
SELECT 'part' AS side, d AS degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM pdeg GROUP BY 2
UNION ALL
SELECT 'supplier', d, CAST(count(*) AS BIGINT) FROM sdeg GROUP BY 2
ORDER BY side, degree"""


QUERIES377 = {
    "docs_burrows_delta_src": q_docs_burrows_delta_src,
    "supplier_part_degree_census": q_supplier_part_degree_census,
}
