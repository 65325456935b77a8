"""Driver-contract queries, wave 131 — Kendall tau-b rank correlation between
quantity and discount per returnflag (the concordance companion to wave-130's
Spearman: robust to the monotone-but-nonlinear case), and pairwise per-source
vocabulary Jaccard overlap over documents (the corpus-mixture redundancy map:
how much of two sources' vocabularies coincide). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES131: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_kendall — tie-corrected Kendall tau-b per returnflag
# ---------------------------------------------------------------------------


def q_lineitem_kendall(sf_dir: str):
    """Kendall tau-b with exact tie handling, computed entirely from the
    bounded (flag, quantity, discount) contingency grid: concordant pairs are
    SUM(c[i,j] * prefix[<i,<j]), discordant pairs SUM(c[i,j] * prefix[<i,>j])
    (each unordered pair counted once from its larger-q cell); tie terms come
    from the marginals. All pair counts are exact integers (Python bigint /
    DuckDB HUGEINT); the finish is ONE identical double expression:
    floor((C - D) / (sqrt(n0 - Tx) * sqrt(n0 - Ty)) * 1e6 + 0.5).

    Scale shape: per-batch (flag, quantity, discount, n) combiner partials —
    at most |flags| x 50 x 11 rows per block — fold on the driver; no shuffle.
    """

    def partial(t: pa.Table) -> pd.DataFrame:
        q = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(
            np.int64
        )
        d = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rf = np.asarray(t["l_returnflag"].to_numpy(zero_copy_only=False))
        g = (
            pd.DataFrame({"rf": rf, "q": q, "d": d, "n": 1})
            .groupby(["rf", "q", "d"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"q": np.int64, "d": np.int64, "n": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: <= |flags| x 50 x 11 rows per block
    )
    empty = pd.DataFrame(
        {
            "l_returnflag": pd.Series([], dtype=object),
            "n_rows": pd.Series([], dtype=np.int64),
            "kendall_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    ct = part.groupby(["rf", "q", "d"], sort=True)["n"].sum().reset_index()
    rows: list[tuple[str, int, int]] = []
    for rf, g in ct.groupby("rf", sort=True):
        qs = np.unique(g["q"].to_numpy(np.int64))
        dvals = np.unique(g["d"].to_numpy(np.int64))
        qi = {int(v): i for i, v in enumerate(qs)}
        di = {int(v): i for i, v in enumerate(dvals)}
        M = np.zeros((len(qs), len(dvals)), dtype=np.int64)
        for q, d, c in zip(
            g["q"].to_numpy(np.int64),
            g["d"].to_numpy(np.int64),
            g["n"].to_numpy(np.int64),
        ):
            M[qi[int(q)], di[int(d)]] = int(c)
        # exclusive 2D prefix (counts fit int64: each entry <= group size)
        cum = M.cumsum(axis=0).cumsum(axis=1)  # inclusive
        row_cum = M.cumsum(axis=1)  # inclusive along d
        col_total = M.sum(axis=1)  # per-q totals
        C = D = 0
        for i in range(len(qs)):
            for j in range(len(dvals)):
                c = int(M[i, j])
                if c == 0:
                    continue
                # strictly less in both axes
                less_less = int(cum[i - 1, j - 1]) if i > 0 and j > 0 else 0
                # q' < q and d' > d
                less_greater = (
                    int(col_total[:i].sum()) - int(row_cum[:i, j].sum())
                    if i > 0
                    else 0
                )
                C += c * less_less
                D += c * less_greater
        n = int(M.sum())
        cq = M.sum(axis=1)
        cd = M.sum(axis=0)
        tx = sum(int(c) * (int(c) - 1) // 2 for c in cq)
        ty = sum(int(c) * (int(c) - 1) // 2 for c in cd)
        n0 = n * (n - 1) // 2
        if n0 - tx <= 0 or n0 - ty <= 0:
            continue  # a constant column has no concordance signal
        den = math.sqrt(float(n0 - tx)) * math.sqrt(float(n0 - ty))
        micro = int(math.floor(float(C - D) / den * 1_000_000.0 + 0.5))
        rows.append((str(rf), n, micro))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["l_returnflag", "n_rows", "kendall_micro"])
    return out.astype({"n_rows": np.int64, "kendall_micro": np.int64})


ORACLES131["lineitem_kendall"] = """
WITH li AS (
  SELECT l_returnflag AS rf,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS d
  FROM lineitem
),
ct AS (SELECT rf, q, d, CAST(count(*) AS HUGEINT) AS c FROM li GROUP BY 1, 2, 3),
conc AS (
  SELECT a.rf, sum(a.c * b.c) AS cpairs
  FROM ct a JOIN ct b ON a.rf = b.rf AND b.q < a.q AND b.d < a.d
  GROUP BY 1
),
disc AS (
  SELECT a.rf, sum(a.c * b.c) AS dpairs
  FROM ct a JOIN ct b ON a.rf = b.rf AND b.q < a.q AND b.d > a.d
  GROUP BY 1
),
qm AS (SELECT rf, q, sum(c) AS cq FROM ct GROUP BY 1, 2),
dm AS (SELECT rf, d, sum(c) AS cd FROM ct GROUP BY 1, 2),
tot AS (SELECT rf, sum(c) AS n FROM ct GROUP BY 1),
tx AS (SELECT rf, sum(cq * (cq - 1) // 2) AS t FROM qm GROUP BY 1),
ty AS (SELECT rf, sum(cd * (cd - 1) // 2) AS t FROM dm GROUP BY 1)
SELECT tot.rf AS l_returnflag,
       CAST(tot.n AS BIGINT) AS n_rows,
       CAST(floor(CAST(coalesce(conc.cpairs, 0) - coalesce(disc.dpairs, 0)
                       AS DOUBLE)
                  / (sqrt(CAST(tot.n * (tot.n - 1) // 2 - tx.t AS DOUBLE))
                     * sqrt(CAST(tot.n * (tot.n - 1) // 2 - ty.t AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS kendall_micro
FROM tot
JOIN tx USING (rf)
JOIN ty USING (rf)
LEFT JOIN conc ON conc.rf = tot.rf
LEFT JOIN disc ON disc.rf = tot.rf
WHERE tot.n * (tot.n - 1) // 2 - tx.t > 0
  AND tot.n * (tot.n - 1) // 2 - ty.t > 0"""


# ---------------------------------------------------------------------------
# docs_vocab_overlap — pairwise per-source vocabulary Jaccard
# ---------------------------------------------------------------------------


def q_docs_vocab_overlap(sf_dir: str):
    """Corpus-mixture redundancy map: per source pair (a < b), the distinct
    vocabulary sizes, the shared-word count, and Jaccard |A∩B| / |A∪B| in
    micro units (floor-half-up; ONE double division over exact int64 counts).
    Tokenization matches docs_vocab: lowercase, split on whitespace runs,
    drop empties. Pairs sharing no word are absent (both engines).

    Scale shape: per-batch distinct (source, word) pairs (only the batch-local
    vocabulary leaves each block), ONE word-hash bucket exchange (a word's
    source set lands wholly in one bucket), per-bucket vectorized self-merge
    emits bounded (source_a, source_b, n) partials — |sources|^2 rows per
    bucket (sizes ride along as a == b rows) — folded on the driver. Words
    never land on the driver."""
    from ..functions.hashing import fnv1a32_arrow

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False)), lens
        )
        words = np.asarray(flat.to_numpy(zero_copy_only=False))
        keep = words != ""
        df = pd.DataFrame({"source": src[keep], "word": words[keep]})
        df = df.drop_duplicates(["source", "word"])
        h = fnv1a32_arrow(pa.array(df["word"], type=pa.string()))
        df["_b"] = (h % 64).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.drop_duplicates(["source", "word"])
        # per-source vocabulary sizes ride along as a == b rows
        sz = gg.groupby("source", sort=False).size().reset_index(name="n")
        sz = pd.DataFrame(
            {"source_a": sz["source"], "source_b": sz["source"], "n": sz["n"]}
        )
        m = gg.merge(gg, on="word", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        inter = (
            m.groupby(["source_a", "source_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out = pd.concat([sz, inter], ignore_index=True)
        return out.astype({"n": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= |sources|^2 rows per bucket
    )
    empty = pd.DataFrame(
        {
            "source_a": pd.Series([], dtype=object),
            "source_b": pd.Series([], dtype=object),
            "n_a": pd.Series([], dtype=np.int64),
            "n_b": pd.Series([], dtype=np.int64),
            "n_common": pd.Series([], dtype=np.int64),
            "jaccard_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "source_a" not in part.columns:
        return empty
    fold = (
        part.groupby(["source_a", "source_b"], sort=True)["n"].sum().reset_index()
    )
    sizes = {
        r.source_a: int(r.n)
        for r in fold[fold["source_a"] == fold["source_b"]].itertuples()
    }
    pairs = fold[fold["source_a"] != fold["source_b"]]
    if pairs.empty:
        return empty
    na = pairs["source_a"].map(sizes).to_numpy(np.int64)
    nb = pairs["source_b"].map(sizes).to_numpy(np.int64)
    nc = pairs["n"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "source_a": pairs["source_a"].to_numpy(object),
            "source_b": pairs["source_b"].to_numpy(object),
            "n_a": na,
            "n_b": nb,
            "n_common": nc,
            "jaccard_micro": np.floor(
                nc.astype(np.float64)
                / (na + nb - nc).astype(np.float64)
                * 1_000_000.0
                + 0.5
            ).astype(np.int64),
        }
    )
    return out


ORACLES131["docs_vocab_overlap"] = """
WITH w AS (
  SELECT DISTINCT source, word FROM (
    SELECT source,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS word
    FROM documents)
),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM w GROUP BY 1),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM w a JOIN w b USING (word)
  WHERE a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b, sa.nv AS n_a, sb.nv AS n_b, i.n_common,
       CAST(floor(CAST(i.n_common AS DOUBLE)
                  / CAST(sa.nv + sb.nv - i.n_common AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS jaccard_micro
FROM inter i
JOIN sz sa ON sa.source = i.source_a
JOIN sz sb ON sb.source = i.source_b"""


QUERIES131 = {
    "lineitem_kendall": q_lineitem_kendall,
    "docs_vocab_overlap": q_docs_vocab_overlap,
}
