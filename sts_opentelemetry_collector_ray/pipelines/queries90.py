"""Driver-contract queries, wave 90 — PMI collocations (the classic
keyphrase/collocation extractor: pointwise mutual information over exact
bigram/unigram counts, candidate-bounded) and supplier HHI by nation (the
Herfindahl–Hirschman market-concentration index from exact integer revenue
shares). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

ORACLES90: dict[str, str] = {}

_PMI_CAND = 1000  # candidate pool: top bigrams by count (documented bound)
_PMI_MIN_SUPPORT = 5
_PMI_TOPK = 20
_PMI_BUCKETS = 64
_HHI_BUCKETS = 32


# ---------------------------------------------------------------------------
# docs_collocations_pmi — top bigram collocations by PMI
# ---------------------------------------------------------------------------


def q_docs_collocations_pmi(sf_dir: str):
    """Collocations: over whitespace tokens (per document, order preserved),
    PMI(a,b) = ln(c_ab · N_uni² / (N_bi · c_a · c_b)) — all counts exact
    integers, one log per candidate, micro-rounded half-up. Candidates are
    the top-{C} bigrams by (count DESC, a, b) with support ≥ {S} (the
    documented bound); output is the top-{K} by (pmi DESC, a, b).

    Scale shape: per-batch bigram-count partials re-reduce in a bigram-hash
    exchange whose buckets own bigrams completely and emit LOCAL
    top-candidates; the ≤ |buckets|·{C} candidate rows reach the driver;
    unigram counts for ONLY the ≤ 2·{C} involved tokens come from a second
    pass with the token set broadcast in the closure.""".format(
        C=_PMI_CAND, S=_PMI_MIN_SUPPORT, K=_PMI_TOPK
    )
    import pyarrow.compute as pc

    def bigram_partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False),
                          dtype=object)
        row = np.repeat(np.arange(len(counts)), counts)
        keep = flat != ""
        flat, row = flat[keep], row[keep]
        same = row[1:] == row[:-1]
        a = flat[:-1][same]
        b = flat[1:][same]
        g = (
            pd.DataFrame({"a": a, "b": b})
            .groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        from ..functions.hashing import fnv1a64_array

        key = (g["a"].astype(str) + "\x00" + g["b"].astype(str)).to_numpy(object)
        g["_b"] = (fnv1a64_array(key) % np.uint64(_PMI_BUCKETS)).astype(np.int64)
        return g

    def bucket_top(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], sort=False, as_index=False)["n"].sum()
        out = out[out["n"] >= _PMI_MIN_SUPPORT]
        return out.sort_values(
            ["n", "a", "b"], ascending=[False, True, True], kind="mergesort"
        ).head(_PMI_CAND)

    cand = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_top, batch_format="pandas")
        .to_pandas()  # bounded: ≤ buckets·CAND rows
        .sort_values(["n", "a", "b"], ascending=[False, True, True],
                     kind="mergesort")
        .head(_PMI_CAND)
    )
    tokens = sorted(set(cand["a"]) | set(cand["b"]))
    tok_set = set(tokens)

    def uni_partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False),
                          dtype=object)
        row = np.repeat(np.arange(len(counts)), counts)
        keep = flat != ""
        flat, row = flat[keep], row[keep]
        n_uni = len(flat)
        n_bi = int((row[1:] == row[:-1]).sum())
        m = np.isin(flat, tokens)
        g = (
            pd.DataFrame({"t": flat[m]})
            .groupby("t", sort=False)
            .size()
            .reset_index(name="c")
        )
        g["c"] = g["c"].astype(np.int64)
        g["n_uni"] = np.int64(0)
        g["n_bi"] = np.int64(0)
        tot = pd.DataFrame(
            {"t": ["\x01TOT"], "c": [0], "n_uni": [n_uni], "n_bi": [n_bi]}
        )
        return pd.concat([g, tot], ignore_index=True)

    uni = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(uni_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ 2·CAND + 1 rows per block
        .groupby("t", as_index=False)[["c", "n_uni", "n_bi"]]
        .sum()
    )
    n_uni = int(uni["n_uni"].sum())
    n_bi = int(uni["n_bi"].sum())
    cmap = dict(zip(uni["t"], uni["c"].astype(int)))
    _ = tok_set
    ca = cand["a"].map(cmap).to_numpy(np.int64)
    cb = cand["b"].map(cmap).to_numpy(np.int64)
    n = cand["n"].to_numpy(np.int64)
    ratio = (
        n.astype(np.float64)
        * float(n_uni)
        * float(n_uni)
        / (float(n_bi) * ca.astype(np.float64) * cb.astype(np.float64))
    )
    pmi = np.floor(np.log(ratio) * 1_000_000.0 + 0.5).astype(np.int64)
    out = cand.assign(pmi_micro=pmi).sort_values(
        ["pmi_micro", "a", "b"], ascending=[False, True, True], kind="mergesort"
    ).head(_PMI_TOPK).reset_index(drop=True)
    return pd.DataFrame(
        {
            "token_a": out["a"].astype(object),
            "token_b": out["b"].astype(object),
            "n_pair": out["n"].to_numpy(np.int64),
            "pmi_micro": out["pmi_micro"].to_numpy(np.int64),
        }
    )


ORACLES90["docs_collocations_pmi"] = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
),
flat AS (
  SELECT doc_id, unnest(w) AS token FROM toks
),
bi AS (
  SELECT pr[1] AS ta, pr[2] AS tb
  FROM (
    SELECT unnest(list_transform(range(len(w) - 1),
             i -> [w[CAST(i AS INT) + 1], w[CAST(i AS INT) + 2]])) AS pr
    FROM toks WHERE len(w) >= 2
  )
),
bc AS (
  SELECT ta, tb, CAST(count(*) AS BIGINT) AS n
  FROM bi GROUP BY 1, 2 HAVING count(*) >= {_PMI_MIN_SUPPORT}
),
cand AS (
  SELECT * FROM bc ORDER BY n DESC, ta, tb LIMIT {_PMI_CAND}
),
uc AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM flat GROUP BY 1),
tot AS (
  SELECT CAST((SELECT count(*) FROM flat) AS DOUBLE) AS n_uni,
         CAST((SELECT count(*) FROM bi) AS DOUBLE) AS n_bi
),
p AS (
  SELECT cand.ta, cand.tb, cand.n,
         CAST(floor(ln(CAST(cand.n AS DOUBLE) * n_uni * n_uni
                       / (n_bi * CAST(ua.c AS DOUBLE)
                          * CAST(ub.c AS DOUBLE)))
                    * 1000000 + 0.5) AS BIGINT) AS pmi_micro
  FROM cand, tot
  JOIN uc ua ON ua.token = cand.ta
  JOIN uc ub ON ub.token = cand.tb
)
SELECT ta AS token_a, tb AS token_b, n AS n_pair, pmi_micro
FROM p ORDER BY pmi_micro DESC, token_a, token_b LIMIT {_PMI_TOPK}"""


# ---------------------------------------------------------------------------
# supplier_hhi_by_nation — Herfindahl concentration of supplier revenue
# ---------------------------------------------------------------------------


def q_supplier_hhi_by_nation(sf_dir: str):
    """Market concentration: per supplier nation, HHI = Σ_i share_i² over
    supplier revenue shares — computed as (Σ rev_i²)·1e6 // (Σ rev_i)² in
    exact big integers (Python/HUGEINT; 1e6 ⇒ a monopoly scores 1_000_000).

    Scale shape: lineitems pre-reduce per suppkey inside batches and share
    ONE suppkey-bucket exchange with the supplier→nation map; each bucket
    owns its suppliers, squares locally and emits per-nation integer
    partials (Σrev, Σrev² as decimal STRINGS to dodge int64 overflow, plus
    counts) — the driver re-reduces ≤ |nations| rows in Python ints."""

    def li_partial(t: pa.Table) -> pd.DataFrame:
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ext * (1.0 - disc) * 1_000_000.0 + 0.5).astype(np.int64)
        g = pd.DataFrame({"sk": sk, "rev": rev}).groupby(
            "sk", sort=False, as_index=False
        ).sum()
        return pd.DataFrame(
            {
                "sk": g["sk"].to_numpy(np.int64),
                "rev": g["rev"].to_numpy(np.int64),
                "nk": np.int64(-1),
                "_b": (g["sk"].to_numpy(np.int64) % _HHI_BUCKETS).astype(np.int64),
            }
        )

    def s_rows(t: pa.Table) -> pd.DataFrame:
        sk = t["s_suppkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "sk": sk,
                "rev": np.int64(0),
                "nk": t["s_nationkey"].to_numpy().astype(np.int64),
                "_b": (sk % _HHI_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.loc[(g["nk"] >= 0).to_numpy(), ["sk", "nk"]]
        li = g.loc[(g["nk"] < 0).to_numpy(), ["sk", "rev"]].groupby(
            "sk", sort=False, as_index=False
        ).sum()
        j = li.merge(s, on="sk")
        rows = []
        for nk, grp in j.groupby("nk", sort=False):
            revs = [int(r) for r in grp["rev"]]
            rows.append(
                {
                    "nk": int(nk),
                    "sr": str(sum(revs)),
                    "sr2": str(sum(r * r for r in revs)),
                    "n": len(revs),
                }
            )
        return pd.DataFrame(rows, columns=["nk", "sr", "sr2", "n"])

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow")
    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(s_rows, batch_format="pyarrow")
    part = (
        li.union(sup)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ≤ |nations| rows per bucket
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    rows = []
    for nk, grp in part.groupby("nk"):
        sr = sum(int(x) for x in grp["sr"])
        sr2 = sum(int(x) for x in grp["sr2"])
        n = int(grp["n"].sum())
        hhi = (sr2 * 1_000_000) // (sr * sr) if sr else 0
        rows.append({"nk": int(nk), "n_suppliers": n, "hhi_micro": int(hhi)})
    out = (
        pd.DataFrame(rows)
        .merge(nat, left_on="nk", right_on="n_nationkey")
        .sort_values("n_name", kind="mergesort")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "nation_name": out["n_name"].astype(object),
            "n_suppliers": out["n_suppliers"].astype(np.int64),
            "hhi_micro": out["hhi_micro"].astype(np.int64),
        }
    )


ORACLES90["supplier_hhi_by_nation"] = """
WITH r AS (
  SELECT l_suppkey AS sk,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000 + 0.5)
                  AS HUGEINT)) AS rev
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT s_nationkey AS nk, rev FROM r JOIN supplier ON s_suppkey = sk
),
a AS (
  SELECT nk, sum(rev) AS sr, sum(rev * rev) AS sr2,
         CAST(count(*) AS BIGINT) AS n
  FROM j GROUP BY 1
)
SELECT n_name AS nation_name, n AS n_suppliers,
       CAST(CASE WHEN sr = 0 THEN 0
                 ELSE (sr2 * 1000000) // (sr * sr) END AS BIGINT) AS hhi_micro
FROM a JOIN nation ON n_nationkey = nk
ORDER BY nation_name"""


QUERIES90 = {
    "docs_collocations_pmi": q_docs_collocations_pmi,
    "supplier_hhi_by_nation": q_supplier_hhi_by_nation,
}
