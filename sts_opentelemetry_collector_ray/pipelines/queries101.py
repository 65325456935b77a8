"""Driver-contract queries, wave 101 — per-source unigram KL drift (how far
each source's token distribution sits from the corpus mix over the top-20
vocabulary + OTHER: the mixture-monitoring readout data curation tracks) and
token burstiness (Church–Gale variance-to-mean ratio of per-doc counts for
the top tokens — bursty topical words vs uniform function words, PURE
integer end to end). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES101: dict[str, str] = {}

_KL_TOPK = 20
_KL_OTHER = "~~other~~"  # '~' sorts after every lowercase token (binary order)
_VMR_TOPK = 10

# tokenization contract shared with docs_vocab (lower, split \s+, drop empty)
_TOK_DOC_SQL = (
    "SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), "
    "x -> x <> '')) AS token FROM documents"
)


def _top_tokens(sf_dir: str, k: int) -> list[str]:
    """Global top-k tokens by (count desc, token asc) — the docs_vocab
    combiner → hash aggregate → tiny sort, reused as a pre-pass."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def local_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"token": flat}).group_by(["token"]).aggregate([([], "count_all")])
        return g.rename_columns(["token", "pn"])

    top = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return top["token"].tolist()


# ---------------------------------------------------------------------------
# docs_source_kl — per-source KL divergence from the corpus unigram mix
# ---------------------------------------------------------------------------


def q_docs_source_kl(sf_dir: str):
    """KL(source ‖ corpus) over the top-K global token cells plus OTHER:
    the drift score that catches a source whose vocabulary mix slides away
    from the training distribution. Cell counts are exact integers; the
    float terms p·ln(p/q) accumulate in FIXED cell order (binary token
    order, OTHER last) on both sides — the users_entropy technique — and
    the SQL replays the ordered sum via array_agg(… ORDER BY cell) +
    list_sum (the char-entropy precedent). Rounded half-up at 1e-6.

    Scale shape: pass 1 is the docs_vocab top-K (combiner + bounded hash
    aggregate); pass 2 ships per-batch (source, cell, n) partials — at most
    |sources|·(K+1) per block — to a driver fold; no row shuffle."""
    import ray

    top = _top_tokens(sf_dir, _KL_TOPK)
    top_ref = ray.put(np.array(sorted(top), dtype=object))

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        top_ = ray.get(top_ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.combine_chunks().flatten().to_numpy(zero_copy_only=False))
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False)), lens
        )
        keep = flat != ""
        flat, src = flat[keep], src[keep]
        idx = np.minimum(np.searchsorted(top_, flat), len(top_) - 1)
        cell = np.where(
            (len(top_) > 0) & (top_[idx] == flat), flat, _KL_OTHER
        )
        g = (
            pd.DataFrame({"source": src, "cell": cell})
            .groupby(["source", "cell"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "source"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |sources| × (K+1) per block
        .groupby(["source", "cell"])["n"]
        .sum()
    )
    glob = part.groupby("cell").sum()
    n_g = int(glob.sum())
    rows = []
    for source, sgrp in part.groupby("source"):
        s = sgrp.droplevel("source")
        n_s = int(s.sum())
        kl = 0.0
        for cell in sorted(glob.index):  # fixed binary cell order, OTHER last
            ns = int(s.get(cell, 0))
            if ns == 0:
                continue
            ng = int(glob[cell])
            p = ns / n_s
            q = ng / n_g
            kl = kl + p * np.log(p / q)
        rows.append(
            {
                "source": source,
                "n_tokens": n_s,
                "kl": float(np.floor(kl * 1_000_000.0 + 0.5) / 1_000_000.0),
            }
        )
    out = pd.DataFrame(rows, columns=["source", "n_tokens", "kl"])
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out


ORACLES101["docs_source_kl"] = f"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
top AS (
  SELECT token FROM tok GROUP BY token
  ORDER BY count(*) DESC, token LIMIT {_KL_TOPK}
),
cells AS (
  SELECT source,
         CASE WHEN token IN (SELECT token FROM top) THEN token
              ELSE '{_KL_OTHER}' END AS cell
  FROM tok
),
sc AS (SELECT source, cell, CAST(count(*) AS BIGINT) AS ns
       FROM cells GROUP BY 1, 2),
gc AS (SELECT cell, CAST(sum(ns) AS BIGINT) AS ng FROM sc GROUP BY 1),
tots AS (SELECT source, CAST(sum(ns) AS BIGINT) AS n_s FROM sc GROUP BY 1),
gt AS (SELECT CAST(sum(ng) AS BIGINT) AS n_g FROM gc),
terms AS (
  SELECT sc.source, sc.cell,
         (CAST(sc.ns AS DOUBLE) / CAST(t.n_s AS DOUBLE))
           * ln((CAST(sc.ns AS DOUBLE) / CAST(t.n_s AS DOUBLE))
                / (CAST(gc.ng AS DOUBLE) / CAST(g.n_g AS DOUBLE))) AS term
  FROM sc JOIN gc USING (cell) JOIN tots t USING (source), gt g
  WHERE sc.ns > 0
)
SELECT t.source, t.n_s AS n_tokens,
       floor(coalesce(list_sum(list(term ORDER BY cell)), 0.0)
             * 1000000.0 + 0.5) / 1000000.0 AS kl
FROM tots t LEFT JOIN terms USING (source)
GROUP BY 1, 2"""


# ---------------------------------------------------------------------------
# docs_token_burstiness — Church–Gale VMR of per-doc counts, top tokens
# ---------------------------------------------------------------------------


def q_docs_token_burstiness(sf_dir: str):
    """Burstiness of the top-{K} tokens: population variance-to-mean ratio
    of per-document counts (zero-count docs included) — bursty topical
    words score ≫ 1, evenly-spread function words ≲ 1. PURE integer:
    VMR = (N·Σx² − S²)/(N·S) released as round-half-up micro via the
    (2a + b)//(2b) identity.

    Scale shape: docs are single rows, so per-doc counts are complete
    inside each batch; every block emits ≤ {K} partial rows
    (token, Σx, Σx², n_docs) and the driver folds with Python ints —
    no shuffle at all.""".format(K=_VMR_TOPK)
    import ray

    top = _top_tokens(sf_dir, _VMR_TOPK)
    top_ref = ray.put(np.array(sorted(top), dtype=object))

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        top_ = ray.get(top_ref)
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.combine_chunks().flatten().to_numpy(zero_copy_only=False))
        doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        keep = flat != ""
        flat, doc = flat[keep], doc[keep]
        idx = np.minimum(np.searchsorted(top_, flat), max(len(top_) - 1, 0))
        hit = (len(top_) > 0) & (top_[idx] == flat)
        x = (
            pd.DataFrame({"token": flat[hit], "doc": doc[hit]})
            .groupby(["token", "doc"], sort=False)
            .size()
            .rename("x")
            .reset_index()
        )
        g = (
            x.groupby("token", sort=False)["x"]
            .agg(S="sum", S2=lambda v: int((v.to_numpy(np.int64) ** 2).sum()))
            .reset_index()
        )
        g["n_docs"] = np.int64(len(lens))
        g[["S", "S2"]] = g[["S", "S2"]].astype(np.int64)
        # blocks whose docs miss a top token still must count their docs
        missing = sorted(set(top_) - set(g["token"]))
        if missing:
            g = pd.concat(
                [
                    g,
                    pd.DataFrame(
                        {
                            "token": missing,
                            "S": np.zeros(len(missing), np.int64),
                            "S2": np.zeros(len(missing), np.int64),
                            "n_docs": np.full(len(missing), len(lens), np.int64),
                        }
                    ),
                ],
                ignore_index=True,
            )
        return g

    part = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: K rows per block
    )
    rows = []
    for token, grp in sorted(part.groupby("token")):
        S = int(sum(int(v) for v in grp["S"]))
        S2 = int(sum(int(v) for v in grp["S2"]))
        n = int(sum(int(v) for v in grp["n_docs"]))
        if S == 0:
            continue
        a = (n * S2 - S * S) * 1_000_000
        b = n * S
        rows.append(
            {"token": token, "n_occurrences": S, "vmr_micro": (2 * a + b) // (2 * b)}
        )
    out = pd.DataFrame(rows, columns=["token", "n_occurrences", "vmr_micro"])
    return out.astype({"n_occurrences": np.int64, "vmr_micro": np.int64})


ORACLES101["docs_token_burstiness"] = f"""
WITH tok AS ({_TOK_DOC_SQL}),
top AS (
  SELECT token FROM tok GROUP BY token
  ORDER BY count(*) DESC, token LIMIT {_VMR_TOPK}
),
cnt AS (
  SELECT k.token, k.doc_id, CAST(count(*) AS HUGEINT) AS x
  FROM tok k JOIN top USING (token) GROUP BY 1, 2
),
nd AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM documents),
s AS (
  SELECT token, CAST(sum(x) AS HUGEINT) AS S, CAST(sum(x * x) AS HUGEINT) AS S2
  FROM cnt GROUP BY 1
)
SELECT token, CAST(S AS BIGINT) AS n_occurrences,
       CAST((2 * ((n * S2 - S * S) * 1000000) + n * S)
            // (2 * (n * S)) AS BIGINT) AS vmr_micro
FROM s, nd WHERE S > 0"""


QUERIES101 = {
    "docs_source_kl": q_docs_source_kl,
    "docs_token_burstiness": q_docs_token_burstiness,
}
