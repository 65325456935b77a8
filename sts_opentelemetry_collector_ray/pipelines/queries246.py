"""Driver-contract queries, wave 246 — temperature-sampled domain mixing
weights (the multilingual/data-mixing standard: w_s ∝ n_s^α; Arivazhagan
et al. 2019, Raffel et al. 2020) and a greedy 512-token sequence-packing
audit per source (the LM pretraining packing-efficiency diagnostic;
replayed in SQL with the envelope_pack recursive-CTE pattern).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES246: dict[str, str] = {}

_MIX_ALPHAS = (300, 500, 700)  # milli
_MIX_BUDGET = 1_000_000  # sampled tokens
_PACK_WINDOW = 512


def _source_tokens(sf_dir: str) -> pd.DataFrame:
    """(source, n_docs, n_tokens) fold over whitespace tokens."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        di = np.repeat(np.arange(len(counts)), counts)
        ntok = np.bincount(
            di[flat != ""], minlength=len(counts)
        ).astype(np.int64)
        return pd.DataFrame(
            {"source": np.asarray(
                t["source"].to_numpy(zero_copy_only=False), object
            ),
             "n_docs": np.int64(1), "n_tokens": ntok}
        ).groupby("source", sort=False, as_index=False).sum()

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if part.empty:
        return part
    return part.groupby("source", as_index=False)[["n_docs", "n_tokens"]].sum()


# ---------------------------------------------------------------------------
# docs_temperature_mix — n^α domain sampling weights
# ---------------------------------------------------------------------------


def q_docs_temperature_mix(sf_dir: str):
    """Per (α, source): the temperature-sampled mixing weight w_s =
    n_s^α / Σ_t n_t^α over source token masses for α ∈ {0.3, 0.5, 0.7},
    and the expected sampled tokens under a 1M-token budget — the knob
    that keeps small domains from vanishing at α < 1. Output: alpha_milli,
    source, n_tokens, weight_micro, budget_tokens.

    Scale shape: one (source, tokens) combiner fold; the weight table is
    |α|×|sources| on the driver."""
    g = _source_tokens(sf_dir)
    cols = ["alpha_milli", "source", "n_tokens", "weight_micro",
            "budget_tokens"]
    if g.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    g = g.sort_values("source", kind="mergesort")
    n = g["n_tokens"].to_numpy(np.float64)
    rows = []
    for am in _MIX_ALPHAS:
        p = n ** (am / 1000.0)
        w = p / p.sum()
        for src, nt, wi in zip(g["source"], g["n_tokens"], w):
            rows.append(
                (np.int64(am), src, np.int64(nt),
                 np.int64(np.floor(wi * 1_000_000.0 + 0.5)),
                 np.int64(np.floor(wi * _MIX_BUDGET + 0.5)))
            )
    out = pd.DataFrame(rows, columns=cols)
    return out.astype(
        {c: np.int64 for c in cols if c != "source"}
    )


ORACLES246["docs_temperature_mix"] = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
st AS (
  SELECT source, CAST(sum(CASE WHEN w <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tokens
  FROM tok GROUP BY 1
),
alphas AS (SELECT unnest([{", ".join(str(a) for a in _MIX_ALPHAS)}])
             AS alpha_milli),
p AS (
  SELECT alphas.alpha_milli, st.source, st.n_tokens,
         pow(CAST(st.n_tokens AS DOUBLE), alphas.alpha_milli / 1000.0) AS p
  FROM st, alphas
),
tot AS (SELECT alpha_milli, sum(p) AS z FROM p GROUP BY 1)
SELECT CAST(p.alpha_milli AS BIGINT) AS alpha_milli, p.source, p.n_tokens,
       CAST(floor(p.p / tot.z * 1000000.0 + 0.5) AS BIGINT) AS weight_micro,
       CAST(floor(p.p / tot.z * {_MIX_BUDGET} + 0.5) AS BIGINT)
         AS budget_tokens
FROM p JOIN tot ON p.alpha_milli = tot.alpha_milli
ORDER BY p.alpha_milli, p.source"""


# ---------------------------------------------------------------------------
# docs_seq_packing — greedy 512-token window packing per source
# ---------------------------------------------------------------------------


def q_docs_seq_packing(sf_dir: str):
    """Per source: pack documents into {_PACK_WINDOW}-token training
    windows greedily in doc_id order (a doc that would overflow closes
    the window and starts the next; an oversize doc sits alone in one
    window) — the packing-efficiency audit of an LM data loader. Output:
    source, n_docs, n_tokens, n_bins, efficiency_micro (tokens per
    window capacity; can exceed 1 via oversize docs), n_oversize.

    Scale shape: the per-doc token fold distributes; the greedy scan is
    sequential per source by contract (the scale path shards it by
    source exactly like stages/pack.py shards by data_source)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        di = np.repeat(np.arange(len(counts)), counts)
        ntok = np.bincount(
            di[flat != ""], minlength=len(counts)
        ).astype(np.int64)
        return pd.DataFrame(
            {"source": np.asarray(
                t["source"].to_numpy(zero_copy_only=False), object
            ),
             "doc_id": np.asarray(
                 t["doc_id"].to_numpy(zero_copy_only=False), np.int64
             ),
             "t": ntok}
        )

    per = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["source", "doc_id", "text"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_docs", "n_tokens", "n_bins", "efficiency_micro",
            "n_oversize"]
    if per.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    rows = []
    for src, sub in per.groupby("source", sort=True):
        t = sub.sort_values("doc_id", kind="mergesort")["t"].to_numpy(
            np.int64
        )
        fill = 0
        bins = 0
        for ti in t:
            if bins == 0 or fill + ti > _PACK_WINDOW:
                bins += 1
                fill = int(ti)
            else:
                fill += int(ti)
        total = int(t.sum())
        eff = total / float(bins * _PACK_WINDOW) if bins else 0.0
        rows.append(
            (src, np.int64(len(t)), np.int64(total), np.int64(bins),
             np.int64(np.floor(eff * 1_000_000.0 + 0.5)),
             np.int64((t > _PACK_WINDOW).sum()))
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES246["docs_seq_packing"] = f"""
WITH RECURSIVE tok AS (
  SELECT source, doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents
),
per AS (
  SELECT source, doc_id,
         CAST(sum(CASE WHEN w <> '' THEN 1 ELSE 0 END) AS BIGINT) AS t
  FROM tok GROUP BY 1, 2
),
d AS (
  SELECT source, t,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM per
),
rec AS (
  SELECT source, rn, t AS fill, CAST(1 AS BIGINT) AS bin
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn,
         CASE WHEN rec.fill + d.t <= {_PACK_WINDOW}
              THEN rec.fill + d.t ELSE d.t END,
         rec.bin + CASE WHEN rec.fill + d.t <= {_PACK_WINDOW}
                        THEN 0 ELSE 1 END
  FROM rec JOIN d ON d.source = rec.source AND d.rn = rec.rn + 1
),
agg AS (
  SELECT source, max(bin) AS n_bins FROM rec GROUP BY 1
),
st AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(t) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN t > {_PACK_WINDOW} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_oversize
  FROM per GROUP BY 1
)
SELECT st.source, st.n_docs, st.n_tokens, agg.n_bins,
       CAST(floor(CAST(st.n_tokens AS DOUBLE)
                  / (agg.n_bins * {_PACK_WINDOW}.0) * 1000000.0 + 0.5)
            AS BIGINT) AS efficiency_micro,
       st.n_oversize
FROM st JOIN agg ON st.source = agg.source ORDER BY st.source"""


QUERIES246 = {
    "docs_temperature_mix": q_docs_temperature_mix,
    "docs_seq_packing": q_docs_seq_packing,
}
