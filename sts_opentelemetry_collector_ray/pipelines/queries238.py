"""Driver-contract queries, wave 238 — Flesch reading ease per source
(vowel-group syllable approximation; complements the LIX score of wave 49)
and exact through-origin quantile regression of extended price on quantity
(the weighted-quantile-of-ratios closed form; Koenker & Bassett 1978).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES238: dict[str, str] = {}

_QR_TAUS = (500, 900)  # milli


# ---------------------------------------------------------------------------
# docs_flesch — Flesch reading ease per source
# ---------------------------------------------------------------------------


def q_docs_flesch(sf_dir: str):
    """Per source: Flesch reading ease FRE = 206.835 − 1.015·(W/S) −
    84.6·(Syl/W) with S = Σ_doc max(1, sentence-terminator runs), W =
    non-empty whitespace tokens, Syl = Σ_word max(1, [aeiouy]+ runs).
    Output: source, n_docs, n_words, n_syllables, fre_micro.

    Scale shape: per-batch (source, S, W, Syl) partials via Arrow regex
    kernels; one bounded driver fold."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        src = np.asarray(t["source"].to_numpy(zero_copy_only=False), object)
        sents = np.maximum(
            np.asarray(
                pc.count_substring_regex(t["text"], r"[.!?]+").to_numpy(
                    zero_copy_only=False
                ),
                np.int64,
            ),
            1,
        )
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        syl = np.asarray(
            pc.count_substring_regex(flat, r"[aeiouyAEIOUY]+").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        words = np.asarray(flat.to_numpy(zero_copy_only=False), object)
        keep = words != ""
        syl = np.maximum(syl[keep], 1)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        wsrc = np.repeat(src, np.diff(off))[keep]
        df = pd.DataFrame({"source": wsrc, "syl": syl, "w": 1})
        g = df.groupby("source", sort=False).agg(
            n_words=("w", "sum"), n_syl=("syl", "sum")
        )
        g2 = pd.DataFrame({"source": src, "n_docs": 1, "n_sents": sents})
        g2 = g2.groupby("source", sort=False).sum()
        out = g.join(g2, how="outer").fillna(0).reset_index()
        return out.astype(
            {"n_words": np.int64, "n_syl": np.int64, "n_docs": np.int64,
             "n_sents": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_docs", "n_words", "n_syllables", "fre_micro"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "source" else np.int64))
             for c in cols}
        )
    g = part.groupby("source").sum().sort_index()
    w = g["n_words"].to_numpy(np.float64)
    s = g["n_sents"].to_numpy(np.float64)
    syl = g["n_syl"].to_numpy(np.float64)
    fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
    return pd.DataFrame(
        {
            "source": np.asarray(g.index.to_numpy(object)),
            "n_docs": g["n_docs"].to_numpy(np.int64),
            "n_words": g["n_words"].to_numpy(np.int64),
            "n_syllables": g["n_syl"].to_numpy(np.int64),
            "fre_micro": np.floor(fre * 1_000_000.0 + 0.5).astype(np.int64),
        }
    )


ORACLES238["docs_flesch"] = """
WITH d AS (
  SELECT source, text,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents
  FROM documents
),
tok AS (SELECT source, unnest(string_split(text, ' ')) AS t FROM d),
t2 AS (
  SELECT source,
         greatest(len(regexp_extract_all(t, '[aeiouyAEIOUY]+')), 1) AS syl
  FROM tok WHERE t <> ''
),
ws AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS w, sum(CAST(syl AS DOUBLE)) AS syl
  FROM t2 GROUP BY 1
),
ds AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         sum(CAST(sents AS DOUBLE)) AS s
  FROM d GROUP BY 1
)
SELECT ws.source, ds.n_docs,
       CAST(ws.w AS BIGINT) AS n_words,
       CAST(ws.syl AS BIGINT) AS n_syllables,
       CAST(floor((206.835 - 1.015 * (ws.w / ds.s) - 84.6 * (ws.syl / ws.w))
                  * 1000000.0 + 0.5) AS BIGINT) AS fre_micro
FROM ws JOIN ds ON ws.source = ds.source ORDER BY ws.source"""


# ---------------------------------------------------------------------------
# lineitem_quantile_regression — exact τ-quantile slope through the origin
# ---------------------------------------------------------------------------


def q_lineitem_quantile_regression(sf_dir: str):
    """Exact through-origin quantile regression price = b·qty per τ ∈
    {0.5, 0.9}: minimizing Σ ρ_τ(y − b·x) over b with x > 0 is solved by
    the x-weighted τ-quantile of the ratios y/x — the first ratio (sorted
    ascending) whose cumulative weight reaches τ·Σx. Reports the pinball
    loss at the optimum. Output: tau_milli, n, slope_micro, loss_int.

    Scale shape: ratio/weight pairs fold per batch; the sorted scan is a
    vectorized cumsum on the driver (full-detail at sandbox scale; at
    100 TB the same contract runs on a mergeable quantile sketch)."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        x = np.asarray(t["l_quantity"].to_numpy(zero_copy_only=False),
                       np.float64)
        y = np.asarray(t["l_extendedprice"].to_numpy(zero_copy_only=False),
                       np.float64)
        keep = x > 0.0
        return pd.DataFrame({"r": y[keep] / x[keep], "w": x[keep],
                             "y": y[keep]})

    part = (
        ray.data.read_parquet(path, columns=["l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["tau_milli", "n", "slope_micro", "loss_int"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    r = part["r"].to_numpy(np.float64)
    x = part["w"].to_numpy(np.float64)  # weight IS the regressor
    y = part["y"].to_numpy(np.float64)
    order = np.argsort(r, kind="mergesort")
    rs, ws = r[order], x[order]
    cw = np.cumsum(ws)
    wt = float(x.sum())
    rows = []
    for tm in _QR_TAUS:
        tau = tm / 1000.0
        b = float(rs[np.searchsorted(cw, tau * wt)])
        u = y - b * x
        loss = float(np.where(u >= 0.0, tau * u, (tau - 1.0) * u).sum())
        rows.append(
            (np.int64(tm), np.int64(len(r)),
             np.int64(np.floor(b * 1_000_000.0 + 0.5)),
             np.int64(np.floor(loss + 0.5)))
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES238["lineitem_quantile_regression"] = """
WITH pts AS (
  SELECT l_extendedprice / l_quantity AS r, l_quantity AS w,
         l_extendedprice AS y, l_quantity AS x
  FROM lineitem WHERE l_quantity > 0
),
srt AS (
  SELECT r, sum(w) OVER (ORDER BY r
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
  FROM pts
),
tot AS (SELECT sum(w) AS wt, CAST(count(*) AS BIGINT) AS n FROM pts),
taus AS (SELECT unnest([500, 900]) AS tau_milli),
sel AS (
  SELECT taus.tau_milli, tot.n,
         (SELECT min(r) FROM srt, tot t2
          WHERE cw >= taus.tau_milli / 1000.0 * t2.wt) AS b
  FROM taus, tot
),
loss AS (
  SELECT sel.tau_milli, sel.n, sel.b,
         sum(CASE WHEN pts.y - sel.b * pts.x >= 0.0
                  THEN sel.tau_milli / 1000.0 * (pts.y - sel.b * pts.x)
                  ELSE (sel.tau_milli / 1000.0 - 1.0)
                       * (pts.y - sel.b * pts.x) END) AS l
  FROM sel, pts GROUP BY 1, 2, 3
)
SELECT CAST(tau_milli AS BIGINT) AS tau_milli, n,
       CAST(floor(b * 1000000.0 + 0.5) AS BIGINT) AS slope_micro,
       CAST(floor(l + 0.5) AS BIGINT) AS loss_int
FROM loss ORDER BY tau_milli"""


QUERIES238 = {
    "docs_flesch": q_docs_flesch,
    "lineitem_quantile_regression": q_lineitem_quantile_regression,
}
