"""Driver-contract queries, wave 260 — ROUGE-1/ROUGE-2 recall between each
document's halves (Lin 2004; the summarization-eval n-gram overlap metric,
here as an intra-document redundancy probe) and Croston's method (1972) for
intermittent-demand forecasting on the top part's daily ship quantities.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES260: dict[str, str] = {}

_DAY_US = 86_400_000_000
_CROSTON_ALPHA = 0.1


# ---------------------------------------------------------------------------
# docs_rouge_halves — ROUGE-1/2 recall of second half against first half
# ---------------------------------------------------------------------------


def q_docs_rouge_halves(sf_dir: str):
    """ROUGE-N recall treating each document's first half (by word count,
    ceil split) as the reference and the second half as the candidate:
    rougeN = |distinct ref N-grams ∩ distinct cand N-grams| / |distinct
    ref N-grams| for N = 1, 2 (bigrams never cross the half boundary).
    Pure set algebra over exact integer counts; one division per metric.
    Per doc: ref_uni, ov_uni, ref_bi, ov_bi, rouge1_micro, rouge2_micro.

    Scale shape: each document explodes, deduplicates and joins entirely
    WITHIN its batch (vectorized pandas explode + merges); output is one
    row per doc — no shuffle."""

    def per_batch(t: pa.Table) -> pd.DataFrame:
        df = t.select(["doc_id", "text"]).to_pandas()
        cols = {
            "doc_id": np.int64, "ref_uni": np.int64, "ov_uni": np.int64,
            "ref_bi": np.int64, "ov_bi": np.int64,
            "rouge1_micro": np.int64, "rouge2_micro": np.int64,
        }
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
        ws = df["text"].fillna("").str.split(" ")
        n = ws.map(len).to_numpy(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        ex = pd.DataFrame(
            {
                "doc_id": np.repeat(ids, n),
                "w": np.concatenate(ws.to_numpy()),
            }
        )
        ex["pos"] = ex.groupby("doc_id").cumcount().to_numpy(np.int64) + 1
        half = dict(zip(ids, (n + 1) // 2))
        ex["ref"] = ex["pos"] <= ex["doc_id"].map(half).to_numpy(np.int64)
        uni = ex.drop_duplicates(["doc_id", "ref", "w"])
        ref_u = uni[uni["ref"]].groupby("doc_id").size()
        ov_u = (
            uni[uni["ref"]]
            .merge(uni[~uni["ref"]], on=["doc_id", "w"])
            .groupby("doc_id")
            .size()
        )
        nxt_doc = ex["doc_id"].shift(-1)
        nxt_ref = ex["ref"].shift(-1)
        adj = (ex["doc_id"] == nxt_doc) & (ex["ref"] == nxt_ref)
        bi = ex[adj.to_numpy()].copy()
        bi["w2"] = ex["w"].shift(-1)[adj.to_numpy()]
        bi = bi.drop_duplicates(["doc_id", "ref", "w", "w2"])
        ref_b = bi[bi["ref"]].groupby("doc_id").size()
        ov_b = (
            bi[bi["ref"]]
            .merge(bi[~bi["ref"]], on=["doc_id", "w", "w2"])
            .groupby("doc_id")
            .size()
        )
        out = pd.DataFrame({"doc_id": ids})
        for name, s in (
            ("ref_uni", ref_u), ("ov_uni", ov_u),
            ("ref_bi", ref_b), ("ov_bi", ov_b),
        ):
            out[name] = out["doc_id"].map(s).fillna(0).astype(np.int64)
        r1 = out["ov_uni"].to_numpy(np.float64) / out["ref_uni"].to_numpy(np.float64)
        rb = out["ref_bi"].to_numpy(np.float64)
        r2 = np.where(
            rb > 0, out["ov_bi"].to_numpy(np.float64) / np.maximum(rb, 1.0), 0.0
        )
        out["rouge1_micro"] = np.floor(r1 * 1_000_000.0 + 0.5).astype(np.int64)
        out["rouge2_micro"] = np.floor(r2 * 1_000_000.0 + 0.5).astype(np.int64)
        return out

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(per_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


ORACLES260["docs_rouge_halves"] = """
WITH w AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents
),
tok AS (
  SELECT doc_id, unnest(ws) AS w,
         CAST(generate_subscripts(ws, 1) AS BIGINT) AS pos,
         CAST(len(ws) AS BIGINT) AS n
  FROM w
),
lab AS (SELECT doc_id, w, pos, pos <= (n + 1) // 2 AS ref FROM tok),
uni AS (SELECT DISTINCT doc_id, ref, w FROM lab),
ru AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ref_uni FROM uni
       WHERE ref GROUP BY doc_id),
ou AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS ov_uni
  FROM uni a JOIN uni b ON a.doc_id = b.doc_id AND a.w = b.w
  WHERE a.ref AND NOT b.ref GROUP BY a.doc_id
),
big AS (
  SELECT DISTINCT doc_id, ref, w, w2 FROM (
    SELECT doc_id, ref, w,
           lead(w) OVER (PARTITION BY doc_id, ref ORDER BY pos) AS w2
    FROM lab
  ) WHERE w2 IS NOT NULL
),
rb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ref_bi FROM big
       WHERE ref GROUP BY doc_id),
ob AS (
  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS ov_bi
  FROM big a JOIN big b
    ON a.doc_id = b.doc_id AND a.w = b.w AND a.w2 = b.w2
  WHERE a.ref AND NOT b.ref GROUP BY a.doc_id
)
SELECT d.doc_id,
       coalesce(ru.ref_uni, 0) AS ref_uni,
       coalesce(ou.ov_uni, 0) AS ov_uni,
       coalesce(rb.ref_bi, 0) AS ref_bi,
       coalesce(ob.ov_bi, 0) AS ov_bi,
       CAST(floor(CAST(coalesce(ou.ov_uni, 0) AS DOUBLE)
                  / CAST(coalesce(ru.ref_uni, 1) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rouge1_micro,
       CAST(floor(CASE WHEN coalesce(rb.ref_bi, 0) > 0
                       THEN CAST(coalesce(ob.ov_bi, 0) AS DOUBLE)
                            / CAST(rb.ref_bi AS DOUBLE)
                       ELSE 0.0 END * 1000000.0 + 0.5) AS BIGINT)
         AS rouge2_micro
FROM documents d
LEFT JOIN ru USING (doc_id) LEFT JOIN ou USING (doc_id)
LEFT JOIN rb USING (doc_id) LEFT JOIN ob USING (doc_id)
ORDER BY d.doc_id"""


# ---------------------------------------------------------------------------
# orders_croston — Croston's intermittent-demand forecast for the top part
# ---------------------------------------------------------------------------


def q_orders_croston(sf_dir: str):
    """Croston's method on the modal part (most lineitems; tie → smallest
    partkey): nonzero daily ship quantities z₁..z_m at day offsets
    t₁<…<t_m. Init ẑ = z₁, p̂ = 1; for i ≥ 2: ẑ += α(zᵢ−ẑ),
    p̂ += α((tᵢ−tᵢ₋₁)−p̂) with α = 0.1; forecast per period = ẑ/p̂.
    Both sides run the IDENTICAL sequential fold (Python loop here,
    `list_reduce` over an ordered DOUBLE-list in SQL), so the recursion
    replays bit-for-bit. One row: partkey, m_days, z_hat_micro,
    p_hat_micro, forecast_micro.

    Scale shape: part selection is a (partkey → count) combiner partial;
    the chosen part's (day → qty) series is a second bounded partial; the
    fold runs over ≤ |days| points on the driver."""

    sel = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
        .map_batches(
            lambda t: (
                t.to_pandas()
                .groupby("l_partkey", as_index=False)
                .size()
                .rename(columns={"size": "n"})
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cols = ["partkey", "m_days", "z_hat_micro", "p_hat_micro", "forecast_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if sel.empty:
        return empty
    agg = sel.groupby("l_partkey")["n"].sum()
    top = agg.sort_index().sort_values(kind="mergesort", ascending=False)
    partkey = int(top.index[0])

    def day_qty(t: pa.Table) -> pd.DataFrame:
        # take day offsets off the Arrow µs representation — pandas would
        # silently convert to ns and shift the day arithmetic
        days_us = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        sel_mask = pk == partkey
        if not sel_mask.any():
            return pd.DataFrame(
                {"t": pd.Series([], dtype=np.int64),
                 "z": pd.Series([], dtype=np.int64)}
            )
        d = (days_us[sel_mask] // _DAY_US).astype(np.int64)
        q = qty[sel_mask].astype(np.int64)
        out = pd.DataFrame({"t": d, "z": q}).groupby("t", as_index=False)["z"].sum()
        return out.astype({"t": np.int64, "z": np.int64})

    dd = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_quantity"],
        )
        .map_batches(day_qty, batch_format="pyarrow")
        .to_pandas()
        .groupby("t")["z"]
        .sum()
        .sort_index()
    )
    if dd.empty:
        return empty
    t = dd.index.to_numpy(np.int64)
    z = dd.to_numpy(np.int64)
    zh = float(z[0])
    ph = 1.0
    for i in range(1, len(z)):
        zh = zh + _CROSTON_ALPHA * (float(z[i]) - zh)
        ph = ph + _CROSTON_ALPHA * (float(t[i] - t[i - 1]) - ph)
    return pd.DataFrame(
        {
            "partkey": [np.int64(partkey)],
            "m_days": [np.int64(len(z))],
            "z_hat_micro": [np.int64(np.floor(zh * 1_000_000.0 + 0.5))],
            "p_hat_micro": [np.int64(np.floor(ph * 1_000_000.0 + 0.5))],
            "forecast_micro": [np.int64(np.floor(zh / ph * 1_000_000.0 + 0.5))],
        }
    )


ORACLES260["orders_croston"] = f"""
WITH top_part AS (
  SELECT l_partkey FROM lineitem GROUP BY 1
  ORDER BY count(*) DESC, l_partkey LIMIT 1
),
dd AS (
  SELECT epoch_us(l_shipdate) // {_DAY_US} AS t,
         CAST(sum(l_quantity) AS BIGINT) AS z
  FROM lineitem WHERE l_partkey = (SELECT l_partkey FROM top_part)
  GROUP BY 1
),
seq AS (
  SELECT t, z, lag(t) OVER (ORDER BY t) AS tprev,
         row_number() OVER (ORDER BY t) AS i
  FROM dd
),
steps AS (
  SELECT coalesce(
           list([CAST(z AS DOUBLE), CAST(t - tprev AS DOUBLE)] ORDER BY t),
           []) AS es,
         CAST(count(*) AS BIGINT) AS m1
  FROM seq WHERE i > 1
),
z1 AS (SELECT CAST(z AS DOUBLE) AS v FROM seq WHERE i = 1),
fit AS (
  SELECT m1 + 1 AS m_days,
         list_reduce(
           list_prepend([z1.v, CAST(1.0 AS DOUBLE)], es),
           (acc, e) -> [acc[1] + CAST({_CROSTON_ALPHA} AS DOUBLE)
                          * (e[1] - acc[1]),
                        acc[2] + CAST({_CROSTON_ALPHA} AS DOUBLE)
                          * (e[2] - acc[2])]) AS zp
  FROM steps, z1
)
SELECT CAST((SELECT l_partkey FROM top_part) AS BIGINT) AS partkey,
       m_days,
       CAST(floor(zp[1] * 1000000.0 + 0.5) AS BIGINT) AS z_hat_micro,
       CAST(floor(zp[2] * 1000000.0 + 0.5) AS BIGINT) AS p_hat_micro,
       CAST(floor(zp[1] / zp[2] * 1000000.0 + 0.5) AS BIGINT)
         AS forecast_micro
FROM fit"""


QUERIES260 = {
    "docs_rouge_halves": q_docs_rouge_halves,
    "orders_croston": q_orders_croston,
}
