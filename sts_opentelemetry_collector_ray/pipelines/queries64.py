"""Driver-contract queries, wave 64 — winnowing fingerprints (the MOSS
plagiarism-detection selection rule: rightmost window minimum over k-gram
hashes) and TPC-H Q14-shaped promo revenue share by ship month. Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES64: dict[str, str] = {}

_WIN_K = 5  # k-gram length (chars)
_WIN_W = 4  # winnowing window (positions)
_WIN_DOCS = 200  # same validation slice as docs_ngram_jaccard
_FNV_BASIS = 2166136261
_FNV_PRIME = 16777619
_FNV_MOD = 1 << 32


# ---------------------------------------------------------------------------
# docs_winnow_fingerprints — rightmost-min winnowing over k-gram hashes
# ---------------------------------------------------------------------------


def q_docs_winnow_fingerprints(sf_dir: str):
    """Winnowing (the MOSS fingerprint selection): per doc, hash every
    5-char gram of the whitespace-normalized text with codepoint-FNV-1a32,
    slide a 4-position window, keep the RIGHTMOST minimum of each full
    window, de-duplicate selected (pos, hash) pairs. Reports per doc the
    fingerprint count and their XOR fold (order-independent). Docs with
    fewer than 4 grams have no full window and are excluded — documented
    contract. First 200 docs (the repo's exact-baseline slice).

    Scale shape: per doc, the 5 FNV rounds are vectorized over ALL positions
    at once (codepoint array + 5 fused ops) and the window minimum is one
    ``sliding_window_view`` reduction — no per-position Python."""
    import re

    from numpy.lib.stride_tricks import sliding_window_view

    def fingerprints(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_numpy(zero_copy_only=False)
        rows = []
        for did, txt in zip(ids, texts):
            s = re.sub(r"\s+", " ", (txt or "").lower()).strip()
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            npos = len(codes) - _WIN_K + 1
            if npos < _WIN_W:
                continue
            h = np.full(npos, _FNV_BASIS, dtype=np.uint64)
            for j in range(_WIN_K):
                h = ((h ^ codes[j : j + npos]) * _FNV_PRIME) % _FNV_MOD
            wv = sliding_window_view(h, _WIN_W)
            mn = wv.min(axis=1)
            # rightmost index achieving the min: argmax over reversed equality
            off_from_right = (wv[:, ::-1] == mn[:, None]).argmax(axis=1)
            pos = np.arange(_WIN_W - 1, npos) - off_from_right
            sel = np.unique(np.stack([pos, mn.astype(np.int64)], axis=1), axis=0)
            fp_xor = int(np.bitwise_xor.reduce(sel[:, 1].astype(np.uint64)))
            rows.append((int(did), len(sel), fp_xor))
        return pd.DataFrame(
            {
                "doc_id": np.array([r[0] for r in rows], np.int64),
                "n_fp": np.array([r[1] for r in rows], np.int64),
                "fp_xor": np.array([r[2] for r in rows], np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .sort("doc_id")
        .limit(_WIN_DOCS)
        .map_batches(fingerprints, batch_format="pyarrow")
    )


ORACLES64["docs_winnow_fingerprints"] = f"""
WITH d0 AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS s
  FROM documents ORDER BY doc_id LIMIT {_WIN_DOCS}
),
pos AS (
  -- range() takes only constant args: over-generate and trim to the doc
  SELECT doc_id, CAST(r.range AS BIGINT) + 1 AS p,
         substring(s, CAST(r.range AS INT) + 1, {_WIN_K}) AS gram
  FROM d0 CROSS JOIN range(0, 5000) r
  WHERE r.range <= length(s) - {_WIN_K}
),
h AS (
  SELECT doc_id, p,
         list_reduce(
           list_prepend({_FNV_BASIS}::BIGINT,
             list_transform(string_split(gram, ''), c -> unicode(c)::BIGINT)),
           (acc, x) -> (xor(acc, x) * {_FNV_PRIME}) % {_FNV_MOD}) AS hv
  FROM pos
),
w AS (
  SELECT doc_id, p, hv,
         min(hv) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW)
           AS mn,
         count(*) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN {_WIN_W - 1} PRECEDING AND CURRENT ROW)
           AS wn
  FROM h
),
sel0 AS (SELECT doc_id, p AS endp, mn FROM w WHERE wn = {_WIN_W}),
selpos AS (
  SELECT s.doc_id, s.endp, max(h.p) AS pos, any_value(s.mn) AS hv
  FROM sel0 s JOIN h ON h.doc_id = s.doc_id
   AND h.p BETWEEN s.endp - {_WIN_W - 1} AND s.endp AND h.hv = s.mn
  GROUP BY s.doc_id, s.endp
),
fp AS (SELECT DISTINCT doc_id, pos, hv FROM selpos)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
       CAST(bit_xor(hv) AS BIGINT) AS fp_xor
FROM fp GROUP BY doc_id"""


# ---------------------------------------------------------------------------
# q14_promo_share — promo revenue share by ship month (TPC-H Q14 shape)
# ---------------------------------------------------------------------------


def q_q14_promo_share(sf_dir: str):
    """Q14-shaped report: per ship month, the share of revenue from PROMO
    parts — promo and total revenue in EXACT integer micro-dollars, the
    share as basis points via integer division (20000·promo + total) //
    (2·total), i.e. round-half-up at 1e-4.

    Scale shape: the part→is-promo flag set broadcasts once (`ray.put` of a
    sorted key array); per batch ONE searchsorted membership + month bucket;
    bounded (month × 2) partials, zero shuffles."""
    import ray
    import pyarrow.parquet as pq_mod

    part = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pk = part["p_partkey"].to_numpy()
    promo = np.sort(
        pk[part["p_type"].to_numpy(zero_copy_only=False) == "PROMO"]
    )
    ref = ray.put(promo)

    def partial(t: pa.Table) -> pd.DataFrame:
        pr = ray.get(ref)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        rev = cents * (100 - dpct) * 100
        day_us = pa.compute.cast(t["l_shipdate"], pa.int64()).to_numpy()
        month = (
            pd.to_datetime(day_us, unit="us").to_period("M").astype(str)
        )
        lpk = t["l_partkey"].to_numpy()
        idx = np.searchsorted(pr, lpk)
        hit = np.zeros(len(lpk), dtype=bool)
        inb = idx < len(pr)
        hit[inb] = pr[idx[inb]] == lpk[inb]
        df = pd.DataFrame({"month": month, "promo": hit, "rev": rev})
        g = (
            df.groupby(["month", "promo"], sort=False)["rev"]
            .sum()
            .reset_index()
        )
        g["rev"] = g["rev"].astype(np.int64)
        return g

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: months x 2 per block
        .groupby(["month", "promo"])["rev"]
        .sum()
        .unstack(fill_value=0)
    )
    months = sorted(agg.index)
    rows = []
    for m in months:
        promo_rev = int(agg.loc[m, True]) if True in agg.columns else 0
        other = int(agg.loc[m, False]) if False in agg.columns else 0
        total = promo_rev + other
        share_bp = (20_000 * promo_rev + total) // (2 * total) if total else 0
        rows.append((m, promo_rev, total, share_bp))
    return pd.DataFrame(
        {
            "ship_month": [r[0] for r in rows],
            "promo_micro": np.array([r[1] for r in rows], np.int64),
            "total_micro": np.array([r[2] for r in rows], np.int64),
            "promo_share_bp": np.array([r[3] for r in rows], np.int64),
        }
    )


ORACLES64["q14_promo_share"] = """
WITH r AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         p_type = 'PROMO' AS promo,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) * 100 AS rev
  FROM lineitem JOIN part ON p_partkey = l_partkey
)
SELECT ship_month,
       CAST(coalesce(sum(rev) FILTER (promo), 0) AS BIGINT) AS promo_micro,
       CAST(sum(rev) AS BIGINT) AS total_micro,
       CAST((20000 * coalesce(sum(rev) FILTER (promo), 0) + sum(rev))
            // (2 * sum(rev)) AS BIGINT) AS promo_share_bp
FROM r GROUP BY ship_month ORDER BY ship_month"""


QUERIES64 = {
    "docs_winnow_fingerprints": q_docs_winnow_fingerprints,
    "q14_promo_share": q_q14_promo_share,
}
