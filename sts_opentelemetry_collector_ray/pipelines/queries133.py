"""Driver-contract queries, wave 133 — SAX symbolization of the per-type daily
event series (Lin et al. 2003: z-normalize, then map to a fixed alphabet by
standard-normal breakpoints — the representation behind time-series indexing
and motif mining), and reciprocal-rank fusion of two retrieval rankings over
documents (Cormack et al. 2009: the standard hybrid-retrieval combiner). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES133: dict[str, str] = {}

_DAY_US = 86_400_000_000
# standard-normal quartile breakpoint for a 4-letter SAX alphabet
_SAX_BP = 0.6744897501960817


# ---------------------------------------------------------------------------
# events_sax_daily — per-type SAX symbols over the daily count series
# ---------------------------------------------------------------------------


def q_events_sax_daily(sf_dir: str):
    """SAX over observed days: per event_type, the daily count series
    z-normalizes with population moments and maps to {a, b, c, d} by the
    standard-normal quartile breakpoints. The z-score is computed as ONE
    exact-integer expression finished by ONE double division on both engines:
    z = (x * n - sx) / sqrt(n * sxx - sx^2)  (algebraically (x - mean) / std).

    Scale shape: per-batch (type, day, n) combiner partials — |types| x |days|
    rows per block — fold on the driver; the z/symbol math runs on the bounded
    grid. Types with a constant series (zero variance) are absent on both
    engines."""

    def partial(t: pa.Table) -> pd.DataFrame:
        day = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
        )
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "day": day,
                    "n": 1,
                }
            )
            .groupby(["event_type", "day"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g.astype({"day": np.int64, "n": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: <= |types| x |days| rows per block
    )
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "day": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "symbol": pd.Series([], dtype=object),
        }
    )
    if part.empty:
        return empty
    grid = part.groupby(["event_type", "day"], sort=True)["n"].sum().reset_index()
    frames = []
    for et, g in grid.groupby("event_type", sort=True):
        x = [int(v) for v in g["n"]]
        n, sx, sxx = len(x), sum(x), sum(v * v for v in x)
        dvar = n * sxx - sx * sx
        if dvar <= 0:
            continue  # constant series: no z-scale
        den = math.sqrt(float(dvar))
        z = np.array([float(v * n - sx) / den for v in x])
        sym = np.where(
            z < -_SAX_BP, "a", np.where(z < 0.0, "b", np.where(z < _SAX_BP, "c", "d"))
        )
        frames.append(
            pd.DataFrame(
                {
                    "event_type": et,
                    "day": g["day"].to_numpy(np.int64),
                    "n_events": g["n"].to_numpy(np.int64),
                    "symbol": sym.astype(object),
                }
            )
        )
    if not frames:
        return empty
    out = pd.concat(frames, ignore_index=True)
    return out.astype({"day": np.int64, "n_events": np.int64})


ORACLES133["events_sax_daily"] = f"""
WITH d AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(count(*) AS HUGEINT) AS x
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(x * x) AS sxx
  FROM d GROUP BY 1
),
z AS (
  SELECT d.event_type, d.day, d.x,
         CAST(d.x * m.n - m.sx AS DOUBLE)
           / sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) AS zz
  FROM d JOIN m USING (event_type)
  WHERE m.n * m.sxx - m.sx * m.sx > 0
)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(x AS BIGINT) AS n_events,
       CASE WHEN zz < -{_SAX_BP!r} THEN 'a'
            WHEN zz < 0.0 THEN 'b'
            WHEN zz < {_SAX_BP!r} THEN 'c'
            ELSE 'd' END AS symbol
FROM z"""


# ---------------------------------------------------------------------------
# docs_rrf_fusion — reciprocal-rank fusion of BM25 and a length-prior ranking
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPN = 100  # per-leg ranking depth
_RRF_OUT = 20


def q_docs_rrf_fusion(sf_dir: str):
    """Hybrid retrieval: leg A ranks the corpus by BM25 against the fixed
    query-term set (reusing docs_bm25's scoring pipeline verbatim), leg B by
    the n_chars length prior; each leg keeps its top-100 (score desc, doc_id
    tiebreak), and RRF fuses them with the standard k=60 kernel
    s = 1/(60+rank_a) + 1/(60+rank_b) (missing leg contributes 0). Output is
    the fused top-20 with per-leg ranks (0 = absent from that leg's top-100)
    and the fused score in 1e-8 units.

    Scale shape: each leg is a streaming per-batch local top-100 combiner —
    only |batches| x 100 (doc_id, score) rows reach the driver; the fuse step
    is a 200-row merge. Corpus text/scores never land on the driver."""
    from .queries15 import q_docs_bm25

    bm = q_docs_bm25(sf_dir)

    def local_top_bm(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "bm25": t["bm25"].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(
            ["bm25", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(_RRF_TOPN)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    bm_top = (
        bm.map_batches(local_top_bm, batch_format="pyarrow")
        .to_pandas()  # bounded: <= 100 rows per block
        .sort_values(["bm25", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(_RRF_TOPN)
        .reset_index(drop=True)
    )
    bm_top["ra"] = np.arange(1, len(bm_top) + 1, dtype=np.int64)

    def local_top_len(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
                "n_chars": t["n_chars"].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(_RRF_TOPN)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    len_top = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        .map_batches(local_top_len, batch_format="pyarrow")
        .to_pandas()  # bounded: <= 100 rows per block
        .sort_values(["n_chars", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(_RRF_TOPN)
        .reset_index(drop=True)
    )
    len_top["rb"] = np.arange(1, len(len_top) + 1, dtype=np.int64)

    m = bm_top[["doc_id", "ra"]].merge(
        len_top[["doc_id", "rb"]], on="doc_id", how="outer"
    )
    ra = m["ra"].to_numpy(np.float64)  # NaN where absent
    rb = m["rb"].to_numpy(np.float64)
    ca = np.where(np.isnan(ra), 0.0, 1.0 / (_RRF_K + ra))
    cb = np.where(np.isnan(rb), 0.0, 1.0 / (_RRF_K + rb))
    s = ca + cb
    out = pd.DataFrame(
        {
            "doc_id": m["doc_id"].to_numpy(np.int64),
            "rank_bm25": np.nan_to_num(ra, nan=0.0).astype(np.int64),
            "rank_len": np.nan_to_num(rb, nan=0.0).astype(np.int64),
            "s": s,
        }
    )
    out = (
        out.sort_values(["s", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(_RRF_OUT)
        .reset_index(drop=True)
    )
    out["rrf_e8"] = np.floor(out["s"] * 1e8 + 0.5).astype(np.int64)
    return out[["doc_id", "rank_bm25", "rank_len", "rrf_e8"]]


def _rrf_oracle() -> str:
    from .queries15 import ORACLES15

    bm = ORACLES15["docs_bm25"]
    # rewrite the bm25 oracle's final projection as a CTE we can rank over
    cut = bm.rindex("SELECT doc_id, floor")
    prefix = bm[:cut]
    return (
        prefix
        + f""", bmq AS (
  SELECT doc_id, floor(s * 1000000.0 + 0.5) / 1000000.0 AS bm25 FROM sc
),
ra AS (
  SELECT doc_id, r FROM (
    SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM bmq
  ) WHERE r <= {_RRF_TOPN}
),
rb AS (
  SELECT doc_id, r FROM (
    SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
    FROM documents
  ) WHERE r <= {_RRF_TOPN}
),
u AS (
  SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
         coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + ra.r), CAST(0 AS DOUBLE))
           + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + rb.r), CAST(0 AS DOUBLE))
           AS s,
         coalesce(ra.r, 0) AS rank_bm25,
         coalesce(rb.r, 0) AS rank_len
  FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rank_bm25 AS BIGINT) AS rank_bm25,
       CAST(rank_len AS BIGINT) AS rank_len,
       CAST(floor(s * 100000000.0 + 0.5) AS BIGINT) AS rrf_e8
FROM (SELECT *, row_number() OVER (ORDER BY s DESC, doc_id) AS rk FROM u)
WHERE rk <= {_RRF_OUT}"""
    )


ORACLES133["docs_rrf_fusion"] = _rrf_oracle()


QUERIES133 = {
    "events_sax_daily": q_events_sax_daily,
    "docs_rrf_fusion": q_docs_rrf_fusion,
}
