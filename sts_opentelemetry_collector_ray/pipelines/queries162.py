"""Driver-contract queries, wave 162 — error-burst histogram (longest run of
consecutive ERROR turns per conversation: sustained failure vs blips) and
length-distribution KS by source (exact Kolmogorov–Smirnov D between each
source's document-length CDF and the rest of the corpus — the drift screen
before mixing feeds). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES162: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_error_bursts — longest consecutive-ERROR run per conversation
# ---------------------------------------------------------------------------


def q_conv_error_bursts(sf_dir: str):
    """Histogram over the longest consecutive run of parsed-severity ERROR
    turns per conversation (0 = conversation never errors): conversation
    counts per burst length.

    Scale shape: parsed turns ride ONE conv-bucket exchange; per-bucket
    lexsort + run-length encoding over the boolean error mask (vectorized
    flatnonzero/diff — no per-group Python) emit bounded (burst, n)
    histogram partials folded on the driver."""
    from ..stages.parse import parse_stage
    from ..sources.transcripts import derive_transcripts_from_events
    from ..functions.hashing import fnv1a64_array

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "conv": conv,
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
                "err": (
                    np.asarray(t["severity"].to_numpy(zero_copy_only=False))
                    == "ERROR"
                ).astype(np.int64),
            }
        )
        df["_b"] = (fnv1a64_array(conv.astype(object)) % np.uint64(64)).astype(
            np.int64
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "burst": pd.Series([], dtype=np.int64),
                "n_convs": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        err = g["err"].to_numpy(np.int64)
        n = len(g)
        new = np.r_[True, conv[1:] != conv[:-1]]
        # run starts: new conv OR error-state change
        run_start = new | np.r_[True, err[1:] != err[:-1]]
        starts = np.flatnonzero(run_start)
        lengths = np.diff(np.r_[starts, n])
        run_err = err[starts] == 1
        conv_code = np.cumsum(new) - 1
        run_conv = conv_code[starts]
        n_convs = int(conv_code[-1]) + 1
        best = np.zeros(n_convs, dtype=np.int64)
        er = run_err
        if er.any():
            np.maximum.at(best, run_conv[er], lengths[er])
        hist = (
            pd.DataFrame({"burst": best, "n_convs": 1})
            .groupby("burst", sort=False, as_index=False)["n_convs"]
            .sum()
        )
        return hist.astype(np.int64)

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "burst": pd.Series([], dtype=np.int64),
            "n_convs": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "burst" not in part.columns:
        return empty
    return (
        part.groupby("burst", sort=True)["n_convs"].sum().reset_index().astype(np.int64)
    )


def _error_bursts_oracle() -> str:
    from .queries2 import _PARSED_SQL

    return (
        _PARSED_SQL
        + """,
m AS (
  SELECT conv_id, turn_idx,
         CASE WHEN severity = 'ERROR' THEN 1 ELSE 0 END AS err,
         turn_idx - row_number() OVER (
             PARTITION BY conv_id,
                          CASE WHEN severity = 'ERROR' THEN 1 ELSE 0 END
             ORDER BY turn_idx) AS grp
  FROM parsed
),
runs AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS len
  FROM m WHERE err = 1 GROUP BY conv_id, grp
),
best AS (
  SELECT c.conv_id, CAST(coalesce(max(r.len), 0) AS BIGINT) AS burst
  FROM (SELECT DISTINCT conv_id FROM parsed) c
  LEFT JOIN runs r USING (conv_id)
  GROUP BY 1
)
SELECT burst, CAST(count(*) AS BIGINT) AS n_convs
FROM best GROUP BY 1"""
    )


ORACLES162["conv_error_bursts"] = _error_bursts_oracle()


# ---------------------------------------------------------------------------
# docs_length_ks_by_source — exact KS distance of length CDFs per source
# ---------------------------------------------------------------------------


def q_docs_length_ks_by_source(sf_dir: str):
    """Per source: document count and the exact Kolmogorov–Smirnov D
    (in micro units) between the source's n_chars CDF and the CDF of ALL
    OTHER sources — D = max over distinct lengths of
    |cum_src·n_rest − cum_rest·n_src| / (n_src·n_rest), evaluated with exact
    integer cross-products and ONE double division at the max.

    Scale shape: per-batch (source, n_chars) histogram combiner — bounded by
    |sources| × distinct lengths — folded on the driver where the CDF walk
    is a cumsum over the bounded grid."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "source": np.asarray(t["source"].to_numpy(zero_copy_only=False)),
                    "len": t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64),
                    "cnt": 1,
                }
            )
            .groupby(["source", "len"], sort=False, as_index=False)["cnt"]
            .sum()
        )
        return g.astype({"len": np.int64, "cnt": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            "n_docs": pd.Series([], dtype=np.int64),
            "ks_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = (
        part.groupby(["source", "len"], sort=True)["cnt"].sum().reset_index()
    )
    all_lens = np.sort(grid["len"].unique())
    total_hist = grid.groupby("len")["cnt"].sum()
    total_vec = total_hist.reindex(all_lens, fill_value=0).to_numpy(np.int64)
    n_all = int(total_vec.sum())
    rows = []
    for src, g in grid.groupby("source", sort=True):
        vec = (
            g.set_index("len")["cnt"].reindex(all_lens, fill_value=0)
            .to_numpy(np.int64)
        )
        n_src = int(vec.sum())
        n_rest = n_all - n_src
        if n_src == 0 or n_rest == 0:
            continue
        cum_src = np.cumsum(vec)
        cum_rest = np.cumsum(total_vec - vec)
        diff = np.abs(
            cum_src.astype(object) * n_rest - cum_rest.astype(object) * n_src
        )
        dmax = int(max(diff))
        ks = int(
            np.floor(dmax / float(n_src * n_rest) * 1_000_000.0 + 0.5)
        )
        rows.append((src, n_src, ks))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=["source", "n_docs", "ks_micro"]).astype(
        {"n_docs": np.int64, "ks_micro": np.int64}
    )


ORACLES162["docs_length_ks_by_source"] = """
WITH h AS (
  SELECT source, CAST(n_chars AS BIGINT) AS len,
         CAST(count(*) AS HUGEINT) AS cnt
  FROM documents GROUP BY 1, 2
),
srcs AS (SELECT source, CAST(sum(cnt) AS HUGEINT) AS n_src FROM h GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS HUGEINT) AS n_all FROM h),
lens AS (SELECT DISTINCT len FROM h),
grid AS (
  SELECT s.source, l.len,
         coalesce(hh.cnt, 0) AS cnt,
         coalesce(ht.cnt_all, 0) AS cnt_all
  FROM srcs s CROSS JOIN lens l
  LEFT JOIN h hh ON hh.source = s.source AND hh.len = l.len
  LEFT JOIN (SELECT len, CAST(sum(cnt) AS HUGEINT) AS cnt_all
             FROM h GROUP BY 1) ht ON ht.len = l.len
),
cums AS (
  SELECT source, len,
         sum(cnt) OVER (PARTITION BY source ORDER BY len) AS cum_src,
         sum(cnt_all - cnt) OVER (PARTITION BY source ORDER BY len) AS cum_rest
  FROM grid
),
d AS (
  SELECT c.source, s.n_src, tot.n_all - s.n_src AS n_rest,
         max(abs(c.cum_src * (tot.n_all - s.n_src)
                 - c.cum_rest * s.n_src)) AS dmax
  FROM cums c JOIN srcs s USING (source) CROSS JOIN tot
  GROUP BY 1, 2, 3
)
SELECT source, CAST(n_src AS BIGINT) AS n_docs,
       CAST(floor(CAST(dmax AS DOUBLE)
                  / CAST(n_src * n_rest AS DOUBLE) * 1000000.0 + 0.5)
            AS BIGINT) AS ks_micro
FROM d WHERE n_src > 0 AND n_rest > 0"""


QUERIES162 = {
    "conv_error_bursts": q_conv_error_bursts,
    "docs_length_ks_by_source": q_docs_length_ks_by_source,
}
