"""Driver-contract queries, wave 337 — the hapax-density census (how
documents distribute over the share of corpus-unique words they carry)
and the Anscombe variance-stabilization audit (does sqrt(y + 3/8)
equalize weekday variances of daily counts?). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES337: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# docs_hapax_density_census — corpus-unique word share per document
# ---------------------------------------------------------------------------


def q_docs_hapax_density_census(sf_dir: str):
    """Hapax density: per document the share of its tokens that are
    corpus hapaxes (appear exactly once in the WHOLE corpus), censused
    into deciles (bucket = min(10 hapax // total, 9) — exact integer
    division). High-hapax documents are novelty/noise candidates. Per
    bucket: density_decile, n_docs, share_micro.

    Scale shape: pass 1 is the wordcount exchange (hapax set is
    vocabulary-bounded, broadcast); pass 2 re-scans documents against
    the broadcast set."""
    import ray as _ray
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def local_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"token": flat}).group_by(["token"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["token", "pn"])

    counts = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="c"))
        .to_pandas()
    )
    cols = ["density_decile", "n_docs", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if counts.empty:
        return empty
    hapax = set(counts.loc[counts["c"] == 1, "token"].tolist())
    hx_ref = _ray.put(hapax)

    def per_doc(t: pa.Table) -> pd.DataFrame:
        hx = _ray.get(hx_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        di = np.repeat(np.arange(len(lens)), lens)
        keep = flat != ""
        flat, di = flat[keep], di[keep]
        is_h = np.fromiter((w in hx for w in flat), bool, len(flat))
        tot = np.bincount(di, minlength=len(lens)).astype(np.int64)
        hap = np.bincount(
            di, weights=is_h.astype(np.float64), minlength=len(lens)
        ).astype(np.int64)
        ok = tot > 0
        dec = np.minimum((10 * hap[ok]) // tot[ok], 9).astype(np.int64)
        h = pd.Series(dec).groupby(dec).size()
        return pd.DataFrame(
            {"d": h.index.to_numpy(np.int64), "n": h.to_numpy(np.int64)}
        )

    h = (
        ds.map_batches(per_doc, batch_format="pyarrow")
        .to_pandas()
        .groupby("d")["n"]
        .sum()
        .sort_index()
    )
    if h.empty:
        return empty
    total = int(h.sum())
    return pd.DataFrame(
        {
            "density_decile": h.index.to_numpy(np.int64),
            "n_docs": h.to_numpy(np.int64),
            "share_micro": np.floor(
                h.to_numpy(np.int64).astype(np.float64) / float(total)
                * 1_000_000.0 + 0.5
            ).astype(np.int64),
        }
    ).astype({c: np.int64 for c in cols})[cols]


ORACLES337["docs_hapax_density_census"] = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
per AS (
  SELECT tok.doc_id,
         CAST(count(*) AS BIGINT) AS tot,
         CAST(sum(CASE WHEN cnt.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hap
  FROM tok JOIN cnt USING (w)
  GROUP BY 1
),
dec AS (
  SELECT least((10 * hap) // tot, 9) AS d FROM per WHERE tot > 0
),
h AS (
  SELECT CAST(d AS BIGINT) AS density_decile,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM dec GROUP BY 1
),
tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM h)
SELECT h.density_decile, h.n_docs,
       CAST(floor(CAST(h.n_docs AS DOUBLE) / tt.t * 1000000.0 + 0.5)
            AS BIGINT) AS share_micro
FROM h, tt
ORDER BY h.density_decile"""


# ---------------------------------------------------------------------------
# events_anscombe_check — variance stabilization across weekdays
# ---------------------------------------------------------------------------


def q_events_anscombe_check(sf_dir: str):
    """Variance-stabilization audit: per epoch-weekday group the
    population variance of the RAW daily counts and of the Anscombe
    transform 2 sqrt(y + 3/8); the max/min variance ratio before vs
    after shows whether the transform equalizes count noise. One row:
    n_days, ratio_raw_micro, ratio_anscombe_micro, improved (ratio
    shrank)."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "ratio_raw_micro", "ratio_anscombe_micro", "improved"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 14:
        return empty
    d0 = int(days.index.min())
    slots = (d0 + np.arange(n)) % 7
    raw_vars = []
    ans_vars = []
    for w in range(7):
        g = y[slots == w]
        m = len(g)
        if m < 2:
            continue
        gf = g.astype(np.float64)
        raw_vars.append(float(gf.var()))
        a = 2.0 * np.sqrt(gf + 0.375)
        ans_vars.append(float(a.var()))
    if len(raw_vars) < 2 or min(raw_vars) <= 0.0 or min(ans_vars) <= 0.0:
        return empty
    rr = max(raw_vars) / min(raw_vars)
    ra = max(ans_vars) / min(ans_vars)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(rr * 1_000_000.0 + 0.5)),
                np.int64(np.floor(ra * 1_000_000.0 + 0.5)),
                np.int64(1 if ra < rr else 0),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES337["events_anscombe_check"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy % 7 AS slot, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
per AS (
  SELECT slot, count(*) AS m,
         var_pop(CAST(y AS DOUBLE)) AS rv,
         var_pop(2.0 * sqrt(CAST(y AS DOUBLE) + 0.375)) AS av
  FROM x GROUP BY 1
  HAVING count(*) >= 2
),
agg AS (
  SELECT max(rv) / min(rv) AS rr, max(av) / min(av) AS ra,
         count(*) AS k, min(rv) AS mrv, min(av) AS mav
  FROM per
)
SELECT nn.n AS n_days,
       CAST(floor(agg.rr * 1000000.0 + 0.5) AS BIGINT) AS ratio_raw_micro,
       CAST(floor(agg.ra * 1000000.0 + 0.5) AS BIGINT)
         AS ratio_anscombe_micro,
       CAST(CASE WHEN agg.ra < agg.rr THEN 1 ELSE 0 END AS BIGINT)
         AS improved
FROM nn, agg
WHERE nn.n >= 14 AND agg.k >= 2 AND agg.mrv > 0 AND agg.mav > 0"""


QUERIES337 = {
    "docs_hapax_density_census": q_docs_hapax_density_census,
    "events_anscombe_check": q_events_anscombe_check,
}
