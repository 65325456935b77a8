"""Driver-contract queries, wave 309 — Gopher quality pass rate by
document length bucket (does the filter systematically discard short or
long documents?) and the one-way weekday ANOVA F on daily event counts
(the parametric companion of the Friedman/Kruskal family). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES309: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# docs_quality_by_length — Gopher pass rate per length bucket
# ---------------------------------------------------------------------------


def q_docs_quality_by_length(sf_dir: str):
    """Filter-bias audit: Gopher keep rate per fixed-width length
    bucket (bucket = min(n_chars // 100, 10)) — reuses the
    `docs_gopher` rule kernel verbatim so the per-doc keep flag is
    value-identical to its strict oracle. Per bucket: len_bucket,
    n_docs, n_pass, rate_micro. Pure integer counting.

    Scale shape: the gopher kernel is a per-batch Arrow pass; the
    driver folds 11 x 2 scalars."""
    from ..stages.text_analysis import gopher_quality_batch

    def partial(t: pa.Table) -> pd.DataFrame:
        g = gopher_quality_batch(t)
        keep = g["keep"].to_numpy(zero_copy_only=False).astype(np.int64)
        bucket = np.minimum(
            t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            // 100,
            10,
        )
        df = pd.DataFrame({"b": bucket, "n": 1, "p": keep})
        return df.groupby("b", as_index=False).sum().astype(np.int64)

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["text", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("b")[["n", "p"]]
        .sum()
        .sort_index()
    )
    cols = ["len_bucket", "n_docs", "n_pass", "rate_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if m.empty:
        return empty
    out = m.reset_index().rename(
        columns={"b": "len_bucket", "n": "n_docs", "p": "n_pass"}
    )
    out["rate_micro"] = np.floor(
        out["n_pass"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES309["docs_quality_by_length"] = """
WITH w AS (
  SELECT doc_id, text, n_chars,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS words
  FROM documents
),
m AS (
  SELECT doc_id, n_chars,
         CAST(len(words) AS BIGINT) AS word_count,
         list_sum(list_transform(words, x -> strlen(x))) * 1.0
             / greatest(len(words), 1) AS mean_len,
         (length(text) - length(replace(text, '#', ''))) AS hashes,
         (length(text) - length(replace(text, '...', ''))) / 3 AS ellipses,
         (CAST(regexp_matches(lower(text), '\\bthe\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bbe\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bto\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bof\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\band\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bthat\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bhave\\b') AS INT)
          + CAST(regexp_matches(lower(text), '\\bwith\\b') AS INT))
           AS stop_hits
  FROM w
),
k AS (
  SELECT least(n_chars // 100, 10) AS b,
         CAST(((word_count >= 50 AND word_count <= 100000)
               AND (mean_len >= 3.0 AND mean_len <= 10.0)
               AND (hashes * 1.0 / greatest(word_count, 1) <= 0.1)
               AND (ellipses * 1.0 / greatest(word_count, 1) <= 0.1)
               AND (stop_hits >= 2)) AS BIGINT) AS keep
  FROM m
),
agg AS (
  SELECT CAST(b AS BIGINT) AS len_bucket,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(keep) AS BIGINT) AS n_pass
  FROM k GROUP BY 1
)
SELECT len_bucket, n_docs, n_pass,
       CAST(floor(CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
FROM agg
ORDER BY len_bucket"""


# ---------------------------------------------------------------------------
# events_weekday_anova_f — one-way F across weekday groups
# ---------------------------------------------------------------------------


def q_events_weekday_anova_f(sf_dir: str):
    """One-way ANOVA of daily counts across the 7 epoch-weekday groups:
    SSB = sum_w S_w^2/n_w - S^2/n, SSW = sum y^2 - sum_w S_w^2/n_w
    (EXACT integer moment cores, float group divisions),
    F = (SSB/(k-1)) / (SSW/(n-k)), eta^2 = SSB/SST. One row: n_days,
    k_groups, f_micro, eta2_micro."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_days", "k_groups", "f_micro", "eta2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 14:
        return empty
    d0 = int(days.index.min())
    slots = (d0 + np.arange(n)) % 7
    s_tot = int(y.sum())
    s2_tot = int((y.astype(object) * y.astype(object)).sum())
    between = 0.0
    k = 0
    for w in range(7):
        mask = slots == w
        nw = int(mask.sum())
        if nw == 0:
            continue
        k += 1
        sw = int(y[mask].sum())
        between += float(sw) * float(sw) / float(nw)
    sst = float(s2_tot) - float(s_tot) * float(s_tot) / float(n)
    ssb = between - float(s_tot) * float(s_tot) / float(n)
    ssw = float(s2_tot) - between
    if k < 2 or n <= k or ssw <= 0.0 or sst <= 0.0:
        return empty
    f = (ssb / float(k - 1)) / (ssw / float(n - k))
    eta2 = ssb / sst
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(k),
                np.int64(np.floor(f * 1_000_000.0 + 0.5)),
                np.int64(np.floor(eta2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES309["events_weekday_anova_f"] = f"""
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
per AS (
  SELECT slot, CAST(count(*) AS BIGINT) AS nw, CAST(sum(y) AS BIGINT) AS sw
  FROM x GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM x
),
b AS (
  SELECT sum(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(nw AS DOUBLE))
           AS between_, CAST(count(*) AS BIGINT) AS k
  FROM per
),
s AS (
  SELECT tot.n, b.k,
         b.between_ - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
           / CAST(tot.n AS DOUBLE) AS ssb,
         CAST(tot.s2 AS DOUBLE) - b.between_ AS ssw,
         CAST(tot.s2 AS DOUBLE)
           - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
             / CAST(tot.n AS DOUBLE) AS sst
  FROM tot, b
)
SELECT n AS n_days, k AS k_groups,
       CAST(floor((ssb / (k - 1)) / (ssw / (n - k)) * 1000000.0 + 0.5)
            AS BIGINT) AS f_micro,
       CAST(floor(ssb / sst * 1000000.0 + 0.5) AS BIGINT) AS eta2_micro
FROM s
WHERE n >= 14 AND k >= 2 AND n > k AND ssw > 0 AND sst > 0"""


QUERIES309 = {
    "docs_quality_by_length": q_docs_quality_by_length,
    "events_weekday_anova_f": q_events_weekday_anova_f,
}
