"""Driver-contract queries, wave 397 — logistic regression of the
return flag on discount depth (5 unrolled Newton iterations over the
bounded level table) and the top source-discriminative words by
presence chi-square. Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES397: dict[str, str] = {}

_LR_ITERS = 5


# ---------------------------------------------------------------------------
# lineitem_logistic_return_on_discount — binary GLM
# ---------------------------------------------------------------------------


def q_lineitem_logistic_return_on_discount(sf_dir: str):
    """Logistic GLM P(returnflag = 'R') = sigmoid(b0 + b1 * x) with
    x = discount milli / 1000; the data collapse exactly to the
    bounded (level, n, r) table, so 5 Newton iterations fold over
    levels in discount order. One row: n, n_levels, b0_micro,
    b1_micro, dev_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        disc = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        ret = (
            t["l_returnflag"].to_numpy(zero_copy_only=False) == "R"
        ).astype(np.int64)
        g = (
            pd.DataFrame({"w": disc, "n": 1, "r": ret})
            .groupby("w", as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    lv = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_discount", "l_returnflag"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("w")[["n", "r"]]
        .sum()
        .sort_index()
    )
    cols = ["n", "n_levels", "b0_micro", "b1_micro", "dev_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if lv.empty or len(lv) < 2:
        return empty
    w = lv.index.to_numpy(np.int64)
    nv = lv["n"].to_numpy(np.int64)
    rv = lv["r"].to_numpy(np.int64)
    n = int(nv.sum())
    r = int(rv.sum())
    if r == 0 or r == n:
        return empty
    xs = [float(int(x)) / 1000.0 for x in w]
    b0 = float(np.log(float(r) / float(n - r)))
    b1 = 0.0
    for _ in range(_LR_ITERS):
        g0 = g1 = h00 = h01 = h11 = 0.0
        for i in range(len(xs)):
            p = 1.0 / (1.0 + float(np.exp(-(b0 + b1 * xs[i]))))
            ni, ri = float(int(nv[i])), float(int(rv[i]))
            res = ri - ni * p
            wgt = ni * p * (1.0 - p)
            g0 = g0 + res
            g1 = g1 + res * xs[i]
            h00 = h00 + wgt
            h01 = h01 + wgt * xs[i]
            h11 = h11 + wgt * xs[i] * xs[i]
        det = h00 * h11 - h01 * h01
        if det <= 0.0:
            return empty
        b0 = b0 + (h11 * g0 - h01 * g1) / det
        b1 = b1 + (h00 * g1 - h01 * g0) / det
    dev = 0.0
    for i in range(len(xs)):
        p = 1.0 / (1.0 + float(np.exp(-(b0 + b1 * xs[i]))))
        ni, ri = float(int(nv[i])), float(int(rv[i]))
        if ri > 0.0:
            dev = dev + ri * float(np.log(ri / (ni * p)))
        if ni - ri > 0.0:
            dev = dev + (ni - ri) * float(
                np.log((ni - ri) / (ni * (1.0 - p)))
            )
    dev = 2.0 * dev
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(len(lv)),
                np.int64(np.floor(b0 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(b1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(dev * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _lr_iter_sql(i: int) -> str:
    return f"""
p{i} AS MATERIALIZED (
  SELECT lv.w, lv.n, lv.r, lv.xv,
         1.0 / (1.0 + exp(-(b{i}.b0 + b{i}.b1 * lv.xv))) AS p
  FROM lv, b{i}
),
s{i} AS MATERIALIZED (
  SELECT
    list_reduce(list_prepend(0.0,
      list(CAST(r AS DOUBLE) - n * p ORDER BY w)),
      (a, b) -> a + b) AS g0,
    list_reduce(list_prepend(0.0,
      list((CAST(r AS DOUBLE) - n * p) * xv ORDER BY w)),
      (a, b) -> a + b) AS g1,
    list_reduce(list_prepend(0.0,
      list(CAST(n AS DOUBLE) * p * (1.0 - p) ORDER BY w)),
      (a, b) -> a + b) AS h00,
    list_reduce(list_prepend(0.0,
      list(CAST(n AS DOUBLE) * p * (1.0 - p) * xv ORDER BY w)),
      (a, b) -> a + b) AS h01,
    list_reduce(list_prepend(0.0,
      list(CAST(n AS DOUBLE) * p * (1.0 - p) * xv * xv ORDER BY w)),
      (a, b) -> a + b) AS h11
  FROM p{i}
),
b{i + 1} AS MATERIALIZED (
  SELECT b{i}.b0 + (s.h11 * s.g0 - s.h01 * s.g1)
                     / (s.h00 * s.h11 - s.h01 * s.h01) AS b0,
         b{i}.b1 + (s.h00 * s.g1 - s.h01 * s.g0)
                     / (s.h00 * s.h11 - s.h01 * s.h01) AS b1
  FROM b{i}, s{i} s
  WHERE s.h00 * s.h11 - s.h01 * s.h01 > 0
)"""


ORACLES397["lineitem_logistic_return_on_discount"] = (
    """
WITH raw AS (
  SELECT CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS w,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem
),
lv AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ret) AS BIGINT) AS r,
         CAST(w AS DOUBLE) / 1000.0 AS xv
  FROM raw GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS r,
               CAST(count(*) AS BIGINT) AS k FROM lv),
b0 AS MATERIALIZED (
  SELECT ln(CAST(tot.r AS DOUBLE) / (tot.n - tot.r)) AS b0, 0.0 AS b1
  FROM tot WHERE tot.r > 0 AND tot.r < tot.n AND tot.k >= 2
),
"""
    + ",\n".join(_lr_iter_sql(i) for i in range(_LR_ITERS))
    + f""",
dev AS (
  SELECT 2.0 * list_reduce(list_prepend(0.0,
           list((CASE WHEN r > 0
                      THEN CAST(r AS DOUBLE)
                           * ln(CAST(r AS DOUBLE)
                                / (n * (1.0 / (1.0
                                   + exp(-(b.b0 + b.b1 * xv))))))
                      ELSE 0.0 END)
                + (CASE WHEN n - r > 0
                        THEN CAST(n - r AS DOUBLE)
                             * ln(CAST(n - r AS DOUBLE)
                                  / (n * (1.0 - 1.0 / (1.0
                                     + exp(-(b.b0 + b.b1 * xv))))))
                        ELSE 0.0 END) ORDER BY w)),
           (p, q) -> p + q) AS d
  FROM lv, b{_LR_ITERS} b
  GROUP BY b.b0, b.b1
)
SELECT tot.n, tot.k AS n_levels,
       CAST(floor(b.b0 * 1000000.0 + 0.5) AS BIGINT) AS b0_micro,
       CAST(floor(b.b1 * 1000000.0 + 0.5) AS BIGINT) AS b1_micro,
       CAST(floor(dev.d * 1000.0 + 0.5) AS BIGINT) AS dev_milli
FROM tot, b{_LR_ITERS} b, dev"""
)


# ---------------------------------------------------------------------------
# docs_discriminative_words_chi2 — presence chi-square per word
# ---------------------------------------------------------------------------


def q_docs_discriminative_words_chi2(sf_dir: str):
    """Which words mark a source? For each word, the chi-square of the
    (contains-word) x (source) table (expected from marginals, cells
    folded in source order); top-10 by chi2 (ties alphabetical).
    Per word: word, n_docs_with, chi2_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        did = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            lens,
        )
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), lens)
        keep = flat != ""
        pres = pd.DataFrame(
            {"d": did[keep], "src": src[keep], "w": flat[keep]}
        ).drop_duplicates()
        return pres

    pres = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "source", "text"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["word", "n_docs_with", "chi2_milli"]
    empty = pd.DataFrame(
        {
            "word": pd.Series([], dtype=object),
            "n_docs_with": pd.Series([], dtype=np.int64),
            "chi2_milli": pd.Series([], dtype=np.int64),
        }
    )
    if pres.empty:
        return empty
    docs_per_src = pres.drop_duplicates(["d"]).groupby("src").size()
    srcs = sorted(docs_per_src.index)
    n_docs = int(docs_per_src.sum())
    if len(srcs) < 2:
        return empty
    with_w = pres.groupby(["w", "src"])["d"].nunique()
    df_w = pres.groupby("w")["d"].nunique()
    recs = []
    for w_ in sorted(df_w.index):
        dfw = int(df_w[w_])
        if dfw == 0 or dfw == n_docs:
            continue
        chi2 = 0.0
        for s_ in srcs:
            ns = int(docs_per_src[s_])
            obs_with = float(int(with_w.get((w_, s_), 0)))
            e_with = float(dfw) * float(ns) / float(n_docs)
            e_without = float(n_docs - dfw) * float(ns) / float(n_docs)
            obs_without = float(ns) - obs_with
            # one combined term per source, matching the oracle fold
            chi2 = chi2 + (
                (obs_with - e_with) * (obs_with - e_with) / e_with
                + (obs_without - e_without) * (obs_without - e_without)
                / e_without
            )
        recs.append((w_, dfw, chi2))
    if not recs:
        return empty
    recs.sort(key=lambda r: (-r[2], r[0]))
    recs = recs[:10]
    return pd.DataFrame(
        [
            (w_, np.int64(dfw),
             np.int64(np.floor(chi2 * 1_000.0 + 0.5)))
            for w_, dfw, chi2 in recs
        ],
        columns=cols,
    ).astype({"n_docs_with": np.int64, "chi2_milli": np.int64})


ORACLES397["docs_discriminative_words_chi2"] = r"""
WITH pres AS (
  SELECT DISTINCT doc_id AS d, source AS src,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
dps AS (
  SELECT src, CAST(count(DISTINCT d) AS BIGINT) AS ns
  FROM pres GROUP BY 1
),
nn AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM dps),
dfw AS (
  SELECT w, CAST(count(DISTINCT d) AS BIGINT) AS df
  FROM pres GROUP BY 1
),
ww AS (
  SELECT w, src, CAST(count(DISTINCT d) AS BIGINT) AS c
  FROM pres GROUP BY 1, 2
),
cells AS (
  SELECT dfw.w, dps.src, dfw.df, dps.ns,
         CAST(coalesce(ww.c, 0) AS BIGINT) AS obs
  FROM dfw CROSS JOIN dps
  LEFT JOIN ww ON ww.w = dfw.w AND ww.src = dps.src, nn
  WHERE dfw.df > 0 AND dfw.df < nn.n
),
chi AS (
  SELECT w, max(df) AS df,
         list_reduce(list_prepend(0.0,
           list((CAST(obs AS DOUBLE)
                 - CAST(df AS DOUBLE) * ns / nn.n)
                * (CAST(obs AS DOUBLE)
                   - CAST(df AS DOUBLE) * ns / nn.n)
                / (CAST(df AS DOUBLE) * ns / nn.n)
                + (CAST(ns AS DOUBLE) - obs
                   - CAST(nn.n - df AS DOUBLE) * ns / nn.n)
                  * (CAST(ns AS DOUBLE) - obs
                     - CAST(nn.n - df AS DOUBLE) * ns / nn.n)
                  / (CAST(nn.n - df AS DOUBLE) * ns / nn.n)
                ORDER BY src)),
           (a, b) -> a + b) AS chi2
  FROM cells, nn
  GROUP BY w, nn.n
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY chi2 DESC, w) AS rk FROM chi
)
SELECT w AS word, CAST(df AS BIGINT) AS n_docs_with,
       CAST(floor(chi2 * 1000.0 + 0.5) AS BIGINT) AS chi2_milli
FROM ranked
WHERE rk <= 10
ORDER BY rk"""


QUERIES397 = {
    "lineitem_logistic_return_on_discount":
        q_lineitem_logistic_return_on_discount,
    "docs_discriminative_words_chi2": q_docs_discriminative_words_chi2,
}
