"""Driver-contract queries, wave 380 — McNemar's paired test of user
activity between the first and last calendar months and a Heaps'-law
fit of vocabulary growth at doc-id decile checkpoints. Same contract
as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES380: dict[str, str] = {}


# ---------------------------------------------------------------------------
# users_mcnemar_months — paired activity first vs last month
# ---------------------------------------------------------------------------


def q_users_mcnemar_months(sf_dir: str):
    """McNemar: each user is a paired binary observation (active in
    the corpus's first calendar month, active in the last). Discordant
    counts b (first only) and c (last only); chi2 = (b-c)^2/(b+c).
    One row: ym_first, ym_last, n_users, n_both, n_first_only,
    n_last_only, chi2_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        ts = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        dt = pd.to_datetime(ts, unit="us")
        ym = (dt.year * 100 + dt.month).astype(np.int64)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"u": u, "ym": ym}).drop_duplicates()

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    cols = ["ym_first", "ym_last", "n_users", "n_both", "n_first_only",
            "n_last_only", "chi2_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if pairs.empty:
        return empty
    ym_f = int(pairs["ym"].min())
    ym_l = int(pairs["ym"].max())
    if ym_f == ym_l:
        return empty
    in_f = set(pairs[pairs["ym"] == ym_f]["u"].astype(int))
    in_l = set(pairs[pairs["ym"] == ym_l]["u"].astype(int))
    both = len(in_f & in_l)
    b = len(in_f - in_l)
    c = len(in_l - in_f)
    n_users = int(pairs["u"].nunique())
    if b + c == 0:
        return empty
    chi2 = float(b - c) * float(b - c) / float(b + c)
    return pd.DataFrame(
        [
            (
                np.int64(ym_f), np.int64(ym_l), np.int64(n_users),
                np.int64(both), np.int64(b), np.int64(c),
                np.int64(np.floor(chi2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c_: np.int64 for c_ in cols})


ORACLES380["users_mcnemar_months"] = """
WITH base AS (
  SELECT DISTINCT user_id AS u,
         CAST(year(ts) * 100 + month(ts) AS BIGINT) AS ym
  FROM events
),
lim AS (SELECT min(ym) AS f, max(ym) AS l FROM base),
per AS (
  SELECT base.u,
         max(CASE WHEN base.ym = lim.f THEN 1 ELSE 0 END) AS inf,
         max(CASE WHEN base.ym = lim.l THEN 1 ELSE 0 END) AS inl
  FROM base, lim
  GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS nu,
         CAST(sum(CASE WHEN inf = 1 AND inl = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS both,
         CAST(sum(CASE WHEN inf = 1 AND inl = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(sum(CASE WHEN inf = 0 AND inl = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM per
)
SELECT lim.f AS ym_first, lim.l AS ym_last, agg.nu AS n_users,
       agg.both AS n_both, agg.b AS n_first_only, agg.c AS n_last_only,
       CAST(floor(CAST(agg.b - agg.c AS DOUBLE)
                  * (agg.b - agg.c) / (agg.b + agg.c)
                  * 1000000.0 + 0.5) AS BIGINT) AS chi2_micro
FROM agg, lim
WHERE lim.f <> lim.l AND agg.b + agg.c > 0"""


# ---------------------------------------------------------------------------
# docs_heaps_law — vocabulary growth fit
# ---------------------------------------------------------------------------


def q_docs_heaps_law(sf_dir: str):
    """Heaps' law V = K * n^beta: at each doc_id decile checkpoint the
    cumulative token count n and vocabulary size V (tokens whose
    first-occurrence doc lies at or before the checkpoint — both exact
    integers); log-log OLS over the checkpoints (folds in checkpoint
    order). One row: n_points, beta_milli, ln_k_milli.

    Scale shape: per-token min-doc and per-doc token counts both ride
    the wordcount exchange; checkpoints are ten broadcast ranks."""

    ids = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])
        .to_pandas()["doc_id"]
        .to_numpy(np.int64)
    )
    cols = ["n_points", "beta_milli", "ln_k_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    nd = len(ids)
    if nd < 10:
        return empty
    s = np.sort(ids)
    bounds = [int(s[(i * nd + 9) // 10 - 1]) for i in range(1, 11)]

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
        keep = flat != ""
        df = pd.DataFrame({"w": flat[keep], "d": did[keep]})
        first = df.groupby("w", as_index=False)["d"].min()
        cnt = df.groupby("d", as_index=False).size().rename(
            columns={"size": "c"}
        )
        first["kind"] = np.int64(0)
        first = first.rename(columns={"d": "v"})
        cnt["kind"] = np.int64(1)
        cnt = cnt.rename(columns={"d": "k", "c": "v"})
        a = pd.DataFrame(
            {"kind": first["kind"], "key": first["w"],
             "v": first["v"].astype(np.int64)}
        )
        b = pd.DataFrame(
            {"kind": cnt["kind"], "key": cnt["k"].astype(str),
             "v": cnt["v"].astype(np.int64)}
        )
        return pd.concat([a, b], ignore_index=True)

    folded = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    firsts = (
        folded[folded["kind"] == 0].groupby("key")["v"].min()
    )
    cnts = (
        folded[folded["kind"] == 1]
        .assign(d=lambda x: x["key"].astype(np.int64))
        .groupby("d")["v"]
        .sum()
    )
    if firsts.empty or cnts.empty:
        return empty
    fd = np.sort(firsts.to_numpy(np.int64))
    cd = cnts.sort_index()
    cum_tokens = cd.cumsum()
    pts = []
    for bnd in bounds:
        n_tok = int(
            cum_tokens[cd.index <= bnd].iloc[-1]
        ) if (cd.index <= bnd).any() else 0
        v_sz = int(np.searchsorted(fd, bnd, side="right"))
        if n_tok > 0 and v_sz > 0:
            pts.append((n_tok, v_sz))
    if len(pts) < 3:
        return empty
    sx = sy = sxx = sxy = 0.0
    for n_tok, v_sz in pts:
        x = float(np.log(float(n_tok)))
        yv = float(np.log(float(v_sz)))
        sx = sx + x
        sy = sy + yv
        sxx = sxx + x * x
        sxy = sxy + x * yv
    m = float(len(pts))
    det = m * sxx - sx * sx
    if det <= 0.0:
        return empty
    beta = (m * sxy - sx * sy) / det
    ln_k = (sy - beta * sx) / m
    return pd.DataFrame(
        [
            (
                np.int64(len(pts)),
                np.int64(np.floor(beta * 1_000.0 + 0.5)),
                np.int64(np.floor(ln_k * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES380["docs_heaps_law"] = r"""
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk
  FROM documents
),
bounds AS (
  SELECT b.i, ranked.doc_id AS bnd
  FROM (SELECT CAST(r.range AS BIGINT) + 1 AS i FROM range(0, 10) r) b
  JOIN nn ON TRUE
  JOIN ranked ON ranked.rk = (b.i * nn.n + 9) // 10
),
tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM documents
),
firsts AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY 1),
cnts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
pts AS (
  SELECT bounds.i,
         (SELECT CAST(sum(c) AS BIGINT) FROM cnts
          WHERE cnts.doc_id <= bounds.bnd) AS n_tok,
         (SELECT CAST(count(*) AS BIGINT) FROM firsts
          WHERE firsts.fd <= bounds.bnd) AS v
  FROM bounds
),
xy AS (
  SELECT i, ln(CAST(n_tok AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
  FROM pts WHERE n_tok > 0 AND v > 0
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         list_reduce(list_prepend(0.0, list(x ORDER BY i)),
                     (a, b) -> a + b) AS sx,
         list_reduce(list_prepend(0.0, list(y ORDER BY i)),
                     (a, b) -> a + b) AS sy,
         list_reduce(list_prepend(0.0, list(x * x ORDER BY i)),
                     (a, b) -> a + b) AS sxx,
         list_reduce(list_prepend(0.0, list(x * y ORDER BY i)),
                     (a, b) -> a + b) AS sxy
  FROM xy
),
f AS (
  SELECT m,
         (m * sxy - sx * sy) / (m * sxx - sx * sx) AS beta,
         sx, sy, m * sxx - sx * sx AS det
  FROM s
)
SELECT m AS n_points,
       CAST(floor(beta * 1000.0 + 0.5) AS BIGINT) AS beta_milli,
       CAST(floor((sy - beta * sx) / m * 1000.0 + 0.5) AS BIGINT)
         AS ln_k_milli
FROM f
WHERE m >= 3 AND det > 0"""


QUERIES380 = {
    "users_mcnemar_months": q_users_mcnemar_months,
    "docs_heaps_law": q_docs_heaps_law,
}
