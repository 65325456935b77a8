"""Driver-contract queries, wave 363 — Jensen-Shannon divergence of
token-length distributions across document sources and the intraclass
correlation (ICC(1), one-way ANOVA) of customer balances within
nations. Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES363: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_wordlen_js_divergence — JSD of token-length profiles per source
# ---------------------------------------------------------------------------


def q_docs_wordlen_js_divergence(sf_dir: str):
    """Are sources stylistically distinguishable by word length alone?
    Per source the token-length histogram (bounded cells); for each
    source pair the Jensen-Shannon divergence (natural log), cells
    folded in ascending length order on both sides. Per pair:
    source_a, source_b, n_a, n_b, jsd_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(t["text"], r"\s+").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.utf8_length(toks.flatten()).to_numpy(zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), lens)
        keep = flat > 0
        g = (
            pd.DataFrame({"src": src[keep], "ln": flat[keep].astype(np.int64)})
            .groupby(["src", "ln"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["src", "ln"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["source_a", "source_b", "n_a", "n_b", "jsd_micro"]
    empty = pd.DataFrame(
        {
            "source_a": pd.Series([], dtype=object),
            "source_b": pd.Series([], dtype=object),
            "n_a": pd.Series([], dtype=np.int64),
            "n_b": pd.Series([], dtype=np.int64),
            "jsd_micro": pd.Series([], dtype=np.int64),
        }
    )
    if hist.empty:
        return empty
    srcs = sorted(hist["src"].unique())
    per = {
        s: dict(zip(sub["ln"].astype(int), sub["c"].astype(int)))
        for s, sub in hist.groupby("src")
    }
    tot = {s: sum(per[s].values()) for s in srcs}
    rows = []
    for a, b in itertools.combinations(srcs, 2):
        na, nb = tot[a], tot[b]
        if na == 0 or nb == 0:
            continue
        jsd = 0.0
        for ln_ in sorted(set(per[a]) | set(per[b])):
            ca, cb = per[a].get(ln_, 0), per[b].get(ln_, 0)
            p = float(ca) / float(na)
            q = float(cb) / float(nb)
            m = 0.5 * (p + q)
            if ca > 0:
                jsd += 0.5 * p * float(np.log(p / m))
            if cb > 0:
                jsd += 0.5 * q * float(np.log(q / m))
        rows.append(
            (a, b, np.int64(na), np.int64(nb),
             np.int64(np.floor(jsd * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_a": np.int64, "n_b": np.int64, "jsd_micro": np.int64}
    )


ORACLES363["docs_wordlen_js_divergence"] = r"""
WITH tok AS (
  SELECT source AS src,
         CAST(length(unnest(list_filter(
           string_split_regex(text, '\s+'), x -> x <> ''))) AS BIGINT)
           AS ln
  FROM documents
),
h AS (
  SELECT src, ln, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
),
tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
pairs AS (
  SELECT a.src AS sa, b.src AS sb, a.n AS na, b.n AS nb
  FROM tot a JOIN tot b ON a.src < b.src
),
cells AS (
  SELECT p.sa, p.sb, p.na, p.nb, l.ln,
         coalesce(ha.c, 0) AS ca, coalesce(hb.c, 0) AS cb
  FROM pairs p
  CROSS JOIN (SELECT DISTINCT ln FROM h) l
  LEFT JOIN h ha ON ha.src = p.sa AND ha.ln = l.ln
  LEFT JOIN h hb ON hb.src = p.sb AND hb.ln = l.ln
  WHERE coalesce(ha.c, 0) + coalesce(hb.c, 0) > 0
),
terms AS (
  SELECT sa, sb, na, nb, ln,
         (CASE WHEN ca > 0 THEN
            0.5 * (CAST(ca AS DOUBLE) / na)
            * ln((CAST(ca AS DOUBLE) / na)
                 / (0.5 * (CAST(ca AS DOUBLE) / na
                           + CAST(cb AS DOUBLE) / nb)))
          ELSE 0.0 END)
         + (CASE WHEN cb > 0 THEN
              0.5 * (CAST(cb AS DOUBLE) / nb)
              * ln((CAST(cb AS DOUBLE) / nb)
                   / (0.5 * (CAST(ca AS DOUBLE) / na
                             + CAST(cb AS DOUBLE) / nb)))
            ELSE 0.0 END) AS t
  FROM cells
),
f AS (
  SELECT sa, sb, na, nb,
         list_reduce(list(t ORDER BY ln), (x, y) -> x + y) AS jsd
  FROM terms GROUP BY 1, 2, 3, 4
)
SELECT sa AS source_a, sb AS source_b, na AS n_a, nb AS n_b,
       CAST(floor(jsd * 1000000.0 + 0.5) AS BIGINT) AS jsd_micro
FROM f
WHERE na > 0 AND nb > 0
ORDER BY source_a, source_b"""


# ---------------------------------------------------------------------------
# customer_nation_icc — intraclass correlation of balances in nations
# ---------------------------------------------------------------------------


def q_customer_nation_icc(sf_dir: str):
    """How much of balance variance is between nations? One-way ANOVA
    on acctbal cents grouped by nationkey: exact per-nation (n, S, Q)
    integer cores; the Sum Sg^2/n_g fold runs in ascending nationkey
    order on both sides (sequential left fold). ICC(1) with the
    unequal-group n0. One row: n, k, f_micro, icc_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"nk": nk, "n": 1, "s": cents, "q": cents * cents})
            .groupby("nk", as_index=False)
            .sum()
        )
        return g.astype(np.int64)

    per = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("nk")[["n", "s", "q"]]
        .sum()
        .sort_index()
    )
    cols = ["n", "k", "f_micro", "icc_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    k = len(per)
    if k < 2:
        return empty
    n_tot = int(per["n"].sum())
    s_tot = int(per["s"].sum())
    q_tot = int(per["q"].sum())
    if n_tot <= k:
        return empty
    fold = 0.0
    fold2 = 0
    for _, r in per.iterrows():
        m, s = int(r["n"]), int(r["s"])
        fold = fold + float(s) * float(s) / float(m)
        fold2 += m * m
    ssb = fold - float(s_tot) * float(s_tot) / float(n_tot)
    ssw = float(q_tot) - fold
    if ssw <= 0.0:
        return empty
    msb = ssb / float(k - 1)
    msw = ssw / float(n_tot - k)
    n0 = (float(n_tot) - float(fold2) / float(n_tot)) / float(k - 1)
    denom = msb + (n0 - 1.0) * msw
    if denom <= 0.0 or msw <= 0.0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(n_tot), np.int64(k),
                np.int64(np.floor(msb / msw * 1_000_000.0 + 0.5)),
                np.int64(np.floor((msb - msw) / denom * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES363["customer_nation_icc"] = """
WITH b AS (
  SELECT c_nationkey AS nk,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS y
  FROM customer
),
g AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS m, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS q
  FROM b GROUP BY 1
),
tot AS (
  SELECT CAST(sum(m) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(s) AS BIGINT) AS s, CAST(sum(q) AS HUGEINT) AS q,
         CAST(sum(CAST(m AS HUGEINT) * m) AS HUGEINT) AS m2
  FROM g
),
fold AS (
  SELECT list_reduce(
           list(CAST(s AS DOUBLE) * s / m ORDER BY nk),
           (x, y) -> x + y) AS f
  FROM g
),
comp AS (
  SELECT tot.n, tot.k,
         (fold.f - CAST(tot.s AS DOUBLE) * tot.s / tot.n)
           / (tot.k - 1) AS msb,
         (CAST(tot.q AS DOUBLE) - fold.f) / (tot.n - tot.k) AS msw,
         (CAST(tot.n AS DOUBLE) - CAST(tot.m2 AS DOUBLE) / tot.n)
           / (tot.k - 1) AS n0
  FROM tot, fold
)
SELECT n, k,
       CAST(floor(msb / msw * 1000000.0 + 0.5) AS BIGINT) AS f_micro,
       CAST(floor((msb - msw) / (msb + (n0 - 1.0) * msw)
                  * 1000000.0 + 0.5) AS BIGINT) AS icc_micro
FROM comp
WHERE k >= 2 AND n > k AND msw > 0
  AND msb + (n0 - 1.0) * msw > 0"""


QUERIES363 = {
    "docs_wordlen_js_divergence": q_docs_wordlen_js_divergence,
    "customer_nation_icc": q_customer_nation_icc,
}
