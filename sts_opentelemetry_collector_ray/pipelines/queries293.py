"""Driver-contract queries, wave 293 — character-level conditional
entropy rate per language (H(next|prev) = H(bigram) - H(unigram), exact
bigram counts) and the Wagstaff concentration index of lineitem revenue
ordered by discount rank (exact doubled-rank integer core). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES293: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_char_entropy_rate — conditional character entropy per language
# ---------------------------------------------------------------------------


def q_docs_char_entropy_rate(sf_dir: str):
    """Character entropy RATE per language: over lowercase text,
    H1 = unigram entropy, H2 = bigram entropy (within-document adjacent
    pairs), and the conditional rate H(X2|X1) = H2 - H1 — the
    first-order-memory information content per character; redundancy
    vs H1 completes the picture. Counts are exact; logs are the float
    step. Per lang: lang, n_chars, n_bigrams, h1_micro, h2_micro,
    cond_micro.

    Scale shape: per-batch (lang, gram -> count) Arrow combiners; the
    driver folds alphabet^2-bounded tables."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pd.DataFrame:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        texts = pc.utf8_lower(t["text"]).to_pylist()
        uni: dict[str, np.ndarray] = {}
        big: dict[str, np.ndarray] = {}
        # ASCII corpus (verified vs octet_length): one bincount per doc,
        # the per-doc loop mirrors the LangId actor precedent
        for lg, tx in zip(lang, texts):
            if not tx:
                continue
            b = np.frombuffer(tx.encode("utf-8"), np.uint8)
            u = uni.setdefault(lg, np.zeros(256, np.int64))
            u += np.bincount(b, minlength=256)
            if len(b) > 1:
                codes = b[:-1].astype(np.int64) * 256 + b[1:]
                g = big.setdefault(lg, np.zeros(65536, np.int64))
                g += np.bincount(codes, minlength=65536)
        frames = []
        for lg, u in uni.items():
            nz = np.nonzero(u)[0]
            frames.append(
                pd.DataFrame(
                    {
                        "lang": lg, "k": np.int64(1),
                        "g": [chr(int(i)) for i in nz],
                        "c": u[nz],
                    }
                )
            )
        for lg, g in big.items():
            nz = np.nonzero(g)[0]
            frames.append(
                pd.DataFrame(
                    {
                        "lang": lg, "k": np.int64(2),
                        "g": [chr(int(i) // 256) + chr(int(i) % 256)
                              for i in nz],
                        "c": g[nz],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype=object),
                    "k": pd.Series([], dtype=np.int64),
                    "g": pd.Series([], dtype=object),
                    "c": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(frames, ignore_index=True)

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "k", "g"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["lang", "n_chars", "n_bigrams", "h1_micro", "h2_micro",
            "cond_micro"]
    empty = pd.DataFrame(
        {
            "lang": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if h.empty:
        return empty
    rows = []
    for lang, sub in h.groupby("lang"):
        u = sub[sub["k"] == 1]
        b = sub[sub["k"] == 2]
        n1 = int(u["c"].sum())
        n2 = int(b["c"].sum())
        if n1 == 0 or n2 == 0:
            continue

        def ent(cnt: np.ndarray, n: int) -> float:
            cf = cnt.astype(np.float64)
            return float(np.log(float(n)) - (cf * np.log(cf)).sum() / float(n))

        h1 = ent(u["c"].to_numpy(np.int64), n1)
        h2 = ent(b["c"].to_numpy(np.int64), n2)
        rows.append(
            (
                lang, np.int64(n1), np.int64(n2),
                np.int64(np.floor(h1 * 1_000_000.0 + 0.5)),
                np.int64(np.floor(h2 * 1_000_000.0 + 0.5)),
                np.int64(np.floor((h2 - h1) * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values("lang")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols[1:]})
    )


ORACLES293["docs_char_entropy_rate"] = """
WITH chars AS (
  SELECT lang, lower(text) AS tx FROM documents WHERE length(text) > 0
),
uni AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT lang, unnest(string_split(tx, '')) AS g FROM chars
  ) GROUP BY 1, 2
),
bi AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT lang,
           substr(tx, CAST(r.range + 1 AS INT), 2) AS g
    FROM chars CROSS JOIN range(0, 100000) r
    WHERE r.range < length(tx) - 1
  ) GROUP BY 1, 2
),
un AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM uni GROUP BY 1),
bn AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM bi GROUP BY 1),
h1 AS (
  SELECT uni.lang,
         ln(un.n) - sum(CAST(uni.c AS DOUBLE) * ln(CAST(uni.c AS DOUBLE)))
           / un.n AS h
  FROM uni JOIN un USING (lang) GROUP BY uni.lang, un.n
),
h2 AS (
  SELECT bi.lang,
         ln(bn.n) - sum(CAST(bi.c AS DOUBLE) * ln(CAST(bi.c AS DOUBLE)))
           / bn.n AS h
  FROM bi JOIN bn USING (lang) GROUP BY bi.lang, bn.n
)
SELECT un.lang, un.n AS n_chars, bn.n AS n_bigrams,
       CAST(floor(h1.h * 1000000.0 + 0.5) AS BIGINT) AS h1_micro,
       CAST(floor(h2.h * 1000000.0 + 0.5) AS BIGINT) AS h2_micro,
       CAST(floor((h2.h - h1.h) * 1000000.0 + 0.5) AS BIGINT) AS cond_micro
FROM un JOIN bn USING (lang) JOIN h1 USING (lang) JOIN h2 USING (lang)
WHERE un.n > 0 AND bn.n > 0
ORDER BY un.lang"""


# ---------------------------------------------------------------------------
# lineitem_concentration_index — revenue concentration over discount rank
# ---------------------------------------------------------------------------


def q_lineitem_concentration_index(sf_dir: str):
    """Wagstaff concentration index: revenue (cents) concentrated over
    the discount ranking — CI = sum(y R2) / (n sum y) - 1 - 1/n with
    doubled average discount ranks R2 (EXACT integers; sum(y R2) is
    HUGEINT/arbitrary-precision). CI > 0 means revenue concentrates in
    high-discount lines. One row: n, sum_cents, ci_micro.

    Scale shape: the `lineitem_gini_correlation` tagged histogram
    combiner keyed by discount, carrying revenue sums; the rank scan is
    a prefix sum over the bounded band histogram."""

    def partial(t: pa.Table) -> pd.DataFrame:
        x = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"v": x, "y": y})
            .groupby("v", sort=False)
            .agg(n=("y", "size"), s=("y", "sum"))
            .reset_index()
        )
        return g.astype(np.int64)

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_discount", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("v")[["n", "s"]]
        .sum()
        .sort_index()
    )
    cols = ["n", "sum_cents", "ci_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    nv = h["n"].to_numpy(np.int64).astype(object)
    sv = h["s"].to_numpy(np.int64).astype(object)
    n = int(nv.sum())
    sy = int(sv.sum())
    if n < 2 or sy <= 0:
        return empty
    below = np.concatenate([[0], np.cumsum(nv)[:-1]])
    r2 = 2 * below + nv + 1
    syr2 = int((sv * r2).sum())
    ci = float(syr2) / (2.0 * float(n) * float(sy)) * 2.0 - 1.0 - 1.0 / float(
        n
    )
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(sy),
                np.int64(np.floor(ci * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES293["lineitem_concentration_index"] = """
WITH base AS (
  SELECT CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM lineitem
),
r AS (
  SELECT y,
         2 * (rank() OVER (ORDER BY x)) + (count(*) OVER (PARTITION BY x))
           - 1 AS r2
  FROM base
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(y AS HUGEINT) * r2) AS HUGEINT) AS syr2
  FROM r
)
SELECT n, sy AS sum_cents,
       CAST(floor((CAST(syr2 AS DOUBLE)
                   / (2.0 * CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)) * 2.0
                   - 1.0 - 1.0 / CAST(n AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS ci_micro
FROM m
WHERE n >= 2 AND sy > 0"""


QUERIES293 = {
    "docs_char_entropy_rate": q_docs_char_entropy_rate,
    "lineitem_concentration_index": q_lineitem_concentration_index,
}
