"""Driver-contract queries, wave 312 — language confusability (cosine
between per-language character-trigram frequency profiles — which
languages a profile-based identifier would mix up) and the yearly Gini
coefficient of order values (the inequality TREND, exact sorted-rank
formula per year). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES312: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_lang_confusability — trigram-profile cosine between languages
# ---------------------------------------------------------------------------


def q_docs_lang_confusability(sf_dir: str):
    """Confusability matrix: per language the character-trigram count
    profile of its lowercase text (within-document sliding trigrams,
    the ASCII bincount kernel of `docs_char_entropy_rate`), and per
    unordered language pair the cosine similarity of the two profiles.
    Counts are exact; the cosine is one mirrored float composition. Per
    pair: lang_a, lang_b, n_a, n_b, cosine_micro.

    Scale shape: per-batch (lang, trigram) combiners; the driver folds
    alphabet^3-bounded profiles."""

    def partial(t: pa.Table) -> pd.DataFrame:
        lang = t["lang"].to_numpy(zero_copy_only=False)
        texts = pc.utf8_lower(t["text"]).to_pylist()
        acc: dict[str, dict[int, int]] = {}
        for lg, tx in zip(lang, texts):
            if not tx or len(tx) < 3:
                continue
            b = np.frombuffer(tx.encode("utf-8"), np.uint8).astype(np.int64)
            codes = b[:-2] * 65536 + b[1:-1] * 256 + b[2:]
            vals, cnts = np.unique(codes, return_counts=True)
            d = acc.setdefault(lg, {})
            for v, c in zip(vals.tolist(), cnts.tolist()):
                d[v] = d.get(v, 0) + c
        rows = []
        for lg, d in acc.items():
            for v, c in d.items():
                rows.append((lg, v, c))
        if not rows:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype=object),
                    "g": pd.Series([], dtype=np.int64),
                    "c": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(rows, columns=["lang", "g", "c"]).astype(
            {"g": np.int64, "c": np.int64}
        )

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "g"])["c"]
        .sum()
    )
    cols = ["lang_a", "lang_b", "n_a", "n_b", "cosine_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if h.empty:
        return empty
    langs = sorted(set(h.index.get_level_values(0)))
    prof = {lg: h.loc[lg] for lg in langs}
    rows = []
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            pa_, pb_ = prof[a], prof[b]
            na, nb = int(pa_.sum()), int(pb_.sum())
            shared = pa_.index.intersection(pb_.index)
            dot = float(
                (pa_.reindex(shared).to_numpy(np.int64).astype(np.float64)
                 * pb_.reindex(shared).to_numpy(np.int64).astype(np.float64))
                .sum()
            )
            norm_a = float(np.sqrt(
                (pa_.to_numpy(np.int64).astype(np.float64) ** 2).sum()
            ))
            norm_b = float(np.sqrt(
                (pb_.to_numpy(np.int64).astype(np.float64) ** 2).sum()
            ))
            if norm_a == 0.0 or norm_b == 0.0:
                continue
            cosv = dot / (norm_a * norm_b)
            rows.append(
                (
                    a, b, np.int64(na), np.int64(nb),
                    np.int64(np.floor(cosv * 1_000_000.0 + 0.5)),
                )
            )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[2:]}
    )


ORACLES312["docs_lang_confusability"] = """
WITH chars AS (
  SELECT lang, lower(text) AS tx FROM documents WHERE length(text) >= 3
),
tri AS (
  SELECT lang, substr(tx, CAST(r.range + 1 AS INT), 3) AS g
  FROM chars CROSS JOIN range(0, 100000) r
  WHERE r.range < length(tx) - 2
),
h AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS c FROM tri GROUP BY 1, 2
),
norms AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n,
         sqrt(sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE))) AS nrm
  FROM h GROUP BY 1
),
pairs AS (
  SELECT a.lang AS la, b.lang AS lb, a.n AS na, b.n AS nb,
         a.nrm AS nrma, b.nrm AS nrmb
  FROM norms a JOIN norms b ON a.lang < b.lang
),
dots AS (
  SELECT x.lang AS la, y.lang AS lb,
         sum(CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE)) AS dot
  FROM h x JOIN h y ON y.g = x.g AND x.lang < y.lang
  GROUP BY 1, 2
)
SELECT p.la AS lang_a, p.lb AS lang_b, p.na AS n_a, p.nb AS n_b,
       CAST(floor(coalesce(d.dot, 0.0) / (p.nrma * p.nrmb)
                  * 1000000.0 + 0.5) AS BIGINT) AS cosine_micro
FROM pairs p LEFT JOIN dots d ON d.la = p.la AND d.lb = p.lb
WHERE p.nrma > 0 AND p.nrmb > 0
ORDER BY lang_a, lang_b"""


# ---------------------------------------------------------------------------
# orders_gini_by_year — inequality trend of order values
# ---------------------------------------------------------------------------


def q_orders_gini_by_year(sf_dir: str):
    """Gini coefficient of order totals per order year from the exact
    sorted formula G = sum (2 cum_i - c_i - n - ... ) expressed over the
    value histogram: G = (2 sum_v v c_v R2bar_v / 2 - (n+1) S) / (n S)
    with doubled average ranks — every term an EXACT integer
    (arbitrary precision), one division. Per year: order_year, n,
    sum_cents, gini_micro — rising Gini means concentrating spend."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        yr = df["o_orderdate"].dt.year.to_numpy(np.int64)
        g = (
            pd.DataFrame({"yr": yr, "y": cents})
            .groupby(["yr", "y"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["yr", "y"])["c"]
        .sum()
    )
    cols = ["order_year", "n", "sum_cents", "gini_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    rows = []
    for yr in sorted(set(h.index.get_level_values(0))):
        sub = h.loc[yr].sort_index()
        v = sub.index.to_numpy(np.int64).astype(object)
        c = sub.to_numpy(np.int64).astype(object)
        n = int(c.sum())
        s = int((v * c).sum())
        if n < 2 or s <= 0:
            continue
        below = np.concatenate([[0], np.cumsum(c)[:-1]])
        r2 = 2 * below + c + 1  # doubled average rank
        # G = (sum v c r2 - (n+1) S) / (n S)   [since sum v c rbar,
        # rbar = r2/2, G = 2 sum v c rbar/(nS) - (n+1)/n]
        num = int((v * c * r2).sum()) - (n + 1) * s
        gini = float(num) / (float(n) * float(s))
        rows.append(
            (
                np.int64(int(yr)), np.int64(n), np.int64(s),
                np.int64(np.floor(gini * 1_000_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES312["orders_gini_by_year"] = """
WITH b AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
  FROM orders
),
h AS (SELECT yr, y, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
r AS (
  SELECT yr, y, c,
         2 * (sum(c) OVER (PARTITION BY yr ORDER BY y) - c) + c + 1 AS r2
  FROM h
),
m AS (
  SELECT yr, CAST(sum(c) AS BIGINT) AS n, CAST(sum(y * c) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * c * r2) AS HUGEINT) AS vcr
  FROM r GROUP BY 1
)
SELECT yr AS order_year, n, s AS sum_cents,
       CAST(floor(CAST(vcr - CAST(n + 1 AS HUGEINT) * s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS gini_micro
FROM m
WHERE n >= 2 AND s > 0
ORDER BY order_year"""


QUERIES312 = {
    "docs_lang_confusability": q_docs_lang_confusability,
    "orders_gini_by_year": q_orders_gini_by_year,
}
