"""Driver-contract queries, wave 140 — per-part unit-price dispersion (the
pricing-consistency audit: coefficient of variation of the per-line unit
price) and length-by-language ANOVA effect size (how much of document-length
variance the language explains — the stratification diagnostic before
per-lang quota sampling). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES140: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_price_dispersion — per-part unit-price coefficient of variation
# ---------------------------------------------------------------------------


def q_lineitem_price_dispersion(sf_dir: str):
    """Per part with >= 2 line items: line count, mean unit price in cents
    (floor-half-up of the exact-integer mean), and the coefficient of
    variation in micro units — cv = sqrt(n·Σu² − (Σu)²) / Σu, every moment an
    exact integer over unit-price cents u = floor(extendedprice/quantity ×
    100 + 0.5) (ONE identical double division per row on both engines).

    Scale shape: per-batch (partkey, n, s, s2) combiner, ONE partkey-hash
    bucket exchange (a part's partials complete in one bucket), per-bucket
    vectorized fold emits one row per part — the output stays a distributed
    dataset; nothing driver-side."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        u = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            / t["l_quantity"].to_numpy(zero_copy_only=False)
            * 100.0
            + 0.5
        ).astype(np.int64)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame({"pk": pk, "n": 1, "s": u, "s2": u.astype(object) * u})
            .groupby("pk", sort=False, as_index=False)
            .sum()
        )
        g["_b"] = (g["pk"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("pk", sort=False, as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum")
        )
        f = f[f["n"] >= 2]
        empty = pd.DataFrame(
            {
                "l_partkey": pd.Series([], dtype=np.int64),
                "n_lines": pd.Series([], dtype=np.int64),
                "mean_cents": pd.Series([], dtype=np.int64),
                "cv_micro": pd.Series([], dtype=np.int64),
            }
        )
        if f.empty:
            return empty
        n = f["n"].to_numpy(np.int64)
        s = f["s"].to_numpy(object)
        s2 = f["s2"].to_numpy(object)
        var_num = n * s2 - s * s  # object bigints, exact
        mean_cents = np.floor(
            s.astype(np.float64) / n.astype(np.float64) + 0.5
        ).astype(np.int64)
        cv = np.floor(
            np.sqrt(var_num.astype(np.float64))
            / s.astype(np.float64)
            * 1_000_000.0
            + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "l_partkey": f["pk"].to_numpy(np.int64),
                "n_lines": n,
                "mean_cents": mean_cents,
                "cv_micro": cv,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES140["lineitem_price_dispersion"] = """
WITH u AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS HUGEINT)
           AS u
  FROM lineitem
),
s AS (
  SELECT l_partkey, CAST(count(*) AS HUGEINT) AS n,
         sum(u) AS s, sum(u * u) AS s2
  FROM u GROUP BY 1 HAVING count(*) >= 2
)
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(n AS BIGINT) AS n_lines,
       CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5) AS BIGINT)
         AS mean_cents,
       CAST(floor(sqrt(CAST(n * s2 - s * s AS DOUBLE)) / CAST(s AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS cv_micro
FROM s"""


# ---------------------------------------------------------------------------
# docs_length_anova — variance in document length explained by language
# ---------------------------------------------------------------------------


def q_docs_length_anova(sf_dir: str):
    """One-way ANOVA effect size: eta² = SS_between / SS_total of n_chars
    grouped by lang, in micro units. Every moment is an exact bigint; the
    per-group between-term uses INTEGER floor division (Tg²·n)//ng — order-
    free and bit-identical on both engines (each term is < 1 below the true
    rational; the documented contract) — so eta2_micro =
    floor((Σ(Tg²·n)//ng − T²) / (n·Σx² − T²) × 1e6 + 0.5) is ONE shared
    double finish.

    Scale shape: per-batch (lang, n, s, s2) combiner over the bounded lang
    grid; driver fold; no shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "lang": np.asarray(t["lang"].to_numpy(zero_copy_only=False)),
                    "n": 1,
                    "s": x,
                    "s2": x.astype(object) * x,
                }
            )
            .groupby("lang", sort=False, as_index=False)
            .sum()
        )
        return g

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "n_langs": pd.Series([], dtype=np.int64),
            "n_docs": pd.Series([], dtype=np.int64),
            "eta2_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = part.groupby("lang", sort=True, as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum")
    )
    n = int(grid["n"].sum())
    T = sum(int(v) for v in grid["s"])
    sumsq = sum(int(v) for v in grid["s2"])
    sst_num = n * sumsq - T * T  # n · SST, exact
    if sst_num <= 0:
        return empty
    # n · SSB ≈ Σ (Tg²·n)//ng − T² with exact integer floor per group —
    # order-free, so the Σ needs no ordering contract.
    ssb_num = (
        sum(int(r["s"]) * int(r["s"]) * n // int(r["n"]) for _, r in grid.iterrows())
        - T * T
    )
    eta2 = float(ssb_num) / float(sst_num)
    return pd.DataFrame(
        {
            "n_langs": [np.int64(len(grid))],
            "n_docs": [np.int64(n)],
            "eta2_micro": [np.int64(np.floor(eta2 * 1_000_000.0 + 0.5))],
        }
    )


ORACLES140["docs_length_anova"] = """
WITH g AS (
  SELECT lang, CAST(count(*) AS HUGEINT) AS ng,
         CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS tg,
         sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS sg2
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(sum(ng) AS HUGEINT) AS n, CAST(sum(tg) AS HUGEINT) AS t,
         CAST(sum(sg2) AS HUGEINT) AS s2,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM g
),
terms AS (
  SELECT sum((tg * tg * tot.n) // ng) AS ssb_part
  FROM g CROSS JOIN tot
)
SELECT tot.n_langs,
       CAST(tot.n AS BIGINT) AS n_docs,
       CAST(floor(CAST(terms.ssb_part - tot.t * tot.t AS DOUBLE)
                  / CAST(tot.n * tot.s2 - tot.t * tot.t AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS eta2_micro
FROM tot CROSS JOIN terms
WHERE tot.n * tot.s2 - tot.t * tot.t > 0"""


QUERIES140 = {
    "lineitem_price_dispersion": q_lineitem_price_dispersion,
    "docs_length_anova": q_docs_length_anova,
}
