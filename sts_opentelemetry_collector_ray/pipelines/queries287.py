"""Driver-contract queries, wave 287 — the Chao1 unseen-species
estimator of per-source vocabulary richness (from the exact
frequency-of-frequencies) and a price-stickiness census: how many
distinct prices each part trades at (menu-cost view, exact integer
histogram). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES287: dict[str, str] = {}

_PS_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_chao1 — unseen-species vocabulary richness per source
# ---------------------------------------------------------------------------


def q_docs_chao1(sf_dir: str):
    """Chao1 richness per source: with V observed types, V1 singletons
    and V2 doubletons, Chao1 = V + V1 (V1 - 1) / (2 (V2 + 1)) (the
    bias-corrected form, defined even when V2 = 0) — the estimated
    vocabulary INCLUDING unseen words. Counts are exact; one division.
    Per source: source, n_types, v1, v2, chao1_milli.

    Scale shape: the `docs_yule_k` wordcount exchange, then a per-batch
    frequency-of-frequencies combiner — the driver folds |sources| x
    |distinct frequency| partials."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def local_counts(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pa.array(
            np.repeat(t["source"].to_numpy(zero_copy_only=False), n_per),
            pa.string(),
        )
        flat = toks.combine_chunks().flatten()
        keep = pc.not_equal(flat, "")
        g = (
            pa.table({"source": src.filter(keep), "token": flat.filter(keep)})
            .group_by(["source", "token"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["source", "token", "pn"])

    counts = (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum("pn", alias_name="c"))
    )

    def fof(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": t["source"].to_numpy(zero_copy_only=False),
                "c": t["c"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby(["source", "c"]).size().rename("v").reset_index()
        g["v"] = g["v"].astype(np.int64)
        return g

    f = (
        counts.map_batches(fof, batch_format="pyarrow")
        .to_pandas()
        .groupby(["source", "c"])["v"]
        .sum()
        .reset_index()
    )
    cols = ["source", "n_types", "v1", "v2", "chao1_milli"]
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if f.empty:
        return empty
    rows = []
    for source, sub in f.groupby("source"):
        v = int(sub["v"].sum())
        v1 = int(sub.loc[sub["c"] == 1, "v"].sum())
        v2 = int(sub.loc[sub["c"] == 2, "v"].sum())
        chao1 = float(v) + float(v1) * float(v1 - 1) / (2.0 * float(v2 + 1))
        rows.append(
            (
                source, np.int64(v), np.int64(v1), np.int64(v2),
                np.int64(np.floor(chao1 * 1_000.0 + 0.5)),
            )
        )
    return (
        pd.DataFrame(rows, columns=cols)
        .sort_values("source")
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols[1:]})
    )


ORACLES287["docs_chao1"] = r"""
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
c AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS v,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
  FROM c GROUP BY 1
)
SELECT source, v AS n_types, v1, v2,
       CAST(floor((CAST(v AS DOUBLE)
                   + CAST(v1 AS DOUBLE) * CAST(v1 - 1 AS DOUBLE)
                     / (2.0 * CAST(v2 + 1 AS DOUBLE)))
                  * 1000.0 + 0.5) AS BIGINT) AS chao1_milli
FROM agg
ORDER BY source"""


# ---------------------------------------------------------------------------
# part_price_stickiness — distinct trading prices per part, as a census
# ---------------------------------------------------------------------------


def q_part_price_stickiness(sf_dir: str):
    """Menu-cost census: per part, how many DISTINCT unit prices
    (extendedprice/quantity rounded to cents) it trades at across
    lineitems; reported as the histogram (n_prices -> n_parts,
    n_items, share of parts). Pure integer counting. Per row: n_prices,
    n_parts, n_items, share_micro.

    Scale shape: distinct (part, price) pairs + item counts ride ONE
    partkey-bucket exchange; each bucket emits its bounded
    (n_prices -> counts) partial."""

    def partial(t: pa.Table) -> pd.DataFrame:
        unit = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            / t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "pk": t["l_partkey"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "p": unit,
            }
        )
        df["_b"] = (df["pk"] % _PS_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("pk").agg(
            n_prices=("p", "nunique"), n_items=("p", "size")
        )
        h = (
            per.groupby("n_prices")
            .agg(n_parts=("n_items", "size"), n_items=("n_items", "sum"))
            .reset_index()
        )
        return h.astype(np.int64)

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("n_prices")[["n_parts", "n_items"]]
        .sum()
        .sort_index()
    )
    cols = ["n_prices", "n_parts", "n_items", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    total = int(h["n_parts"].sum())
    out = h.reset_index()
    out["share_micro"] = np.floor(
        out["n_parts"].to_numpy(np.float64) / float(total) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES287["part_price_stickiness"] = """
WITH unit AS (
  SELECT l_partkey AS pk,
         CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5) AS BIGINT)
           AS p
  FROM lineitem
),
per AS (
  SELECT pk, CAST(count(DISTINCT p) AS BIGINT) AS n_prices,
         CAST(count(*) AS BIGINT) AS n_items
  FROM unit GROUP BY 1
),
h AS (
  SELECT n_prices, CAST(count(*) AS BIGINT) AS n_parts,
         CAST(sum(n_items) AS BIGINT) AS n_items
  FROM per GROUP BY 1
),
tot AS (SELECT CAST(sum(n_parts) AS BIGINT) AS t FROM h)
SELECT h.n_prices, h.n_parts, h.n_items,
       CAST(floor(CAST(h.n_parts AS DOUBLE) / CAST(tot.t AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM h, tot
ORDER BY h.n_prices"""


QUERIES287 = {
    "docs_chao1": q_docs_chao1,
    "part_price_stickiness": q_part_price_stickiness,
}
