"""Driver-contract queries, wave 115 — tokenizer fertility by language
(chars per BPE-ish token: the multilingual-efficiency metric tokenizer
audits report) and suppliers-per-order histogram (how fragmented order
fulfillment is across suppliers — the consolidation-opportunity
count-of-counts). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries3 import BPE_ISH_PATTERN

ORACLES115: dict[str, str] = {}

_SPO_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_tokenizer_fertility — chars per BPE-ish token, by language
# ---------------------------------------------------------------------------


def q_docs_tokenizer_fertility(sf_dir: str):
    """Fertility per language: total characters over total BPE-ish tokens
    (the wave-3 word/digit/punct alternation), released as exact
    floor-division micro — a language whose fertility drifts high pays more
    context budget per character.

    Scale shape: per-batch (lang, chars, tokens, docs) combiner partials —
    |langs| rows per block — fold on the driver; no shuffle."""

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lang = np.asarray(t["lang"].to_numpy(zero_copy_only=False))
        chars = pc.utf8_length(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = (
            pd.Series(t["text"].to_numpy(zero_copy_only=False))
            .str.count(BPE_ISH_PATTERN)
            .to_numpy()
            .astype(np.int64)
        )
        g = (
            pd.DataFrame({"lang": lang, "chars": chars, "toks": toks, "docs": 1})
            .groupby("lang", sort=False)
            .sum()
            .reset_index()
        )
        return g.astype({"chars": np.int64, "toks": np.int64, "docs": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("lang")[["chars", "toks", "docs"]]
        .sum()
        .sort_index()
        .reset_index()
    )
    c = part["chars"].to_numpy(np.int64)
    tk = part["toks"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "lang": part["lang"].to_numpy(object),
            "n_docs": part["docs"].to_numpy(np.int64),
            "total_chars": c,
            "total_tokens": tk,
            "fertility_micro": c * 1_000_000 // np.maximum(tk, 1),
        }
    )


ORACLES115["docs_tokenizer_fertility"] = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS BIGINT)
         AS total_tokens,
       CAST(sum(length(text)) * 1000000
            // greatest(sum(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))),
                        1) AS BIGINT) AS fertility_micro
FROM documents GROUP BY 1"""


# ---------------------------------------------------------------------------
# orders_suppliers_per_order — fulfillment fragmentation count-of-counts
# ---------------------------------------------------------------------------


def q_orders_suppliers_per_order(sf_dir: str):
    """Consolidation readout: the distribution of DISTINCT suppliers per
    order (count-of-counts) plus the share of multi-supplier orders in
    exact basis points — high fragmentation is freight money on the table.

    Scale shape: per-batch distinct (orderkey, suppkey) pairs → ONE
    orderkey-bucket exchange where per-order distincts resolve exactly
    (pairs co-locate); only the bounded (n_suppliers → n_orders) histogram
    leaves each bucket."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "k": t["l_orderkey"].to_numpy().astype(np.int64),
                "s": t["l_suppkey"].to_numpy().astype(np.int64),
            }
        ).drop_duplicates()
        df["_b"] = (df["k"] % _SPO_BUCKETS).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.drop_duplicates(["k", "s"]).groupby("k", sort=False).size()
        h = m.value_counts().rename("n_orders").reset_index()
        h.columns = ["n_suppliers", "n_orders"]
        return h.astype(np.int64)

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |distinct supplier-counts| per bucket
    )
    g = part.groupby("n_suppliers")["n_orders"].sum().sort_index().reset_index()
    total = int(g["n_orders"].sum())
    multi = int(g.loc[g["n_suppliers"] > 1, "n_orders"].sum())
    g["multi_bp"] = np.int64(multi * 10_000 // max(total, 1))
    return g.astype(np.int64)


ORACLES115["orders_suppliers_per_order"] = """
WITH s AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns FROM lineitem GROUP BY 1
),
h AS (SELECT ns AS n_suppliers, CAST(count(*) AS BIGINT) AS n_orders
      FROM s GROUP BY 1),
t AS (
  SELECT CAST(sum(n_orders) AS BIGINT) AS total,
         CAST(coalesce(sum(n_orders) FILTER (n_suppliers > 1), 0) AS BIGINT)
           AS multi
  FROM h
)
SELECT CAST(h.n_suppliers AS BIGINT) AS n_suppliers, h.n_orders,
       CAST(t.multi * 10000 // greatest(t.total, 1) AS BIGINT) AS multi_bp
FROM h, t"""


QUERIES115 = {
    "docs_tokenizer_fertility": q_docs_tokenizer_fertility,
    "orders_suppliers_per_order": q_orders_suppliers_per_order,
}
