"""Driver-contract queries, wave 27 — mixture rebalancing (deterministic
hash-thinning of over-represented languages to the minority count — the data
mixing step before training) and prefix template fingerprinting (boilerplate
detection over document heads). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES27: dict[str, str] = {}

_PT_BUCKETS = 64
_PT_W = 5

# FNV-1a32 of doc_id as VARCHAR (the docs_split hash), modulo a parameter
_FNV32_EXPR = (
    "list_reduce(list_prepend(2166136261::BIGINT, "
    "list_transform(string_split(CAST(doc_id AS VARCHAR), ''), "
    "c -> unicode(c)::BIGINT)), "
    "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296)"
)


# ---------------------------------------------------------------------------
# docs_mixture_rebalance — downsample every language to the minority count
# ---------------------------------------------------------------------------


def q_docs_mixture_rebalance(sf_dir: str):
    """Mixture rebalancing: thin every language to (in expectation) the
    minority language's count with the content-independent id hash — keep iff
    fnv32(doc_id) % n_lang < n_min. Deterministic (no RNG state, reproducible
    across runs/partitionings), exact-rational keep rates, and one tiny
    counts pass (|langs| driver rows) before a stateless streaming filter —
    the data-mixing step at any corpus size. Same hash family as
    `docs_split`/`docs_negative_samples`."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a32_arrow

    path = f"{sf_dir}/documents.parquet"

    counts = (
        ray.data.read_parquet(path, columns=["lang"])
        .map_batches(
            lambda t: pa.Table.from_pandas(
                pd.DataFrame({"lang": t["lang"].to_pandas()})
                .groupby("lang", sort=False)
                .size()
                .rename("pn")
                .reset_index(),
                preserve_index=False,
            ).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("lang")["pn"]
        .sum()
    )
    n_min = np.uint64(counts.min())
    langs = pa.array(counts.index.tolist())
    n_lang = counts.to_numpy().astype(np.uint64)

    def thin(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.string()).combine_chunks()
        h = fnv1a32_arrow(ids)
        li = pc.index_in(t["lang"], value_set=langs).to_numpy(zero_copy_only=False)
        keep = (h % n_lang[li]) < n_min
        return t.filter(pa.array(keep)).select(["doc_id", "lang"])

    return ray.data.read_parquet(path, columns=["doc_id", "lang"]).map_batches(
        thin, batch_format="pyarrow"
    )


ORACLES27["docs_mixture_rebalance"] = f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
t AS (SELECT min(n) AS n_min FROM c)
SELECT doc_id, lang
FROM documents JOIN c USING (lang) CROSS JOIN t
WHERE {_FNV32_EXPR} % c.n < t.n_min"""


# ---------------------------------------------------------------------------
# docs_prefix_templates — boilerplate fingerprints over document heads
# ---------------------------------------------------------------------------


def q_docs_prefix_templates(sf_dir: str):
    """Template/boilerplate fingerprinting: group documents by their first
    5 tokens (the head most boilerplate shares) and report per-prefix doc
    count + smallest member id — the detection table a crawl-cleaning pass
    filters against. Per-batch (prefix, count, min_id) combiner → ONE bounded
    prefix-hash bucket exchange → vectorized per-bucket re-reduce (the
    vocab-scale aggregate via the bucketed-pandas idiom, not a per-group Ray
    reduce). Docs with fewer than 5 tokens have no head and are absent."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_arrow

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t["text"], "")), r"\s+"
        ).combine_chunks()
        off = toks.offsets.to_numpy()
        vals = toks.values.slice(off[0], int(off[-1] - off[0]))
        off = off - off[0]
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        fv = vals.filter(pa.array(keep))
        cs = np.concatenate([[0], np.cumsum(keep, dtype=np.int64)])
        fcounts = cs[off[1:]] - cs[off[:-1]]
        fo = np.concatenate([[0], np.cumsum(fcounts)])
        ok = fcounts >= _PT_W
        empty = pa.table(
            {
                "_b": pa.array([], pa.int32()),
                "prefix": pa.array([], pa.string()),
                "pn": pa.array([], pa.int64()),
                "mid": pa.array([], pa.int64()),
            }
        )
        if not ok.any():
            return empty
        starts = fo[:-1][ok]
        parts = [fv.take(pa.array(starts + j)) for j in range(_PT_W)]
        prefix = pc.binary_join_element_wise(*parts, " ")
        df = (
            pd.DataFrame(
                {
                    "prefix": prefix.to_pandas().to_numpy(dtype=object),
                    "doc_id": t["doc_id"].to_numpy()[ok],
                }
            )
            .groupby("prefix", sort=False)["doc_id"]
            .agg(pn="size", mid="min")
            .reset_index()
        )
        df["pn"] = df["pn"].astype(np.int64)
        df["mid"] = df["mid"].astype(np.int64)
        h = fnv1a64_arrow(pa.array(df["prefix"].to_numpy(dtype=object), pa.string()))
        df["_b"] = (h % _PT_BUCKETS).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
            None
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("prefix", sort=False)
            .agg(n_docs=("pn", "sum"), min_doc_id=("mid", "min"))
            .reset_index()
        )
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["min_doc_id"] = out["min_doc_id"].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


ORACLES27["docs_prefix_templates"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), p AS (
  SELECT doc_id,
         l[1] || ' ' || l[2] || ' ' || l[3] || ' ' || l[4] || ' ' || l[5] AS prefix
  FROM toks WHERE len(l) >= 5
)
SELECT prefix, count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM p GROUP BY 1"""


QUERIES27 = {
    "docs_mixture_rebalance": q_docs_mixture_rebalance,
    "docs_prefix_templates": q_docs_prefix_templates,
}
