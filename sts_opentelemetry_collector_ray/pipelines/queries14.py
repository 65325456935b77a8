"""Driver-contract queries, wave 14 — duplicated n-gram span detection (the
Lee et al. 2022 "Deduplicating Training Data" substring-dedup signal, exact
over corpus-wide 5-gram positions) and market-basket pair co-occurrence
(within-group self-pairing without a self-join). Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES14: dict[str, str] = {}

_SPAN_W = 5  # tokens per shingle
_SPAN_BUCKETS = 64
_BASKET_BUCKETS = 64


# ---------------------------------------------------------------------------
# docs_dup_spans — per-doc count of token positions opening a corpus-repeated
# 5-gram (the signal substring dedup removes; Lee et al. 2022 use 50-token
# spans over a suffix array — same semantics at shingle granularity)
# ---------------------------------------------------------------------------


def q_docs_dup_spans(sf_dir: str):
    """Duplicated-span detection: for every doc, how many of its 5-token
    shingle positions start a shingle that occurs MORE THAN ONCE corpus-wide.
    Scale shape: the exchange carries (shingle-fnv64, doc_id) — 16 B per
    position, text never leaves the batch — through ONE bounded hash-bucket
    exchange (all occurrences of a shingle land in one bucket); per-bucket
    np.unique counts mark dup positions; a SECOND doc-bucket exchange merges
    each doc's per-shingle-bucket partials with a vectorized pandas re-sum
    (doc count is unbounded, so a Ray `groupby(doc_id).aggregate()` reduce —
    ~2 ms/group measured, CLAUDE.md — is the wrong tail here). Same
    zero-false-negative hash contract as stages/compact.py::snapshot_diff
    (collision odds ~2^-64 make a false dup, never a miss)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_arrow

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def shingle_positions(t: pa.Table) -> pa.Table:
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
        m = np.maximum(fcounts - _SPAN_W + 1, 0)  # shingle starts per doc
        total = int(m.sum())
        empty = pa.table(
            {
                "_b": pa.array([], pa.int32()),
                "h": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
            }
        )
        if total == 0:
            return empty
        cm = np.concatenate([[0], np.cumsum(m)])
        intra = np.arange(total, dtype=np.int64) - np.repeat(cm[:-1], m)
        starts = np.repeat(fo[:-1], m) + intra
        parts = [fv.take(pa.array(starts + j)) for j in range(_SPAN_W)]
        sh = pc.binary_join_element_wise(*parts, " ")
        h = fnv1a64_arrow(sh)
        return pa.table(
            {
                "_b": pa.array((h % _SPAN_BUCKETS).astype(np.int32)),
                "h": pa.array(h.view(np.int64)),
                "doc_id": pa.array(
                    np.repeat(t["doc_id"].to_numpy(), m).astype(np.int64)
                ),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        dup = (cnt[inv] > 1).astype(np.int64)
        out = (
            pd.DataFrame({"doc_id": g["doc_id"].to_numpy(), "dp": dup})
            .groupby("doc_id", sort=False)
            .agg(dp=("dp", "sum"), tp=("dp", "size"))
            .reset_index()
        )
        out["dp"] = out["dp"].astype(np.int64)
        out["tp"] = out["tp"].astype(np.int64)
        out["_b2"] = (
            out["doc_id"].to_numpy().astype(np.uint64) % _SPAN_BUCKETS
        ).astype(np.int32)
        return out

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("doc_id", sort=False)
            .agg(dup_positions=("dp", "sum"), total_positions=("tp", "sum"))
            .reset_index()
        )
        out["dup_positions"] = out["dup_positions"].astype(np.int64)
        out["total_positions"] = out["total_positions"].astype(np.int64)
        return out

    pos = ds.map_batches(shingle_positions, batch_format="pyarrow")
    partials = pos.groupby("_b").map_groups(per_bucket, batch_format="pandas")
    return partials.groupby("_b2").map_groups(per_doc, batch_format="pandas")


ORACLES14["docs_dup_spans"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), sh AS (
  SELECT doc_id,
         l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS s
  FROM toks, UNNEST(range(1, len(l)::BIGINT - 3)) AS t(i)
), c AS (
  SELECT s, count(*) AS n FROM sh GROUP BY s
)
SELECT sh.doc_id,
       CAST(count(*) FILTER (WHERE c.n > 1) AS BIGINT) AS dup_positions,
       count(*) AS total_positions
FROM sh JOIN c USING (s)
GROUP BY sh.doc_id"""


# ---------------------------------------------------------------------------
# basket_pairs — top co-purchased part pairs (within-order co-occurrence)
# ---------------------------------------------------------------------------


def q_basket_pairs(sf_dir: str):
    """Market-basket co-occurrence: top part pairs appearing in the same
    order. NOT a self-join: items bucket-exchange by order key once, each
    bucket enumerates sorted within-order pairs with a bounded lag loop
    (TPC-H orders hold ≤7 items, so ≤6 vectorized passes), a per-bucket
    combiner collapses to (pair, count) partials, and a SECOND bucket
    exchange keyed by pair hash finishes: per-bucket exact sums + local
    top-20, then one tiny global sort over ≤ buckets×20 rows. (A Ray
    two-key `groupby().aggregate()` here measured 206 CPU-s for 115k
    groups — the reduce is per-group-shaped; the bucketed-pandas pattern
    is ~50× cheaper and is the same idiom as stages/clusters.py.)"""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        b = (
            df["l_orderkey"].to_numpy().astype(np.uint64) % _BASKET_BUCKETS
        ).astype(np.int32)
        return df.assign(_b=b)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"], kind="mergesort"
        )
        ok = g["l_orderkey"].to_numpy()
        pk = g["l_partkey"].to_numpy()
        n = len(g)
        outs_a, outs_b = [], []
        j = 1
        while j < n:
            same = ok[: n - j] == ok[j:]
            if not same.any():
                break
            outs_a.append(pk[: n - j][same])
            outs_b.append(pk[j:][same])
            j += 1
        if not outs_a:
            return pd.DataFrame(
                {
                    "part_a": pd.Series([], dtype=np.int64),
                    "part_b": pd.Series([], dtype=np.int64),
                    "pn": pd.Series([], dtype=np.int64),
                    "_b2": pd.Series([], dtype=np.int32),
                }
            )
        a = np.concatenate(outs_a)
        b = np.concatenate(outs_b)
        out = (
            pd.DataFrame({"part_a": a, "part_b": b})
            .groupby(["part_a", "part_b"], sort=False)
            .size()
            .rename("pn")
            .reset_index()
        )
        out["pn"] = out["pn"].astype(np.int64)
        h = out["part_a"].to_numpy().astype(np.uint64) * np.uint64(
            2654435761
        ) ^ out["part_b"].to_numpy().astype(np.uint64)
        out["_b2"] = (h % _BASKET_BUCKETS).astype(np.int32)
        return out

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # all partials of a pair land in this bucket → sums here are GLOBAL,
        # so the bucket's top-20 is a superset of its global-top-20 members
        out = (
            g.groupby(["part_a", "part_b"], sort=False)["pn"]
            .sum()
            .rename("n")
            .reset_index()
        )
        out["n"] = out["n"].astype(np.int64)
        return out.sort_values(
            ["n", "part_a", "part_b"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(20)

    b = ds.map_batches(bucketize, batch_format="pandas")
    partials = b.groupby("_b").map_groups(pairs, batch_format="pandas")
    heads = partials.groupby("_b2").map_groups(topk_bucket, batch_format="pandas")
    return heads.sort(
        ["n", "part_a", "part_b"], descending=[True, False, False]
    ).limit(20)


ORACLES14["basket_pairs"] = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n
FROM items a
JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 ORDER BY n DESC, part_a, part_b LIMIT 20"""


QUERIES14 = {
    "docs_dup_spans": q_docs_dup_spans,
    "basket_pairs": q_basket_pairs,
}
