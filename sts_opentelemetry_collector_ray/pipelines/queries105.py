"""Driver-contract queries, wave 105 — adjacent-document duplication probe
(shingle Jaccard of each doc against its id-successor: the crawl-locality
dedup diagnostic, computed with overlapping id-range buckets so neighbor
pairs co-locate without an all-pairs join) and delivery duplicate rate
(share of events repeating a (user, type, minute) key — the at-least-once
ingestion health metric, exact distincts via bucketed partials). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES105: dict[str, str] = {}

_ADJ_RANGE = 64  # docs per id-range bucket (each bucket also reads its left edge)
_ADJ_SHINGLE = 5
_DUP_BUCKETS = 32
_MIN_US = 60_000_000


# ---------------------------------------------------------------------------
# docs_adjacent_dup — shingle Jaccard of id-adjacent document pairs
# ---------------------------------------------------------------------------


def q_docs_adjacent_dup(sf_dir: str):
    """Crawl-locality duplication: for every CONSECUTIVE id pair
    (doc_id, doc_id+1), the Jaccard similarity of their distinct
    {S}-token-shingle sets in exact round-half-up micro — adjacent
    near-dups betray a crawler revisiting the same template. Pairs are
    ADJACENT only (≤ N−1 pairs, never all-pairs); id gaps simply yield no
    pair, so the contract is exact for sparse ids too.

    Scale shape: OVERLAPPING id-range buckets — each row goes to its own
    range bucket AND (as a read-only ghost) to the bucket on its left, so
    every adjacent pair co-locates in exactly one bucket; per-bucket kernel
    sorts by id and intersects successive shingle sets with one
    np.intersect1d per pair over FNV64 shingle hashes (the dup-spans
    zero-false-negative hash contract).""".format(S=_ADJ_SHINGLE)
    from ..functions.hashing import fnv1a64

    def shingle_hashes(text: str) -> np.ndarray:
        toks = [w for w in text.lower().split() if w]
        if len(toks) < _ADJ_SHINGLE:
            return np.empty(0, np.uint64)
        sh = {
            fnv1a64(" ".join(toks[i : i + _ADJ_SHINGLE]))
            for i in range(len(toks) - _ADJ_SHINGLE + 1)
        }
        return np.fromiter(sh, np.uint64, len(sh))

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        texts = t["text"].to_numpy(zero_copy_only=False)
        rows = []
        for i, txt in zip(ids, texts):
            h = np.sort(shingle_hashes(txt))
            b = int(i) // _ADJ_RANGE
            rows.append({"doc_id": int(i), "h": h, "_b": b, "ghost": 0})
            if int(i) % _ADJ_RANGE == 0 and b > 0:
                # left-edge ghost: the previous bucket needs this row to
                # close ITS last adjacent pair
                rows.append({"doc_id": int(i), "h": h, "_b": b - 1, "ghost": 1})
        return pd.DataFrame(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "ghost"], kind="mergesort")
        ids = g["doc_id"].to_numpy(np.int64)
        hs = g["h"].tolist()
        out = []
        for i in range(len(ids) - 1):
            if ids[i + 1] != ids[i] + 1:
                continue  # only consecutive-id pairs (gaps yield none)
            if g["ghost"].iloc[i] == 1:
                continue  # ghosts only ever CLOSE a pair, never open one
            a, b = hs[i], hs[i + 1]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            jacc = (2 * inter * 1_000_000 + union) // (2 * union) if union else 0
            out.append(
                {"doc_id": int(ids[i]), "next_doc_id": int(ids[i + 1]), "jacc_micro": jacc}
            )
        if not out:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "next_doc_id": pd.Series([], dtype=np.int64),
                    "jacc_micro": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(out).astype(np.int64)

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


ORACLES105["docs_adjacent_dup"] = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
           AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < {_ADJ_SHINGLE} THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(list_transform(
                range(1, len(w) - {_ADJ_SHINGLE} + 2),
                i -> array_to_string(
                  array_slice(w, i, i + {_ADJ_SHINGLE - 1}), ' ')))
         END AS s
  FROM toks
),
p AS (
  SELECT a.doc_id, b.doc_id AS next_doc_id,
         CAST(len(list_intersect(a.s, b.s)) AS HUGEINT) AS i,
         CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))
              AS HUGEINT) AS u
  FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
)
SELECT doc_id, next_doc_id,
       CAST(CASE WHEN u = 0 THEN 0
                 ELSE (2 * i * 1000000 + u) // (2 * u) END AS BIGINT)
         AS jacc_micro
FROM p"""


# ---------------------------------------------------------------------------
# events_delivery_dup_rate — at-least-once duplicate share per type
# ---------------------------------------------------------------------------


def q_events_delivery_dup_rate(sf_dir: str):
    """Ingestion health: per event type, how many rows REPEAT an already-
    seen (user, minute) delivery key — n − distinct keys — and the duplicate
    share in exact basis points. The at-least-once redelivery metric an
    ingest pipeline alerts on.

    Scale shape: per-batch distinct (type, user, minute) partials → ONE
    user-bucket exchange (a key's rows co-locate, so per-bucket distincts
    SUM exactly — the stickiness precedent); only bounded per-(bucket,type)
    (n, n_distinct) scalars leave."""

    def partial(t: pa.Table) -> pd.DataFrame:
        u = t["user_id"].to_numpy().astype(np.int64)
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        mn = t["ts"].cast(pa.int64()).to_numpy() // _MIN_US
        df = pd.DataFrame({"ty": et, "u": u, "mn": mn})
        g = (
            df.groupby(["ty", "u", "mn"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        g["n"] = g["n"].astype(np.int64)
        g["_b"] = (g["u"] % _DUP_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["ty", "u", "mn"], sort=False)["n"].sum().reset_index()
        out = (
            m.groupby("ty", sort=False)["n"]
            .agg(n="sum", nd="size")
            .reset_index()
        )
        return out.astype({"n": np.int64, "nd": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |types| per bucket
    )
    g = part.groupby("ty")[["n", "nd"]].sum().sort_index().reset_index()
    n = g["n"].to_numpy(np.int64)
    nd = g["nd"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "event_type": g["ty"].to_numpy(object),
            "n": n,
            "n_dup": n - nd,
            "dup_bp": (n - nd) * 10_000 // np.maximum(n, 1),
        }
    )


ORACLES105["events_delivery_dup_rate"] = f"""
WITH k AS (
  SELECT event_type, user_id, epoch_us(ts) // {_MIN_US} AS mn FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) - count(DISTINCT (user_id, mn)) AS BIGINT) AS n_dup,
       CAST((count(*) - count(DISTINCT (user_id, mn))) * 10000
            // greatest(count(*), 1) AS BIGINT) AS dup_bp
FROM k GROUP BY 1"""


QUERIES105 = {
    "docs_adjacent_dup": q_docs_adjacent_dup,
    "events_delivery_dup_rate": q_events_delivery_dup_rate,
}
