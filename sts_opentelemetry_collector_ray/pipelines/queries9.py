"""Driver-contract queries, wave 9 — corpus snapshot diff (CDC between crawl
versions), global row numbering (training-shard id assignment), and per-key
percentile-rank transform. Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import pyarrow as pa  # noqa: F401
import ray.data

ORACLES9: dict[str, str] = {}

_FNV64_BASIS = 14695981039346656037


def _fnv64_sql(expr: str) -> str:
    """FNV-1a64 of a VARCHAR expression as HUGEINT (functions/hashing.py
    replay; '' hashes to the offset basis — no bytes folded)."""
    return f"""CASE WHEN {expr} = '' THEN CAST({_FNV64_BASIS} AS HUGEINT)
ELSE CAST(list_reduce(list_prepend(CAST({_FNV64_BASIS} AS HUGEINT),
  list_transform(string_split({expr}, ''), c -> unicode(c)::HUGEINT)),
  (acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616) AS HUGEINT) END"""


# ---------------------------------------------------------------------------
# docs_snapshot_diff — added/removed/changed between two corpus versions
# ---------------------------------------------------------------------------
# Deterministic version simulation: the OLD snapshot drops doc_id % 7 == 0,
# the NEW snapshot drops doc_id % 11 == 0 and appends ' v2' to every
# doc_id % 5 == 0 text. The diff operator itself only sees (key, hash).


def q_docs_snapshot_diff(sf_dir: str):
    """Snapshot diff (stages/compact.py::snapshot_diff — both sides ship only
    (key, fnv64(content)) through ONE bounded bucket exchange; the reference's
    rules/diff.py tombstone diff generalized to corpus versions)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_arrow
    from ..stages.compact import snapshot_diff

    def hashed(keep_mod: int, mutate: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(ids % keep_mod != 0))
            txt = pc.fill_null(t["text"], "")
            if mutate:
                is_v2 = pa.array(
                    t["doc_id"].to_numpy(zero_copy_only=False) % 5 == 0
                )
                txt = pc.if_else(
                    is_v2, pc.binary_join_element_wise(txt, " v2", ""), txt
                )
            h = fnv1a64_arrow(txt.combine_chunks()).astype(np.int64)
            return pa.table(
                {"doc_id": t["doc_id"], "content_h": pa.array(h, pa.int64())}
            )

        return fn

    def side(keep_mod: int, mutate: bool):
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(hashed(keep_mod, mutate), batch_format="pyarrow")

    return snapshot_diff(side(7, False), side(11, True))


ORACLES9["docs_snapshot_diff"] = f"""
WITH oldt AS (
  SELECT doc_id, {_fnv64_sql("coalesce(text, '')")} AS h
  FROM documents WHERE doc_id % 7 <> 0
),
newt AS (
  SELECT doc_id,
         {_fnv64_sql("CASE WHEN doc_id % 5 = 0 THEN coalesce(text, '') || ' v2' ELSE coalesce(text, '') END")} AS h
  FROM documents WHERE doc_id % 11 <> 0
)
SELECT doc_id,
       CASE WHEN o.h IS NULL THEN 'added'
            WHEN n.h IS NULL THEN 'removed'
            ELSE 'changed' END AS change
FROM oldt o FULL JOIN newt n USING (doc_id)
WHERE o.h IS NULL OR n.h IS NULL OR o.h <> n.h"""


# ---------------------------------------------------------------------------
# docs_global_rownum — dense 0..N-1 ids in (lang, doc_id) order, no global sort
# ---------------------------------------------------------------------------


def q_docs_global_rownum(sf_dir: str):
    """Global row numbering (stages/analytics.py::global_row_number — range
    histogram → driver prefix-sum → broadcast offsets → in-bucket argsort;
    every bucket ≤ range_width rows, rows shuffle ONCE)."""
    from ..stages.analytics import global_row_number

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return global_row_number(ds, group_col="lang", id_col="doc_id", range_width=256)


ORACLES9["docs_global_rownum"] = """
SELECT doc_id, lang,
       CAST(row_number() OVER (ORDER BY lang, doc_id) - 1 AS BIGINT) AS row_num
FROM documents"""


# ---------------------------------------------------------------------------
# events_percentile_rank — per-type percentile of every row (rank transform)
# ---------------------------------------------------------------------------


def q_events_percentile_rank(sf_dir: str):
    """Percentile-rank feature transform (analytics.py::percentile_rank —
    bounded (key, cents) histogram broadcast, streaming searchsorted scoring;
    rows never shuffle). Input is re-read per pass (two passes over the
    source, per the no-branch rule)."""
    from ..stages.analytics import percentile_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    return percentile_rank(ds, value_col="value", key_col="event_type")


ORACLES9["events_percentile_rank"] = """
WITH b AS (
  SELECT event_id, event_type, value,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
c AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
t AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
le AS (
  SELECT event_type, cents,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) - cnt AS less
  FROM c
)
SELECT b.event_id, b.event_type, b.value,
       CAST((1000000 * le.less) // t.n AS BIGINT) AS pr_micro
FROM b JOIN le USING (event_type, cents) JOIN t USING (event_type)"""


QUERIES9 = {
    "docs_snapshot_diff": q_docs_snapshot_diff,
    "docs_global_rownum": q_docs_global_rownum,
    "events_percentile_rank": q_events_percentile_rank,
}
