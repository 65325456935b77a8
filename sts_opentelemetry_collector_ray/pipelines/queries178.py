"""Driver-contract queries, wave 178 — document-id continuity (holes in the
doc_id sequence betray dropped ingest batches) and value ANOVA by event type
(how much of value variance the type explains — eta² with the order-free
integer floor-div contract from docs_length_anova). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES178: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_id_continuity — holes in the doc_id sequence
# ---------------------------------------------------------------------------


def q_docs_id_continuity(sf_dir: str):
    """One row: documents, distinct ids, the min..max id span, missing ids
    inside the span, and duplicate-id rows — the ingest-completeness audit.

    Scale shape: per-batch (min, max, n, distinct-partial) — distinct ids
    resolve through ONE id-bucket exchange emitting one scalar row per
    bucket; the driver folds 64 rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame({"id": ids, "n": 1})
            .groupby("id", sort=False, as_index=False)["n"]
            .sum()
        )
        g["_b"] = (g["id"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"n": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        per_id = g.groupby("id", sort=False, as_index=False)["n"].sum()
        return pd.DataFrame(
            {
                "n_rows": [np.int64(per_id["n"].sum())],
                "n_ids": [np.int64(len(per_id))],
                "lo": [np.int64(per_id["id"].min())],
                "hi": [np.int64(per_id["id"].max())],
                "dups": [np.int64((per_id["n"] - 1).sum())],
            }
        )

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "n_docs": pd.Series([], dtype=np.int64),
            "n_distinct_ids": pd.Series([], dtype=np.int64),
            "span": pd.Series([], dtype=np.int64),
            "n_missing": pd.Series([], dtype=np.int64),
            "n_dup_rows": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "n_rows" not in part.columns:
        return empty
    n_ids = int(part["n_ids"].sum())  # buckets partition ids: sum is exact
    span = int(part["hi"].max()) - int(part["lo"].min()) + 1
    return pd.DataFrame(
        {
            "n_docs": [np.int64(part["n_rows"].sum())],
            "n_distinct_ids": [np.int64(n_ids)],
            "span": [np.int64(span)],
            "n_missing": [np.int64(span - n_ids)],
            "n_dup_rows": [np.int64(part["dups"].sum())],
        }
    )


ORACLES178["docs_id_continuity"] = """
WITH g AS (SELECT doc_id, count(*) AS n FROM documents GROUP BY 1),
s AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_distinct_ids,
         CAST(max(doc_id) - min(doc_id) + 1 AS BIGINT) AS span,
         CAST(sum(n - 1) AS BIGINT) AS n_dup_rows
  FROM g
)
SELECT n_docs, n_distinct_ids, span,
       CAST(span - n_distinct_ids AS BIGINT) AS n_missing,
       n_dup_rows
FROM s"""


# ---------------------------------------------------------------------------
# events_value_anova — value variance explained by event type
# ---------------------------------------------------------------------------


def q_events_value_anova(sf_dir: str):
    """One row: types, events, and eta² in micro units over value cents —
    the order-free integer floor-div between-term contract
    (docs_length_anova): eta2_micro =
    floor((Σ(Tg²·n)//ng − T²) / (n·Σx² − T²) × 1e6 + 0.5).

    Scale shape: per-batch (type, n, s, s²) combiner over the bounded type
    grid; exact bigint fold on the driver."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        x = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "event_type": np.asarray(
                        t["event_type"].to_numpy(zero_copy_only=False)
                    ),
                    "n": 1,
                    "s": x,
                    "s2": x.astype(object) * x,
                }
            )
            .groupby("event_type", sort=False, as_index=False)
            .sum()
        )
        return g

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "n_types": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "eta2_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    grid = part.groupby("event_type", sort=True, as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum")
    )
    n = int(grid["n"].sum())
    T = sum(int(v) for v in grid["s"])
    sumsq = sum(int(v) for v in grid["s2"])
    sst_num = n * sumsq - T * T
    if sst_num <= 0:
        return empty
    ssb_num = (
        sum(int(r["s"]) * int(r["s"]) * n // int(r["n"]) for _, r in grid.iterrows())
        - T * T
    )
    eta2 = float(ssb_num) / float(sst_num)
    return pd.DataFrame(
        {
            "n_types": [np.int64(len(grid))],
            "n_events": [np.int64(n)],
            "eta2_micro": [np.int64(np.floor(eta2 * 1_000_000.0 + 0.5))],
        }
    )


ORACLES178["events_value_anova"] = """
WITH g AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS ng,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)) AS HUGEINT)
           AS tg,
         sum(CAST(floor(value * 100.0 + 0.5) AS HUGEINT)
             * CAST(floor(value * 100.0 + 0.5) AS HUGEINT)) AS sg2
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(sum(ng) AS HUGEINT) AS n, CAST(sum(tg) AS HUGEINT) AS t,
         CAST(sum(sg2) AS HUGEINT) AS s2,
         CAST(count(*) AS BIGINT) AS n_types
  FROM g
),
terms AS (
  SELECT sum((tg * tg * tot.n) // ng) AS ssb_part
  FROM g CROSS JOIN tot
)
SELECT tot.n_types,
       CAST(tot.n AS BIGINT) AS n_events,
       CAST(floor(CAST(terms.ssb_part - tot.t * tot.t AS DOUBLE)
                  / CAST(tot.n * tot.s2 - tot.t * tot.t AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS eta2_micro
FROM tot CROSS JOIN terms
WHERE tot.n * tot.s2 - tot.t * tot.t > 0"""


QUERIES178 = {
    "docs_id_continuity": q_docs_id_continuity,
    "events_value_anova": q_events_value_anova,
}
