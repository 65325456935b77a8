"""Driver-contract queries, wave 11 — a TPC-H Q3-shaped 3-way join pipeline
(the multi-join relational workhorse), distributed regex corpus search, and
per-key inter-arrival lag deltas. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import pyarrow as pa  # noqa: F401
import ray.data

ORACLES11: dict[str, str] = {}

_Q3_CUT = "1998-01-01"
_Q3_SEG = "BUILDING"
_Q3_K = 10


# ---------------------------------------------------------------------------
# q3_shipping — customer ⋈ orders ⋈ lineitem → exact-cents revenue top-k
# ---------------------------------------------------------------------------


def q_q3_shipping(sf_dir: str):
    """TPC-H Q3 shape: filter customer segment, two hash joins (both sides
    pruned at the read and pre-filtered BEFORE the shuffle), revenue summed in
    EXACT integer 10⁻⁴-dollars (float sums are order-dependent and could never
    hash-match), tiny post-aggregate sort for the top 10."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], _Q3_SEG)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    cut = np.datetime64(_Q3_CUT, "us")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pa.array(t["o_orderdate"].to_numpy(zero_copy_only=False) < cut)
        ),
        batch_format="pyarrow",
    )
    def li_cents(t: pa.Table) -> pa.Table:
        t = t.filter(
            pa.array(t["l_shipdate"].to_numpy(zero_copy_only=False) > cut)
        )
        ep = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        dc = np.floor(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev4": pa.array(ep * (100 - dc), pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_cents, batch_format="pyarrow")

    oc = orders.join(
        cust, join_type="inner", num_partitions=8,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    j = li.join(
        oc, join_type="inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    agg = j.groupby(["l_orderkey", "o_orderdate"]).aggregate(
        Sum("rev4", alias_name="rev4")
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "o_orderdate": t["o_orderdate"].cast(pa.timestamp("us")),
                "revenue": pa.array(
                    t["rev4"].to_numpy(zero_copy_only=False).astype(np.float64)
                    / 10000.0
                ),
                "_neg": pc.multiply(t["rev4"], -1),
            }
        )

    return (
        agg.map_batches(finalize, batch_format="pyarrow")
        .sort(["_neg", "l_orderkey"])
        .limit(_Q3_K)
        .map_batches(lambda t: t.drop_columns(["_neg"]), batch_format="pyarrow")
    )


ORACLES11["q3_shipping"] = f"""
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) / 10000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{_Q3_SEG}'
  AND o_orderdate < TIMESTAMP '{_Q3_CUT}'
  AND l_shipdate > TIMESTAMP '{_Q3_CUT}'
GROUP BY l_orderkey, o_orderdate
ORDER BY sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) DESC,
         l_orderkey
LIMIT {_Q3_K}"""


# ---------------------------------------------------------------------------
# docs_regex_search — distributed grep with per-doc match counts
# ---------------------------------------------------------------------------

_SEARCH_PAT = r"(?:data|query) [a-z]+"


def q_docs_regex_search(sf_dir: str):
    """Corpus regex search: per-doc non-overlapping match counts via the Arrow
    RE2 kernel (count_substring_regex), matched docs only — stateless, zero
    shuffles, the map-side of every 'find examples mentioning X' curation
    pass."""
    import pyarrow.compute as pc

    def scan(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(pc.fill_null(t["text"], ""), _SEARCH_PAT)
        out = pa.table(
            {"doc_id": t["doc_id"], "n_matches": pc.cast(n, pa.int64())}
        )
        return out.filter(pc.greater(out["n_matches"], 0))

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(scan, batch_format="pyarrow")


ORACLES11["docs_regex_search"] = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(coalesce(text, ''), '{_SEARCH_PAT}')) AS BIGINT)
         AS n_matches
FROM documents
WHERE len(regexp_extract_all(coalesce(text, ''), '{_SEARCH_PAT}')) > 0"""


# ---------------------------------------------------------------------------
# events_interarrival — per-user lag deltas (window-function family)
# ---------------------------------------------------------------------------


def q_events_interarrival(sf_dir: str):
    """Per-user time-since-previous-event (analytics.py::interarrival_deltas —
    one bounded key-bucket exchange + vectorized lexsort/shift; first event
    per user NULL)."""
    from ..stages.analytics import interarrival_deltas

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return interarrival_deltas(ds)


ORACLES11["events_interarrival"] = """
SELECT event_id, user_id,
       CAST(epoch_us(ts) - lag(epoch_us(ts))
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS delta_us
FROM events"""


QUERIES11 = {
    "q3_shipping": q_q3_shipping,
    "docs_regex_search": q_docs_regex_search,
    "events_interarrival": q_events_interarrival,
}
