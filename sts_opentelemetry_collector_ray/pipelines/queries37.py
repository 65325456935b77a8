"""Driver-contract queries, wave 37 — audience-overlap Jaccard matrix (the
corpus-mixing / channel-overlap diagnostic) and order document assembly (the
denormalize-to-document-store export: parent + ordered children as one nested
JSON record). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES37: dict[str, str] = {}

_AO_USER_BUCKETS = 32
_DA_ORDER_BUCKETS = 64


# ---------------------------------------------------------------------------
# events_audience_overlap — pairwise Jaccard of per-type user sets
# ---------------------------------------------------------------------------


def q_events_audience_overlap(sf_dir: str):
    """Audience overlap matrix: for every event-type pair (a < b), the exact
    Jaccard similarity of their user sets — the diagnostic behind corpus
    mixing and dedup-across-sources decisions.

    The trick that scales: users never pairwise-join. Each batch emits
    distinct (user, type-bitmask) partials, ONE user-bucket exchange ORs the
    masks per user, and per bucket a 2^|types| histogram (32 cells here)
    ships to the driver — every pairwise intersection/union is then an exact
    integer fold over ≤32 cells, independent of user cardinality."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/events.parquet"
    # type universe from a tiny distinct pass (bounded)
    types = sorted(
        ray.data.read_parquet(path, columns=["event_type"])
        .map_batches(
            lambda t: pa.table({"event_type": pc.unique(t["event_type"])}),
            batch_format="pyarrow",
        )
        .to_pandas()["event_type"]
        .unique()
    )
    k = len(types)

    type_arr = pa.array(types, pa.string())

    def _or_by_user(user: np.ndarray, bits: np.ndarray):
        """Vectorized per-user OR: sort once, bitwise_or.reduceat per run."""
        order = np.argsort(user, kind="mergesort")
        u = user[order]
        b = bits[order]
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        return u[starts], np.bitwise_or.reduceat(b, starts)

    def mask_partial(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=type_arr).to_numpy(
            zero_copy_only=False
        )
        bits = np.left_shift(np.int64(1), idx.astype(np.int64))
        users, masks = _or_by_user(
            t["user_id"].to_numpy(zero_copy_only=False), bits
        )
        return pa.table(
            {
                "user_id": pa.array(users),
                "mask": pa.array(masks.astype(np.int64)),
                "_b": pa.array((users % _AO_USER_BUCKETS).astype(np.int32)),
            }
        )

    def bucket_hist(g: pd.DataFrame) -> pd.DataFrame:
        _, masks = _or_by_user(
            g["user_id"].to_numpy(), g["mask"].to_numpy().astype(np.int64)
        )
        u, cnt = np.unique(masks, return_counts=True)
        return pd.DataFrame({"mask": u.astype(np.int64), "cnt": cnt.astype(np.int64)})

    hist = (
        ray.data.read_parquet(path, columns=["user_id", "event_type"])
        .map_batches(mask_partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_hist, batch_format="pandas")
        .to_pandas()  # bounded: ≤ 2^k rows per bucket
        .groupby("mask")["cnt"]
        .sum()
    )
    masks = hist.index.to_numpy()
    cnts = hist.to_numpy()

    rows = []
    for i in range(k):
        for j in range(i + 1, k):
            bi, bj = 1 << i, 1 << j
            inter = int(cnts[(masks & bi > 0) & (masks & bj > 0)].sum())
            ca = int(cnts[masks & bi > 0].sum())
            cb = int(cnts[masks & bj > 0].sum())
            uni = ca + cb - inter
            jac = (
                np.int64(np.floor(1e6 * inter / uni + 0.5)) if uni else np.int64(0)
            )
            rows.append((types[i], types[j], inter, uni, jac))
    return pd.DataFrame(
        rows, columns=["type_a", "type_b", "inter", "uni", "jaccard_micro"]
    ).astype({"inter": np.int64, "uni": np.int64, "jaccard_micro": np.int64})


ORACLES37["events_audience_overlap"] = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
t AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM t a JOIN t b ON a.event_type < b.event_type
),
inter AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM d x JOIN d y ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY 1, 2
),
singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY event_type
)
SELECT p.type_a, p.type_b,
       coalesce(i.inter, 0) AS inter,
       sa.n + sb.n - coalesce(i.inter, 0) AS uni,
       CASE WHEN sa.n + sb.n - coalesce(i.inter, 0) = 0 THEN 0
            ELSE CAST(floor(1000000.0 * coalesce(i.inter, 0)
                            / (sa.n + sb.n - coalesce(i.inter, 0)) + 0.5)
                      AS BIGINT) END AS jaccard_micro
FROM pairs p
LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b"""


# ---------------------------------------------------------------------------
# orders_doc_assembly — denormalized order document with nested items
# ---------------------------------------------------------------------------


def q_orders_doc_assembly(sf_dir: str):
    """Document assembly (the relational→document-store denormalization
    export): each order becomes one record with its lineitems embedded as a
    canonical JSON array ordered by linenumber — the traces Events/Links
    nested-column build generalized to relational data.

    Shape: per-item JSON fragments build vectorized (Arrow casts +
    binary_join_element_wise — no per-row Python), both sides share ONE
    order-bucket exchange, and per bucket a single mergesort + ListArray +
    binary_join assembles every document (the bucketed-pandas-merge idiom;
    never join-in-a-loop). Output: o_orderkey, n_items, items_json."""
    import pyarrow.compute as pc

    def li_fragment(t: pa.Table) -> pd.DataFrame:
        ok = t["l_orderkey"]
        ln = t["l_linenumber"]
        pk = t["l_partkey"]
        cents = pa.array(
            np.floor(
                t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
            ).astype(np.int64)
        )
        frag = pc.binary_join_element_wise(
            '{"ln":',
            pc.cast(ln, pa.string()),
            ',"pk":',
            pc.cast(pk, pa.string()),
            ',"cents":',
            pc.cast(cents, pa.string()),
            "}",
            "",
        )
        return pd.DataFrame(
            {
                "o_orderkey": ok.to_numpy(zero_copy_only=False),
                "ln": ln.to_numpy(zero_copy_only=False).astype(np.int64),
                "pk": pk.to_numpy(zero_copy_only=False).astype(np.int64),
                "cents": cents.to_numpy(),
                "frag": np.asarray(frag.to_pandas(), dtype=object),
                "_b": (ok.to_numpy(zero_copy_only=False) % _DA_ORDER_BUCKETS).astype(
                    np.int32
                ),
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        # (ln, pk, cents) is a TOTAL order — l_linenumber alone ties in the
        # synthetic data, and an unspecified tie order can never hash-match
        d = g.sort_values(["o_orderkey", "ln", "pk", "cents"], kind="mergesort")
        ok = d["o_orderkey"].to_numpy()
        uniq, counts = np.unique(ok, return_counts=True)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        )
        frags = pa.array(d["frag"].to_numpy(dtype=object), pa.string())
        inner = pc.binary_join(pa.ListArray.from_arrays(offsets, frags), ",")
        items = pc.binary_join_element_wise("[", inner, "]", "")
        return pd.DataFrame(
            {
                "o_orderkey": uniq.astype(np.int64),
                "n_items": counts.astype(np.int64),
                "items_json": np.asarray(items.to_pandas(), dtype=object),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"],
        )
        .map_batches(li_fragment, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: assemble(g.drop(columns=["_b"])), batch_format="pandas"
        )
    )


ORACLES37["orders_doc_assembly"] = """
SELECT l_orderkey AS o_orderkey,
       CAST(count(*) AS BIGINT) AS n_items,
       '[' || string_agg(
         '{"ln":' || CAST(l_linenumber AS VARCHAR)
         || ',"pk":' || CAST(l_partkey AS VARCHAR)
         || ',"cents":' || CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                                AS VARCHAR)
         || '}', ',' ORDER BY l_linenumber, l_partkey,
                             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
       || ']' AS items_json
FROM lineitem GROUP BY l_orderkey"""


QUERIES37 = {
    "events_audience_overlap": q_events_audience_overlap,
    "orders_doc_assembly": q_orders_doc_assembly,
}
