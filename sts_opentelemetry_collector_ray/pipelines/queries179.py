"""Driver-contract queries, wave 179 — export share by supplier nation (what
fraction of each supplier nation's line revenue ships to customers in a
DIFFERENT nation — the q7 generalization over every nation pair, built as a
three-table chain that respects the empty-block rule: ONE native hash join +
ONE bucketed-pandas merge, never join-into-join) and resolution by
conversation length (do longer conversations resolve less often?). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES179: dict[str, str] = {}


# ---------------------------------------------------------------------------
# trade_export_share — cross-nation revenue share per supplier nation
# ---------------------------------------------------------------------------


def q_trade_export_share(sf_dir: str):
    """Per supplier nation: line count, exact extendedprice revenue cents,
    and the share shipped to customers of a DIFFERENT nation in micro units.

    Scale shape (the documented 3-table chain): supplier→nation broadcasts
    (`ray.put`, dimension side); lineitem ⋈ orders runs as ONE native hash
    join; the join output must NOT feed another `Dataset.join` (empty-block
    rule — CLAUDE.md), so the customer-nation resolution is a custkey-bucket
    exchange with a per-bucket pandas merge against the bucketed customer
    side (`stages/clusters.py` pattern); bounded (supp_nation, cross) grid
    partials fold on the driver."""
    import pyarrow.parquet as pq_mod

    sup = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = sup["s_suppkey"].to_numpy()
    order = np.argsort(sk)
    ref = ray.put(
        (sk[order], sup["s_nationkey"].to_numpy()[order].astype(np.int64))
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice"],
    )
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    j = li.join(
        o,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def fact_rows(t: pa.Table) -> pd.DataFrame:
        keys, nat = ray.get(ref)
        idx = np.searchsorted(keys, t["l_suppkey"].to_numpy(zero_copy_only=False))
        idx = np.minimum(idx, len(keys) - 1)
        cents = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "cust": t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "snat": nat[idx],
                "cents": cents,
                "cnat": np.int64(-1),  # fact marker
            }
        )
        # pre-reduce: one row per (cust, snat) per batch
        g = (
            df.groupby(["cust", "snat", "cnat"], sort=False, as_index=False)
            .agg(cents=("cents", "sum"), n=("cents", "size"))
        )
        g["_b"] = (g["cust"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return g.astype({"n": np.int64})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def dim_rows(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "cust": t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "snat": np.int64(-1),
                "cents": np.int64(0),
                "cnat": t["c_nationkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "n": np.int64(0),
            }
        )
        df["_b"] = (df["cust"].to_numpy(np.int64).astype(np.uint64) % np.uint64(64)).astype(
            np.int64
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "supp_nation": pd.Series([], dtype=np.int64),
                "n_lines": pd.Series([], dtype=np.int64),
                "sum_cents": pd.Series([], dtype=np.int64),
                "export_cents": pd.Series([], dtype=np.int64),
            }
        )
        facts = g[g["cnat"] < 0]
        dims = g[g["cnat"] >= 0][["cust", "cnat"]].drop_duplicates("cust")
        if facts.empty or dims.empty:
            return empty
        m = facts.merge(dims, on="cust", how="inner")
        cross = (m["snat"] != m["cnat_y"]).astype(np.int64)
        out = (
            pd.DataFrame(
                {
                    "supp_nation": m["snat"].to_numpy(np.int64),
                    "n_lines": m["n"].to_numpy(np.int64),
                    "sum_cents": m["cents"].to_numpy(np.int64),
                    "export_cents": m["cents"].to_numpy(np.int64) * cross,
                }
            )
            .groupby("supp_nation", sort=False, as_index=False)
            .sum()
        )
        return out.astype(np.int64)

    part = (
        j.map_batches(fact_rows, batch_format="pyarrow")
        .union(cust.map_batches(dim_rows, batch_format="pyarrow"))
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: <= |nations| rows per bucket
    )
    empty = pd.DataFrame(
        {
            "supp_nation": pd.Series([], dtype=np.int64),
            "n_lines": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "export_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "supp_nation" not in part.columns:
        return empty
    out = (
        part.groupby("supp_nation", sort=True)[
            ["n_lines", "sum_cents", "export_cents"]
        ]
        .sum()
        .reset_index()
    )
    out["export_micro"] = np.floor(
        out["export_cents"].to_numpy(np.float64)
        / out["sum_cents"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.drop(columns=["export_cents"]).astype(np.int64)


ORACLES179["trade_export_share"] = """
WITH f AS (
  SELECT CAST(s.s_nationkey AS BIGINT) AS supp_nation,
         CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
         CASE WHEN s.s_nationkey <> c.c_nationkey THEN 1 ELSE 0 END AS is_cross
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
),
g AS (
  SELECT supp_nation,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(cents) AS BIGINT) AS sum_cents,
         CAST(sum(cents * is_cross) AS BIGINT) AS export_cents
  FROM f GROUP BY 1
)
SELECT supp_nation, n_lines, sum_cents,
       CAST(floor(CAST(export_cents AS DOUBLE) / CAST(sum_cents AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS export_micro
FROM g"""


# ---------------------------------------------------------------------------
# conv_resolution_by_length — resolution rate by conversation length bucket
# ---------------------------------------------------------------------------


def q_conv_resolution_by_length(sf_dir: str):
    """Per conversation-length bucket (total turns // 10), over conversations
    WITH tool turns: conversations, resolved (last tool turn non-ERROR), and
    the resolution share in micro units.

    Scale shape: parsed turns ride ONE conv-bucket exchange; per-bucket one
    lexsort derives both the conversation length and its last tool turn;
    bounded (bucket, n, resolved) partials fold on the driver."""
    from ..stages.parse import parse_stage
    from ..sources.transcripts import derive_transcripts_from_events
    from ..functions.hashing import fnv1a64_array

    ds = parse_stage(derive_transcripts_from_events(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        conv = np.asarray(t["conv_id"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "conv": conv,
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64),
                "is_tool": (
                    np.asarray(t["role"].to_numpy(zero_copy_only=False)) == "tool"
                ).astype(np.int64),
                "err": (
                    np.asarray(t["severity"].to_numpy(zero_copy_only=False))
                    == "ERROR"
                ).astype(np.int64),
            }
        )
        df["_b"] = (fnv1a64_array(conv.astype(object)) % np.uint64(64)).astype(
            np.int64
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "len_bucket": pd.Series([], dtype=np.int64),
                "n_convs": pd.Series([], dtype=np.int64),
                "n_resolved": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        n = len(g)
        new = np.r_[True, conv[1:] != conv[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, n]).astype(np.int64)
        code = np.cumsum(new) - 1
        idx = np.arange(n)
        is_tool = g["is_tool"].to_numpy(np.int64)
        err = g["err"].to_numpy(np.int64)
        pos_tool = np.where(is_tool == 1, idx, -1)
        last_tool = np.maximum.reduceat(pos_tool, starts)
        has_tool = last_tool >= 0
        if not has_tool.any():
            return empty
        resolved = np.zeros(len(starts), dtype=np.int64)
        resolved[has_tool] = (err[last_tool[has_tool]] == 0).astype(np.int64)
        lb = counts // 10
        out = (
            pd.DataFrame(
                {
                    "len_bucket": lb[has_tool],
                    "n_convs": 1,
                    "n_resolved": resolved[has_tool],
                }
            )
            .groupby("len_bucket", sort=False, as_index=False)
            .sum()
        )
        return out.astype(np.int64)

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "len_bucket": pd.Series([], dtype=np.int64),
            "n_convs": pd.Series([], dtype=np.int64),
            "n_resolved": pd.Series([], dtype=np.int64),
            "resolution_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "len_bucket" not in part.columns:
        return empty
    out = (
        part.groupby("len_bucket", sort=True)[["n_convs", "n_resolved"]]
        .sum()
        .reset_index()
    )
    out["resolution_micro"] = np.floor(
        out["n_resolved"].to_numpy(np.float64)
        / out["n_convs"].to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype(np.int64)


def _resolution_by_length_oracle() -> str:
    from .queries2 import _PARSED_SQL

    return (
        _PARSED_SQL
        + """,
lens AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) // 10 AS len_bucket
  FROM parsed GROUP BY 1
),
last_tool AS (
  SELECT conv_id, max(turn_idx) AS t FROM parsed
  WHERE role = 'tool' GROUP BY 1
),
res AS (
  SELECT lt.conv_id,
         CASE WHEN p.severity <> 'ERROR' THEN 1 ELSE 0 END AS resolved
  FROM last_tool lt
  JOIN parsed p ON p.conv_id = lt.conv_id AND p.turn_idx = lt.t
),
g AS (
  SELECT lens.len_bucket,
         CAST(count(*) AS BIGINT) AS n_convs,
         CAST(sum(res.resolved) AS BIGINT) AS n_resolved
  FROM res JOIN lens USING (conv_id)
  GROUP BY 1
)
SELECT len_bucket, n_convs, n_resolved,
       CAST(floor(CAST(n_resolved AS DOUBLE) / CAST(n_convs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS resolution_micro
FROM g"""
    )


ORACLES179["conv_resolution_by_length"] = _resolution_by_length_oracle()


QUERIES179 = {
    "trade_export_share": q_trade_export_share,
    "conv_resolution_by_length": q_conv_resolution_by_length,
}
