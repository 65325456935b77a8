"""Driver-contract queries, wave 144 — tool co-occurrence lift within
conversations (which tools travel together — the transcript analogue of
basket-pair lift) and exact per-role turn-length quantiles (the
grouped value-histogram quantile engine pointed at the transcript table).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES144: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_tool_pairs — tool co-occurrence lift within conversations
# ---------------------------------------------------------------------------


def q_conv_tool_pairs(sf_dir: str):
    """For each unordered tool pair (a < b): conversations containing both,
    each tool's conversation count, and the lift in micro units —
    lift = n_both·n_convs / (n_a·n_b), the integer product computed exactly
    before ONE shared double division. All tool-bearing turns count
    (tool <> '', any role — the derivation stamps tools on caller and
    executor turns alike); pairs never co-occurring are absent on both
    engines.

    Scale shape: turns co-locate per conversation through ONE conv-bucket
    exchange; per-bucket distinct (conv, tool) via drop_duplicates, a
    vectorized self-merge emits bounded (a, b, n) pair partials plus
    (tool, n) singles and a conversation count — everything the driver folds
    is ≤ |tools|² + |tools| + 1 rows per bucket."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ("tool",))
        df = df[df["tool"] != ""]
        return df[["conv", "tool", "_b"]].drop_duplicates()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ct = g.drop_duplicates(["conv", "tool"])[["conv", "tool"]]
        n_convs = ct["conv"].nunique()
        singles = ct.groupby("tool", sort=False).size().reset_index(name="n")
        m = ct.merge(ct, on="conv")
        m = m[m["tool_x"] < m["tool_y"]]
        pairs = (
            m.groupby(["tool_x", "tool_y"], sort=False)
            .size()
            .reset_index(name="n_both")
        )
        pairs = pairs.rename(columns={"tool_x": "tool_a", "tool_y": "tool_b"})
        out = pairs.assign(kind="pair", n=np.int64(0))
        s = singles.assign(
            kind="single", tool_a=singles["tool"], tool_b="", n_both=np.int64(0)
        )[["tool_a", "tool_b", "n_both", "kind", "n"]]
        tot = pd.DataFrame(
            {
                "tool_a": [""],
                "tool_b": [""],
                "n_both": [np.int64(0)],
                "kind": ["total"],
                "n": [np.int64(n_convs)],
            }
        )
        out = pd.concat(
            [out[["tool_a", "tool_b", "n_both", "kind", "n"]], s, tot],
            ignore_index=True,
        )
        return out.astype({"n_both": np.int64, "n": np.int64})

    part = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: |tools|² + |tools| + 1 rows per bucket
    )
    empty = pd.DataFrame(
        {
            "tool_a": pd.Series([], dtype=object),
            "tool_b": pd.Series([], dtype=object),
            "n_both": pd.Series([], dtype=np.int64),
            "n_a": pd.Series([], dtype=np.int64),
            "n_b": pd.Series([], dtype=np.int64),
            "lift_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty or "kind" not in part.columns:
        return empty
    n_convs = int(part.loc[part["kind"] == "total", "n"].sum())
    singles = (
        part[part["kind"] == "single"]
        .groupby("tool_a", sort=False)["n"]
        .sum()
        .to_dict()
    )
    pairs = (
        part[part["kind"] == "pair"]
        .groupby(["tool_a", "tool_b"], sort=True)["n_both"]
        .sum()
        .reset_index()
    )
    if pairs.empty:
        return empty
    na = pairs["tool_a"].map(singles).astype(np.int64)
    nb = pairs["tool_b"].map(singles).astype(np.int64)
    nboth = pairs["n_both"].to_numpy(np.int64)
    lift = np.floor(
        (nboth * np.int64(n_convs)).astype(np.float64)
        / (na.to_numpy(np.int64) * nb.to_numpy(np.int64)).astype(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "tool_a": pairs["tool_a"],
            "tool_b": pairs["tool_b"],
            "n_both": nboth,
            "n_a": na.to_numpy(np.int64),
            "n_b": nb.to_numpy(np.int64),
            "lift_micro": lift,
        }
    )


def _tool_pairs_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
ct AS (
  SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool <> ''
),
singles AS (SELECT tool, CAST(count(*) AS BIGINT) AS n FROM ct GROUP BY 1),
tot AS (SELECT CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs FROM ct),
pairs AS (
  SELECT a.tool AS tool_a, b.tool AS tool_b,
         CAST(count(*) AS BIGINT) AS n_both
  FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
  GROUP BY 1, 2
)
SELECT p.tool_a, p.tool_b, p.n_both, sa.n AS n_a, sb.n AS n_b,
       CAST(floor(CAST(p.n_both * tot.n_convs AS DOUBLE)
                  / CAST(sa.n * sb.n AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS lift_micro
FROM pairs p
JOIN singles sa ON sa.tool = p.tool_a
JOIN singles sb ON sb.tool = p.tool_b
CROSS JOIN tot"""
    )


ORACLES144["conv_tool_pairs"] = _tool_pairs_oracle()


# ---------------------------------------------------------------------------
# conv_length_quantiles — exact per-role turn-length quantiles
# ---------------------------------------------------------------------------


def q_conv_length_quantiles(sf_dir: str):
    """Exact p50/p90 of turn text length (Unicode codepoints) per role —
    the grouped value-histogram quantile engine (stages/quantiles.py) over
    the transcript table: the length domain is bounded, so the exchange
    carries the distinct-length histogram, never the rows."""
    import pyarrow.compute as pc

    from ..sources.transcripts import derive_transcripts_from_events
    from ..stages.quantiles import grouped_quantiles_exact

    ds = derive_transcripts_from_events(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "role": t["role"],
                "chars": pc.cast(pc.utf8_length(t["text"]), pa.float64()),
            }
        )

    return grouped_quantiles_exact(
        ds.map_batches(project, batch_format="pyarrow"), "chars", "role"
    )


def _length_quantiles_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
b AS (
  SELECT role,
         CAST(floor(length(text) * 100 + 0.5) AS BIGINT) AS cents
  FROM transcripts
),
c AS (SELECT role, cents, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
t AS (SELECT role, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1),
cum AS (
  SELECT role, cents,
         sum(cnt) OVER (PARTITION BY role ORDER BY cents) AS cum
  FROM c
),
qs AS (SELECT * FROM (VALUES (1, 2, 'p50'), (9, 10, 'p90')) q(num, den, q_label)),
pick AS (
  SELECT t.role, q.q_label, t.n, min(cum.cents) AS cents
  FROM t CROSS JOIN qs q
  JOIN cum ON cum.role = t.role
          AND cum.cum >= (t.n * q.num + q.den - 1) // q.den
  GROUP BY 1, 2, 3
)
SELECT role, q_label, n, cents / 100.0 AS value FROM pick"""
    )


ORACLES144["conv_length_quantiles"] = _length_quantiles_oracle()


QUERIES144 = {
    "conv_tool_pairs": q_conv_tool_pairs,
    "conv_length_quantiles": q_conv_length_quantiles,
}
