"""Driver-contract queries, wave 336 — opening-severity outcome rates
(does a conversation that STARTS with an error end badly?) and token
position bias (where in documents the top tokens live). Same contract
as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES336: dict[str, str] = {}


# ---------------------------------------------------------------------------
# conv_opening_outcome — first-turn severity vs final-turn health
# ---------------------------------------------------------------------------


def q_conv_opening_outcome(sf_dir: str):
    """Outcome by opening: classify each conversation by whether its
    FIRST turn (min turn_idx) contains '[ERROR]' and whether its LAST
    turn (max turn_idx) does NOT (resolved). Pure integer counting. Per
    opening class: opened_with_error, n_convs, n_resolved, rate_micro.

    Scale shape: ONE conv-bucket exchange; per-bucket idxmin/idxmax
    masks."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv": np.asarray(t["conv_id"].to_numpy(zero_copy_only=False)),
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "err": pc.match_substring(t["text"], "[ERROR]").to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "op": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "res": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        first = g.loc[g.groupby("conv")["turn"].idxmin()]
        last = g.loc[g.groupby("conv")["turn"].idxmax()]
        m = first[["conv", "err"]].merge(
            last[["conv", "err"]], on="conv", suffixes=("_f", "_l")
        )
        m["res"] = (m["err_l"] == 0).astype(np.int64)
        agg = m.groupby("err_f").agg(n=("res", "size"), res=("res", "sum"))
        out = agg.reset_index().rename(columns={"err_f": "op"})
        return out.astype(np.int64)

    h = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("op")[["n", "res"]]
        .sum()
        .sort_index()
    )
    cols = ["opened_with_error", "n_convs", "n_resolved", "rate_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if h.empty:
        return empty
    out = h.reset_index().rename(
        columns={"op": "opened_with_error", "n": "n_convs",
                 "res": "n_resolved"}
    )
    out["rate_micro"] = np.floor(
        out["n_resolved"].to_numpy(np.float64)
        / out["n_convs"].to_numpy(np.float64) * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype({c: np.int64 for c in cols})[cols]


def _opening_outcome_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
fl AS (
  SELECT conv_id,
         first(CAST(contains(text, '[ERROR]') AS BIGINT)
               ORDER BY turn_idx) AS op,
         first(CAST(contains(text, '[ERROR]') AS BIGINT)
               ORDER BY turn_idx DESC) AS lst
  FROM transcripts GROUP BY 1
),
agg AS (
  SELECT op AS opened_with_error,
         CAST(count(*) AS BIGINT) AS n_convs,
         CAST(sum(CASE WHEN lst = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resolved
  FROM fl GROUP BY 1
)
SELECT opened_with_error, n_convs, n_resolved,
       CAST(floor(CAST(n_resolved AS DOUBLE) / CAST(n_convs AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
FROM agg
ORDER BY opened_with_error"""
    )


# ---------------------------------------------------------------------------
# docs_token_position_bias — where the top tokens live inside documents
# ---------------------------------------------------------------------------


def q_docs_token_position_bias(sf_dir: str):
    """Position bias of the 20 most frequent tokens: per occurrence the
    relative position pos / (len - 1) within the document's RAW split
    list (single-token docs excluded); the mean per token shows which
    words open vs close documents. Counting is exact; the position
    ratio fold is mirrored float. Per token: token, n, relpos_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        di = np.repeat(np.arange(len(lens)), lens)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(len(flat)) - starts[di]
        ln = lens[di]
        keep = (flat != "") & (ln >= 2)
        rel = pos[keep].astype(np.float64) / (
            ln[keep].astype(np.float64) - 1.0
        )
        df = pd.DataFrame({"w": flat[keep], "n": 1, "s": rel})
        g = df.groupby("w", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    m = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("w")
        .agg(n=("n", "sum"), s=("s", "sum"))
    )
    cols = ["token", "n", "relpos_micro"]
    empty = pd.DataFrame(
        {
            "token": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "relpos_micro": pd.Series([], dtype=np.int64),
        }
    )
    if m.empty:
        return empty
    top = (
        m.reset_index()
        .sort_values(["n", "w"], ascending=[False, True])
        .head(20)
    )
    top["relpos_micro"] = np.floor(
        top["s"].to_numpy(np.float64) / top["n"].to_numpy(np.float64)
        * 1_000_000.0 + 0.5
    ).astype(np.int64)
    top = top.rename(columns={"w": "token"})
    return (
        top[cols]
        .sort_values(["n", "token"], ascending=[False, True])
        .reset_index(drop=True)
        .astype({"n": np.int64, "relpos_micro": np.int64})
    )


ORACLES336["docs_token_position_bias"] = r"""
WITH tl AS (
  SELECT string_split_regex(lower(text), '\s+') AS ws FROM documents
),
pos AS (
  SELECT unnest(ws) AS w,
         generate_subscripts(ws, 1) - 1 AS p,
         len(ws) AS ln
  FROM tl
),
k AS (
  SELECT w, CAST(p AS DOUBLE) / (ln - 1) AS rel
  FROM pos WHERE w <> '' AND ln >= 2
),
agg AS (
  SELECT w AS token, CAST(count(*) AS BIGINT) AS n, sum(rel) AS s
  FROM k GROUP BY 1
),
top AS (
  SELECT token, n, s FROM agg ORDER BY n DESC, token LIMIT 20
)
SELECT token, n,
       CAST(floor(s / n * 1000000.0 + 0.5) AS BIGINT) AS relpos_micro
FROM top
ORDER BY n DESC, token"""


def _register_dynamic() -> None:
    ORACLES336["conv_opening_outcome"] = _opening_outcome_oracle()


_register_dynamic()

QUERIES336 = {
    "conv_opening_outcome": q_conv_opening_outcome,
    "docs_token_position_bias": q_docs_token_position_bias,
}
