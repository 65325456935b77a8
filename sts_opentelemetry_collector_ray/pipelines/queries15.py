"""Driver-contract queries, wave 15 — conversation tool-transition mining
(Markov transition counts over the transcript family) and BM25 query scoring
(the lexical-ranking counterpart of the ANN operators). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

ORACLES15: dict[str, str] = {}

_TT_BUCKETS = 64

# event_type → tool, the _EVENT_MAP third column (sources/transcripts.py)
_TOOL_MAP = {
    "error": "bash",
    "purchase": "search",
    "signup": "",
    "click": "",
    "view": "browser",
}


# ---------------------------------------------------------------------------
# conv_tool_transitions — adjacent tool→tool transition counts per conversation
# ---------------------------------------------------------------------------


def q_conv_tool_transitions(sf_dir: str):
    """Tool-transition mining over the transcript corpus: count adjacent
    (tool → next tool) pairs within each conversation in turn order, skipping
    non-tool turns on either side. The per-conversation order contract is the
    flagship's (turn_idx == row_number over (ts, event_id)); ONE bounded
    conv-bucket exchange + a vectorized shift-compare per bucket, then a tiny
    (|tools|² groups) aggregate."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv": df["user_id"].to_numpy(),
                "event_id": df["event_id"].to_numpy(),
                "ts": df["ts"].to_numpy(),
                "tool": df["event_type"].map(_TOOL_MAP).to_numpy(dtype=object),
                "_b": (
                    df["user_id"].to_numpy().astype(np.uint64) % _TT_BUCKETS
                ).astype(np.int32),
            }
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "ts", "event_id"], kind="mergesort")
        conv = g["conv"].to_numpy()
        tool = g["tool"].to_numpy(dtype=object)
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "tool_from": pd.Series([], dtype=object),
                    "tool_to": pd.Series([], dtype=object),
                    "pn": pd.Series([], dtype=np.int64),
                }
            )
        same = conv[:-1] == conv[1:]
        a = tool[:-1][same]
        b = tool[1:][same]
        keep = (a != "") & (b != "")
        out = (
            pd.DataFrame({"tool_from": a[keep], "tool_to": b[keep]})
            .groupby(["tool_from", "tool_to"], sort=False)
            .size()
            .rename("pn")
            .reset_index()
        )
        out["pn"] = out["pn"].astype(np.int64)
        return out

    partials = (
        ds.map_batches(prep, batch_format="pandas")
        .groupby("_b")
        .map_groups(transitions, batch_format="pandas")
    )
    return partials.groupby(["tool_from", "tool_to"]).aggregate(
        Sum("pn", alias_name="n")
    )


ORACLES15["conv_tool_transitions"] = (
    TRANSCRIPTS_FROM_EVENTS_SQL
    + """,
tr AS (
  SELECT tool,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS tool_to
  FROM transcripts
)
SELECT tool AS tool_from, tool_to, count(*) AS n
FROM tr
WHERE tool <> '' AND tool_to IS NOT NULL AND tool_to <> ''
GROUP BY 1, 2"""
)


# ---------------------------------------------------------------------------
# docs_bm25 — Okapi BM25 (k1=1.2, b=0.75) of every doc against a query set
# ---------------------------------------------------------------------------

_BM25_TERMS = ("merge", "window", "scan")


def q_docs_bm25(sf_dir: str):
    """Okapi BM25 scoring (Robertson & Zaragoza 2009) of the whole corpus
    against a fixed query-term set — the lexical-retrieval counterpart of the
    ANN family. Two streaming passes like classify.py::dsir_pipeline: pass 1
    is a per-batch combiner of (n_docs, Σdl, df_t) partials whose driver
    residue is |batches| rows; the fitted constants broadcast in the closure;
    pass 2 scores per batch with one index_in + per-term reduceat (no per-row
    Python). Floats mirror the SQL's operation order exactly; scores round to
    1e-6 with floor(x*1e6 + 0.5) (half-even vs half-away rule, CLAUDE.md)."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/documents.parquet"
    terms = pa.array(list(_BM25_TERMS))

    def tokenize(t: pa.Table):
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
        # per-doc tf of each query term in one index_in pass
        ti = pc.index_in(fv, value_set=terms)
        ti_np = ti.to_numpy(zero_copy_only=False)
        tfs = []
        for i in range(len(_BM25_TERMS)):
            m = (ti_np == i).astype(np.int64)
            mc = np.concatenate([[0], np.cumsum(m)])
            tfs.append(mc[fo[1:]] - mc[fo[:-1]])
        return fcounts, tfs

    def fit_partial(t: pa.Table) -> pa.Table:
        dl, tfs = tokenize(t)
        cols = {
            "nd": pa.array([len(dl)], pa.int64()),
            "sl": pa.array([int(dl.sum())], pa.int64()),
        }
        for i in range(len(_BM25_TERMS)):
            cols[f"df{i}"] = pa.array([int((tfs[i] > 0).sum())], pa.int64())
        return pa.table(cols)

    fit = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(fit_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    nd = int(fit["nd"])
    avgdl = fit["sl"] / nd  # double division, mirrors CAST(SUM AS DOUBLE)/count
    idf = [
        np.log(1.0 + (nd - int(fit[f"df{i}"]) + 0.5) / (int(fit[f"df{i}"]) + 0.5))
        for i in range(len(_BM25_TERMS))
    ]

    def score(t: pa.Table) -> pa.Table:
        dl, tfs = tokenize(t)
        dlf = dl.astype(np.float64)
        s = np.zeros(len(dl), dtype=np.float64)
        for i in range(len(_BM25_TERMS)):
            tf = tfs[i].astype(np.float64)
            s = s + idf[i] * (
                (tf * (1.2 + 1.0))
                / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dlf / avgdl))
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bm25": np.floor(s * 1000000.0 + 0.5) / 1000000.0,
            }
        )

    return ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


def _bm25_term_sql(i: int, term: str) -> str:
    tf = f"len(list_filter(t.l, x -> x = '{term}'))"
    return (
        f"ln(1.0 + (st.nd - dfs.df{i} + 0.5) / (dfs.df{i} + 0.5)) * "
        f"(({tf} * (1.2 + 1.0)) / "
        f"({tf} + 1.2 * (1.0 - 0.75 + 0.75 * len(t.l) / st.avgdl)))"
    )


ORACLES15["docs_bm25"] = (
    r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x <> '') AS l
  FROM documents
), st AS (
  SELECT count(*) AS nd, CAST(SUM(len(l)) AS DOUBLE) / count(*) AS avgdl
  FROM toks
), dfs AS (
  SELECT """
    + ", ".join(
        f"(SELECT count(*) FROM toks WHERE list_contains(l, '{term}')) AS df{i}"
        for i, term in enumerate(_BM25_TERMS)
    )
    + """
), sc AS (
  SELECT t.doc_id, """
    + " + ".join(
        f"({_bm25_term_sql(i, term)})" for i, term in enumerate(_BM25_TERMS)
    )
    + """ AS s
  FROM toks t, st, dfs
)
SELECT doc_id, floor(s * 1000000.0 + 0.5) / 1000000.0 AS bm25 FROM sc"""
)


QUERIES15 = {
    "conv_tool_transitions": q_conv_tool_transitions,
    "docs_bm25": q_docs_bm25,
}
