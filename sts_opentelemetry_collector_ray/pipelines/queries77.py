"""Driver-contract queries, wave 77 — language-ID evaluation (confusion
matrix of the trigram classifier against the corpus's labeled ``lang``
column: the model-eval readout every filtering pipeline needs before trusting
a classifier) and an exact multi-column table profiler (per column: nulls,
exact distinct count, canonical min/max — the data-contract snapshot). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly.

Profiler canonicalization: int64 columns stringify as decimal, float columns
as their micro fixed-point integer (floor(x·1e6 + 0.5) — monotone, so
min/max commute with the mapping), strings pass through — identical on both
engines, no float-formatting drift. Distinct counts are counts of CANONICAL
representations (documented contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES77: dict[str, str] = {}

_PROF_BUCKETS = 64
# (column, kind): kind ∈ {int, float, str}
_PROF_COLS = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_quantity", "float"),
    ("l_extendedprice", "float"),
    ("l_discount", "float"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
]


# ---------------------------------------------------------------------------
# docs_langid_eval — confusion matrix of the trigram language classifier
# ---------------------------------------------------------------------------


def q_docs_langid_eval(sf_dir: str):
    """Classifier evaluation: run the trigram language-ID stage (the wave-6
    actor-pool model) over every document and cross-tabulate the prediction
    against the corpus's labeled ``lang`` — one row per (lang_true,
    lang_pred) with the document count.

    Scale shape: the LangIdActor pool appends lang_pred per batch (profiles
    load once per actor); a per-batch group_by emits |langs|² bounded
    partials; the driver re-reduces ≤ |langs|² rows."""
    from ..stages.text_analysis import lang_id_stage

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "lang_true": np.asarray(t["lang"].to_numpy(zero_copy_only=False)),
                    "lang_pred": np.asarray(
                        t["lang_pred"].to_numpy(zero_copy_only=False)
                    ),
                }
            )
            .groupby(["lang_true", "lang_pred"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    part = (
        lang_id_stage(ds, concurrency=2)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ |langs|² rows per block
        .groupby(["lang_true", "lang_pred"], as_index=False)["n"]
        .sum()
        .sort_values(["lang_true", "lang_pred"], kind="mergesort")
    )
    return pd.DataFrame(
        {
            "lang_true": part["lang_true"].astype(object),
            "lang_pred": part["lang_pred"].astype(object),
            "n_docs": part["n"].to_numpy(np.int64),
        }
    )


def _langid_eval_oracle() -> str:
    from .queries2 import _langid_oracle

    return f"""
WITH pred AS ({_langid_oracle()})
SELECT d.lang AS lang_true, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN pred p ON p.doc_id = d.doc_id
GROUP BY 1, 2 ORDER BY 1, 2"""


ORACLES77["docs_langid_eval"] = _langid_eval_oracle()


# ---------------------------------------------------------------------------
# lineitem_profile — exact per-column profiling snapshot
# ---------------------------------------------------------------------------


def _canon(t: pa.Table, col: str, kind: str) -> np.ndarray:
    """Canonical string representation (identical in numpy and DuckDB)."""
    if kind == "int":
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return v.astype("U20").astype(object)
    if kind == "float":
        v = t[col].to_numpy(zero_copy_only=False)
        m = np.floor(v * 1_000_000.0 + 0.5).astype(np.int64)
        return m.astype("U20").astype(object)
    return np.asarray(t[col].to_numpy(zero_copy_only=False), dtype=object)


def q_lineitem_profile(sf_dir: str):
    """Data-contract profiler over eight lineitem columns: per column the
    null count, the EXACT distinct count of canonical representations, and
    the canonical min/max.

    Scale shape: each batch emits (a) one stats partial per column (nulls,
    local min/max — |cols| rows) and (b) its batch-LOCAL distinct canonical
    values hashed into 64 buckets (fnv1a64 — deterministic across workers).
    The distinct exchange is the standard exact-distinct shuffle: each
    (column, bucket) group re-uniques and emits ONE count row, so the driver
    reduces |cols|·(1 + |buckets|) tiny rows; raw values never converge on
    one node."""
    from ..functions.hashing import fnv1a64_array

    cols = [c for c, _ in _PROF_COLS]

    def partial(t: pa.Table) -> pd.DataFrame:
        frames = []
        nrows = t.num_rows
        for col, kind in _PROF_COLS:
            nulls = int(t[col].null_count)
            c = _canon(t, col, kind)
            c = c[pd.notna(c)]
            u = pd.unique(c)
            h = (fnv1a64_array(u.astype(str)) % _PROF_BUCKETS).astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "column": col,
                        "val": u.astype(object),
                        "n_null": np.int64(-1),
                        "n_rows": np.int64(-1),
                        "_b": h,
                    }
                )
            )
            # stats row: bucket by column name so min/max reduce stays sharded
            frames.append(
                pd.DataFrame(
                    {
                        "column": [col],
                        "val": [None],
                        "n_null": np.array([nulls], np.int64),
                        "n_rows": np.array([nrows], np.int64),
                        "_b": np.array([_PROF_BUCKETS], np.int64),
                    }
                )
            )
            frames[-2]["vmin"] = None
            frames[-2]["vmax"] = None
            if len(u):
                frames[-1]["vmin"] = str(min(u))
                frames[-1]["vmax"] = str(max(u))
            else:
                frames[-1]["vmin"] = None
                frames[-1]["vmax"] = None
        return pd.concat(frames, ignore_index=True)

    def bucket_reduce(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_b"].iloc[0])
        if b == _PROF_BUCKETS:  # the stats lineage
            out = []
            for col, grp in g.groupby("column", sort=False):
                vmin = grp["vmin"].dropna()
                vmax = grp["vmax"].dropna()
                out.append(
                    {
                        "column": col,
                        "kind": "stats",
                        "n": int(grp["n_null"].sum()),
                        "n_rows": int(grp["n_rows"].sum()),
                        "vmin": vmin.min() if len(vmin) else None,
                        "vmax": vmax.max() if len(vmax) else None,
                    }
                )
            return pd.DataFrame(out)
        out = []
        for col, grp in g.groupby("column", sort=False):
            out.append(
                {
                    "column": col,
                    "kind": "distinct",
                    "n": int(grp["val"].nunique()),
                    "n_rows": 0,
                    "vmin": None,
                    "vmax": None,
                }
            )
        return pd.DataFrame(out)

    part = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_reduce, batch_format="pandas")
        .to_pandas()  # bounded: |cols|·(|buckets|+1) rows
    )
    stats = part[part["kind"] == "stats"].set_index("column")
    dist = (
        part[part["kind"] == "distinct"]
        .groupby("column")["n"]
        .sum()
    )
    out_rows = []
    for col, kind in _PROF_COLS:
        out_rows.append(
            {
                "column": col,
                "n_null": int(stats.loc[col, "n"]),
                "n_distinct": int(dist.get(col, 0)),
                "min_repr": stats.loc[col, "vmin"],
                "max_repr": stats.loc[col, "vmax"],
            }
        )
    out = pd.DataFrame(out_rows).sort_values("column", kind="mergesort")
    out["n_null"] = out["n_null"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out.reset_index(drop=True)


def _profile_oracle() -> str:
    selects = []
    for col, kind in _PROF_COLS:
        if kind == "int":
            expr = f"CAST({col} AS VARCHAR)"
            dexpr = col
        elif kind == "float":
            expr = f"CAST(CAST(floor({col} * 1000000 + 0.5) AS BIGINT) AS VARCHAR)"
            dexpr = f"CAST(floor({col} * 1000000 + 0.5) AS BIGINT)"
        else:
            expr = col
            dexpr = col
        selects.append(
            f"""SELECT '{col}' AS "column",
       CAST(count(*) - count({col}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {dexpr}) AS BIGINT) AS n_distinct,
       min({expr}) AS min_repr, max({expr}) AS max_repr
FROM lineitem"""
        )
    u = "\nUNION ALL\n".join(selects)
    return f'SELECT * FROM ({u}) ORDER BY "column"'


ORACLES77["lineitem_profile"] = _profile_oracle()


QUERIES77 = {
    "docs_langid_eval": q_docs_langid_eval,
    "lineitem_profile": q_lineitem_profile,
}
