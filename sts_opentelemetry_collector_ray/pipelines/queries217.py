"""Driver-contract queries, wave 217 — 2-state HMM forward filtering over
daily up-moves (fixed sticky-transition/emission parameters, scaled forward
recursion replayed step-exactly in a recursive CTE) and standardized
type-token ratio over fixed 50-token windows per source.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES217: dict[str, str] = {}

_HMM_STAY = 0.9
_HMM_E1_UP, _HMM_E2_UP = 0.4, 0.7
_STTR_W = 50


# ---------------------------------------------------------------------------
# events_hmm_forward — scaled forward algorithm per type
# ---------------------------------------------------------------------------


def q_events_hmm_forward(sf_dir: str):
    """Per event type: the scaled HMM forward recursion (Rabiner 1989) over
    daily up-moves x_t = 1{n_t > n_{t−1}} with sticky transitions (0.9
    stay) and emissions P(up|low) = 0.4, P(up|high) = 0.7, uniform init;
    per step a' = Ta, w = a'·e(x), c = Σw, ll += ln c, a = w/c. The SQL
    oracle replays every step. Output: event_type, n_steps, loglik_micro,
    p_high_final_micro.

    Scale shape: bounded daily fold; sequential recursion per type on
    driver arrays — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        return (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n_steps", "loglik_micro", "p_high_final_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    stay, sw = _HMM_STAY, 1.0 - _HMM_STAY
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        n = sub["n"].to_numpy(np.int64)
        if len(n) < 2:
            continue
        x = (n[1:] > n[:-1]).astype(np.int64)
        a1, a2, ll = 0.5, 0.5, 0.0
        for xt in x:
            p1 = stay * a1 + sw * a2
            p2 = sw * a1 + stay * a2
            e1 = _HMM_E1_UP if xt == 1 else 1.0 - _HMM_E1_UP
            e2 = _HMM_E2_UP if xt == 1 else 1.0 - _HMM_E2_UP
            w1 = p1 * e1
            w2 = p2 * e2
            c = w1 + w2
            ll = ll + math.log(c)
            a1 = w1 / c
            a2 = w2 / c
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append((et, np.int64(len(x)), micro(ll), micro(a2)))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES217["events_hmm_forward"] = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
),
obs AS (
  SELECT a.event_type, a.t - 1 AS rt,
         CASE WHEN a.n > b.n THEN 1 ELSE 0 END AS x,
         count(*) OVER (PARTITION BY a.event_type) AS m
  FROM idx a JOIN idx b ON a.event_type = b.event_type AND b.t = a.t - 1
),
hmm AS (
  SELECT event_type, 0 AS t, m, CAST(0.5 AS DOUBLE) AS a1,
         CAST(0.5 AS DOUBLE) AS a2, CAST(0.0 AS DOUBLE) AS ll
  FROM (SELECT DISTINCT event_type, m FROM obs WHERE m >= 1)
  UNION ALL
  SELECT h.event_type, h.t + 1, h.m,
         (({_HMM_STAY} * h.a1 + {1.0 - _HMM_STAY} * h.a2)
          * (CASE WHEN o.x = 1 THEN {_HMM_E1_UP}
                  ELSE {1.0 - _HMM_E1_UP} END))
         / ((({_HMM_STAY} * h.a1 + {1.0 - _HMM_STAY} * h.a2)
             * (CASE WHEN o.x = 1 THEN {_HMM_E1_UP}
                     ELSE {1.0 - _HMM_E1_UP} END))
            + (({1.0 - _HMM_STAY} * h.a1 + {_HMM_STAY} * h.a2)
               * (CASE WHEN o.x = 1 THEN {_HMM_E2_UP}
                       ELSE {1.0 - _HMM_E2_UP} END))),
         (({1.0 - _HMM_STAY} * h.a1 + {_HMM_STAY} * h.a2)
          * (CASE WHEN o.x = 1 THEN {_HMM_E2_UP}
                  ELSE {1.0 - _HMM_E2_UP} END))
         / ((({_HMM_STAY} * h.a1 + {1.0 - _HMM_STAY} * h.a2)
             * (CASE WHEN o.x = 1 THEN {_HMM_E1_UP}
                     ELSE {1.0 - _HMM_E1_UP} END))
            + (({1.0 - _HMM_STAY} * h.a1 + {_HMM_STAY} * h.a2)
               * (CASE WHEN o.x = 1 THEN {_HMM_E2_UP}
                       ELSE {1.0 - _HMM_E2_UP} END))),
         h.ll + ln((({_HMM_STAY} * h.a1 + {1.0 - _HMM_STAY} * h.a2)
             * (CASE WHEN o.x = 1 THEN {_HMM_E1_UP}
                     ELSE {1.0 - _HMM_E1_UP} END))
            + (({1.0 - _HMM_STAY} * h.a1 + {_HMM_STAY} * h.a2)
               * (CASE WHEN o.x = 1 THEN {_HMM_E2_UP}
                       ELSE {1.0 - _HMM_E2_UP} END)))
  FROM hmm h JOIN obs o ON o.event_type = h.event_type AND o.rt = h.t + 1
  WHERE h.t < h.m
)
SELECT event_type, CAST(m AS BIGINT) AS n_steps,
       CAST(floor(ll * 1000000.0 + 0.5) AS BIGINT) AS loglik_micro,
       CAST(floor(a2 * 1000000.0 + 0.5) AS BIGINT) AS p_high_final_micro
FROM hmm WHERE t = m ORDER BY event_type"""


# ---------------------------------------------------------------------------
# docs_sttr — standardized type-token ratio per source
# ---------------------------------------------------------------------------


def q_docs_sttr(sf_dir: str):
    """Per source: the standardized type-token ratio — mean over FULL
    50-token windows (per doc) of distinct-tokens/50 (Kubát & Milička
    2013). Output: source, n_windows, sttr_micro.

    Scale shape: windows derive inside each batch (a doc lives in one
    row); one bounded (source, n_windows, Σttr) combiner folds on the
    driver."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        di = np.repeat(np.arange(len(counts)), counts)
        keep = flat != ""
        # positions among NON-EMPTY tokens per doc
        df = pd.DataFrame({"di": di[keep], "w": flat[keep]})
        df["pos"] = df.groupby("di").cumcount()
        df["win"] = df["pos"] // _STTR_W
        sizes = df.groupby(["di", "win"])["w"].size()
        dist = df.drop_duplicates(["di", "win", "w"]).groupby(["di", "win"])[
            "w"
        ].size()
        full = sizes[sizes == _STTR_W]
        if full.empty:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "n_windows": pd.Series([], dtype=np.int64),
                 "ttr_sum": pd.Series([], dtype=np.float64)}
            )
        ttr = dist.loc[full.index].to_numpy(np.float64) / float(_STTR_W)
        src_all = np.asarray(t["source"].to_numpy(zero_copy_only=False), object)
        srcs = src_all[full.index.get_level_values(0).to_numpy(np.int64)]
        out = pd.DataFrame({"source": srcs, "n_windows": 1, "ttr_sum": ttr})
        return out.groupby("source", sort=False, as_index=False).sum().astype(
            {"n_windows": np.int64}
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["source", "n_windows", "sttr_micro"]
    if part.empty:
        return pd.DataFrame(
            {"source": pd.Series([], dtype=object),
             "n_windows": pd.Series([], dtype=np.int64),
             "sttr_micro": pd.Series([], dtype=np.int64)}
        )
    g = part.groupby("source")[["n_windows", "ttr_sum"]].sum().sort_index()
    return pd.DataFrame(
        {
            "source": np.asarray(g.index.to_numpy(object)),
            "n_windows": g["n_windows"].to_numpy(np.int64),
            "sttr_micro": np.floor(
                g["ttr_sum"].to_numpy(np.float64)
                / g["n_windows"].to_numpy(np.float64)
                * 1_000_000.0
                + 0.5
            ).astype(np.int64),
        }
    )


ORACLES217["docs_sttr"] = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
tok AS (
  SELECT doc_id, source, unnest(ws) AS t,
         unnest(range(1, len(ws) + 1)) AS p
  FROM w
),
t2 AS (
  SELECT doc_id, source, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1 AS pos
  FROM tok WHERE t <> ''
),
win AS (
  SELECT doc_id, source, pos // {_STTR_W} AS win, t FROM t2
),
full_w AS (
  SELECT doc_id, source, win,
         CAST(count(DISTINCT t) AS DOUBLE) / {_STTR_W} AS ttr
  FROM win GROUP BY 1, 2, 3 HAVING count(*) = {_STTR_W}
)
SELECT source, CAST(count(*) AS BIGINT) AS n_windows,
       CAST(floor(sum(ttr) / count(*) * 1000000.0 + 0.5) AS BIGINT)
         AS sttr_micro
FROM full_w GROUP BY 1 ORDER BY 1"""


QUERIES217 = {
    "events_hmm_forward": q_events_hmm_forward,
    "docs_sttr": q_docs_sttr,
}
