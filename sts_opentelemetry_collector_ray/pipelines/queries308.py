"""Driver-contract queries, wave 308 — the cross-domain bigram-LM
cross-entropy matrix (train on one source, evaluate every source — the
domain-shift grid behind data-mixing decisions) and the seasonal Sen
slope of the daily event series (lower-median of within-weekday pairwise
slopes). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES308: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# docs_crossdomain_ce — train-on-A / eval-on-B bigram cross-entropy
# ---------------------------------------------------------------------------


def q_docs_crossdomain_ce(sf_dir: str):
    """Domain-shift matrix: for every ordered source pair (model A,
    eval B), the cross-entropy of B's word bigrams under A's add-one
    bigram LM — p_A(w2|w1) = (c_A(w1 w2) + 1) / (c_A(w1 .) + V) with V
    the CORPUS unigram vocabulary (the `docs_bigram_ce` smoothing
    convention, per-source counts instead of corpus counts). The
    diagonal is in-domain CE; off-diagonal excess quantifies transfer
    loss. Counts are exact; the log fold is float. Per pair:
    model_source, eval_source, n_bigrams, ce_micro.

    Scale shape: one (source, w1, w2) count exchange (bigram-vocabulary
    bounded); the |sources|^2 evaluation is vectorized merges over that
    table."""
    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        flat = np.asarray(
            toks.flatten().to_numpy(zero_copy_only=False), object
        )
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        src_all = np.asarray(t["source"].to_numpy(zero_copy_only=False), object)
        di = np.repeat(np.arange(len(counts)), counts)
        src = np.repeat(src_all, counts)
        keep = flat != ""
        flat, di, src = flat[keep], di[keep], src[keep]
        if len(flat) < 2:
            return pd.DataFrame(
                {"source": [], "w1": [], "w2": [], "c": []}
            )
        same = di[1:] == di[:-1]
        df = pd.DataFrame(
            {"source": src[:-1][same], "w1": flat[:-1][same],
             "w2": flat[1:][same]}
        )
        return (
            df.groupby(["source", "w1", "w2"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "c"})
            .astype({"c": np.int64})
        )

    def vocab_partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) \
            else toks
        flat = np.asarray(
            toks.flatten().to_numpy(zero_copy_only=False), object
        )
        w = pd.unique(flat[flat != ""])
        return pd.DataFrame({"w": w})

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    voc = (
        ray.data.read_parquet(path, columns=["text"])
        .map_batches(vocab_partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["model_source", "eval_source", "n_bigrams", "ce_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if part.empty:
        return empty
    sw = part.groupby(["source", "w1", "w2"], as_index=False)["c"].sum()
    v_size = int(voc["w"].nunique())
    sources = sorted(sw["source"].unique())
    start = sw.groupby(["source", "w1"], as_index=False)["c"].sum().rename(
        columns={"c": "m"}
    )
    rows = []
    for a in sources:
        mod = sw[sw["source"] == a][["w1", "w2", "c"]]
        st = start[start["source"] == a][["w1", "m"]]
        for b in sources:
            ev = sw[sw["source"] == b][["w1", "w2", "c"]].rename(
                columns={"c": "ce_c"}
            )
            n_b = int(ev["ce_c"].sum())
            if n_b == 0:
                continue
            j = ev.merge(mod, on=["w1", "w2"], how="left").merge(
                st, on="w1", how="left"
            )
            num = j["c"].fillna(0).to_numpy(np.float64) + 1.0
            den = j["m"].fillna(0).to_numpy(np.float64) + float(v_size)
            ll = float(
                (j["ce_c"].to_numpy(np.int64).astype(np.float64)
                 * np.log(num / den)).sum()
            )
            ce = -ll / float(n_b)
            rows.append(
                (
                    a, b, np.int64(n_b),
                    np.int64(np.floor(ce * 1_000_000.0 + 0.5)),
                )
            )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[2:]}
    )


ORACLES308["docs_crossdomain_ce"] = """
WITH tl AS (
  SELECT source,
         list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
bigu AS (
  SELECT source, unnest(ws[:len(ws)-1]) AS w1, unnest(ws[2:]) AS w2
  FROM tl WHERE len(ws) >= 2
),
big AS (
  SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c
  FROM bigu GROUP BY 1, 2, 3
),
vv AS (
  SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
  FROM (SELECT unnest(ws) AS w FROM tl)
),
start AS (
  SELECT source, w1, CAST(sum(c) AS BIGINT) AS m FROM big GROUP BY 1, 2
),
srcs AS (SELECT DISTINCT source FROM big),
pairs AS (
  SELECT a.source AS ms, b.source AS es FROM srcs a CROSS JOIN srcs b
),
ev AS (
  SELECT p.ms, p.es, e.w1, e.w2, e.c AS ce_c,
         coalesce(m.c, 0) AS mc, coalesce(s.m, 0) AS sm
  FROM pairs p
  JOIN big e ON e.source = p.es
  LEFT JOIN big m ON m.source = p.ms AND m.w1 = e.w1 AND m.w2 = e.w2
  LEFT JOIN start s ON s.source = p.ms AND s.w1 = e.w1
),
ce AS (
  SELECT ms, es, CAST(sum(ce_c) AS BIGINT) AS n_bigrams,
         -sum(CAST(ce_c AS DOUBLE)
              * ln((CAST(mc AS DOUBLE) + 1.0)
                   / (CAST(sm AS DOUBLE) + vv.v)))
           / sum(CAST(ce_c AS DOUBLE)) AS h
  FROM ev, vv
  GROUP BY 1, 2, vv.v
)
SELECT ms AS model_source, es AS eval_source, n_bigrams,
       CAST(floor(h * 1000000.0 + 0.5) AS BIGINT) AS ce_micro
FROM ce
WHERE n_bigrams > 0
ORDER BY model_source, eval_source"""


# ---------------------------------------------------------------------------
# events_seasonal_sen_slope — median of within-weekday pairwise slopes
# ---------------------------------------------------------------------------


def q_events_seasonal_sen_slope(sf_dir: str):
    """Seasonal Sen slope: all pairwise slopes
    (y_j - y_i) / (t_j - t_i) WITHIN each epoch-weekday subseries of the
    zero-filled daily grid, pooled; the estimate is the LOWER median of
    the slope multiset (deterministic order statistic — slope values
    are identical exact-integer divisions on both sides). One row:
    n_slopes, slope_nano (floor of slope * 1e9 of the selected order
    statistic)."""
    from sts_opentelemetry_collector_ray.pipelines.queries264 import (
        _daily_counts,
        _grid,
    )

    days = _daily_counts(sf_dir)
    cols = ["n_slopes", "slope_nano"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 14:
        return empty
    d0 = int(days.index.min())
    slots = (d0 + np.arange(n)) % 7
    slopes = []
    for w in range(7):
        idx = np.nonzero(slots == w)[0]
        if len(idx) < 2:
            continue
        yy = y[idx].astype(np.float64)
        tt = idx.astype(np.float64)
        dy_ = yy[None, :] - yy[:, None]
        dt = tt[None, :] - tt[:, None]
        iu = np.triu_indices(len(idx), k=1)
        slopes.append(dy_[iu] / dt[iu])
    if not slopes:
        return empty
    s = np.concatenate(slopes)
    m = len(s)
    med = float(np.sort(s)[(m - 1) // 2])
    return pd.DataFrame(
        [
            (
                np.int64(m),
                np.int64(np.floor(med * 1_000_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES308["events_seasonal_sen_slope"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, grid.dy % 7 AS slot, CAST(coalesce(h.cnt, 0) AS BIGINT)
           AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
slopes AS (
  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
  FROM x a JOIN x b ON a.slot = b.slot AND a.t < b.t
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM slopes),
med AS (
  SELECT s FROM slopes ORDER BY s LIMIT 1
  OFFSET (SELECT (m - 1) // 2 FROM m)
)
SELECT m.m AS n_slopes,
       CAST(floor(med.s * 1000000000.0 + 0.5) AS BIGINT) AS slope_nano
FROM m, med, nn
WHERE nn.n >= 14 AND m.m > 0"""


QUERIES308 = {
    "docs_crossdomain_ce": q_docs_crossdomain_ce,
    "events_seasonal_sen_slope": q_events_seasonal_sen_slope,
}
