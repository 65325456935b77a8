"""Driver-contract queries, wave 382 — positive PMI cells of the
document lang x source table and the index-of-dispersion curve of
event counts at 1h/6h/24h window scales. Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES382: dict[str, str] = {}

_HOUR_US = 3_600_000_000
_SCALES = (("1h", 1), ("6h", 6), ("24h", 24))


# ---------------------------------------------------------------------------
# docs_lang_source_ppmi — pointwise mutual information cells
# ---------------------------------------------------------------------------


def q_docs_lang_source_ppmi(sf_dir: str):
    """Which (lang, source) pairs co-occur beyond independence?
    PMI = ln(c * N / (c_lang * c_source)) per cell (exact integer
    ratio inside one ln); positive cells reported. Per cell: lang,
    source, n, pmi_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "lang": t["lang"].to_numpy(zero_copy_only=False),
                    "src": t["source"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["lang", "src"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    joint = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "source"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["lang", "src"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["lang", "source", "n", "pmi_milli"]
    empty = pd.DataFrame(
        {
            "lang": pd.Series([], dtype=object),
            "source": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "pmi_milli": pd.Series([], dtype=np.int64),
        }
    )
    if joint.empty:
        return empty
    n = int(joint["c"].sum())
    ml = joint.groupby("lang")["c"].sum()
    ms = joint.groupby("src")["c"].sum()
    rows = []
    for _, r in joint.sort_values(["lang", "src"]).iterrows():
        c = int(r["c"])
        pmi = float(np.log(
            float(c) * float(n)
            / (float(int(ml[r["lang"]])) * float(int(ms[r["src"]])))
        ))
        if pmi > 0.0:
            rows.append(
                (
                    r["lang"], r["src"], np.int64(c),
                    np.int64(np.floor(pmi * 1_000.0 + 0.5)),
                )
            )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {"n": np.int64, "pmi_milli": np.int64}
    )


ORACLES382["docs_lang_source_ppmi"] = """
WITH j AS (
  SELECT lang, source AS src, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM j),
ml AS (SELECT lang, CAST(sum(c) AS BIGINT) AS c FROM j GROUP BY 1),
ms AS (SELECT src, CAST(sum(c) AS BIGINT) AS c FROM j GROUP BY 1),
pmi AS (
  SELECT j.lang, j.src, j.c,
         ln(CAST(j.c AS DOUBLE) * nn.n
            / (CAST(ml.c AS DOUBLE) * ms.c)) AS pmi
  FROM j JOIN ml USING (lang) JOIN ms USING (src), nn
)
SELECT lang, src AS source, c AS n,
       CAST(floor(pmi * 1000.0 + 0.5) AS BIGINT) AS pmi_milli
FROM pmi
WHERE pmi > 0.0
ORDER BY lang, source"""


# ---------------------------------------------------------------------------
# events_dispersion_curve — index of dispersion across scales
# ---------------------------------------------------------------------------


def q_events_dispersion_curve(sf_dir: str):
    """Burstiness across scales: for window sizes 1h/6h/24h, the
    variance-to-mean ratio of counts over the zero-filled window grid
    (population variance, exact integer cores). A Poisson stream sits
    at 1 on every scale; growth with scale signals clustering. Per
    scale: window_label, n_windows, mean_milli, dispersion_milli."""

    def partial(t: pa.Table) -> pd.DataFrame:
        hr = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        h = pd.Series(hr).groupby(hr).size()
        return pd.DataFrame(
            {"hr": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hours = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("hr")["c"]
        .sum()
    )
    cols = ["window_label", "n_windows", "mean_milli", "dispersion_milli"]
    empty = pd.DataFrame(
        {
            "window_label": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if hours.empty:
        return empty
    h0, h1 = int(hours.index.min()), int(hours.index.max())
    span = h1 - h0 + 1
    y = np.zeros(span, np.int64)
    y[hours.index.to_numpy(np.int64) - h0] = hours.to_numpy(np.int64)
    rows = []
    for label, w in _SCALES:
        nw = span // w
        if nw < 5:
            continue
        win = y[: nw * w].reshape(nw, w).sum(axis=1).astype(object)
        s = int(win.sum())
        s2 = int((win * win).sum())
        mean = float(s) / float(nw)
        if mean <= 0.0:
            continue
        var = (float(s2) - float(s) * float(s) / float(nw)) / float(nw)
        rows.append(
            (
                label, np.int64(nw),
                np.int64(np.floor(mean * 1_000.0 + 0.5)),
                np.int64(np.floor(var / mean * 1_000.0 + 0.5)),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES382["events_dispersion_curve"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
grid AS (
  SELECT CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 500000) r
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.t, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h ON h.hr = (SELECT h0 FROM g) + grid.t
),
span AS (SELECT CAST(count(*) AS BIGINT) AS s FROM x),
scales AS (
  SELECT * FROM (VALUES ('1h', 1), ('6h', 6), ('24h', 24))
    AS t(label, w)
),
wins AS (
  SELECT scales.label, scales.w, x.t // scales.w AS widx,
         CAST(sum(x.y) AS BIGINT) AS cnt
  FROM x, scales, span
  WHERE x.t < (span.s // scales.w) * scales.w
  GROUP BY 1, 2, 3
),
agg AS (
  SELECT label, w, CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(cnt) AS BIGINT) AS s,
         CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS s2
  FROM wins GROUP BY 1, 2
),
f AS (
  SELECT label, w, nw,
         CAST(s AS DOUBLE) / nw AS mean,
         (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / nw) / nw AS var
  FROM agg
  WHERE nw >= 5 AND s > 0
)
SELECT label AS window_label, nw AS n_windows,
       CAST(floor(mean * 1000.0 + 0.5) AS BIGINT) AS mean_milli,
       CAST(floor(var / mean * 1000.0 + 0.5) AS BIGINT)
         AS dispersion_milli
FROM f
ORDER BY w"""


QUERIES382 = {
    "docs_lang_source_ppmi": q_docs_lang_source_ppmi,
    "events_dispersion_curve": q_events_dispersion_curve,
}
