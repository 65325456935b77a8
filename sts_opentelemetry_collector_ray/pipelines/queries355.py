"""Driver-contract queries, wave 355 — the props schema census (which
JSON keys exist and their fill rates — the semi-structured payload
audit) and the weekend-lift monthly trend (is the weekend share of
events growing?). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES355: dict[str, str] = {}

_DAY_US = 86_400_000_000
_KEY_RE = re.compile(r'"(\w+)":')


# ---------------------------------------------------------------------------
# events_props_schema_census — JSON key fill rates
# ---------------------------------------------------------------------------


def q_events_props_schema_census(sf_dir: str):
    """Semi-structured audit: discover every '"key":' in the props
    column (pass 1, bounded key set), then per key the number of rows
    CONTAINING it (vectorized substring match). Per key: key, n_rows,
    fill_rate_micro; n_total repeated.

    Scale shape: pass 1 folds per-batch key sets; pass 2 is one
    match_substring per discovered key per batch."""
    import ray as _ray

    def discover(t: pa.Table) -> pd.DataFrame:
        keys: set[str] = set()
        for s in t["props"].to_pylist():
            if s:
                keys.update(_KEY_RE.findall(s))
        return pd.DataFrame({"k": sorted(keys)})

    keys = sorted(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["props"])
        .map_batches(discover, batch_format="pyarrow")
        .to_pandas()["k"]
        .unique()
    )
    cols = ["key", "n_rows", "fill_rate_micro", "n_total"]
    empty = pd.DataFrame(
        {
            "key": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if not keys:
        return empty
    keys_ref = _ray.put(keys)

    def presence(t: pa.Table) -> pd.DataFrame:
        ks = _ray.get(keys_ref)
        props = pc.fill_null(t["props"], "")
        row = {"n": np.int64(len(t))}
        for i, k in enumerate(ks):
            row[f"k{i}"] = np.int64(int(
                pc.sum(
                    pc.cast(
                        pc.match_substring(props, f'"{k}":'), pa.int64()
                    )
                ).as_py() or 0
            ))
        return pd.DataFrame([row])

    p = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["props"])
        .map_batches(presence, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    n = int(p["n"])
    if n == 0:
        return empty
    rows = []
    for i, k in enumerate(keys):
        c = int(p[f"k{i}"])
        rows.append(
            (
                k, np.int64(c),
                np.int64(np.floor(float(c) / float(n) * 1_000_000.0 + 0.5)),
                np.int64(n),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES355["events_props_schema_census"] = r"""
WITH keys AS (
  SELECT DISTINCT unnest(regexp_extract_all(props, '"(\w+)":', 1)) AS k
  FROM events WHERE props IS NOT NULL
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
cnt AS (
  SELECT keys.k,
         CAST(sum(CASE WHEN contains(coalesce(e.props, ''),
                                     '"' || keys.k || '":')
                       THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM keys CROSS JOIN events e
  GROUP BY 1
)
SELECT cnt.k AS key, cnt.c AS n_rows,
       CAST(floor(CAST(cnt.c AS DOUBLE) / nn.n * 1000000.0 + 0.5)
            AS BIGINT) AS fill_rate_micro,
       nn.n AS n_total
FROM cnt, nn
WHERE nn.n > 0
ORDER BY key"""


# ---------------------------------------------------------------------------
# events_weekend_lift_trend — weekend share of monthly volume over time
# ---------------------------------------------------------------------------


def q_events_weekend_lift_trend(sf_dir: str):
    """Weekend-lift trend: per calendar month the share of events on
    true weekends (epoch-day % 7 in {2, 3}); the OLS slope of that
    share on the month index asks whether weekend behavior grows.
    Counts exact; shares/OLS mirrored float. Per month: ym, n,
    weekend_share_micro, slope_nano (repeated)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        ym = (
            df["ts"].dt.year.to_numpy(np.int64) * 12
            + df["ts"].dt.month.to_numpy(np.int64) - 1
        )
        wk = np.isin((us // _DAY_US) % 7, (2, 3)).astype(np.int64)
        g = pd.DataFrame({"ym": ym, "n": 1, "w": wk}).groupby(
            "ym", as_index=False
        ).sum()
        return g.astype(np.int64)

    m = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("ym")[["n", "w"]]
        .sum()
        .sort_index()
    )
    cols = ["ym", "n", "weekend_share_micro", "slope_nano"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(m) < 3:
        return empty
    ym = m.index.to_numpy(np.int64)
    t_idx = (ym - ym.min()).astype(np.float64)
    share = m["w"].to_numpy(np.int64).astype(np.float64) / m[
        "n"
    ].to_numpy(np.int64).astype(np.float64)
    k = float(len(m))
    sx, sy = float(t_idx.sum()), float(share.sum())
    sxx = float((t_idx * t_idx).sum())
    sxy = float((t_idx * share).sum())
    den = k * sxx - sx * sx
    if den == 0.0:
        return empty
    slope = (k * sxy - sx * sy) / den
    sn = np.int64(np.floor(slope * 1_000_000_000.0 + 0.5))
    out = pd.DataFrame(
        {
            "ym": ym,
            "n": m["n"].to_numpy(np.int64),
            "weekend_share_micro": np.floor(
                share * 1_000_000.0 + 0.5
            ).astype(np.int64),
            "slope_nano": sn,
        }
    )
    return out.astype({c: np.int64 for c in cols})[cols]


ORACLES355["events_weekend_lift_trend"] = f"""
WITH b AS (
  SELECT CAST(year(ts) * 12 + month(ts) - 1 AS BIGINT) AS ym,
         CAST(((epoch_us(ts) // {_DAY_US}) % 7) IN (2, 3) AS BIGINT) AS wk
  FROM events
),
m AS (
  SELECT ym, CAST(count(*) AS BIGINT) AS n, CAST(sum(wk) AS BIGINT) AS w
  FROM b GROUP BY 1
),
m0 AS (SELECT min(ym) AS y0, CAST(count(*) AS DOUBLE) AS k FROM m),
xy AS (
  SELECT CAST(m.ym - m0.y0 AS DOUBLE) AS x,
         CAST(m.w AS DOUBLE) / m.n AS y
  FROM m, m0
),
fit AS (
  SELECT (k * sxy - sx * sy) / (k * sxx - sx * sx) AS slope
  FROM (
    SELECT max(m0.k) AS k, sum(x) AS sx, sum(y) AS sy,
           sum(x * x) AS sxx, sum(x * y) AS sxy
    FROM xy, m0
  )
  WHERE (k * sxx - sx * sx) <> 0
)
SELECT m.ym, m.n,
       CAST(floor(CAST(m.w AS DOUBLE) / m.n * 1000000.0 + 0.5) AS BIGINT)
         AS weekend_share_micro,
       CAST(floor(fit.slope * 1000000000.0 + 0.5) AS BIGINT) AS slope_nano
FROM m, fit, m0
WHERE m0.k >= 3
ORDER BY m.ym"""


QUERIES355 = {
    "events_props_schema_census": q_events_props_schema_census,
    "events_weekend_lift_trend": q_events_weekend_lift_trend,
}
