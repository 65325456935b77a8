"""Driver-contract queries, wave 187 — two-factor ANOVA with interaction
(return flag × line status on quantity, weighted cell-means decomposition)
and record-breaking daily event counts per type.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly. ANOVA runs on the integer-valued quantity column so every
aggregate is exactly representable — the strict hash gate never sees a
summation-order ulp."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES187: dict[str, str] = {}


def _micro(x) -> np.ndarray:
    return np.floor(np.asarray(x, np.float64) * 1_000_000.0 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# lineitem_twoway_anova — returnflag × linestatus on quantity
# ---------------------------------------------------------------------------


def q_lineitem_twoway_anova(sf_dir: str):
    """Two-factor fixed-effects ANOVA of l_quantity on A = l_returnflag and
    B = l_linestatus with interaction, using the count-weighted cell-means
    decomposition (SS_A = Σ s_a²/n_a − S²/N etc.; SS_AB = SS_cells − SS_A −
    SS_B, which may be negative on unbalanced data — documented). One row:
    N, cell count, SS terms (micro) and F statistics (micro).

    Scale shape: one single-pass bounded combiner (|A|×|B| cells of exact
    integer n/Σq/Σq²); driver folds cells×blocks rows — no shuffle."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["l_returnflag", "l_linestatus", "l_quantity"]).to_pandas()
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        df["s"] = q
        df["s2"] = q * q
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            n=("s", "size"), s=("s", "sum"), s2=("s2", "sum")
        )
        return g.reset_index().astype({"n": np.int64, "s": np.int64, "s2": np.int64})

    part = (
        ray.data.read_parquet(
            path, columns=["l_returnflag", "l_linestatus", "l_quantity"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = [
        "n_rows", "n_cells", "ss_a_micro", "ss_b_micro", "ss_ab_micro",
        "ss_err_micro", "f_a_micro", "f_b_micro", "f_ab_micro",
    ]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    cells = part.groupby(["l_returnflag", "l_linestatus"]).sum()
    n_ab = cells["n"].to_numpy(np.float64)
    s_ab = cells["s"].to_numpy(np.float64)
    N = float(n_ab.sum())
    S = float(s_ab.sum())
    S2 = float(cells["s2"].to_numpy(np.float64).sum())
    base = S * S / N
    a_lv = cells.groupby(level=0).sum()
    b_lv = cells.groupby(level=1).sum()
    ss_a = float(
        (a_lv["s"].to_numpy(np.float64) ** 2 / a_lv["n"].to_numpy(np.float64)).sum()
    ) - base
    ss_b = float(
        (b_lv["s"].to_numpy(np.float64) ** 2 / b_lv["n"].to_numpy(np.float64)).sum()
    ) - base
    ss_cells = float((s_ab * s_ab / n_ab).sum()) - base
    ss_ab = ss_cells - ss_a - ss_b
    ss_err = S2 - base - ss_cells
    na, nb = len(a_lv), len(b_lv)
    n_cells = len(cells)
    df_a, df_b = na - 1, nb - 1
    df_ab = df_a * df_b
    df_err = int(N) - n_cells
    ms_err = ss_err / df_err
    f_a = ss_a / df_a / ms_err
    f_b = ss_b / df_b / ms_err
    f_ab = ss_ab / df_ab / ms_err
    return pd.DataFrame(
        {
            "n_rows": np.array([int(N)], np.int64),
            "n_cells": np.array([n_cells], np.int64),
            "ss_a_micro": _micro([ss_a]),
            "ss_b_micro": _micro([ss_b]),
            "ss_ab_micro": _micro([ss_ab]),
            "ss_err_micro": _micro([ss_err]),
            "f_a_micro": _micro([f_a]),
            "f_b_micro": _micro([f_b]),
            "f_ab_micro": _micro([f_ab]),
        }
    )


ORACLES187["lineitem_twoway_anova"] = """
WITH cells AS (
  SELECT l_returnflag AS a, l_linestatus AS b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS s2
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n) AS DOUBLE) AS nn, CAST(sum(s) AS DOUBLE) AS ss,
         CAST(sum(s2) AS DOUBLE) AS ss2, count(*) AS n_cells
  FROM cells
),
al AS (SELECT a, CAST(sum(s) AS DOUBLE) AS s, CAST(sum(n) AS DOUBLE) AS n
       FROM cells GROUP BY 1),
bl AS (SELECT b, CAST(sum(s) AS DOUBLE) AS s, CAST(sum(n) AS DOUBLE) AS n
       FROM cells GROUP BY 1),
parts AS (
  SELECT (SELECT sum(s * s / n) FROM al) - ss * ss / nn AS ss_a,
         (SELECT sum(s * s / n) FROM bl) - ss * ss / nn AS ss_b,
         (SELECT sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          FROM cells) - ss * ss / nn AS ss_cells,
         ss2 - ss * ss / nn AS ss_tot,
         (SELECT count(*) FROM al) AS na,
         (SELECT count(*) FROM bl) AS nb,
         nn, n_cells
  FROM tot
),
f AS (
  SELECT nn, n_cells, ss_a, ss_b,
         ss_cells - ss_a - ss_b AS ss_ab,
         ss_tot - ss_cells AS ss_err,
         na - 1 AS df_a, nb - 1 AS df_b, (na - 1) * (nb - 1) AS df_ab,
         CAST(nn AS BIGINT) - n_cells AS df_err
  FROM parts
)
SELECT CAST(nn AS BIGINT) AS n_rows,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST(floor(ss_a * 1000000.0 + 0.5) AS BIGINT) AS ss_a_micro,
       CAST(floor(ss_b * 1000000.0 + 0.5) AS BIGINT) AS ss_b_micro,
       CAST(floor(ss_ab * 1000000.0 + 0.5) AS BIGINT) AS ss_ab_micro,
       CAST(floor(ss_err * 1000000.0 + 0.5) AS BIGINT) AS ss_err_micro,
       CAST(floor(ss_a / df_a / (ss_err / df_err) * 1000000.0 + 0.5) AS BIGINT)
         AS f_a_micro,
       CAST(floor(ss_b / df_b / (ss_err / df_err) * 1000000.0 + 0.5) AS BIGINT)
         AS f_b_micro,
       CAST(floor(ss_ab / df_ab / (ss_err / df_err) * 1000000.0 + 0.5) AS BIGINT)
         AS f_ab_micro
FROM f"""


# ---------------------------------------------------------------------------
# events_running_records — record-breaking daily counts per type
# ---------------------------------------------------------------------------


def q_events_running_records(sf_dir: str):
    """Per event type over the DAILY count series in date order: number of
    record-breaking days (count strictly above every earlier day; day one is
    a record), the last record day (yyyymmdd) and the maximum daily count.

    Scale shape: per-batch (type, day, n) combiner → driver folds the
    bounded |types|×|days| dimension table and runs one vectorized cummax
    scan — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        g = (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "n_days": pd.Series([], dtype=np.int64),
            "n_records": pd.Series([], dtype=np.int64),
            "last_record_day": pd.Series([], dtype=np.int64),
            "max_daily": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    et = daily["event_type"].to_numpy(object)
    n = daily["n"].to_numpy(np.int64)
    day = daily["day"].to_numpy(np.int64)
    new_type = np.ones(len(daily), dtype=bool)
    new_type[1:] = et[1:] != et[:-1]
    # running max that resets at type boundaries: segment-wise cummax
    grp = np.cumsum(new_type) - 1
    # per-segment running max of the PREVIOUS rows: global shift is safe
    # because first-of-segment rows are masked to -1 right after
    prev_max = pd.Series(n).groupby(grp).cummax().shift(1).to_numpy()
    prev_max[new_type] = -1  # first day of a type is always a record
    is_rec = n > prev_max
    out = pd.DataFrame(
        {"event_type": et, "n": n, "day": day, "rec": is_rec.astype(np.int64)}
    )
    g = out.groupby("event_type", sort=True)
    res = pd.DataFrame(
        {
            "event_type": np.asarray(g.size().index.to_numpy(object)),
            "n_days": g.size().to_numpy(np.int64),
            "n_records": g["rec"].sum().to_numpy(np.int64),
            "last_record_day": out[out["rec"] == 1]
            .groupby("event_type", sort=True)["day"]
            .max()
            .to_numpy(np.int64),
            "max_daily": g["n"].max().to_numpy(np.int64),
        }
    )
    return res.reset_index(drop=True)


ORACLES187["events_running_records"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, n,
         CASE WHEN n > coalesce(max(n) OVER (
                PARTITION BY event_type ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS rec
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(rec) AS BIGINT) AS n_records,
       CAST(max(CASE WHEN rec = 1 THEN day END) AS BIGINT) AS last_record_day,
       CAST(max(n) AS BIGINT) AS max_daily
FROM r GROUP BY 1 ORDER BY 1"""


QUERIES187 = {
    "lineitem_twoway_anova": q_lineitem_twoway_anova,
    "events_running_records": q_events_running_records,
}
