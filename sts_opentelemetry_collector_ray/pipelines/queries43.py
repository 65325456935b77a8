"""Driver-contract queries, wave 43 — ordered run-length encoding profile
(the columnar-storage planning statistic, computed as a distributed segmented
scan with cross-range boundary stitching) and the exact two-sample
Kolmogorov–Smirnov drift statistic (the nonparametric companion to the PSI
report, pure integer). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES43: dict[str, str] = {}

_RLE_RANGES = 32
_KS_USER_BUCKETS = 32


# ---------------------------------------------------------------------------
# events_rle_profile — ordered run/distinct profile per column
# ---------------------------------------------------------------------------


def q_events_rle_profile(sf_dir: str):
    """RLE/dictionary encoding profile (the column-store compression planner:
    runs in storage order decide RLE viability, distinct count decides dict
    width). Runs are counted in event_id order WITHOUT a global sort: rows
    range-bucket by event_id (ranges are CONTIGUOUS), each range counts its
    runs locally and emits (n, runs, first, last), and the driver stitches
    adjacent ranges — a run crossing a boundary is counted once. The
    segmented-scan-with-boundary-stitch pattern. Output per profiled column:
    n_rows, n_runs, n_distinct, avg_run_micro (all exact integers)."""

    path = f"{sf_dir}/events.parquet"
    bounds = (
        ray.data.read_parquet(path, columns=["event_id"])
        .map_batches(
            lambda t: pa.table(
                {"mx": pa.array([t["event_id"].to_numpy(zero_copy_only=False).max()])}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    max_id = int(bounds["mx"].max())

    cols = ["event_type", "user_id"]

    def prep(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "user_id": t["user_id"],
                "_rb": pa.array(
                    (eid * _RLE_RANGES // (max_id + 1)).astype(np.int32)
                ),
            }
        )

    def range_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values("event_id", kind="mergesort")
        rb = int(d["_rb"].iloc[0])
        rows = []
        for col in cols:
            v = d[col].to_numpy(dtype=object)
            runs = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
            dvals = pd.unique(d[col])
            rows.append(
                (
                    col,
                    rb,
                    np.int64(len(d)),
                    np.int64(runs),
                    np.int64(len(dvals)),
                    str(v[0]) if len(v) else "",
                    str(v[-1]) if len(v) else "",
                )
            )
        return pd.DataFrame(
            rows,
            columns=["col", "rb", "n", "runs", "nd_local", "first_v", "last_v"],
        )

    parts = (
        ray.data.read_parquet(path, columns=["event_id"] + cols)
        .map_batches(prep, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(
            lambda g: range_partial(g), batch_format="pandas"
        )
        .to_pandas()  # bounded: |cols| rows per range
        .sort_values(["col", "rb"], kind="mergesort")
    )

    # exact distinct via driver fold of per-block distinct VALUES (domains
    # are dimension-sized: event types and users)
    import pyarrow.compute as pc

    dvals = (
        ray.data.read_parquet(path, columns=cols)
        .map_batches(
            lambda t: pa.table(
                {
                    "col": pa.array(
                        ["event_type"] * len(pc.unique(t["event_type"]))
                        + ["user_id"] * len(pc.unique(t["user_id"]))
                    ),
                    "v": pa.array(
                        [str(x) for x in pc.unique(t["event_type"]).to_pylist()]
                        + [str(x) for x in pc.unique(t["user_id"]).to_pylist()],
                        pa.string(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates()
        .groupby("col")["v"]
        .nunique()
    )

    rows = []
    for col, g in parts.groupby("col", sort=True):
        g = g[g["n"] > 0]
        n = int(g["n"].sum())
        runs = int(g["runs"].sum())
        # stitch: adjacent ranges whose boundary values match merge one run
        fv = g["first_v"].to_numpy(dtype=object)
        lv = g["last_v"].to_numpy(dtype=object)
        runs -= int((fv[1:] == lv[:-1]).sum())
        nd = int(dvals.loc[col])
        rows.append(
            (
                col,
                np.int64(n),
                np.int64(runs),
                np.int64(nd),
                np.int64((2 * 1000000 * n + runs) // (2 * runs)),
            )
        )
    return pd.DataFrame(
        rows, columns=["col", "n_rows", "n_runs", "n_distinct", "avg_run_micro"]
    ).astype(
        {
            "n_rows": np.int64,
            "n_runs": np.int64,
            "n_distinct": np.int64,
            "avg_run_micro": np.int64,
        }
    )


def _rle_oracle_col(col: str) -> str:
    return f"""(
  WITH s AS (
    SELECT CAST({col} AS VARCHAR) AS v,
           lag(CAST({col} AS VARCHAR)) OVER (ORDER BY event_id) AS pv
    FROM events
  )
  SELECT '{col}' AS col,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(1 + count(*) FILTER (pv IS NOT NULL AND v <> pv) AS BIGINT)
           AS n_runs,
         CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
         (2 * 1000000 * count(*)
          + (1 + count(*) FILTER (pv IS NOT NULL AND v <> pv)))
           // (2 * (1 + count(*) FILTER (pv IS NOT NULL AND v <> pv)))
           AS avg_run_micro
  FROM s)"""


ORACLES43["events_rle_profile"] = (
    _rle_oracle_col("event_type") + " UNION ALL " + _rle_oracle_col("user_id")
)


# ---------------------------------------------------------------------------
# events_ks_drift — exact two-sample Kolmogorov–Smirnov statistic
# ---------------------------------------------------------------------------


def q_events_ks_drift(sf_dir: str):
    """Exact two-sample KS drift (the nonparametric companion to PSI): split
    the stream at the midpoint of its time range; per event_type,
    KS = max over observed values v of |F_A(v) − F_B(v)| — computed as the
    PURE-INTEGER max |cumA·nB − cumB·nA| over the value-domain histogram, so
    no float ever enters the gate (micro-rounds via the 2a+b // 2b form).

    The exchange carries (type, cents, period, count) partials — bounded by
    the VALUE DOMAIN (the winsorize/quantiles contract), never rows."""

    path = f"{sf_dir}/events.parquet"
    b = (
        ray.data.read_parquet(path, columns=["ts"])
        .map_batches(
            lambda t: pa.table(
                {
                    "mn": pa.array(
                        [t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).min()]
                    ),
                    "mx": pa.array(
                        [t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False).max()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    mn, mx = int(b["mn"].min()), int(b["mx"].max())
    mid = mn + (mx - mn) // 2

    def count_partial(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        period = (tu > mid).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": cents,
                "period": period,
            }
        )
        out = (
            df.groupby(["event_type", "cents", "period"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    counts = (
        ray.data.read_parquet(path, columns=["ts", "value", "event_type"])
        .map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: value-domain rows per block
        .groupby(["event_type", "cents", "period"])["cnt"]
        .sum()
        .reset_index()
    )
    rows = []
    for et, g in counts.groupby("event_type", sort=True):
        piv = (
            g.pivot_table(
                index="cents", columns="period", values="cnt", fill_value=0,
                aggfunc="sum",
            )
            .reindex(columns=[0, 1], fill_value=0)
            .sort_index()
        )
        ca = piv[0].to_numpy().cumsum()
        cb = piv[1].to_numpy().cumsum()
        na, nb = int(ca[-1]), int(cb[-1])
        num = np.abs(ca * nb - cb * na)
        mx_num = int(num.max())
        denom = na * nb
        ks_micro = (
            (2 * 1000000 * mx_num + denom) // (2 * denom) if denom else 0
        )
        rows.append((et, np.int64(na), np.int64(nb), np.int64(ks_micro)))
    return pd.DataFrame(rows, columns=["event_type", "n_a", "n_b", "ks_micro"]).astype(
        {"n_a": np.int64, "n_b": np.int64, "ks_micro": np.int64}
    )


ORACLES43["events_ks_drift"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) AS tu,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
g AS (SELECT min(tu) mn, max(tu) mx FROM c),
p AS (
  SELECT event_type, cents,
         CASE WHEN tu > mn + (mx - mn) // 2 THEN 1 ELSE 0 END AS period
  FROM c CROSS JOIN g
),
cnts AS (
  SELECT event_type, cents,
         CAST(count(*) FILTER (period = 0) AS BIGINT) AS a,
         CAST(count(*) FILTER (period = 1) AS BIGINT) AS b
  FROM p GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cents,
         SUM(a) OVER (PARTITION BY event_type ORDER BY cents) AS ca,
         SUM(b) OVER (PARTITION BY event_type ORDER BY cents) AS cb,
         SUM(a) OVER (PARTITION BY event_type) AS na,
         SUM(b) OVER (PARTITION BY event_type) AS nb
  FROM cnts
),
mx AS (
  SELECT event_type, CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS num,
         CAST(any_value(na) AS BIGINT) AS n_a, CAST(any_value(nb) AS BIGINT) AS n_b
  FROM cum GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       CASE WHEN n_a * n_b = 0 THEN 0
            ELSE (2 * 1000000 * num + n_a * n_b) // (2 * n_a * n_b) END
         AS ks_micro
FROM mx"""


QUERIES43 = {
    "events_rle_profile": q_events_rle_profile,
    "events_ks_drift": q_events_ks_drift,
}
