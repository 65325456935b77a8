"""Driver-contract queries, wave 300 — the Renyi entropy / Hill-number
diversity spectrum of the event-type distribution (orders 0, 1, 2 and
infinity in one profile) and the Wald-Wolfowitz runs test on the
return-flag sequence in global shipment order. Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES300: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_renyi_spectrum — diversity profile of the type distribution
# ---------------------------------------------------------------------------


def q_events_renyi_spectrum(sf_dir: str):
    """Renyi/Hill diversity profile of event types: H_0 = ln k
    (richness), H_1 = Shannon, H_2 = -ln sum p^2 (collision), H_inf =
    -ln max p (min-entropy), each with its Hill number exp(H_q) — the
    whole diversity ordering in one profile. Counts are exact; logs are
    float. Per order: q_label, h_micro, hill_milli.

    Scale shape: one (type -> count) combiner; the driver folds |types|
    scalars."""

    def partial(t: pa.Table) -> pd.DataFrame:
        g = pd.Series(
            t["event_type"].to_numpy(zero_copy_only=False)
        ).value_counts()
        return pd.DataFrame(
            {"et": g.index.to_numpy(object), "c": g.to_numpy(np.int64)}
        )

    h = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("et")["c"]
        .sum()
    )
    cols = ["q_label", "h_micro", "hill_milli"]
    empty = pd.DataFrame(
        {
            "q_label": pd.Series([], dtype=object),
            "h_micro": pd.Series([], dtype=np.int64),
            "hill_milli": pd.Series([], dtype=np.int64),
        }
    )
    if h.empty:
        return empty
    c = h.to_numpy(np.int64)
    n = int(c.sum())
    if n == 0:
        return empty
    k = len(c)
    cf = c.astype(np.float64)
    nf = float(n)
    h0 = float(np.log(float(k)))
    h1 = float(np.log(nf) - (cf * np.log(cf)).sum() / nf)
    # sum p^2 as exact integer ratio: sum c^2 / n^2
    s2 = int((c.astype(object) * c.astype(object)).sum())
    h2 = float(-np.log(float(s2) / (nf * nf)))
    hinf = float(-np.log(float(int(c.max())) / nf))
    rows = []
    for lbl, hv in (("q0", h0), ("q1", h1), ("q2", h2), ("qinf", hinf)):
        rows.append(
            (
                lbl,
                np.int64(np.floor(hv * 1_000_000.0 + 0.5)),
                np.int64(np.floor(float(np.exp(hv)) * 1_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"h_micro": np.int64, "hill_milli": np.int64}
    )


ORACLES300["events_renyi_spectrum"] = """
WITH h AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
         CAST(max(c) AS BIGINT) AS cmax,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
  FROM h
),
vals AS (
  SELECT 'q0' AS q_label, ln(CAST(k AS DOUBLE)) AS hv FROM m
  UNION ALL
  SELECT 'q1', ln(CAST(n AS DOUBLE)) - clnc / CAST(n AS DOUBLE) FROM m
  UNION ALL
  SELECT 'q2', -ln(CAST(s2 AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) FROM m
  UNION ALL
  SELECT 'qinf', -ln(CAST(cmax AS DOUBLE) / CAST(n AS DOUBLE)) FROM m
)
SELECT q_label,
       CAST(floor(hv * 1000000.0 + 0.5) AS BIGINT) AS h_micro,
       CAST(floor(exp(hv) * 1000.0 + 0.5) AS BIGINT) AS hill_milli
FROM vals, m
WHERE m.n > 0
ORDER BY q_label"""


# ---------------------------------------------------------------------------
# lineitem_return_runs — Wald-Wolfowitz runs in shipment order
# ---------------------------------------------------------------------------


def q_lineitem_return_runs(sf_dir: str):
    """Wald-Wolfowitz runs test on the return-flag sequence ordered by
    (shipdate, orderkey, linenumber): run count R vs the exact null
    E[R] = 2 n1 n2 / n + 1 and Var = 2 n1 n2 (2 n1 n2 - n) /
    (n^2 (n-1)). Counting is pure integers. One row: n1, n2, n_runs,
    e_runs_micro, z_micro — too few runs means returns CLUSTER in time.

    Scale shape: ONE range-partitioned sort, per-block change counting
    with (first, last) flag partials stitched on the driver (the
    `events_greenwood` idiom)."""

    def block_fold(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        if len(df) == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype=np.int64)
                 for c in ("n1", "n2", "changes", "first_sd", "first_ok",
                           "first_ln", "first_flag", "last_flag")}
            )
        r = (df["l_returnflag"].to_numpy(object) == "R").astype(np.int64)
        changes = int((r[1:] != r[:-1]).sum())
        return pd.DataFrame(
            {
                "n1": [np.int64(int(r.sum()))],
                "n2": [np.int64(int((1 - r).sum()))],
                "changes": [np.int64(changes)],
                "first_sd": [np.int64(
                    df["l_shipdate"].to_numpy("datetime64[us]")
                    .astype(np.int64)[0]
                )],
                "first_ok": [np.int64(df["l_orderkey"].iloc[0])],
                "first_ln": [np.int64(df["l_linenumber"].iloc[0])],
                "first_flag": [np.int64(r[0])],
                "last_flag": [np.int64(r[-1])],
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_shipdate", "l_orderkey", "l_linenumber", "l_returnflag",
            ],
        )
        .sort(["l_shipdate", "l_orderkey", "l_linenumber"])
        .map_batches(block_fold, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["first_sd", "first_ok", "first_ln"])
        .reset_index(drop=True)
    )
    cols = ["n1", "n2", "n_runs", "e_runs_micro", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if parts.empty:
        return empty
    n1 = int(parts["n1"].sum())
    n2 = int(parts["n2"].sum())
    n = n1 + n2
    if n1 == 0 or n2 == 0 or n < 2:
        return empty
    changes = int(parts["changes"].sum())
    ff = parts["first_flag"].to_numpy(np.int64)
    lf = parts["last_flag"].to_numpy(np.int64)
    changes += int((ff[1:] != lf[:-1]).sum())
    runs = changes + 1
    e = 2.0 * float(n1) * float(n2) / float(n) + 1.0
    var = (
        2.0 * float(n1) * float(n2)
        * (2.0 * float(n1) * float(n2) - float(n))
        / (float(n) * float(n) * float(n - 1))
    )
    if var <= 0.0:
        return empty
    z = (float(runs) - e) / float(np.sqrt(var))
    return pd.DataFrame(
        [
            (
                np.int64(n1), np.int64(n2), np.int64(runs),
                np.int64(np.floor(e * 1_000_000.0 + 0.5)),
                np.int64(np.floor(z * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES300["lineitem_return_runs"] = """
WITH s AS (
  SELECT CAST(l_returnflag = 'R' AS BIGINT) AS r,
         lag(CAST(l_returnflag = 'R' AS BIGINT)) OVER (
           ORDER BY l_shipdate, l_orderkey, l_linenumber
         ) AS prev
  FROM lineitem
),
m AS (
  SELECT CAST(sum(r) AS BIGINT) AS n1,
         CAST(sum(1 - r) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> r
                       THEN 1 ELSE 0 END) AS BIGINT) + 1 AS runs
  FROM s
),
st AS (
  SELECT n1, n2, runs, CAST(n1 + n2 AS BIGINT) AS n,
         2.0 * n1 * n2 / (n1 + n2) + 1.0 AS e,
         2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
           / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)) AS v
  FROM m
)
SELECT n1, n2, runs AS n_runs,
       CAST(floor(e * 1000000.0 + 0.5) AS BIGINT) AS e_runs_micro,
       CAST(floor((CAST(runs AS DOUBLE) - e) / sqrt(v) * 1000000.0 + 0.5)
            AS BIGINT) AS z_micro
FROM st
WHERE n1 > 0 AND n2 > 0 AND n >= 2 AND v > 0"""


QUERIES300 = {
    "events_renyi_spectrum": q_events_renyi_spectrum,
    "lineitem_return_runs": q_lineitem_return_runs,
}
