"""Driver-contract queries, wave 198 — approximate functional-dependency
discovery over part attributes (g3-style confidence per candidate FD) and a
t-closeness privacy audit over customer quasi-identifier groups (total
variation distance of the sensitive-attribute distribution).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES198: dict[str, str] = {}

_FD_CANDIDATES = [
    ("p_brand", "p_type"),
    ("p_type", "p_brand"),
    ("p_size", "p_type"),
    ("p_brand", "p_size"),
]


# ---------------------------------------------------------------------------
# part_fd_discovery — approximate FD confidence per candidate
# ---------------------------------------------------------------------------


def q_part_fd_discovery(sf_dir: str):
    """Approximate functional-dependency discovery (Kivinen & Mannila 1995
    g₃ measure): for each candidate X→Y over part attributes, confidence =
    Σ_x max_y n(x,y) / N (the share of rows kept by the best per-determinant
    mapping), violation count and whether the FD holds exactly. Output: fd,
    n_det, n_violations, conf_micro, holds.

    Scale shape: one pass emits all candidates' (x, y, n) combiner partials
    (attribute domains are dimension-bounded); driver folds pairs×blocks
    rows — no shuffle."""
    path = f"{sf_dir}/part.parquet"
    cols_needed = sorted({c for fd in _FD_CANDIDATES for c in fd})

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        outs = []
        for x, y in _FD_CANDIDATES:
            g = (
                df.groupby([x, y], sort=False, as_index=False)
                .size()
                .rename(columns={"size": "n", x: "x", y: "y"})
            )
            g["x"] = g["x"].astype(str)
            g["y"] = g["y"].astype(str)
            g["fd"] = f"{x}->{y}"
            outs.append(g)
        return pd.concat(outs, ignore_index=True).astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=cols_needed)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    out_cols = ["fd", "n_det", "n_violations", "conf_micro", "holds"]
    if part.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "fd" else np.int64))
             for c in out_cols}
        )
    g = part.groupby(["fd", "x", "y"], as_index=False)["n"].sum()
    rows = []
    for fd, sub in g.groupby("fd", sort=True):
        n_total = int(sub["n"].sum())
        best = sub.groupby("x")["n"].max()
        kept = int(best.sum())
        rows.append(
            (
                fd,
                np.int64(len(best)),
                np.int64(n_total - kept),
                np.int64(
                    np.floor(kept / float(n_total) * 1_000_000.0 + 0.5)
                ),
                np.int64(1 if kept == n_total else 0),
            )
        )
    return pd.DataFrame(rows, columns=out_cols).astype(
        {c: np.int64 for c in out_cols[1:]}
    )


def _fd_sql() -> str:
    parts = []
    for x, y in _FD_CANDIDATES:
        parts.append(f"""
SELECT '{x}->{y}' AS fd, CAST({x} AS VARCHAR) AS x, CAST({y} AS VARCHAR) AS y,
       CAST(count(*) AS BIGINT) AS n
FROM part GROUP BY 2, 3""")
    union = " UNION ALL ".join(parts)
    return f"""
WITH pairs AS ({union}),
best AS (
  SELECT fd, x, max(n) AS kept, sum(n) AS nx FROM pairs GROUP BY 1, 2
),
agg AS (
  SELECT fd, CAST(count(*) AS BIGINT) AS n_det,
         CAST(sum(nx) AS BIGINT) AS n_total,
         CAST(sum(kept) AS BIGINT) AS kept
  FROM best GROUP BY 1
)
SELECT fd, n_det,
       n_total - kept AS n_violations,
       CAST(floor(CAST(kept AS DOUBLE) / CAST(n_total AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS conf_micro,
       CAST(CASE WHEN kept = n_total THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM agg ORDER BY fd"""


ORACLES198["part_fd_discovery"] = _fd_sql()


# ---------------------------------------------------------------------------
# customer_t_closeness — total-variation t per quasi-identifier group
# ---------------------------------------------------------------------------


def q_customer_t_closeness(sf_dir: str):
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, categorical
    total-variation distance): quasi-identifier groups = (nation, balance
    band floor((bal+1000)/1000)), sensitive attribute = market segment;
    t(group) = ½ Σ_s |p_group(s) − p_global(s)|. Output per nation: group
    count, row count, and the nation's worst (max) t in micro units.

    Scale shape: one (nation, band, segment, n) bounded combiner; driver
    folds the dimension grid — no shuffle."""
    path = f"{sf_dir}/customer.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["c_nationkey", "c_acctbal", "c_mktsegment"]).to_pandas()
        df["band"] = np.floor(
            (df["c_acctbal"].to_numpy(np.float64) + 1000.0) / 1000.0
        ).astype(np.int64)
        df["n"] = 1
        return (
            df.groupby(["c_nationkey", "band", "c_mktsegment"], sort=False,
                       as_index=False)["n"]
            .sum()
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(
            path, columns=["c_nationkey", "c_acctbal", "c_mktsegment"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    out_cols = ["c_nationkey", "n_groups", "n_rows", "max_t_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in out_cols})
    g = part.groupby(["c_nationkey", "band", "c_mktsegment"], as_index=False)[
        "n"
    ].sum()
    segs = sorted(g["c_mktsegment"].unique())
    total = float(g["n"].sum())
    glob = g.groupby("c_mktsegment")["n"].sum().reindex(segs, fill_value=0)
    p_glob = glob.to_numpy(np.float64) / total
    rows = []
    for nk, sub in g.groupby("c_nationkey", sort=True):
        ts = []
        n_rows = int(sub["n"].sum())
        for _, grp in sub.groupby("band", sort=True):
            cnt = (
                grp.set_index("c_mktsegment")["n"]
                .reindex(segs, fill_value=0)
                .to_numpy(np.float64)
            )
            p = cnt / cnt.sum()
            ts.append(0.5 * np.abs(p - p_glob).sum())
        rows.append(
            (
                np.int64(nk), np.int64(len(ts)), np.int64(n_rows),
                np.int64(np.floor(max(ts) * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=out_cols).astype(np.int64)


ORACLES198["customer_t_closeness"] = """
WITH c AS (
  SELECT c_nationkey,
         CAST(floor((c_acctbal + 1000.0) / 1000.0) AS BIGINT) AS band,
         c_mktsegment, count(*) AS n
  FROM customer GROUP BY 1, 2, 3
),
segs AS (SELECT DISTINCT c_mktsegment FROM c),
grps AS (SELECT DISTINCT c_nationkey, band FROM c),
grid AS (
  SELECT grps.c_nationkey, grps.band, segs.c_mktsegment,
         coalesce(c.n, 0) AS n
  FROM grps CROSS JOIN segs
  LEFT JOIN c ON c.c_nationkey = grps.c_nationkey AND c.band = grps.band
             AND c.c_mktsegment = segs.c_mktsegment
),
gl AS (
  SELECT c_mktsegment, CAST(sum(n) AS DOUBLE) AS ns,
         (SELECT CAST(sum(n) AS DOUBLE) FROM grid) AS total
  FROM grid GROUP BY 1
),
gt AS (SELECT c_nationkey, band, CAST(sum(n) AS DOUBLE) AS ng FROM grid GROUP BY 1, 2),
tv AS (
  SELECT grid.c_nationkey, grid.band,
         0.5 * sum(abs(CAST(grid.n AS DOUBLE) / gt.ng - gl.ns / gl.total)) AS t
  FROM grid
  JOIN gt ON grid.c_nationkey = gt.c_nationkey AND grid.band = gt.band
  JOIN gl ON grid.c_mktsegment = gl.c_mktsegment
  GROUP BY 1, 2
),
nr AS (SELECT c_nationkey, CAST(sum(n) AS BIGINT) AS n_rows FROM c GROUP BY 1)
SELECT CAST(tv.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(any_value(nr.n_rows) AS BIGINT) AS n_rows,
       CAST(floor(max(tv.t) * 1000000.0 + 0.5) AS BIGINT) AS max_t_micro
FROM tv JOIN nr ON tv.c_nationkey = nr.c_nationkey
GROUP BY 1 ORDER BY 1"""


QUERIES198 = {
    "part_fd_discovery": q_part_fd_discovery,
    "customer_t_closeness": q_customer_t_closeness,
}
