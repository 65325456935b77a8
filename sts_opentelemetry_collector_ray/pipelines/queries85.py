"""Driver-contract queries, wave 85 — sales rollup cube (GROUPING SETS over
region → nation → grand total in ONE pass: the OLAP subtotal contract) and
embedding centroid drift (per label, the exact fixed-point squared shift
between the even- and odd-half centroids — the training-data drift monitor).
Same contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

ORACLES85: dict[str, str] = {}

_CUBE_BUCKETS = 32
_DRIFT_SCALE = 1 << 20
_DRIFT_OFF = 1 << 40
_DRIFT_DIM = 64


# ---------------------------------------------------------------------------
# sales_cube — region/nation/total revenue with subtotal rows
# ---------------------------------------------------------------------------


def q_sales_cube(sf_dir: str):
    """GROUPING SETS in one pass: revenue (order totalprice, micro-exact) and
    order counts at three granularities — (region, nation), (region, ALL),
    (ALL, ALL) — subtotal labels spelled 'ALL'.

    Scale shape: orders pre-reduce per custkey inside batches and share ONE
    custkey-bucket exchange with the customer keys; buckets emit per-nation
    integer partials (≤ |nations| rows each); the driver decorates with the
    tiny nation/region tables and expands the three levels from the SAME
    |nations| partials — the fact table is scanned once."""

    def o_partial(t: pa.Table) -> pd.DataFrame:
        c = t["o_custkey"].to_numpy().astype(np.int64)
        tp = np.floor(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        g = pd.DataFrame({"c": c, "tp": tp, "n": np.int64(1)}).groupby(
            "c", sort=False, as_index=False
        ).sum()
        return pd.DataFrame(
            {
                "c": g["c"].to_numpy(np.int64),
                "tp": g["tp"].to_numpy(np.int64),
                "n": g["n"].to_numpy(np.int64),
                "nk": np.int64(-1),
                "_b": (g["c"].to_numpy(np.int64) % _CUBE_BUCKETS).astype(np.int64),
            }
        )

    def c_rows(t: pa.Table) -> pd.DataFrame:
        c = t["c_custkey"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "c": c,
                "tp": np.int64(0),
                "n": np.int64(0),
                "nk": t["c_nationkey"].to_numpy().astype(np.int64),
                "_b": (c % _CUBE_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_c = (g["nk"] >= 0).to_numpy()
        cust = g.loc[is_c, ["c", "nk"]]
        o = g.loc[~is_c, ["c", "tp", "n"]].groupby(
            "c", sort=False, as_index=False
        ).sum()
        j = o.merge(cust, on="c")
        out = j.groupby("nk", sort=False, as_index=False)[["tp", "n"]].sum()
        return pd.DataFrame(
            {
                "nk": out["nk"].to_numpy(np.int64),
                "tp": out["tp"].to_numpy(np.int64),
                "n": out["n"].to_numpy(np.int64),
            }
        )

    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(o_partial, batch_format="pyarrow")
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(c_rows, batch_format="pyarrow")
    per_nation = (
        o.union(c)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: ≤ |nations| rows per bucket
        .groupby("nk", as_index=False)[["tp", "n"]]
        .sum()
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    j = (
        per_nation.merge(nat, left_on="nk", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    lvl0 = j.groupby(["r_name", "n_name"], as_index=False)[["tp", "n"]].sum()
    lvl1 = j.groupby("r_name", as_index=False)[["tp", "n"]].sum()
    lvl1["n_name"] = "ALL"
    lvl2 = pd.DataFrame(
        {"r_name": ["ALL"], "n_name": ["ALL"],
         "tp": [int(j["tp"].sum())], "n": [int(j["n"].sum())]}
    )
    out = pd.concat(
        [lvl0[["r_name", "n_name", "tp", "n"]],
         lvl1[["r_name", "n_name", "tp", "n"]], lvl2],
        ignore_index=True,
    ).sort_values(["r_name", "n_name"], kind="mergesort")
    return pd.DataFrame(
        {
            "region_name": out["r_name"].astype(object),
            "nation_name": out["n_name"].astype(object),
            "revenue_micro": out["tp"].to_numpy(np.int64),
            "n_orders": out["n"].to_numpy(np.int64),
        }
    )


ORACLES85["sales_cube"] = """
WITH j AS (
  SELECT n_name, r_name,
         CAST(floor(o_totalprice * 1000000 + 0.5) AS HUGEINT) AS tp
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
),
a AS (
  SELECT r_name, n_name, sum(tp) AS rev, CAST(count(*) AS BIGINT) AS n
  FROM j GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
)
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       CAST(rev AS BIGINT) AS revenue_micro, n AS n_orders
FROM a ORDER BY 1, 2"""


# ---------------------------------------------------------------------------
# emb_centroid_drift — even-half vs odd-half centroid shift per label
# ---------------------------------------------------------------------------


def q_emb_centroid_drift(sf_dir: str):
    """Drift monitor: split vectors by vec_id parity, compute each half's
    fixed-point centroid per label (the wave-63 exact convention) and report
    the EXACT integer squared L2 shift Σ_d (c_even − c_odd)² plus both half
    sizes. Labels present in only one half are excluded (no drift defined).

    Scale shape: ONE pass emits per-(parity, label, dim) integer partials
    (bounded 2·|labels|·d per block); the driver reduces the tiny exchange
    and finishes with |labels| subtractions."""
    from ..functions.vectors import stack_list_column

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _DRIFT_SCALE + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        par = (t["vec_id"].to_numpy().astype(np.int64) % 2).astype(np.int64)
        frames = []
        for p in (0, 1):
            for l in np.unique(lab[par == p]):
                sel = q[(lab == l) & (par == p)]
                frames.append(
                    pd.DataFrame(
                        {
                            "p": np.full(_DRIFT_DIM, p, np.int64),
                            "label": np.full(_DRIFT_DIM, l, np.int64),
                            "dim": np.arange(_DRIFT_DIM, dtype=np.int64),
                            "s": sel.sum(axis=0),
                            "n": np.full(_DRIFT_DIM, len(sel), np.int64),
                        }
                    )
                )
        return pd.concat(frames, ignore_index=True)

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "label", "embedding"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: 2·|labels|·d per block
        .groupby(["p", "label", "dim"])
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index()
    )
    agg["cfp"] = agg["s"].to_numpy(np.int64) // agg["n"].to_numpy(np.int64)
    ev = agg[agg["p"] == 0].set_index(["label", "dim"])
    od = agg[agg["p"] == 1].set_index(["label", "dim"])
    labels = sorted(
        set(ev.index.get_level_values(0)) & set(od.index.get_level_values(0))
    )
    rows = []
    for l in labels:
        ce = ev.loc[l, "cfp"].to_numpy(np.int64)
        co = od.loc[l, "cfp"].to_numpy(np.int64)
        d = ce - co
        rows.append(
            {
                "label": int(l),
                "n_even": int(ev.loc[l, "n"].iloc[0]),
                "n_odd": int(od.loc[l, "n"].iloc[0]),
                "drift2": int((d * d).sum()),
            }
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


ORACLES85["emb_centroid_drift"] = f"""
WITH u AS (
  SELECT CAST(vec_id % 2 AS BIGINT) AS p, CAST(label AS BIGINT) AS label,
         CAST(g.i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(g.i AS INT) + 1] AS DOUBLE)
                    * {_DRIFT_SCALE} + 0.5) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, {_DRIFT_DIM}) g(i)
),
a AS (
  SELECT p, label, dim, sum(CAST(q AS HUGEINT)) AS s,
         CAST(count(*) AS HUGEINT) AS n
  FROM u GROUP BY 1, 2, 3
),
c AS (
  SELECT p, label, dim,
         CAST(((s + n * {_DRIFT_OFF}) // n) - {_DRIFT_OFF} AS BIGINT) AS cfp,
         CAST(n AS BIGINT) AS n
  FROM a
),
d AS (
  SELECT e.label,
         max(e.n) AS n_even, max(o.n) AS n_odd,
         sum(CAST(e.cfp - o.cfp AS HUGEINT)
             * CAST(e.cfp - o.cfp AS HUGEINT)) AS drift2
  FROM c e JOIN c o ON o.label = e.label AND o.dim = e.dim
  WHERE e.p = 0 AND o.p = 1
  GROUP BY 1
)
SELECT label, n_even, n_odd, CAST(drift2 AS BIGINT) AS drift2
FROM d ORDER BY label"""


QUERIES85 = {
    "sales_cube": q_sales_cube,
    "emb_centroid_drift": q_emb_centroid_drift,
}
