"""Driver-contract queries, wave 207 — Shapley-value conversion attribution
over exposure coalitions (exact 2⁴ enumeration) and a gravity-model OLS fit
over the nation→nation trade-flow matrix (3-parameter normal equations via
Cramer's rule). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES207: dict[str, str] = {}

_SH_CHANNELS = ["click", "error", "signup", "view"]  # bit i = 2^i


# ---------------------------------------------------------------------------
# events_shapley_attribution — exact Shapley over exposure coalitions
# ---------------------------------------------------------------------------


def q_events_shapley_attribution(sf_dir: str):
    """Shapley attribution (Shapley 1953 applied à la Zhao et al. 2018):
    per user, the exposure set = distinct non-purchase channels; v(S) =
    conversion rate (has a purchase event) among users with EXACTLY set S
    (0 when unpopulated); φ_i = Σ_{S∌i} |S|!(k−|S|−1)!/k! (v(S∪i)−v(S))
    over the 2⁴ coalitions. Output per channel: n_exposed, phi_micro.

    Scale shape: per-batch (user, mask, conv) partials → ONE user-bucket
    exchange → per-bucket (mask, users, conv) counts; the 16-coalition
    Shapley enumeration runs on the driver."""
    path = f"{sf_dir}/events.parquet"
    bit = {c: 1 << i for i, c in enumerate(_SH_CHANNELS)}

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["user_id", "event_type"]).to_pandas()
        df["m"] = df["event_type"].map(bit).fillna(0).astype(np.int64)
        df["conv"] = (df["event_type"] == "purchase").astype(np.int64)
        g = df.groupby("user_id", sort=False).agg(
            mask=("m", lambda s: int(np.bitwise_or.reduce(s.to_numpy()))),
            conv=("conv", "max"),
        ).reset_index()
        g["_b"] = (g["user_id"].to_numpy(np.int64) % 64).astype(np.int32)
        return g.astype({"mask": np.int64, "conv": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id").agg(
            mask=("mask", lambda s: int(np.bitwise_or.reduce(s.to_numpy()))),
            conv=("conv", "max"),
        )
        out = pd.DataFrame({"mask": u["mask"].to_numpy(np.int64), "n": 1,
                            "c": u["conv"].to_numpy(np.int64)})
        return out.groupby("mask", as_index=False).sum().astype(np.int64)

    part = (
        ray.data.read_parquet(path, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["channel", "n_exposed", "phi_micro"]
    if part.empty:
        return pd.DataFrame(
            {"channel": pd.Series([], dtype=object),
             "n_exposed": pd.Series([], dtype=np.int64),
             "phi_micro": pd.Series([], dtype=np.int64)}
        )
    agg = part.groupby("mask")[["n", "c"]].sum()
    v = {int(m): (row["c"] / row["n"] if row["n"] > 0 else 0.0)
         for m, row in agg.iterrows()}
    k = len(_SH_CHANNELS)
    rows = []
    for i, ch in enumerate(_SH_CHANNELS):
        others = [j for j in range(k) if j != i]
        phi = 0.0
        for r in range(k):
            for sub in itertools.combinations(others, r):
                s_mask = sum(1 << j for j in sub)
                w = (
                    math.factorial(r) * math.factorial(k - r - 1)
                    / math.factorial(k)
                )
                phi += w * (
                    v.get(s_mask | (1 << i), 0.0) - v.get(s_mask, 0.0)
                )
        n_exp = int(agg[(agg.index.to_numpy(np.int64) & (1 << i)) > 0]["n"].sum())
        rows.append(
            (ch, np.int64(n_exp),
             np.int64(np.floor(phi * 1_000_000.0 + 0.5)))
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {"n_exposed": np.int64, "phi_micro": np.int64}
    )


def _shapley_oracle() -> str:
    k = len(_SH_CHANNELS)
    case = " ".join(
        f"WHEN '{c}' THEN {1 << i}" for i, c in enumerate(_SH_CHANNELS)
    )
    per_channel = []
    for i, ch in enumerate(_SH_CHANNELS):
        others = [j for j in range(k) if j != i]
        terms = []
        for r in range(k):
            for sub in itertools.combinations(others, r):
                s_mask = sum(1 << j for j in sub)
                w = (
                    math.factorial(r) * math.factorial(k - r - 1)
                    / math.factorial(k)
                )
                terms.append(
                    f"{w!r} * (coalesce((SELECT v FROM vt WHERE mask = "
                    f"{s_mask | (1 << i)}), 0.0) - coalesce((SELECT v FROM vt "
                    f"WHERE mask = {s_mask}), 0.0))"
                )
        phi = " + ".join(terms)
        per_channel.append(f"""
SELECT '{ch}' AS channel,
       CAST(coalesce((SELECT sum(n) FROM vt WHERE mask & {1 << i} > 0), 0)
            AS BIGINT) AS n_exposed,
       CAST(floor(({phi}) * 1000000.0 + 0.5) AS BIGINT) AS phi_micro""")
    union = " UNION ALL ".join(per_channel)
    return f"""
WITH u AS (
  SELECT user_id,
         CAST(sum(DISTINCT CASE event_type {case} ELSE 0 END) AS BIGINT)
           AS mask,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
vt AS MATERIALIZED (
  SELECT mask, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conv) AS DOUBLE) / count(*) AS v
  FROM u GROUP BY 1
)
SELECT * FROM ({union}) ORDER BY channel"""


ORACLES207["events_shapley_attribution"] = _shapley_oracle()


# ---------------------------------------------------------------------------
# nation_gravity_fit — gravity model over the trade-flow matrix
# ---------------------------------------------------------------------------


def q_nation_gravity_fit(sf_dir: str):
    """Gravity model of trade (Tinbergen 1962): over nation-pair flows
    f_ij = Σ revenue (customer nation i → supplier nation j), fit
    ln f = b0 + b1·ln(rowmass_i) + b2·ln(colmass_j) by OLS (3×3 normal
    equations via Cramer's rule). One row: n_pairs, b0_micro, b1_micro,
    b2_micro, r2_micro.

    Scale shape: customer/supplier nation maps broadcast (dimension
    tables) into ONE (ci, sj, Σrev) combiner over lineitem ⋈ orders;
    the bounded |nations|² system solves on the driver."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = np.asarray(cust["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
    cn = np.asarray(cust["c_nationkey"].to_numpy(zero_copy_only=False), np.int64)
    co = np.argsort(ck)
    ck, cn = ck[co], cn[co]
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = np.asarray(supp["s_suppkey"].to_numpy(zero_copy_only=False), np.int64)
    sn = np.asarray(supp["s_nationkey"].to_numpy(zero_copy_only=False), np.int64)
    so = np.argsort(sk)
    sk, sn = sk[so], sn[so]
    ords = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    ok = np.asarray(ords["o_orderkey"].to_numpy(zero_copy_only=False), np.int64)
    oc = np.asarray(ords["o_custkey"].to_numpy(zero_copy_only=False), np.int64)
    oo = np.argsort(ok)
    ok, oc = ok[oo], oc[oo]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        rev = df["l_extendedprice"].to_numpy(np.float64) * (
            1.0 - df["l_discount"].to_numpy(np.float64)
        )
        ci = cn[np.searchsorted(ck, oc[np.searchsorted(ok, df["l_orderkey"].to_numpy(np.int64))])]
        sj = sn[np.searchsorted(sk, df["l_suppkey"].to_numpy(np.int64))]
        out = pd.DataFrame({"ci": ci, "sj": sj, "f": rev})
        return out.groupby(["ci", "sj"], sort=False, as_index=False).sum()

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_pairs", "b0_micro", "b1_micro", "b2_micro", "r2_micro"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    fm = part.groupby(["ci", "sj"])["f"].sum()
    row_mass = fm.groupby(level=0).sum()
    col_mass = fm.groupby(level=1).sum()
    f = fm.to_numpy(np.float64)
    ci = fm.index.get_level_values(0).to_numpy(np.int64)
    sj = fm.index.get_level_values(1).to_numpy(np.int64)
    keep = f > 0.0
    y = np.log(f[keep])
    x1 = np.log(row_mass.loc[ci[keep]].to_numpy(np.float64))
    x2 = np.log(col_mass.loc[sj[keep]].to_numpy(np.float64))
    n = float(len(y))
    s1, s2, sy = x1.sum(), x2.sum(), y.sum()
    s11, s22, s12 = (x1 * x1).sum(), (x2 * x2).sum(), (x1 * x2).sum()
    s1y, s2y, syy = (x1 * y).sum(), (x2 * y).sum(), (y * y).sum()
    # centered 2×2 system — well-conditioned, so ulp-level input noise
    # cannot move the micro-rounded coefficients across engines
    s11c = s11 - s1 * s1 / n
    s22c = s22 - s2 * s2 / n
    s12c = s12 - s1 * s2 / n
    s1yc = s1y - s1 * sy / n
    s2yc = s2y - s2 * sy / n
    syyc = syy - sy * sy / n
    det = s11c * s22c - s12c * s12c
    if det == 0.0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    b1 = (s1yc * s22c - s2yc * s12c) / det
    b2 = (s2yc * s11c - s1yc * s12c) / det
    b0 = sy / n - b1 * (s1 / n) - b2 * (s2 / n)
    sse = syyc - b1 * s1yc - b2 * s2yc
    r2 = 1.0 - sse / syyc if syyc > 0.0 else 0.0
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n_pairs": [np.int64(n)],
            "b0_micro": [micro(b0)],
            "b1_micro": [micro(b1)],
            "b2_micro": [micro(b2)],
            "r2_micro": [micro(r2)],
        }
    )


ORACLES207["nation_gravity_fit"] = """
WITH fl AS (
  SELECT c.c_nationkey AS ci, s.s_nationkey AS sj,
         sum(l_extendedprice * (1.0 - l_discount)) AS f
  FROM lineitem
  JOIN orders o ON l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
rm AS (SELECT ci, sum(f) AS m FROM fl GROUP BY 1),
cm AS (SELECT sj, sum(f) AS m FROM fl GROUP BY 1),
pts AS (
  SELECT ln(fl.f) AS y, ln(rm.m) AS x1, ln(cm.m) AS x2
  FROM fl JOIN rm ON fl.ci = rm.ci JOIN cm ON fl.sj = cm.sj
  WHERE fl.f > 0.0
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
         sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
         sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
  FROM pts
),
c AS (
  SELECT n, s1, s2, sy,
         s11 - s1 * s1 / n AS s11c,
         s22 - s2 * s2 / n AS s22c,
         s12 - s1 * s2 / n AS s12c,
         s1y - s1 * sy / n AS s1yc,
         s2y - s2 * sy / n AS s2yc,
         syy - sy * sy / n AS syyc
  FROM s
),
b AS (
  SELECT n, s1, s2, sy, s1yc, s2yc, syyc,
         (s1yc * s22c - s2yc * s12c) / (s11c * s22c - s12c * s12c) AS b1,
         (s2yc * s11c - s1yc * s12c) / (s11c * s22c - s12c * s12c) AS b2
  FROM c WHERE s11c * s22c - s12c * s12c <> 0.0
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(floor((sy / n - b1 * (s1 / n) - b2 * (s2 / n))
                  * 1000000.0 + 0.5) AS BIGINT) AS b0_micro,
       CAST(floor(b1 * 1000000.0 + 0.5) AS BIGINT) AS b1_micro,
       CAST(floor(b2 * 1000000.0 + 0.5) AS BIGINT) AS b2_micro,
       CAST(floor((CASE WHEN syyc > 0.0
                        THEN 1.0 - (syyc - b1 * s1yc - b2 * s2yc) / syyc
                        ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT)
         AS r2_micro
FROM b"""


QUERIES207 = {
    "events_shapley_attribution": q_events_shapley_attribution,
    "nation_gravity_fit": q_nation_gravity_fit,
}
