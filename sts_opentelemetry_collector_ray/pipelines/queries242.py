"""Driver-contract queries, wave 242 — Cochran-Armitage trend test
(Cochran 1954, Armitage 1955) of return rate across ordinal discount
bands, and an out-of-sample Brier score with the Murphy (1973)
decomposition for the band-rate forecaster under a deterministic
even/odd-orderkey train/test split.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES242: dict[str, str] = {}

_CA_CRIT = 1.959963984540054  # N(0,1) two-sided 5%


def _band_partials(sf_dir: str, with_split: bool) -> pd.DataFrame:
    cols = ["l_discount", "l_returnflag"] + (
        ["l_orderkey"] if with_split else []
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["band"] = np.floor(
            df["l_discount"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        df["pos"] = (df["l_returnflag"] == "R").astype(np.int64)
        keys = ["band"]
        if with_split:
            df["train"] = (
                df["l_orderkey"].to_numpy(np.int64) % 2 == 0
            ).astype(np.int64)
            keys.append("train")
        g = df.groupby(keys, sort=False, as_index=False).agg(
            n=("pos", "size"), r=("pos", "sum")
        )
        return g.astype({"n": np.int64, "r": np.int64})

    part = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if part.empty:
        return part
    keys = ["band", "train"] if with_split else ["band"]
    return part.groupby(keys, as_index=False)[["n", "r"]].sum()


# ---------------------------------------------------------------------------
# lineitem_cochran_armitage — trend in return rate across discount bands
# ---------------------------------------------------------------------------


def q_lineitem_cochran_armitage(sf_dir: str):
    """Cochran-Armitage linear-trend test of P(returnflag = 'R') across
    ordinal discount bands (score = the band's cents value): with
    p̄ = R/N, T = Σ r_i s_i − p̄·Σ n_i s_i and Var = p̄(1−p̄)·(Σ n_i s_i²
    − (Σ n_i s_i)²/N), z = T/√Var; rejected two-sided at 1.96. One row:
    n, n_bands, z_micro, reject_5pct.

    Scale shape: per-batch (band, n, r) combiner; the trend statistic
    folds a |bands|-row table."""
    g = _band_partials(sf_dir, with_split=False)
    cols = ["n", "n_bands", "z_micro", "reject_5pct"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if g.empty or len(g) < 2:
        return empty
    s = g["band"].to_numpy(np.float64)
    n_i = g["n"].to_numpy(np.float64)
    r_i = g["r"].to_numpy(np.float64)
    n = float(n_i.sum())
    pbar = float(r_i.sum()) / n
    t = float((r_i * s).sum()) - pbar * float((n_i * s).sum())
    var = pbar * (1.0 - pbar) * (
        float((n_i * s * s).sum()) - float((n_i * s).sum()) ** 2 / n
    )
    if var <= 0.0:
        return empty
    z = t / np.sqrt(var)
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "n_bands": [np.int64(len(g))],
            "z_micro": [np.int64(np.floor(z * 1_000_000.0 + 0.5))],
            "reject_5pct": [np.int64(1 if abs(z) > _CA_CRIT else 0)],
        }
    )


ORACLES242["lineitem_cochran_armitage"] = f"""
WITH b AS (
  SELECT CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS band,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
           AS r
  FROM lineitem GROUP BY 1
),
agg AS (
  SELECT sum(n) AS n, CAST(count(*) AS BIGINT) AS k, sum(r) AS rr,
         sum(r * band) AS rs, sum(n * band) AS ns,
         sum(n * band * band) AS nss
  FROM b
),
z AS (
  SELECT n, k,
         (rs - rr / n * ns)
           / sqrt(rr / n * (1.0 - rr / n) * (nss - ns * ns / n)) AS z
  FROM agg
  WHERE k >= 2 AND rr / n * (1.0 - rr / n) * (nss - ns * ns / n) > 0.0
)
SELECT CAST(n AS BIGINT) AS n, k AS n_bands,
       CAST(floor(z * 1000000.0 + 0.5) AS BIGINT) AS z_micro,
       CAST(CASE WHEN abs(z) > {_CA_CRIT} THEN 1 ELSE 0 END AS BIGINT)
         AS reject_5pct
FROM z"""


# ---------------------------------------------------------------------------
# lineitem_brier_calibration — out-of-sample Brier + Murphy decomposition
# ---------------------------------------------------------------------------


def q_lineitem_brier_calibration(sf_dir: str):
    """Out-of-sample calibration of the band-rate forecaster: train on
    EVEN orderkeys (per-discount-band return rate, global-rate fallback),
    score ODD orderkeys. Per band: the forecast f, the test outcome rate
    o, and the Murphy decomposition constants — BS = unc − res + rel with
    rel = Σ n_b(f_b−o_b)²/N, res = Σ n_b(o_b−ō)²/N, unc = ō(1−ō).
    Output per band: band, n_test, f_micro, o_micro, brier_micro,
    rel_micro, res_micro, unc_micro.

    Scale shape: one (band, split) combiner pass; everything downstream
    folds a |bands|×2 table."""
    g = _band_partials(sf_dir, with_split=True)
    cols = ["band", "n_test", "f_micro", "o_micro", "brier_micro",
            "rel_micro", "res_micro", "unc_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if g.empty:
        return empty
    tr = g[g["train"] == 1].set_index("band")
    te = g[g["train"] == 0].set_index("band").sort_index()
    if te.empty or tr.empty:
        return empty
    glob = float(tr["r"].sum()) / float(tr["n"].sum())
    f = (tr["r"] / tr["n"]).reindex(te.index)
    f = f.fillna(glob).to_numpy(np.float64)
    n_b = te["n"].to_numpy(np.float64)
    o_b = te["r"].to_numpy(np.float64) / n_b
    n = float(n_b.sum())
    obar = float(te["r"].sum()) / n
    rel = float((n_b * (f - o_b) ** 2).sum()) / n
    res = float((n_b * (o_b - obar) ** 2).sum()) / n
    unc = obar * (1.0 - obar)
    bs = unc - res + rel
    micro = lambda x: np.floor(x * 1_000_000.0 + 0.5).astype(np.int64)  # noqa: E731
    return pd.DataFrame(
        {
            "band": te.index.to_numpy(np.int64),
            "n_test": te["n"].to_numpy(np.int64),
            "f_micro": micro(f),
            "o_micro": micro(o_b),
            "brier_micro": np.full(len(te), micro(np.float64(bs))),
            "rel_micro": np.full(len(te), micro(np.float64(rel))),
            "res_micro": np.full(len(te), micro(np.float64(res))),
            "unc_micro": np.full(len(te), micro(np.float64(unc))),
        }
    )


ORACLES242["lineitem_brier_calibration"] = """
WITH b AS (
  SELECT CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS band,
         CAST(l_orderkey % 2 = 0 AS INT) AS train,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
           AS r
  FROM lineitem GROUP BY 1, 2
),
tr AS (SELECT band, r / n AS f FROM b WHERE train = 1),
gl AS (SELECT sum(r) / sum(n) AS g FROM b WHERE train = 1),
te AS (SELECT band, n, r, r / n AS o FROM b WHERE train = 0),
tot AS (SELECT sum(n) AS n, sum(r) / sum(n) AS obar FROM te),
j AS (
  SELECT te.band, te.n, te.o, coalesce(tr.f, gl.g) AS f
  FROM te LEFT JOIN tr ON te.band = tr.band, gl
),
dec AS (
  SELECT sum(j.n * (j.f - j.o) * (j.f - j.o)) / tot.n AS rel,
         sum(j.n * (j.o - tot.obar) * (j.o - tot.obar)) / tot.n AS res,
         tot.obar * (1.0 - tot.obar) AS unc
  FROM j, tot GROUP BY tot.n, tot.obar
)
SELECT j.band, CAST(j.n AS BIGINT) AS n_test,
       CAST(floor(j.f * 1000000.0 + 0.5) AS BIGINT) AS f_micro,
       CAST(floor(j.o * 1000000.0 + 0.5) AS BIGINT) AS o_micro,
       CAST(floor((dec.unc - dec.res + dec.rel) * 1000000.0 + 0.5) AS BIGINT)
         AS brier_micro,
       CAST(floor(dec.rel * 1000000.0 + 0.5) AS BIGINT) AS rel_micro,
       CAST(floor(dec.res * 1000000.0 + 0.5) AS BIGINT) AS res_micro,
       CAST(floor(dec.unc * 1000000.0 + 0.5) AS BIGINT) AS unc_micro
FROM j, dec ORDER BY j.band"""


QUERIES242 = {
    "lineitem_cochran_armitage": q_lineitem_cochran_armitage,
    "lineitem_brier_calibration": q_lineitem_brier_calibration,
}
