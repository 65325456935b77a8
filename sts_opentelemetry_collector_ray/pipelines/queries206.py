"""Driver-contract queries, wave 206 — James-Stein shrinkage of per-brand
mean quantities (empirical Bayes, equal-variance approximation) and the
energy-distance two-sample statistic between weekend and weekday value
distributions (100-bin histogram approximation).
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES206: dict[str, str] = {}

_ED_BINS = 100


# ---------------------------------------------------------------------------
# lineitem_james_stein — shrink per-brand mean quantities
# ---------------------------------------------------------------------------


def q_lineitem_james_stein(sf_dir: str):
    """James-Stein estimator (equal-variance approximation) for per-brand
    mean quantities: with k brands, pooled within-variance s², mean
    sampling variance v̄ = (1/k)Σ s²/nᵢ and S = Σ(mᵢ−m̄)², the common
    shrink factor is B = max(0, 1 − (k−3)·v̄/S); m̂ᵢ = m̄ + B(mᵢ−m̄)
    (James & Stein 1961). Output per brand: n, raw_mean_micro,
    js_mean_micro, shrink_micro (constant).

    Scale shape: the part→brand map broadcasts (dimension table) into one
    (brand, n, Σq, Σq²) combiner; driver folds |brands|×blocks rows — no
    shuffle."""
    import pyarrow.parquet as pq

    part_t = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    pk = np.asarray(part_t["p_partkey"].to_numpy(zero_copy_only=False), np.int64)
    pb = np.asarray(part_t["p_brand"].to_numpy(zero_copy_only=False), object)
    order = np.argsort(pk)
    pk, pb = pk[order], pb[order]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["l_partkey", "l_quantity"]).to_pandas()
        brand = pb[np.searchsorted(pk, df["l_partkey"].to_numpy(np.int64))]
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        out = pd.DataFrame({"brand": brand, "n": 1, "s": q, "s2": q * q})
        return out.groupby("brand", sort=False, as_index=False).sum().astype(
            {"n": np.int64, "s": np.int64, "s2": np.int64}
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_quantity"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["p_brand", "n", "raw_mean_micro", "js_mean_micro", "shrink_micro"]
    if agg.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype=(object if c == "p_brand" else np.int64))
             for c in cols}
        )
    g = agg.groupby("brand").sum().sort_index()
    k = len(g)
    n_i = g["n"].to_numpy(np.float64)
    m_i = g["s"].to_numpy(np.float64) / n_i
    # pooled within variance: (Σ s2 − Σ s²/n) / (N − k)
    sse_w = float(g["s2"].sum()) - float(
        (g["s"].to_numpy(np.float64) ** 2 / n_i).sum()
    )
    n_tot = float(n_i.sum())
    s2 = sse_w / (n_tot - k)
    m_bar = float(m_i.sum()) / k
    ss = float(((m_i - m_bar) ** 2).sum())
    v_bar = float((s2 / n_i).sum()) / k
    b = max(0.0, 1.0 - (k - 3.0) * v_bar / ss) if ss > 0.0 and k > 3 else 0.0
    js = m_bar + b * (m_i - m_bar)
    micro = lambda a: np.floor(np.asarray(a) * 1_000_000.0 + 0.5).astype(np.int64)  # noqa: E731
    return pd.DataFrame(
        {
            "p_brand": np.asarray(g.index.to_numpy(object)),
            "n": g["n"].to_numpy(np.int64),
            "raw_mean_micro": micro(m_i),
            "js_mean_micro": micro(js),
            "shrink_micro": np.full(k, micro(b), np.int64),
        }
    )


ORACLES206["lineitem_james_stein"] = """
WITH c AS (
  SELECT p.p_brand AS brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS s2
  FROM lineitem JOIN part p ON l_partkey = p.p_partkey
  GROUP BY 1
),
st AS (
  SELECT count(*) AS k,
         (sum(CAST(s2 AS DOUBLE))
          - sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n))
           / (sum(CAST(n AS DOUBLE)) - count(*)) AS s2p,
         sum(CAST(s AS DOUBLE) / n) / count(*) AS m_bar
  FROM c
),
m AS (
  SELECT c.brand, c.n, CAST(c.s AS DOUBLE) / c.n AS mi, st.k, st.s2p, st.m_bar
  FROM c, st
),
ss AS (
  SELECT sum((mi - m_bar) * (mi - m_bar)) AS ss,
         sum(s2p / n) / any_value(k) AS v_bar,
         any_value(k) AS k, any_value(m_bar) AS m_bar
  FROM m
),
b AS (
  SELECT CASE WHEN ss > 0.0 AND k > 3
              THEN greatest(0.0, 1.0 - (k - 3.0) * v_bar / ss)
              ELSE 0.0 END AS b,
         m_bar
  FROM ss
)
SELECT m.brand AS p_brand, m.n,
       CAST(floor(m.mi * 1000000.0 + 0.5) AS BIGINT) AS raw_mean_micro,
       CAST(floor((b.m_bar + b.b * (m.mi - b.m_bar)) * 1000000.0 + 0.5)
            AS BIGINT) AS js_mean_micro,
       CAST(floor(b.b * 1000000.0 + 0.5) AS BIGINT) AS shrink_micro
FROM m, b ORDER BY p_brand"""


# ---------------------------------------------------------------------------
# events_energy_distance — binned two-sample energy statistic
# ---------------------------------------------------------------------------


def q_events_energy_distance(sf_dir: str):
    """Per event type: the energy distance (Székely & Rizzo 2004) between
    weekend and weekday value distributions, approximated on a 100-bin
    histogram over the type's [min, max] value range: E = 2E|X−Y| −
    E|X−X'| − E|Y−Y'| with |·| evaluated between bin indices × bin width.
    Output: event_type, n_x (weekend), n_y, e_stat_micro.

    Scale shape: pass 1 folds per-type (min, max); pass 2 folds a bounded
    (type, arm, bin) histogram combiner; the 100² double sums run on the
    driver — no shuffle."""
    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_type", "ts", "value"])

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "value"]).to_pandas()
        g = df.groupby("event_type", sort=False)["value"].agg(["min", "max"])
        return g.reset_index()

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    cols = ["event_type", "n_x", "n_y", "e_stat_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if mm.empty:
        return empty
    rng = mm.groupby("event_type").agg(mn=("min", "min"), mx=("max", "max"))
    rng = rng[rng["mx"] > rng["mn"]]
    if rng.empty:
        return empty
    tkeys = np.asarray(sorted(rng.index.to_numpy(object)))
    mn = rng.loc[tkeys, "mn"].to_numpy(np.float64)
    mx = rng.loc[tkeys, "mx"].to_numpy(np.float64)

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts", "value"]).to_pandas()
        et = df["event_type"].to_numpy(object)
        keep = np.isin(et, tkeys)
        if not keep.any():
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "arm": pd.Series([], dtype=np.int64),
                 "bin": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        df = df[keep]
        et = et[keep]
        idx = np.searchsorted(tkeys, et)
        v = df["value"].to_numpy(np.float64)
        b = np.minimum(
            np.floor((v - mn[idx]) / (mx[idx] - mn[idx]) * _ED_BINS),
            float(_ED_BINS - 1),
        ).astype(np.int64)
        arm = (df["ts"].dt.dayofweek >= 5).to_numpy().astype(np.int64)
        out = pd.DataFrame({"event_type": et, "arm": arm, "bin": b, "n": 1})
        return out.groupby(
            ["event_type", "arm", "bin"], sort=False, as_index=False
        ).sum().astype({"n": np.int64})

    hp = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    if hp.empty:
        return empty
    hist = hp.groupby(["event_type", "arm", "bin"])["n"].sum()
    dist = np.abs(
        np.arange(_ED_BINS)[:, None] - np.arange(_ED_BINS)[None, :]
    ).astype(np.float64)
    rows = []
    for i, et in enumerate(tkeys):
        hx = np.zeros(_ED_BINS, np.float64)
        hy = np.zeros(_ED_BINS, np.float64)
        for arm, h in ((1, hx), (0, hy)):
            try:
                sub = hist.loc[(et, arm)]
            except KeyError:
                continue
            h[sub.index.to_numpy(np.int64)] = sub.to_numpy(np.int64)
        nx, ny = float(hx.sum()), float(hy.sum())
        if nx == 0.0 or ny == 0.0:
            continue
        w = (mx[i] - mn[i]) / _ED_BINS
        p, q = hx / nx, hy / ny
        exy = float(p @ dist @ q)
        exx = float(p @ dist @ p)
        eyy = float(q @ dist @ q)
        e = w * (2.0 * exy - exx - eyy)
        rows.append(
            (et, np.int64(nx), np.int64(ny),
             np.int64(np.floor(e * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES206["events_energy_distance"] = f"""
WITH rng AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx
  FROM events GROUP BY 1 HAVING max(value) > min(value)
),
b AS (
  SELECT e.event_type,
         CASE WHEN dayofweek(e.ts) IN (0, 6) THEN 1 ELSE 0 END AS arm,
         least(CAST(floor((e.value - rng.mn) / (rng.mx - rng.mn)
                          * {_ED_BINS}) AS BIGINT), {_ED_BINS - 1}) AS bin
  FROM events e JOIN rng ON e.event_type = rng.event_type
),
h AS (
  SELECT event_type, arm, bin, CAST(count(*) AS DOUBLE) AS n
  FROM b GROUP BY 1, 2, 3
),
tot AS (
  SELECT event_type, arm, sum(n) AS nt FROM h GROUP BY 1, 2
),
p AS (
  SELECT h.event_type, h.arm, h.bin, h.n / tot.nt AS p
  FROM h JOIN tot ON h.event_type = tot.event_type AND h.arm = tot.arm
),
e AS (
  SELECT a.event_type,
         sum(CASE WHEN a.arm = 1 AND c.arm = 0
                  THEN 2.0 * a.p * c.p * abs(a.bin - c.bin) ELSE 0.0 END)
         - sum(CASE WHEN a.arm = 1 AND c.arm = 1
                    THEN a.p * c.p * abs(a.bin - c.bin) ELSE 0.0 END)
         - sum(CASE WHEN a.arm = 0 AND c.arm = 0
                    THEN a.p * c.p * abs(a.bin - c.bin) ELSE 0.0 END) AS es
  FROM p a JOIN p c ON a.event_type = c.event_type
  GROUP BY 1
),
nn AS (
  SELECT event_type,
         CAST(max(CASE WHEN arm = 1 THEN nt END) AS BIGINT) AS n_x,
         CAST(max(CASE WHEN arm = 0 THEN nt END) AS BIGINT) AS n_y
  FROM tot GROUP BY 1
)
SELECT e.event_type, nn.n_x, nn.n_y,
       CAST(floor((rng.mx - rng.mn) / {_ED_BINS} * e.es * 1000000.0 + 0.5)
            AS BIGINT) AS e_stat_micro
FROM e
JOIN nn ON e.event_type = nn.event_type
JOIN rng ON e.event_type = rng.event_type
WHERE nn.n_x IS NOT NULL AND nn.n_y IS NOT NULL
ORDER BY e.event_type"""


QUERIES206 = {
    "lineitem_james_stein": q_lineitem_james_stein,
    "events_energy_distance": q_events_energy_distance,
}
