"""Driver-contract queries, wave 212 — empirical-Bayes shrinkage of per-user
purchase rates (method-of-moments Beta prior, posterior top-k) and Otsu's
between-class-variance threshold over per-type value histograms.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES212: dict[str, str] = {}

_OTSU_BINS = 100


# ---------------------------------------------------------------------------
# users_eb_rates — Beta-prior shrinkage of per-user purchase rates
# ---------------------------------------------------------------------------


def q_users_eb_rates(sf_dir: str):
    """Empirical-Bayes purchase-rate shrinkage (Robbins 1956 style): per
    user the rate p = purchases/events; a Beta prior fits by method of
    moments over users (t = m(1−m)/v − 1, α = mt, β = (1−m)t; α = β = 1
    when v is degenerate); posterior mean = (k+α)/(n+α+β). Top-10 users by
    posterior (ties → user ASC) with the prior as constant columns.
    Output: user_id, k, n, post_micro, alpha_micro, beta_micro.

    Scale shape: per-user counts derive inside ONE user-bucket exchange;
    moment partials and per-bucket local top-10 fold on the driver."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["user_id", "event_type"]).to_pandas()
        df["k"] = (df["event_type"] == "purchase").astype(np.int64)
        df["n"] = 1
        g = df.groupby("user_id", sort=False, as_index=False)[["k", "n"]].sum()
        g["_b"] = (g["user_id"].to_numpy(np.int64) % 64).astype(np.int32)
        return g.astype({"k": np.int64, "n": np.int64})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False)[["k", "n"]].sum().astype(
            np.int64
        )

    users = (
        ray.data.read_parquet(path, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cols = ["user_id", "k", "n", "post_micro", "alpha_micro", "beta_micro"]
    if users.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    p = users["k"].to_numpy(np.float64) / users["n"].to_numpy(np.float64)
    nu = float(len(p))
    m = p.sum() / nu
    v = (p * p).sum() / nu - m * m
    if v > 0.0 and v < m * (1.0 - m):
        t = m * (1.0 - m) / v - 1.0
        alpha = m * t
        beta = (1.0 - m) * t
    else:
        alpha = beta = 1.0
    post = (users["k"].to_numpy(np.float64) + alpha) / (
        users["n"].to_numpy(np.float64) + alpha + beta
    )
    users = users.assign(
        post_micro=np.floor(post * 1_000_000.0 + 0.5).astype(np.int64)
    )
    out = users.sort_values(
        ["post_micro", "user_id"], ascending=[False, True], kind="mergesort"
    ).head(10)
    micro = lambda x: np.int64(np.floor(x * 1_000_000.0 + 0.5))  # noqa: E731
    out = out.assign(
        alpha_micro=np.full(len(out), micro(alpha), np.int64),
        beta_micro=np.full(len(out), micro(beta), np.int64),
    )
    return out[cols].reset_index(drop=True).astype(np.int64)


ORACLES212["users_eb_rates"] = """
WITH u AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
mo AS (
  SELECT count(*) AS nu,
         sum(CAST(k AS DOUBLE) / n) / count(*) AS m,
         sum((CAST(k AS DOUBLE) / n) * (CAST(k AS DOUBLE) / n)) / count(*)
           - (sum(CAST(k AS DOUBLE) / n) / count(*))
           * (sum(CAST(k AS DOUBLE) / n) / count(*)) AS v
  FROM u
),
pr AS (
  SELECT CASE WHEN v > 0.0 AND v < m * (1.0 - m)
              THEN m * (m * (1.0 - m) / v - 1.0) ELSE 1.0 END AS alpha,
         CASE WHEN v > 0.0 AND v < m * (1.0 - m)
              THEN (1.0 - m) * (m * (1.0 - m) / v - 1.0) ELSE 1.0 END AS beta
  FROM mo
),
post AS (
  SELECT u.user_id, u.k, u.n,
         CAST(floor((u.k + pr.alpha) / (u.n + pr.alpha + pr.beta)
                    * 1000000.0 + 0.5) AS BIGINT) AS post_micro,
         CAST(floor(pr.alpha * 1000000.0 + 0.5) AS BIGINT) AS alpha_micro,
         CAST(floor(pr.beta * 1000000.0 + 0.5) AS BIGINT) AS beta_micro
  FROM u, pr
)
SELECT CAST(user_id AS BIGINT) AS user_id, k, n, post_micro,
       alpha_micro, beta_micro
FROM post ORDER BY post_micro DESC, user_id ASC LIMIT 10"""


# ---------------------------------------------------------------------------
# events_otsu_threshold — between-class-variance optimal threshold
# ---------------------------------------------------------------------------


def q_events_otsu_threshold(sf_dir: str):
    """Per event type: Otsu's threshold (Otsu 1979) over the 100-bin value
    histogram on [min, max] — the bin boundary t maximizing
    w₀w₁(μ₀−μ₁)² in bin-index units (ties → smallest t). Output:
    event_type, t_bin, between_var_micro, frac_above_micro.

    Scale shape: pass 1 folds (min, max); pass 2 folds the bounded
    |types|×100 histogram; the 99-candidate scan runs on the driver."""
    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return df.groupby("event_type", sort=False)["value"].agg(
            ["min", "max"]
        ).reset_index()

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    cols = ["event_type", "t_bin", "between_var_micro", "frac_above_micro"]
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
        df = t.to_pandas()
        et = np.asarray(df["event_type"].to_numpy(object))
        keep = np.isin(et, tkeys)
        if not keep.any():
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "bin": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        et = et[keep]
        idx = np.searchsorted(tkeys, et)
        v = df["value"].to_numpy(np.float64)[keep]
        b = np.minimum(
            np.floor((v - mn[idx]) / (mx[idx] - mn[idx]) * _OTSU_BINS),
            float(_OTSU_BINS - 1),
        ).astype(np.int64)
        out = pd.DataFrame({"event_type": et, "bin": b, "n": 1})
        return out.groupby(["event_type", "bin"], sort=False, as_index=False).sum().astype(
            {"n": np.int64}
        )

    hp = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    if hp.empty:
        return empty
    hist = hp.groupby(["event_type", "bin"])["n"].sum()
    rows = []
    for et in tkeys:
        h = np.zeros(_OTSU_BINS, np.float64)
        sub = hist.loc[et]
        h[sub.index.to_numpy(np.int64)] = sub.to_numpy(np.int64)
        n = h.sum()
        p = h / n
        b = np.arange(_OTSU_BINS, dtype=np.float64)
        best_t, best_v = -1, -1.0
        for t in range(1, _OTSU_BINS):
            w0 = p[:t].sum()
            w1 = 1.0 - w0
            if w0 <= 0.0 or w1 <= 0.0:
                continue
            mu0 = (p[:t] * b[:t]).sum() / w0
            mu1 = (p[t:] * b[t:]).sum() / w1
            bv = w0 * w1 * (mu0 - mu1) * (mu0 - mu1)
            if bv > best_v:
                best_v, best_t = bv, t
        if best_t < 0:
            continue
        frac_above = p[best_t:].sum()
        rows.append(
            (et, np.int64(best_t),
             np.int64(np.floor(best_v * 1_000_000.0 + 0.5)),
             np.int64(np.floor(frac_above * 1_000_000.0 + 0.5)))
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES212["events_otsu_threshold"] = f"""
WITH rng AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx
  FROM events GROUP BY 1 HAVING max(value) > min(value)
),
b AS (
  SELECT e.event_type,
         least(CAST(floor((e.value - rng.mn) / (rng.mx - rng.mn)
                          * {_OTSU_BINS}) AS BIGINT), {_OTSU_BINS - 1}) AS bin
  FROM events e JOIN rng ON e.event_type = rng.event_type
),
h AS (
  SELECT event_type, bin, CAST(count(*) AS DOUBLE) AS n
  FROM b GROUP BY 1, 2
),
tot AS (SELECT event_type, sum(n) AS nt FROM h GROUP BY 1),
cand AS (SELECT CAST(u.range AS BIGINT) AS t FROM range(1, {_OTSU_BINS}) u),
sw AS (
  SELECT h.event_type, cand.t,
         sum(CASE WHEN h.bin < cand.t THEN h.n / tot.nt ELSE 0.0 END) AS w0,
         sum(CASE WHEN h.bin < cand.t THEN h.n / tot.nt * h.bin
                  ELSE 0.0 END) AS s0,
         sum(CASE WHEN h.bin >= cand.t THEN h.n / tot.nt * h.bin
                  ELSE 0.0 END) AS s1,
         sum(CASE WHEN h.bin >= cand.t THEN h.n / tot.nt ELSE 0.0 END) AS wa
  FROM h JOIN tot ON h.event_type = tot.event_type, cand
  GROUP BY 1, 2
),
bv AS (
  SELECT event_type, t, wa,
         w0 * (1.0 - w0) * (s0 / w0 - s1 / (1.0 - w0))
           * (s0 / w0 - s1 / (1.0 - w0)) AS v
  FROM sw WHERE w0 > 0.0 AND (1.0 - w0) > 0.0
),
best AS (
  SELECT event_type, t, v, wa,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v DESC, t ASC) AS r
  FROM bv
)
SELECT event_type, CAST(t AS BIGINT) AS t_bin,
       CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS between_var_micro,
       CAST(floor(wa * 1000000.0 + 0.5) AS BIGINT) AS frac_above_micro
FROM best WHERE r = 1 ORDER BY event_type"""


QUERIES212 = {
    "users_eb_rates": q_users_eb_rates,
    "events_otsu_threshold": q_events_otsu_threshold,
}
