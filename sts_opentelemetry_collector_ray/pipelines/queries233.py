"""Driver-contract queries, wave 233 — Ornstein-Uhlenbeck mean-reversion fit
of the daily count series (AR(1) mapping: θ = −ln ρ, half-life = ln2/θ) and
the Benford mantissa-arc test over line-item extended prices.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES233: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_ou_halflife — mean-reversion half-life per type
# ---------------------------------------------------------------------------


def q_events_ou_halflife(sf_dir: str):
    """Per event type: the Ornstein-Uhlenbeck fit via the exact AR(1)
    mapping (Δt = 1 day): ρ from the centered lag-1 regression y_t ~
    y_{t−1}, θ = −ln ρ, half-life = ln 2/θ days (types with ρ ∉ (0, 1)
    drop — no mean reversion to report). Output: event_type, n_obs,
    rho_micro, halflife_micro.

    Scale shape: bounded daily fold + scalar regression on the driver."""
    from .queries221 import _daily

    daily = _daily(sf_dir)
    cols = ["event_type", "n_obs", "rho_micro", "halflife_micro"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if daily.empty:
        return empty
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        y = sub["n"].to_numpy(np.float64)
        if len(y) < 5:
            continue
        a = y[1:]
        b = y[:-1]
        n = float(len(a))
        sxx_c = (b * b).sum() - b.sum() * b.sum() / n
        sxy_c = (b * a).sum() - b.sum() * a.sum() / n
        if sxx_c <= 0.0:
            continue
        rho = sxy_c / sxx_c
        if rho <= 0.0 or rho >= 1.0:
            continue
        theta = -np.log(rho)
        hl = np.log(2.0) / theta
        micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
        rows.append((et, np.int64(n), micro(rho), micro(hl)))
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype({c: np.int64 for c in cols[1:]})


ORACLES233["events_ou_halflife"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, y AS a, lag(y) OVER w AS b
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
pts AS (SELECT event_type, a, b FROM lagged WHERE b IS NOT NULL),
m AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(b) AS sb, sum(a) AS sa, sum(b * b) AS sbb, sum(b * a) AS sba
  FROM pts GROUP BY 1 HAVING count(*) >= 4
),
f AS (
  SELECT event_type, n,
         (sba - sb * sa / n) / (sbb - sb * sb / n) AS rho
  FROM m WHERE sbb - sb * sb / n > 0.0
)
SELECT event_type, CAST(n AS BIGINT) AS n_obs,
       CAST(floor(rho * 1000000.0 + 0.5) AS BIGINT) AS rho_micro,
       CAST(floor(ln(2.0) / (-ln(rho)) * 1000000.0 + 0.5) AS BIGINT)
         AS halflife_micro
FROM f WHERE rho > 0.0 AND rho < 1.0 ORDER BY event_type"""


# ---------------------------------------------------------------------------
# lineitem_mantissa_arc — Benford mantissa-arc test
# ---------------------------------------------------------------------------


def q_lineitem_mantissa_arc(sf_dir: str):
    """Mantissa-arc test (Alexander 2009): map each extended price to the
    unit circle at angle 2π·frac(log₁₀ x); under Benford the mean vector
    vanishes. One row: n, center_norm_micro (‖(Σcos, Σsin)‖/n), arc_stat
    (n·L², micro) and benford_reject (arc > 5.99, the χ²₂ 5% bound).

    Scale shape: one (n, Σcos, Σsin) combiner — no shuffle."""
    path = f"{sf_dir}/lineitem.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        v = np.asarray(
            t["l_extendedprice"].to_numpy(zero_copy_only=False), np.float64
        )
        v = v[v > 0.0]
        lg = np.log10(v)
        frac = lg - np.floor(lg)
        ang = 2.0 * np.pi * frac
        return pd.DataFrame(
            {"n": [np.int64(len(v))], "c": [np.cos(ang).sum()],
             "s": [np.sin(ang).sum()]}
        )

    part = (
        ray.data.read_parquet(path, columns=["l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n", "center_norm_micro", "arc_stat_micro", "benford_reject"]
    if part.empty or part["n"].sum() == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = float(part["n"].sum())
    c = float(part["c"].sum())
    s = float(part["s"].sum())
    el = np.sqrt(c * c + s * s) / n
    arc = n * el * el
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n": [np.int64(n)],
            "center_norm_micro": [micro(el)],
            "arc_stat_micro": [micro(arc)],
            "benford_reject": [np.int64(1 if arc > 5.99 else 0)],
        }
    )


ORACLES233["lineitem_mantissa_arc"] = """
WITH t AS (
  SELECT 2.0 * pi() * (log10(l_extendedprice)
                       - floor(log10(l_extendedprice))) AS ang
  FROM lineitem WHERE l_extendedprice > 0.0
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(cos(ang)) AS c, sum(sin(ang)) AS s
  FROM t HAVING count(*) > 0
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(floor(sqrt(c * c + s * s) / n * 1000000.0 + 0.5) AS BIGINT)
         AS center_norm_micro,
       CAST(floor(n * (sqrt(c * c + s * s) / n) * (sqrt(c * c + s * s) / n)
                  * 1000000.0 + 0.5) AS BIGINT) AS arc_stat_micro,
       CAST(CASE WHEN n * (sqrt(c * c + s * s) / n) * (sqrt(c * c + s * s) / n)
                      > 5.99 THEN 1 ELSE 0 END AS BIGINT) AS benford_reject
FROM g"""


QUERIES233 = {
    "events_ou_halflife": q_events_ou_halflife,
    "lineitem_mantissa_arc": q_lineitem_mantissa_arc,
}
