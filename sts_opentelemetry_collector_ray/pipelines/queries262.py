"""Driver-contract queries, wave 262 — additive Holt–Winters triple
exponential smoothing (Winters 1960) with weekly seasonality over the daily
event series, and Mood's median test (Mood 1950) of `value` across event
types. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES262: dict[str, str] = {}

_DAY_US = 86_400_000_000
_HW_ALPHA = 0.2
_HW_BETA = 0.1
_HW_GAMMA = 0.3


# ---------------------------------------------------------------------------
# events_holt_winters — additive HW with weekly seasonality on daily counts
# ---------------------------------------------------------------------------


def q_events_holt_winters(sf_dir: str):
    """Additive Holt–Winters on the zero-filled daily count series with a
    7-slot season keyed by ABSOLUTE epoch-day mod 7: init over the first
    week (ℓ₀ = Σy/7 — an exact-int sum, order-safe; b₀ = 0; s_slot =
    y − ℓ₀), then for each later day ℓ' = α(y−s) + (1−α)(ℓ+b),
    b' = β(ℓ'−ℓ) + (1−β)b, s' = γ(y−ℓ') + (1−γ)s with α,β,γ = .2/.1/.3.
    Both sides run the IDENTICAL sequential fold (Python loop here; a
    `list_reduce` over 9-element DOUBLE state lists with dynamic slot
    indexing in SQL — verified bit-equal), so every float replays exactly.
    One row: n_days, level_micro, trend_micro, s_next_micro,
    forecast_micro (ℓ+b+s_next).

    Scale shape: one (day → count) combiner per batch; the bounded
    calendar grid folds on the driver."""

    def partial(t: pa.Table) -> pa.Table:
        days = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(days).groupby(days).size()
        return pa.table(
            {
                "dy": pa.array(h.index.to_numpy(np.int64)),
                "cnt": pa.array(h.to_numpy(np.int64)),
            }
        )

    days = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: calendar-day domain
        .groupby("dy")["cnt"]
        .sum()
    )
    cols = [
        "n_days", "level_micro", "trend_micro", "s_next_micro", "forecast_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    d0, d1 = int(days.index.min()), int(days.index.max())
    n = d1 - d0 + 1
    if n < 8:
        return empty
    y = np.zeros(n, np.int64)
    y[days.index.to_numpy(np.int64) - d0] = days.to_numpy(np.int64)
    # seasonal slots by ABSOLUTE epoch day mod 7; first week covers each once
    l = float(int(y[:7].sum())) / 7.0
    b = 0.0
    s = [0.0] * 7
    for i in range(7):
        s[(d0 + i) % 7] = float(y[i]) - l
    for t in range(7, n):
        slot = (d0 + t) % 7
        yv = float(y[t])
        lp = _HW_ALPHA * (yv - s[slot]) + (1.0 - _HW_ALPHA) * (l + b)
        bp = _HW_BETA * (lp - l) + (1.0 - _HW_BETA) * b
        sp = _HW_GAMMA * (yv - lp) + (1.0 - _HW_GAMMA) * s[slot]
        l, b = lp, bp
        s[slot] = sp
    s_next = s[(d0 + n) % 7]
    f = l + b + s_next

    def mic(v: float) -> np.int64:
        return np.int64(np.floor(v * 1_000_000.0 + 0.5))

    return pd.DataFrame(
        {
            "n_days": [np.int64(n)],
            "level_micro": [mic(l)],
            "trend_micro": [mic(b)],
            "s_next_micro": [mic(s_next)],
            "forecast_micro": [mic(f)],
        }
    )


ORACLES262["events_holt_winters"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy, g.d0 AS d0, g.d1 AS d1
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.dy, grid.d0, grid.d1,
         CAST(coalesce(h.cnt, 0) AS BIGINT) AS y,
         grid.dy % 7 AS slot, grid.dy - grid.d0 AS t
  FROM grid LEFT JOIN h USING (dy)
),
init AS (
  SELECT CAST((SELECT sum(y) FROM x WHERE t < 7) AS DOUBLE) / 7.0 AS l0,
         (SELECT d0 FROM g) AS d0, (SELECT d1 - d0 + 1 FROM g) AS n
),
s0 AS (
  SELECT list(CAST(x.y AS DOUBLE) - init.l0 ORDER BY x.slot) AS sl
  FROM x, init WHERE x.t < 7 GROUP BY ALL
),
steps AS (
  SELECT list([CAST(y AS DOUBLE), CAST(slot AS DOUBLE)] ORDER BY t) AS es
  FROM x WHERE t >= 7
),
fold AS (
  SELECT init.n, list_reduce(
    list_prepend(
      list_concat([init.l0, CAST(0.0 AS DOUBLE)], s0.sl), steps.es),
    (acc, x) -> list_concat(
      [CAST({_HW_ALPHA} AS DOUBLE) * (x[1] - acc[CAST(x[2] AS BIGINT) + 3])
         + CAST({1.0 - _HW_ALPHA} AS DOUBLE) * (acc[1] + acc[2]),
       CAST({_HW_BETA} AS DOUBLE)
         * ((CAST({_HW_ALPHA} AS DOUBLE)
               * (x[1] - acc[CAST(x[2] AS BIGINT) + 3])
             + CAST({1.0 - _HW_ALPHA} AS DOUBLE) * (acc[1] + acc[2]))
            - acc[1])
         + CAST({1.0 - _HW_BETA} AS DOUBLE) * acc[2]],
      list_transform(acc[3:9], (v, i) ->
        CASE WHEN CAST(i AS BIGINT) = CAST(x[2] AS BIGINT) + 1
             THEN CAST({_HW_GAMMA} AS DOUBLE)
                    * (x[1]
                       - (CAST({_HW_ALPHA} AS DOUBLE)
                            * (x[1] - acc[CAST(x[2] AS BIGINT) + 3])
                          + CAST({1.0 - _HW_ALPHA} AS DOUBLE)
                            * (acc[1] + acc[2])))
                  + CAST({1.0 - _HW_GAMMA} AS DOUBLE) * v
             ELSE v END))
  ) AS z,
  (SELECT (d1 + 1) % 7 FROM g) AS next_slot
  FROM init, s0, steps
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(floor(z[1] * 1000000.0 + 0.5) AS BIGINT) AS level_micro,
       CAST(floor(z[2] * 1000000.0 + 0.5) AS BIGINT) AS trend_micro,
       CAST(floor(z[CAST(next_slot AS BIGINT) + 3] * 1000000.0 + 0.5)
            AS BIGINT) AS s_next_micro,
       CAST(floor((z[1] + z[2] + z[CAST(next_slot AS BIGINT) + 3])
                  * 1000000.0 + 0.5) AS BIGINT) AS forecast_micro
FROM fold WHERE n >= 8"""


# ---------------------------------------------------------------------------
# events_mood_median — Mood's median test of value across event types
# ---------------------------------------------------------------------------


def q_events_mood_median(sf_dir: str):
    """Mood's median test: grand LOWER median of value (the ⌈N/2⌉-th
    smallest cent — pure rank pick on the integer-cents histogram, no
    interpolation), per event_type counts strictly above it, expected
    counts under independence e_above = n_g·A/N, and the per-type χ²
    contribution (a−eₐ)²/eₐ + (b−e_b)²/e_b — exact integer counts with
    mirrored single-shape float expressions. Per type: event_type, n,
    above, e_above_micro, chi_micro.

    Scale shape: per-batch (type, cents → count) combiner; only the
    bounded distinct-cents histogram reaches the driver (the
    `events_quantiles_exact` idiom)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"et": et, "cents": cents})
        out = df.groupby(["et", "cents"], as_index=False).size().rename(
            columns={"size": "cnt"}
        )
        return out.astype({"cnt": np.int64})

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |types| × |distinct cents|
        .groupby(["et", "cents"])["cnt"]
        .sum()
        .reset_index()
    )
    cols = ["event_type", "n", "above", "e_above_micro", "chi_micro"]
    dts = {
        "event_type": object, "n": np.int64, "above": np.int64,
        "e_above_micro": np.int64, "chi_micro": np.int64,
    }
    empty = pd.DataFrame({c: pd.Series([], dtype=dts[c]) for c in cols})
    if hist.empty:
        return empty
    gl = hist.groupby("cents")["cnt"].sum().sort_index()
    N = int(gl.sum())
    k = (N + 1) // 2
    cum = np.cumsum(gl.to_numpy(np.int64))
    med = int(gl.index.to_numpy(np.int64)[np.searchsorted(cum, k)])
    ng_s = hist.groupby("et")["cnt"].sum()
    ab_s = hist[hist["cents"] > med].groupby("et")["cnt"].sum()
    byt = pd.DataFrame(
        {
            "et": ng_s.index.to_numpy(object),
            "n": ng_s.to_numpy(np.int64),
            "above": ab_s.reindex(ng_s.index, fill_value=0).to_numpy(np.int64),
        }
    )
    A = int(byt["above"].sum())
    B = N - A
    if A == 0 or B == 0:
        return empty
    ng = byt["n"].to_numpy(np.int64)
    a = byt["above"].to_numpy(np.int64)
    bl = ng - a
    ea = (ng * A).astype(np.float64) / np.float64(N)
    eb = (ng * B).astype(np.float64) / np.float64(N)
    af = a.astype(np.float64)
    bf = bl.astype(np.float64)
    chi = ((af - ea) * (af - ea)) / ea + ((bf - eb) * (bf - eb)) / eb
    out = pd.DataFrame(
        {
            "event_type": byt["et"].astype(object),
            "n": ng,
            "above": a,
            "e_above_micro": np.floor(ea * 1_000_000.0 + 0.5).astype(np.int64),
            "chi_micro": np.floor(chi * 1_000_000.0 + 0.5).astype(np.int64),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


ORACLES262["events_mood_median"] = """
WITH b AS (
  SELECT event_type AS et,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
c AS (SELECT et, cents, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
gl AS (SELECT cents, CAST(sum(cnt) AS BIGINT) AS cnt FROM c GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM gl),
cum AS (
  SELECT cents, sum(cnt) OVER (ORDER BY cents) AS cm FROM gl
),
med AS (
  SELECT min(cents) AS med FROM cum, tot
  WHERE cm >= (tot.n + 1) // 2
),
byt AS (
  SELECT et, CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(CASE WHEN cents > (SELECT med FROM med)
                       THEN cnt ELSE 0 END) AS BIGINT) AS above
  FROM c GROUP BY et
),
ab AS (SELECT CAST(sum(above) AS BIGINT) AS a,
              CAST(sum(n) - sum(above) AS BIGINT) AS b FROM byt)
SELECT byt.et AS event_type, byt.n, byt.above,
       CAST(floor(CAST(byt.n * ab.a AS DOUBLE) / CAST(tot.n AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS e_above_micro,
       CAST(floor((
         ((CAST(byt.above AS DOUBLE)
             - CAST(byt.n * ab.a AS DOUBLE) / CAST(tot.n AS DOUBLE))
          * (CAST(byt.above AS DOUBLE)
             - CAST(byt.n * ab.a AS DOUBLE) / CAST(tot.n AS DOUBLE)))
           / (CAST(byt.n * ab.a AS DOUBLE) / CAST(tot.n AS DOUBLE))
         + ((CAST(byt.n - byt.above AS DOUBLE)
               - CAST(byt.n * ab.b AS DOUBLE) / CAST(tot.n AS DOUBLE))
            * (CAST(byt.n - byt.above AS DOUBLE)
               - CAST(byt.n * ab.b AS DOUBLE) / CAST(tot.n AS DOUBLE)))
             / (CAST(byt.n * ab.b AS DOUBLE) / CAST(tot.n AS DOUBLE))
       ) * 1000000.0 + 0.5) AS BIGINT) AS chi_micro
FROM byt, ab, tot
WHERE ab.a > 0 AND ab.b > 0
ORDER BY event_type"""


QUERIES262 = {
    "events_holt_winters": q_events_holt_winters,
    "events_mood_median": q_events_mood_median,
}
