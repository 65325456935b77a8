"""Driver-contract queries, wave 279 — temporal Ripley's K (pair counts
within 1-minute/1-hour/1-day windows of the global event stream, exact
integer pair counting via the bucket+neighbor exchange) and Tukey HSD
pairwise contrasts of event values across types (exact cent moments,
studentized q per pair). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES279: dict[str, str] = {}

_RK_WINDOWS_US = (60_000_000, 3_600_000_000, 86_400_000_000)


# ---------------------------------------------------------------------------
# events_ripley_k — temporal pair-correlation at fixed windows
# ---------------------------------------------------------------------------


def q_events_ripley_k(sf_dir: str):
    """Temporal Ripley's K: for each window W in {1min, 1h, 1d}, count
    ordered pairs with 0 < t_j - t_i <= W (EXACT integers; tied
    timestamps never pair) and report K = span * pairs / n^2 plus the
    clustering ratio pairs * span / (n (n-1) W) vs the CSR expectation.
    Per window: w_us, n_pairs, k_milli, csr_ratio_micro.

    Scale shape: each event lands in bucket ts // W (home) and ts // W
    - 1 (neighbor), so every qualifying pair is co-bucketed; per-bucket
    counting is one sort + two vectorized searchsorteds; the driver
    folds one scalar per (window, bucket)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        frames = []
        for wi, w in enumerate(_RK_WINDOWS_US):
            b = us // w
            frames.append(
                pd.DataFrame({"w": wi, "bk": b, "home": 1, "us": us})
            )
            frames.append(
                pd.DataFrame({"w": wi, "bk": b - 1, "home": 0, "us": us})
            )
        out = pd.concat(frames, ignore_index=True)
        out["_b"] = (out["bk"] % 256).astype(np.int64)
        return out.astype(
            {"w": np.int64, "bk": np.int64, "home": np.int64, "us": np.int64}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (wi, bk), sub in g.groupby(["w", "bk"], sort=False):
            w = _RK_WINDOWS_US[int(wi)]
            all_us = np.sort(sub["us"].to_numpy(np.int64))
            home = sub.loc[sub["home"] == 1, "us"].to_numpy(np.int64)
            if len(home) == 0:
                continue
            hi = np.searchsorted(all_us, home + w, side="right")
            lo = np.searchsorted(all_us, home, side="right")
            rows.append((int(wi), int((hi - lo).sum())))
        if not rows:
            return pd.DataFrame(
                {
                    "w": pd.Series([], dtype=np.int64),
                    "pairs": pd.Series([], dtype=np.int64),
                }
            )
        out = pd.DataFrame(rows, columns=["w", "pairs"])
        return out.groupby("w", as_index=False)["pairs"].sum().astype(np.int64)

    agg = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby("w")["pairs"]
        .sum()
    )
    stats = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(
            lambda t: pd.DataFrame(
                {
                    "n": [np.int64(len(t))],
                    "mn": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().min()
                    )],
                    "mx": [np.int64(
                        pa.compute.cast(t["ts"], pa.int64()).to_numpy().max()
                    )],
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    cols = ["w_us", "n_pairs", "k_milli", "csr_ratio_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if stats.empty:
        return empty
    n = int(stats["n"].sum())
    span = int(stats["mx"].max()) - int(stats["mn"].min())
    if n < 2 or span <= 0:
        return empty
    rows = []
    for wi, w in enumerate(_RK_WINDOWS_US):
        pairs = int(agg.get(wi, 0))
        k = float(span) * float(pairs) / (float(n) * float(n))
        csr = (
            float(pairs) * float(span)
            / (float(n) * float(n - 1) * float(w))
        )
        rows.append(
            (
                np.int64(w), np.int64(pairs),
                np.int64(np.floor(k * 1_000.0 + 0.5)),
                np.int64(np.floor(csr * 1_000_000.0 + 0.5)),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES279["events_ripley_k"] = f"""
WITH ev AS (SELECT epoch_us(ts) AS us FROM events),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(max(us) - min(us) AS BIGINT) AS span
  FROM ev
),
w AS (SELECT CAST(u.w AS BIGINT) AS w
      FROM (SELECT unnest([{", ".join(str(w) for w in _RK_WINDOWS_US)}])
              AS w) u),
pairs AS (
  SELECT w.w,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM w JOIN ev a ON true JOIN ev b
    ON b.us > a.us AND b.us <= a.us + w.w
  GROUP BY 1
),
per AS (
  SELECT w.w, CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs
  FROM w LEFT JOIN pairs p USING (w)
)
SELECT per.w AS w_us, per.n_pairs,
       CAST(floor(CAST(nn.span AS DOUBLE) * CAST(per.n_pairs AS DOUBLE)
                  / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE))
                  * 1000.0 + 0.5) AS BIGINT) AS k_milli,
       CAST(floor(CAST(per.n_pairs AS DOUBLE) * CAST(nn.span AS DOUBLE)
                  / (CAST(nn.n AS DOUBLE) * CAST(nn.n - 1 AS DOUBLE)
                     * CAST(per.w AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS csr_ratio_micro
FROM per, nn
WHERE nn.n >= 2 AND nn.span > 0
ORDER BY per.w"""


# ---------------------------------------------------------------------------
# events_tukey_hsd — studentized pairwise contrasts after ANOVA
# ---------------------------------------------------------------------------


def q_events_tukey_hsd(sf_dir: str):
    """Tukey HSD contrasts of event value (cents) across event types:
    within-group mean square MSW = (sum y^2 - sum_g S_g^2/n_g)/(N - k)
    from EXACT integer cent moments, and per type pair (a < b) the
    studentized q = |mean_a - mean_b| / sqrt(MSW (1/n_a + 1/n_b) / 2).
    Per pair: type_a, type_b, n_a, n_b, diff_cents_milli, q_micro.

    Scale shape: one bounded per-batch (type -> n, sum, sum^2)
    combiner; the driver folds |types| x 3 scalars."""

    def partial(t: pa.Table) -> pd.DataFrame:
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "et": t["event_type"].to_numpy(zero_copy_only=False),
                "n": 1,
                "s": cents,
                "s2": cents * cents,
            }
        )
        out = df.groupby("et", sort=False, as_index=False).sum()
        return out.astype({"n": np.int64, "s": np.int64, "s2": np.int64})

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("et")[["n", "s", "s2"]]
        .sum()
        .sort_index()
    )
    cols = ["type_a", "type_b", "n_a", "n_b", "diff_cents_milli", "q_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    k = len(m)
    if k < 2:
        return empty
    N = int(m["n"].sum())
    if N <= k:
        return empty
    # SSW = sum s2 - sum_g s_g^2 / n_g (float division per group)
    ssw = float(int(m["s2"].sum())) - float(
        sum(float(int(s)) * float(int(s)) / float(int(n))
            for s, n in zip(m["s"], m["n"]))
    )
    msw = ssw / float(N - k)
    if msw <= 0.0:
        return empty
    types = m.index.tolist()
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            na, nb = int(m.loc[a, "n"]), int(m.loc[b, "n"])
            sa, sb = int(m.loc[a, "s"]), int(m.loc[b, "s"])
            diff = float(sa) / float(na) - float(sb) / float(nb)
            se = float(
                np.sqrt(msw * (1.0 / float(na) + 1.0 / float(nb)) / 2.0)
            )
            q = abs(diff) / se
            rows.append(
                (
                    a, b, np.int64(na), np.int64(nb),
                    np.int64(np.floor(diff * 1_000.0 + 0.5)),
                    np.int64(np.floor(q * 1_000_000.0 + 0.5)),
                )
            )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[2:]}
    )


ORACLES279["events_tukey_hsd"] = """
WITH base AS (
  SELECT event_type AS et,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
m AS (
  SELECT et, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2
  FROM base GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
         sum(CAST(s2 AS DOUBLE)) AS ss2,
         sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           AS sgn
  FROM m
),
msw AS (
  SELECT (ss2 - sgn) / CAST(nn - k AS DOUBLE) AS msw, nn, k FROM tot
)
SELECT a.et AS type_a, b.et AS type_b, a.n AS n_a, b.n AS n_b,
       CAST(floor((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                   - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
                  * 1000.0 + 0.5) AS BIGINT) AS diff_cents_milli,
       CAST(floor(abs(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                      - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
                  / sqrt(msw.msw * (1.0 / CAST(a.n AS DOUBLE)
                                    + 1.0 / CAST(b.n AS DOUBLE)) / 2.0)
                  * 1000000.0 + 0.5) AS BIGINT) AS q_micro
FROM m a JOIN m b ON a.et < b.et, msw
WHERE msw.msw > 0 AND msw.k >= 2 AND msw.nn > msw.k
ORDER BY type_a, type_b"""


QUERIES279 = {
    "events_ripley_k": q_events_ripley_k,
    "events_tukey_hsd": q_events_tukey_hsd,
}
