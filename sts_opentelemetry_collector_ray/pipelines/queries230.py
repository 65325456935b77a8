"""Driver-contract queries, wave 230 — successive-halving bandit replay
(arms = event types, rounds = equal time windows, eliminate the bottom half
by window mean value) and a first-order stochastic-dominance audit between
customer segments' order-value distributions (binned CDFs, violation
ratio). Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES230: dict[str, str] = {}

_SH_ROUNDS = 3
_SD_BINS = 20
_SD_WIDTH = 30_000.0


# ---------------------------------------------------------------------------
# events_successive_halving — bandit elimination replay
# ---------------------------------------------------------------------------


def q_events_successive_halving(sf_dir: str):
    """Successive halving (Karnin et al. 2013) replay: arms = event types,
    the time span splits into 3 equal windows; each round ranks the
    SURVIVING arms by that window's mean value (ties → type ASC) and keeps
    the top ⌈k/2⌉. Output per (round, arm) for surviving-at-round-start
    arms: round, event_type, n, mean_micro, survived.

    Scale shape: one (window, type, n, Σv) combiner after a (min, max)
    timestamp fold; the elimination loop is driver-side over |types|."""
    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(path, columns=["event_type", "ts", "value"])

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame({"mn": [ts.min()], "mx": [ts.max()]})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    cols = ["round", "event_type", "n", "mean_micro", "survived"]
    empty = pd.DataFrame(
        {c: pd.Series([], dtype=(object if c == "event_type" else np.int64))
         for c in cols}
    )
    if mm.empty:
        return empty
    mn, mx = int(mm["mn"].min()), int(mm["mx"].max())
    if mx <= mn:
        return empty
    span = float(mx - mn)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        ts = df["ts"].astype("datetime64[us]").to_numpy("datetime64[us]").astype(np.int64)
        w = np.minimum(
            np.floor((ts - mn) / span * _SH_ROUNDS), float(_SH_ROUNDS - 1)
        ).astype(np.int64)
        out = pd.DataFrame(
            {"w": w, "event_type": df["event_type"].to_numpy(object),
             "n": 1, "s": df["value"].to_numpy(np.float64)}
        )
        return out.groupby(["w", "event_type"], sort=False, as_index=False).sum().astype(
            {"n": np.int64}
        )

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        return empty
    g = part.groupby(["w", "event_type"])[["n", "s"]].sum()
    alive = sorted(g.index.get_level_values(1).unique())
    rows = []
    for r in range(_SH_ROUNDS):
        stats = []
        for et in alive:
            if (r, et) in g.index:
                n = int(g.loc[(r, et), "n"])
                mean = g.loc[(r, et), "s"] / n
            else:
                n, mean = 0, -np.inf
            stats.append((et, n, mean))
        keep_k = int(np.ceil(len(alive) / 2.0))
        order = sorted(stats, key=lambda x: (-x[2], x[0]))
        kept = {et for et, _, _ in order[:keep_k]}
        for et, n, mean in stats:
            rows.append(
                (
                    np.int64(r + 1), et, np.int64(n),
                    np.int64(np.floor(mean * 1_000_000.0 + 0.5))
                    if np.isfinite(mean) else np.int64(0),
                    np.int64(1 if et in kept else 0),
                )
            )
        alive = sorted(kept)
        if len(alive) <= 1:
            break
    return pd.DataFrame(rows, columns=cols).astype(
        {"round": np.int64, "n": np.int64, "mean_micro": np.int64,
         "survived": np.int64}
    )


def _sh_oracle() -> str:
    rounds = []
    prev_alive = "(SELECT DISTINCT event_type FROM wm)"
    selects = []
    for r in range(1, _SH_ROUNDS + 1):
        rounds.append(f""",
st{r} AS MATERIALIZED (
  SELECT a.event_type,
         coalesce(wm.n, 0) AS n,
         coalesce(wm.s / wm.n, -1e18) AS mean
  FROM {prev_alive} a(event_type)
  LEFT JOIN wm ON wm.event_type = a.event_type AND wm.w = {r - 1}
),
rk{r} AS MATERIALIZED (
  SELECT event_type, n, mean,
         row_number() OVER (ORDER BY mean DESC, event_type ASC) AS rnk,
         count(*) OVER () AS k
  FROM st{r}
),
al{r} AS MATERIALIZED (
  SELECT event_type FROM rk{r}
  WHERE rnk <= CAST(ceil(k / 2.0) AS BIGINT)
)""")
        selects.append(f"""
SELECT {r} AS round, rk{r}.event_type, CAST(rk{r}.n AS BIGINT) AS n,
       CAST(CASE WHEN rk{r}.n > 0
                 THEN floor(rk{r}.mean * 1000000.0 + 0.5) ELSE 0 END
            AS BIGINT) AS mean_micro,
       CAST(CASE WHEN rk{r}.rnk <= CAST(ceil(rk{r}.k / 2.0) AS BIGINT)
                 THEN 1 ELSE 0 END AS BIGINT) AS survived
FROM rk{r}""")
        prev_alive = f"al{r}"
    return f"""
WITH tt AS (
  SELECT CAST(min(epoch_us(ts)) AS DOUBLE) AS mn,
         CAST(max(epoch_us(ts)) AS DOUBLE) AS mx
  FROM events
),
wm AS MATERIALIZED (
  SELECT least(CAST(floor((epoch_us(ts) - tt.mn) / (tt.mx - tt.mn)
                          * {_SH_ROUNDS}) AS BIGINT),
               {_SH_ROUNDS - 1}) AS w,
         event_type, CAST(count(*) AS BIGINT) AS n, sum(value) AS s
  FROM events, tt WHERE tt.mx > tt.mn GROUP BY 1, 2
){"".join(rounds)}
SELECT CAST(round AS BIGINT) AS round, event_type, n, mean_micro, survived
FROM ({" UNION ALL ".join(selects)}) ORDER BY round, event_type"""


ORACLES230["events_successive_halving"] = _sh_oracle()


# ---------------------------------------------------------------------------
# orders_stochastic_dominance — binned first-order SD audit
# ---------------------------------------------------------------------------


def q_orders_stochastic_dominance(sf_dir: str):
    """First-order stochastic dominance of BUILDING-segment order values
    over the rest, on 20 fixed bins: A dominates B when F_A ≤ F_B at every
    bin; the violation ratio ε = Σmax(F_A−F_B, 0)/Σ|F_A−F_B| (Dror et al.
    2019 'almost SD' style). One row: n_a, n_b, max_gap_micro, eps_micro,
    dominates (ε < 0.05).

    Scale shape: the customer→segment map broadcasts into one (arm, bin)
    histogram combiner; the 20-bin CDF scan on the driver."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    ck = np.asarray(cust["c_custkey"].to_numpy(zero_copy_only=False), np.int64)
    cs = (
        np.asarray(cust["c_mktsegment"].to_numpy(zero_copy_only=False), object)
        == "BUILDING"
    ).astype(np.int64)
    order = np.argsort(ck)
    ck, cs = ck[order], cs[order]

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["o_custkey", "o_totalprice"]).to_pandas()
        arm = cs[np.searchsorted(ck, df["o_custkey"].to_numpy(np.int64))]
        b = np.minimum(
            np.floor(df["o_totalprice"].to_numpy(np.float64) / _SD_WIDTH),
            float(_SD_BINS - 1),
        ).astype(np.int64)
        out = pd.DataFrame({"arm": arm, "bin": b, "n": 1})
        return out.groupby(["arm", "bin"], sort=False, as_index=False).sum().astype(
            np.int64
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["n_a", "n_b", "max_gap_micro", "eps_micro", "dominates"]
    if part.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    g = part.groupby(["arm", "bin"])["n"].sum()
    ha = np.zeros(_SD_BINS, np.float64)
    hb = np.zeros(_SD_BINS, np.float64)
    for arm, h in ((1, ha), (0, hb)):
        if arm in g.index.get_level_values(0):
            sub = g.loc[arm]
            h[sub.index.to_numpy(np.int64)] = sub.to_numpy(np.int64)
    na, nb = ha.sum(), hb.sum()
    if na == 0.0 or nb == 0.0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    fa = np.cumsum(ha / na)
    fb = np.cumsum(hb / nb)
    diff = fa - fb
    pos = np.maximum(diff, 0.0).sum()
    tot = np.abs(diff).sum()
    eps = pos / tot if tot > 0.0 else 0.0
    micro = lambda v: np.int64(np.floor(v * 1_000_000.0 + 0.5))  # noqa: E731
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "n_b": [np.int64(nb)],
            "max_gap_micro": [micro(float(np.max(diff)))],
            "eps_micro": [micro(eps)],
            "dominates": [np.int64(1 if eps < 0.05 else 0)],
        }
    )


ORACLES230["orders_stochastic_dominance"] = f"""
WITH o AS (
  SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS arm,
         least(CAST(floor(o_totalprice / {_SD_WIDTH}) AS BIGINT),
               {_SD_BINS - 1}) AS bin
  FROM orders JOIN customer c ON o_custkey = c.c_custkey
),
grid AS (
  SELECT a.arm, b.range AS bin
  FROM (SELECT DISTINCT arm FROM o) a, range({_SD_BINS}) b
),
h AS (
  SELECT grid.arm, grid.bin, CAST(coalesce(x.n, 0) AS BIGINT) AS n
  FROM grid LEFT JOIN (
    SELECT arm, bin, count(*) AS n FROM o GROUP BY 1, 2
  ) x ON grid.arm = x.arm AND grid.bin = x.bin
),
tot AS (SELECT arm, CAST(sum(n) AS DOUBLE) AS nt FROM h GROUP BY 1),
cdf AS (
  SELECT h.arm, h.bin,
         sum(CAST(h.n AS DOUBLE) / tot.nt)
           OVER (PARTITION BY h.arm ORDER BY h.bin) AS f
  FROM h JOIN tot ON h.arm = tot.arm
),
d AS (
  SELECT a.bin, a.f - b.f AS diff
  FROM cdf a JOIN cdf b ON a.bin = b.bin AND a.arm = 1 AND b.arm = 0
),
agg AS (
  SELECT max(diff) AS mx,
         sum(greatest(diff, 0.0)) AS pos,
         sum(abs(diff)) AS tot
  FROM d
)
SELECT CAST((SELECT nt FROM tot WHERE arm = 1) AS BIGINT) AS n_a,
       CAST((SELECT nt FROM tot WHERE arm = 0) AS BIGINT) AS n_b,
       CAST(floor(mx * 1000000.0 + 0.5) AS BIGINT) AS max_gap_micro,
       CAST(floor((CASE WHEN tot > 0.0 THEN pos / tot ELSE 0.0 END)
                  * 1000000.0 + 0.5) AS BIGINT) AS eps_micro,
       CAST(CASE WHEN (CASE WHEN tot > 0.0 THEN pos / tot ELSE 0.0 END) < 0.05
                 THEN 1 ELSE 0 END AS BIGINT) AS dominates
FROM agg"""


QUERIES230 = {
    "events_successive_halving": q_events_successive_halving,
    "orders_stochastic_dominance": q_orders_stochastic_dominance,
}
