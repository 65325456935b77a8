"""Driver-contract queries, wave 276 — the two-sample Anderson-Darling
statistic (Scholz-Stephens midrank A2akN with ties; exact integer core
via doubled midranks) between the top-2 event types' value
distributions, and McGill interaction information among (event_type,
weekday, daypart). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES276: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_ad_two_sample — Scholz-Stephens A2akN (midrank, k=2)
# ---------------------------------------------------------------------------


def q_events_ad_two_sample(sf_dir: str):
    """Two-sample Anderson-Darling (midrank version with ties): over the
    combined distinct cents values, with doubled cumulative counts the
    per-value term is l_j X_aj^2 / D_j where
    X_aj = N (2 M_aj - f_aj) - n_a (2 L_j - l_j) and
    D_j = (2 L_j - l_j)(2N - (2 L_j - l_j)) - N l_j — ALL integers; the
    statistic A2 = (N-1)/N^2 * sum_a (1/n_a) sum_j l_j X^2 / D sums the
    exact-rational terms in float. One row: type_a, type_b, n_a, n_b,
    a2_micro.

    Scale shape: per-batch (type, cents) combiners; only the bounded
    distinct-cents histogram reaches the driver (the
    `events_cvm_two_sample` idiom)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "et": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": np.floor(
                    t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                ).astype(np.int64),
            }
        )
        g = df.groupby(["et", "cents"]).size().rename("c").reset_index()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["et", "cents"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["type_a", "type_b", "n_a", "n_b", "a2_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if h.empty:
        return empty
    totals = (
        h.groupby("et")["c"].sum().reset_index()
        .sort_values(["c", "et"], ascending=[False, True])
    )
    if len(totals) < 2:
        return empty
    ta, tb = totals["et"].tolist()[:2]
    ha = h[h["et"] == ta].set_index("cents")["c"]
    hb = h[h["et"] == tb].set_index("cents")["c"]
    vals = np.array(sorted(set(ha.index) | set(hb.index)), np.int64)
    fa = ha.reindex(vals).fillna(0).to_numpy(np.int64)
    fb = hb.reindex(vals).fillna(0).to_numpy(np.int64)
    na, nb = int(fa.sum()), int(fb.sum())
    if na == 0 or nb == 0:
        return empty
    N = na + nb
    lj = fa + fb
    Lj = np.cumsum(lj)
    tL = 2 * Lj - lj  # doubled midrank cumulative of the pooled sample
    D = tL.astype(object) * (2 * N - tL).astype(object) - N * lj.astype(
        object
    )
    a2 = 0.0
    for fs, ns in ((fa, na), (fb, nb)):
        M = np.cumsum(fs)
        X = (N * (2 * M - fs).astype(object)
             - ns * tL.astype(object))
        terms = [
            float(l) * float(x) * float(x) / float(d)
            for l, x, d in zip(lj, X, D)
            if d != 0
        ]
        a2 += float(np.sum(terms)) / float(ns)
    a2 *= float(N - 1) / (float(N) * float(N))
    return pd.DataFrame(
        [
            (
                ta, tb, np.int64(na), np.int64(nb),
                np.int64(np.floor(a2 * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


ORACLES276["events_ad_two_sample"] = """
WITH tc AS (
  SELECT event_type, row_number() OVER (ORDER BY count(*) DESC, event_type)
           AS rk
  FROM events GROUP BY 1
),
top2 AS (SELECT event_type, rk FROM tc WHERE rk <= 2),
v AS (
  SELECT top2.rk, CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN top2 ON top2.event_type = e.event_type
),
hist AS (
  SELECT cents,
         CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fa,
         CAST(sum(CASE WHEN rk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS fb
  FROM v GROUP BY 1
),
nn AS (SELECT CAST(sum(fa) AS BIGINT) AS na, CAST(sum(fb) AS BIGINT) AS nb,
              CAST(sum(fa + fb) AS BIGINT) AS n
       FROM hist),
cum AS (
  SELECT cents, fa, fb, fa + fb AS lj,
         CAST(2 * sum(fa) OVER (ORDER BY cents) - fa AS HUGEINT) AS tma,
         CAST(2 * sum(fb) OVER (ORDER BY cents) - fb AS HUGEINT) AS tmb,
         CAST(2 * sum(fa + fb) OVER (ORDER BY cents) - (fa + fb)
              AS HUGEINT) AS tl
  FROM hist
),
terms AS (
  SELECT
    CAST(lj AS DOUBLE)
      * CAST(nn.n * tma - nn.na * tl AS DOUBLE)
      * CAST(nn.n * tma - nn.na * tl AS DOUBLE)
      / CAST(tl * (2 * nn.n - tl) - nn.n * lj AS DOUBLE) AS term_a,
    CAST(lj AS DOUBLE)
      * CAST(nn.n * tmb - nn.nb * tl AS DOUBLE)
      * CAST(nn.n * tmb - nn.nb * tl AS DOUBLE)
      / CAST(tl * (2 * nn.n - tl) - nn.n * lj AS DOUBLE) AS term_b
  FROM cum, nn
  WHERE tl * (2 * nn.n - tl) - nn.n * lj <> 0
),
a2 AS (
  SELECT (sum(term_a) / nn.na + sum(term_b) / nn.nb)
         * CAST(nn.n - 1 AS DOUBLE)
         / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)) AS stat
  FROM terms, nn
  GROUP BY nn.na, nn.nb, nn.n
)
SELECT (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
       (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
       nn.na AS n_a, nn.nb AS n_b,
       CAST(floor(a2.stat * 1000000.0 + 0.5) AS BIGINT) AS a2_micro
FROM nn, a2
WHERE nn.na > 0 AND nn.nb > 0"""


# ---------------------------------------------------------------------------
# events_interaction_information — McGill II over (type, dow, daypart)
# ---------------------------------------------------------------------------


def q_events_interaction_information(sf_dir: str):
    """McGill interaction information
    I(A;B;C) = H(A)+H(B)+H(C) - H(AB) - H(AC) - H(BC) + H(ABC) over
    A = event_type, B = epoch-weekday, C = 6-hour daypart. Every entropy
    is H = ln N - (1/N) sum c ln c from EXACT integer cell counts of the
    bounded contingency cube. One row: n, h_a_micro, h_b_micro,
    h_c_micro, h_ab_micro, h_ac_micro, h_bc_micro, h_abc_micro,
    ii_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "a": t["event_type"].to_numpy(zero_copy_only=False),
                "b": (us // _DAY_US) % 7,
                "c": (us // 3_600_000_000 % 24) // 6,
            }
        )
        g = df.groupby(["a", "b", "c"]).size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    cube = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["a", "b", "c"])["n"]
        .sum()
        .reset_index()
    )
    cols = [
        "n", "h_a_micro", "h_b_micro", "h_c_micro", "h_ab_micro",
        "h_ac_micro", "h_bc_micro", "h_abc_micro", "ii_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cube.empty:
        return empty
    N = int(cube["n"].sum())

    def ent(keys: list[str]) -> float:
        c = cube.groupby(keys)["n"].sum().to_numpy(np.int64).astype(np.float64)
        return float(np.log(float(N)) - (c * np.log(c)).sum() / float(N))

    h_a, h_b, h_c = ent(["a"]), ent(["b"]), ent(["c"])
    h_ab, h_ac, h_bc = ent(["a", "b"]), ent(["a", "c"]), ent(["b", "c"])
    h_abc = ent(["a", "b", "c"])
    ii = h_a + h_b + h_c - h_ab - h_ac - h_bc + h_abc

    def micro(v: float) -> np.int64:
        return np.int64(np.floor(v * 1_000_000.0 + 0.5))

    return pd.DataFrame(
        [
            (
                np.int64(N), micro(h_a), micro(h_b), micro(h_c), micro(h_ab),
                micro(h_ac), micro(h_bc), micro(h_abc), micro(ii),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES276["events_interaction_information"] = f"""
WITH base AS (
  SELECT event_type AS a,
         (epoch_us(ts) // {_DAY_US}) % 7 AS b,
         ((epoch_us(ts) // 3600000000) % 24) // 6 AS c
  FROM events
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
ha AS (SELECT ln(nn.n) - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                / nn.n AS h
       FROM (SELECT count(*) AS c FROM base GROUP BY a), nn GROUP BY nn.n),
hb AS (SELECT ln(nn.n) - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                / nn.n AS h
       FROM (SELECT count(*) AS c FROM base GROUP BY b), nn GROUP BY nn.n),
hc AS (SELECT ln(nn.n) - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                / nn.n AS h
       FROM (SELECT count(*) AS c FROM base GROUP BY c), nn GROUP BY nn.n),
hab AS (SELECT ln(nn.n) - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                 / nn.n AS h
        FROM (SELECT count(*) AS c FROM base GROUP BY a, b), nn
        GROUP BY nn.n),
hac AS (SELECT ln(nn.n) - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                 / nn.n AS h
        FROM (SELECT count(*) AS c FROM base GROUP BY a, c), nn
        GROUP BY nn.n),
hbc AS (SELECT ln(nn.n) - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                 / nn.n AS h
        FROM (SELECT count(*) AS c FROM base GROUP BY b, c), nn
        GROUP BY nn.n),
habc AS (SELECT ln(nn.n) - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                  / nn.n AS h
         FROM (SELECT count(*) AS c FROM base GROUP BY a, b, c), nn
         GROUP BY nn.n)
SELECT nn.n,
       CAST(floor(ha.h * 1000000.0 + 0.5) AS BIGINT) AS h_a_micro,
       CAST(floor(hb.h * 1000000.0 + 0.5) AS BIGINT) AS h_b_micro,
       CAST(floor(hc.h * 1000000.0 + 0.5) AS BIGINT) AS h_c_micro,
       CAST(floor(hab.h * 1000000.0 + 0.5) AS BIGINT) AS h_ab_micro,
       CAST(floor(hac.h * 1000000.0 + 0.5) AS BIGINT) AS h_ac_micro,
       CAST(floor(hbc.h * 1000000.0 + 0.5) AS BIGINT) AS h_bc_micro,
       CAST(floor(habc.h * 1000000.0 + 0.5) AS BIGINT) AS h_abc_micro,
       CAST(floor((ha.h + hb.h + hc.h - hab.h - hac.h - hbc.h + habc.h)
                  * 1000000.0 + 0.5) AS BIGINT) AS ii_micro
FROM nn, ha, hb, hc, hab, hac, hbc, habc"""


QUERIES276 = {
    "events_ad_two_sample": q_events_ad_two_sample,
    "events_interaction_information": q_events_interaction_information,
}
