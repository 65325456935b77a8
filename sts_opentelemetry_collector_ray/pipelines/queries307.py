"""Driver-contract queries, wave 307 — Welch's unequal-variance t-test
with Hedges' g effect size between the top-2 event types' values, and
the Bhattacharyya coefficient / Hellinger distance between their cents
histograms. Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES307: dict[str, str] = {}

_TOP2_SQL = """
tc AS (
  SELECT event_type, row_number() OVER (ORDER BY count(*) DESC, event_type)
           AS rk
  FROM events GROUP BY 1
),
top2 AS (SELECT event_type, rk FROM tc WHERE rk <= 2)"""


def _top2_moments(sf_dir: str):
    """(type, n, sum, sum^2) cent moments for the two busiest types."""

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
    )
    if m.empty:
        return None
    order = m["n"].reset_index().sort_values(
        ["n", "et"], ascending=[False, True]
    )
    if len(order) < 2:
        return None
    ta, tb = order["et"].tolist()[:2]
    return ta, tb, m.loc[ta], m.loc[tb]


# ---------------------------------------------------------------------------
# events_welch_t — unequal-variance t-test between top-2 types
# ---------------------------------------------------------------------------


def q_events_welch_t(sf_dir: str):
    """Welch's t between the top-2 types' values (cents): sample
    variances from EXACT integer moments (ddof = 1), the t statistic,
    the Welch-Satterthwaite degrees of freedom, and Hedges' g
    (bias-corrected pooled-SD effect size). One row: type_a, type_b,
    n_a, n_b, t_micro, df_milli, g_micro."""
    got = _top2_moments(sf_dir)
    cols = ["type_a", "type_b", "n_a", "n_b", "t_micro", "df_milli",
            "g_micro"]
    empty = pd.DataFrame(
        {
            **{c: pd.Series([], dtype=object) for c in cols[:2]},
            **{c: pd.Series([], dtype=np.int64) for c in cols[2:]},
        }
    )
    if got is None:
        return empty
    ta, tb, ma, mb = got
    na, sa, s2a = int(ma["n"]), int(ma["s"]), int(ma["s2"])
    nb, sb, s2b = int(mb["n"]), int(mb["s"]), int(mb["s2"])
    if na < 2 or nb < 2:
        return empty
    va = (float(s2a) - float(sa) * float(sa) / float(na)) / float(na - 1)
    vb = (float(s2b) - float(sb) * float(sb) / float(nb)) / float(nb - 1)
    se2 = va / float(na) + vb / float(nb)
    if se2 <= 0.0:
        return empty
    diff = float(sa) / float(na) - float(sb) / float(nb)
    t = diff / float(np.sqrt(se2))
    df = se2 * se2 / (
        (va / float(na)) ** 2 / float(na - 1)
        + (vb / float(nb)) ** 2 / float(nb - 1)
    )
    sp2 = (
        float(na - 1) * va + float(nb - 1) * vb
    ) / float(na + nb - 2)
    if sp2 <= 0.0:
        return empty
    d = diff / float(np.sqrt(sp2))
    corr = 1.0 - 3.0 / (4.0 * float(na + nb) - 9.0)
    g = d * corr
    return pd.DataFrame(
        [
            (
                ta, tb, np.int64(na), np.int64(nb),
                np.int64(np.floor(t * 1_000_000.0 + 0.5)),
                np.int64(np.floor(df * 1_000.0 + 0.5)),
                np.int64(np.floor(g * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


ORACLES307["events_welch_t"] = f"""
WITH {_TOP2_SQL},
m AS (
  SELECT top2.rk, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(sum(CAST(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)
                       AS HUGEINT)
                  * CAST(floor(e.value * 100.0 + 0.5) AS BIGINT))
              AS HUGEINT) AS s2
  FROM events e JOIN top2 ON top2.event_type = e.event_type
  GROUP BY 1
),
v AS (
  SELECT
    (SELECT n FROM m WHERE rk = 1) AS na,
    (SELECT n FROM m WHERE rk = 2) AS nb,
    (SELECT s FROM m WHERE rk = 1) AS sa,
    (SELECT s FROM m WHERE rk = 2) AS sb,
    (SELECT s2 FROM m WHERE rk = 1) AS s2a,
    (SELECT s2 FROM m WHERE rk = 2) AS s2b
),
c AS (
  SELECT na, nb,
         (CAST(s2a AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
            / na) / (na - 1) AS va,
         (CAST(s2b AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
            / nb) / (nb - 1) AS vb,
         CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS diff
  FROM v WHERE na >= 2 AND nb >= 2
),
s AS (
  SELECT na, nb, diff, va, vb, va / na + vb / nb AS se2 FROM c
)
SELECT (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
       (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
       na AS n_a, nb AS n_b,
       CAST(floor(diff / sqrt(se2) * 1000000.0 + 0.5) AS BIGINT)
         AS t_micro,
       CAST(floor(se2 * se2 / ((va / na) * (va / na) / (na - 1)
                               + (vb / nb) * (vb / nb) / (nb - 1))
                  * 1000.0 + 0.5) AS BIGINT) AS df_milli,
       CAST(floor(diff / sqrt(((na - 1) * va + (nb - 1) * vb)
                              / (na + nb - 2))
                  * (1.0 - 3.0 / (4.0 * (na + nb) - 9.0))
                  * 1000000.0 + 0.5) AS BIGINT) AS g_micro
FROM s
WHERE se2 > 0
  AND ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2) > 0"""


# ---------------------------------------------------------------------------
# events_bhattacharyya — histogram overlap between top-2 types
# ---------------------------------------------------------------------------


def q_events_bhattacharyya(sf_dir: str):
    """Bhattacharyya coefficient BC = sum_k sqrt(p_k q_k) over the
    shared cents histogram of the top-2 types' values, and the Hellinger
    distance sqrt(1 - BC). Bin counts are exact; the sqrt fold is the
    float step. One row: type_a, type_b, n_a, n_b, bc_micro,
    hellinger_micro.

    Scale shape: the `events_cvm_two_sample` histogram combiner."""

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
    cols = ["type_a", "type_b", "n_a", "n_b", "bc_micro", "hellinger_micro"]
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
    shared = ha.index.intersection(hb.index)
    na, nb = int(ha.sum()), int(hb.sum())
    if na == 0 or nb == 0:
        return empty
    pa_ = ha.reindex(shared).to_numpy(np.int64).astype(np.float64) / float(na)
    qb = hb.reindex(shared).to_numpy(np.int64).astype(np.float64) / float(nb)
    bc = float(np.sqrt(pa_ * qb).sum())
    bc = min(bc, 1.0)
    hel = float(np.sqrt(1.0 - bc))
    return pd.DataFrame(
        [
            (
                ta, tb, np.int64(na), np.int64(nb),
                np.int64(np.floor(bc * 1_000_000.0 + 0.5)),
                np.int64(np.floor(hel * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols[2:]})


ORACLES307["events_bhattacharyya"] = f"""
WITH {_TOP2_SQL},
v AS (
  SELECT top2.rk, CAST(floor(e.value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events e JOIN top2 ON top2.event_type = e.event_type
),
hist AS (
  SELECT cents,
         CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN rk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM v GROUP BY 1
),
nn AS (SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
       FROM hist),
bcv AS (
  SELECT least(sum(sqrt((CAST(a AS DOUBLE) / nn.na)
                        * (CAST(b AS DOUBLE) / nn.nb))), 1.0) AS bc
  FROM hist, nn
  WHERE a > 0 AND b > 0
  GROUP BY nn.na, nn.nb
)
SELECT (SELECT event_type FROM top2 WHERE rk = 1) AS type_a,
       (SELECT event_type FROM top2 WHERE rk = 2) AS type_b,
       nn.na AS n_a, nn.nb AS n_b,
       CAST(floor(bcv.bc * 1000000.0 + 0.5) AS BIGINT) AS bc_micro,
       CAST(floor(sqrt(1.0 - bcv.bc) * 1000000.0 + 0.5) AS BIGINT)
         AS hellinger_micro
FROM nn, bcv
WHERE nn.na > 0 AND nn.nb > 0"""


QUERIES307 = {
    "events_welch_t": q_events_welch_t,
    "events_bhattacharyya": q_events_bhattacharyya,
}
