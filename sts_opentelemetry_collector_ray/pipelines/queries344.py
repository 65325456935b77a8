"""Driver-contract queries, wave 344 — flash-crowd coherence (on the
global peak day, how many participants also had their PERSONAL peak)
and BCG-style brand quadrants (volume vs price-level split at exact
medians). Same contract as queries.py: column names AND dtypes match
the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES344: dict[str, str] = {}

_DAY_US = 86_400_000_000
_FC_BUCKETS = 64


# ---------------------------------------------------------------------------
# users_flash_crowd — personal peaks aligned with the global peak
# ---------------------------------------------------------------------------


def q_users_flash_crowd(sf_dir: str):
    """Flash-crowd coherence: find the global peak day (max events,
    earliest tie); among users active that day, count those whose
    peak-day activity equals their own maximum daily activity (personal
    peak, ties inclusive). Pure integer counting. One row: peak_day,
    n_users_on_peak, n_personal_peak, share_micro.

    Scale shape: per-user (day -> count) partials ride ONE user-bucket
    exchange with the broadcast peak day; each bucket emits two
    scalars."""
    import ray as _ray

    def day_partial(t: pa.Table) -> pd.DataFrame:
        dy = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        h = pd.Series(dy).groupby(dy).size()
        return pd.DataFrame(
            {"dy": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    days = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(day_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("dy")["c"]
        .sum()
    )
    cols = ["peak_day", "n_users_on_peak", "n_personal_peak", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    mx = int(days.max())
    peak_day = int(days[days == mx].index.min())
    pk_ref = _ray.put(peak_day)

    def partial(t: pa.Table) -> pd.DataFrame:
        dy = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _DAY_US
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame({"u": u, "dy": dy})
            .groupby(["u", "dy"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        g["_b"] = (g["u"].to_numpy(np.int64) % _FC_BUCKETS).astype(np.int64)
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        pk = _ray.get(pk_ref)
        per = g.groupby(["u", "dy"])["c"].sum().reset_index()
        mx_per = per.groupby("u")["c"].max()
        on_peak = per[per["dy"] == pk].set_index("u")["c"]
        if len(on_peak) == 0:
            return pd.DataFrame(
                {"n": [np.int64(0)], "p": [np.int64(0)]}
            )
        personal = (
            on_peak.to_numpy(np.int64)
            >= mx_per.reindex(on_peak.index).to_numpy(np.int64)
        )
        return pd.DataFrame(
            {
                "n": [np.int64(len(on_peak))],
                "p": [np.int64(int(personal.sum()))],
            }
        )

    p = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    n_on = int(p["n"])
    if n_on == 0:
        return empty
    n_pk = int(p["p"])
    return pd.DataFrame(
        [
            (
                np.int64(peak_day), np.int64(n_on), np.int64(n_pk),
                np.int64(np.floor(
                    float(n_pk) / float(n_on) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES344["users_flash_crowd"] = f"""
WITH d AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
pk AS (SELECT dy FROM d ORDER BY c DESC, dy LIMIT 1),
per AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS dy,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
mx AS (SELECT user_id, CAST(max(c) AS BIGINT) AS m FROM per GROUP BY 1),
onp AS (
  SELECT per.user_id, per.c
  FROM per, pk WHERE per.dy = pk.dy
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN onp.c >= mx.m THEN 1 ELSE 0 END) AS BIGINT)
           AS p
  FROM onp JOIN mx USING (user_id)
)
SELECT CAST(pk.dy AS BIGINT) AS peak_day, agg.n AS n_users_on_peak,
       agg.p AS n_personal_peak,
       CAST(floor(CAST(agg.p AS DOUBLE) / agg.n * 1000000.0 + 0.5)
            AS BIGINT) AS share_micro
FROM pk, agg
WHERE agg.n > 0"""


# ---------------------------------------------------------------------------
# part_brand_bcg_quadrants — volume x price-level portfolio census
# ---------------------------------------------------------------------------


def q_part_brand_bcg_quadrants(sf_dir: str):
    """Portfolio view: per brand the shipped-item volume and the
    integer mean unit price level; split both at their LOWER medians
    across brands (exact order statistics) into four quadrants
    (0 = low/low .. 3 = high-volume/high-price). Per quadrant:
    quadrant, n_brands, share_micro."""
    import ray as _ray
    import pyarrow.parquet as pq_mod

    part_t = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    p2b = dict(zip(part_t["p_partkey"].to_pylist(), part_t["p_brand"].to_pylist()))
    dims_ref = _ray.put(p2b)

    def partial(t: pa.Table) -> pd.DataFrame:
        p2b_ = _ray.get(dims_ref)
        unit = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)
            / t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        brand = pd.Series(
            t["l_partkey"].to_numpy(zero_copy_only=False)
        ).map(p2b_).to_numpy(object)
        g = (
            pd.DataFrame({"brand": brand, "n": 1, "s": unit})
            .groupby("brand", as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "s": np.int64})

    m = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("brand")[["n", "s"]]
        .sum()
    )
    cols = ["quadrant", "n_brands", "share_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    k = len(m)
    if k < 4:
        return empty
    vol = m["n"].to_numpy(np.int64)
    lvl = (m["s"].to_numpy(np.int64) // m["n"].to_numpy(np.int64)).astype(
        np.int64
    )

    def lower_med(v: np.ndarray) -> int:
        return int(np.sort(v)[(len(v) - 1) // 2])

    mv, ml = lower_med(vol), lower_med(lvl)
    quad = (
        2 * (vol > mv).astype(np.int64) + (lvl > ml).astype(np.int64)
    )
    h = pd.Series(quad).groupby(quad).size()
    total = int(h.sum())
    return pd.DataFrame(
        {
            "quadrant": h.index.to_numpy(np.int64),
            "n_brands": h.to_numpy(np.int64),
            "share_micro": np.floor(
                h.to_numpy(np.int64).astype(np.float64) / float(total)
                * 1_000_000.0 + 0.5
            ).astype(np.int64),
        }
    ).astype({c: np.int64 for c in cols})[cols]


ORACLES344["part_brand_bcg_quadrants"] = """
WITH per AS (
  SELECT p.p_brand AS brand, CAST(count(*) AS BIGINT) AS vol,
         CAST(sum(CAST(floor(l.l_extendedprice / l.l_quantity * 100.0
                             + 0.5) AS BIGINT)) // count(*) AS BIGINT)
           AS lvl
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS k FROM per),
mv AS (
  SELECT vol AS m FROM per ORDER BY vol
  LIMIT 1 OFFSET (SELECT (k - 1) // 2 FROM nn)
),
ml AS (
  SELECT lvl AS m FROM per ORDER BY lvl
  LIMIT 1 OFFSET (SELECT (k - 1) // 2 FROM nn)
),
q AS (
  SELECT 2 * CAST(per.vol > mv.m AS BIGINT)
         + CAST(per.lvl > ml.m AS BIGINT) AS quadrant
  FROM per, mv, ml
),
h AS (
  SELECT CAST(quadrant AS BIGINT) AS quadrant,
         CAST(count(*) AS BIGINT) AS n_brands
  FROM q GROUP BY 1
),
tot AS (SELECT CAST(sum(n_brands) AS BIGINT) AS t FROM h)
SELECT h.quadrant, h.n_brands,
       CAST(floor(CAST(h.n_brands AS DOUBLE) / tot.t * 1000000.0 + 0.5)
            AS BIGINT) AS share_micro
FROM h, tot, nn
WHERE nn.k >= 4
ORDER BY h.quadrant"""


QUERIES344 = {
    "users_flash_crowd": q_users_flash_crowd,
    "part_brand_bcg_quadrants": q_part_brand_bcg_quadrants,
}
