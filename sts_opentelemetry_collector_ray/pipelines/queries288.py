"""Driver-contract queries, wave 288 — the Mendenhall word-length
spectrum per document source (the stylometry characteristic-curve
census) and the bullwhip effect: variance amplification of daily order
placements vs daily shipments (exact cent moments). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES288: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# docs_mendenhall — word-length characteristic curve per source
# ---------------------------------------------------------------------------


def q_docs_mendenhall(sf_dir: str):
    """Mendenhall characteristic curve: the word-length frequency
    spectrum per source over the docs_vocab tokenizer (lengths clamped
    at 20+), pure integer counting. Per row: source, word_len, n_words,
    share_micro (share within the source).

    Scale shape: one per-batch (source, length -> count) combiner; the
    driver folds |sources| x 20 scalars."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), n_per)
        flat = toks.combine_chunks().flatten()
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        keep = lens > 0
        ln = np.minimum(lens[keep], 20).astype(np.int64)
        g = (
            pd.DataFrame({"source": src[keep], "wl": ln})
            .groupby(["source", "wl"])
            .size()
            .rename("c")
            .reset_index()
        )
        g["c"] = g["c"].astype(np.int64)
        return g

    h = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["source", "wl"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["source", "word_len", "n_words", "share_micro"]
    empty = pd.DataFrame(
        {
            "source": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if h.empty:
        return empty
    tot = h.groupby("source")["c"].transform("sum")
    h["share_micro"] = np.floor(
        h["c"].to_numpy(np.float64) / tot.to_numpy(np.float64) * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    h = h.rename(columns={"wl": "word_len", "c": "n_words"})
    return (
        h.sort_values(["source", "word_len"])
        .reset_index(drop=True)
        .astype({c: np.int64 for c in cols[1:]})
    )[cols]


ORACLES288["docs_mendenhall"] = r"""
WITH tok AS (
  SELECT source,
         least(length(unnest(list_filter(
           string_split_regex(lower(text), '\s+'), x -> x <> ''))), 20)
           AS wl
  FROM documents
),
h AS (
  SELECT source, CAST(wl AS BIGINT) AS word_len,
         CAST(count(*) AS BIGINT) AS n_words
  FROM tok GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n_words) AS BIGINT) AS t FROM h GROUP BY 1)
SELECT h.source, h.word_len, h.n_words,
       CAST(floor(CAST(h.n_words AS DOUBLE) / CAST(tot.t AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM h JOIN tot USING (source)
ORDER BY h.source, h.word_len"""


# ---------------------------------------------------------------------------
# orders_bullwhip — variance amplification of orders vs shipments
# ---------------------------------------------------------------------------


def q_orders_bullwhip(sf_dir: str):
    """Bullwhip ratio: CV^2 of daily ORDER value (order placements,
    cents from o_totalprice) over CV^2 of daily SHIPMENT value (cents
    from l_extendedprice by shipdate), both on their zero-filled
    calendar grids — >1 means order-side volatility amplifies demand.
    All moments are exact integers; the two CV^2 and the ratio are the
    float steps. One row: n_days_orders, n_days_ships, cv2_orders_micro,
    cv2_ships_micro, bullwhip_micro.

    Scale shape: two bounded per-batch (day -> cents) combiners; the
    calendar-bounded series fold on the driver."""

    def daily(path: str, date_col: str, val_col: str) -> pd.Series:
        def partial(t: pa.Table) -> pd.DataFrame:
            cents = np.floor(
                t[val_col].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            dy = (
                pa.compute.cast(t[date_col], pa.int64()).to_numpy() // _DAY_US
            )
            g = pd.DataFrame({"dy": dy, "s": cents}).groupby("dy")["s"].sum()
            return pd.DataFrame(
                {"dy": g.index.to_numpy(np.int64), "s": g.to_numpy(np.int64)}
            )

        return (
            ray.data.read_parquet(path, columns=[date_col, val_col])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby("dy")["s"]
            .sum()
        )

    o = daily(f"{sf_dir}/orders.parquet", "o_orderdate", "o_totalprice")
    s = daily(f"{sf_dir}/lineitem.parquet", "l_shipdate", "l_extendedprice")
    cols = [
        "n_days_orders", "n_days_ships", "cv2_orders_micro",
        "cv2_ships_micro", "bullwhip_micro",
    ]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if o.empty or s.empty:
        return empty

    def cv2(series: pd.Series):
        d0, d1 = int(series.index.min()), int(series.index.max())
        n = d1 - d0 + 1
        y = np.zeros(n, dtype=object)
        for dy, v in series.items():
            y[int(dy) - d0] = int(v)
        t = int(sum(y))
        s2 = int(sum(v * v for v in y))
        if n < 2 or t <= 0:
            return None
        # CV^2 = (n * s2 - t^2) / t^2  (population variance over mean^2)
        return n, float(n * s2 - t * t) / (float(t) * float(t))

    ro = cv2(o)
    rs = cv2(s)
    if ro is None or rs is None or rs[1] <= 0.0:
        return empty
    bull = ro[1] / rs[1]
    return pd.DataFrame(
        [
            (
                np.int64(ro[0]), np.int64(rs[0]),
                np.int64(np.floor(ro[1] * 1_000_000.0 + 0.5)),
                np.int64(np.floor(rs[1] * 1_000_000.0 + 0.5)),
                np.int64(np.floor(bull * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES288["orders_bullwhip"] = f"""
WITH od AS (
  SELECT epoch_us(o_orderdate) // {_DAY_US} AS dy,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM orders GROUP BY 1
),
og AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM od),
ogrid AS (
  SELECT og.d0 + CAST(r.range AS BIGINT) AS dy
  FROM og CROSS JOIN range(0, 20000) r WHERE r.range <= og.d1 - og.d0
),
ox AS (
  SELECT CAST(coalesce(od.s, 0) AS BIGINT) AS y
  FROM ogrid LEFT JOIN od USING (dy)
),
om AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS t,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM ox
),
sd AS (
  SELECT epoch_us(l_shipdate) // {_DAY_US} AS dy,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s
  FROM lineitem GROUP BY 1
),
sg AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM sd),
sgrid AS (
  SELECT sg.d0 + CAST(r.range AS BIGINT) AS dy
  FROM sg CROSS JOIN range(0, 20000) r WHERE r.range <= sg.d1 - sg.d0
),
sx AS (
  SELECT CAST(coalesce(sd.s, 0) AS BIGINT) AS y
  FROM sgrid LEFT JOIN sd USING (dy)
),
sm AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS t,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM sx
),
r AS (
  SELECT om.n AS no, sm.n AS ns,
         CAST(om.n * om.s2 - CAST(om.t AS HUGEINT) * om.t AS DOUBLE)
           / (CAST(om.t AS DOUBLE) * CAST(om.t AS DOUBLE)) AS cvo,
         CAST(sm.n * sm.s2 - CAST(sm.t AS HUGEINT) * sm.t AS DOUBLE)
           / (CAST(sm.t AS DOUBLE) * CAST(sm.t AS DOUBLE)) AS cvs
  FROM om, sm
  WHERE om.n >= 2 AND sm.n >= 2 AND om.t > 0 AND sm.t > 0
)
SELECT no AS n_days_orders, ns AS n_days_ships,
       CAST(floor(cvo * 1000000.0 + 0.5) AS BIGINT) AS cv2_orders_micro,
       CAST(floor(cvs * 1000000.0 + 0.5) AS BIGINT) AS cv2_ships_micro,
       CAST(floor(cvo / cvs * 1000000.0 + 0.5) AS BIGINT) AS bullwhip_micro
FROM r
WHERE cvs > 0"""


QUERIES288 = {
    "docs_mendenhall": q_docs_mendenhall,
    "orders_bullwhip": q_orders_bullwhip,
}
