"""Driver-contract queries, wave 50 — zone-map effectiveness report (the
data-skipping planning statistic behind predicate pushdown) and quantile–
quantile distribution mapping (the distribution-matching transform). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES50: dict[str, str] = {}

_ZM_ZONES = 32
_ZM_THRESHOLD_CENTS = 90_000  # predicate: cents >= 900.00
_QQ_DECILES = list(range(1, 10))


# ---------------------------------------------------------------------------
# events_zonemap_report — data-skipping zone-map effectiveness
# ---------------------------------------------------------------------------


def q_events_zonemap_report(sf_dir: str):
    """Zone-map effectiveness (the min/max data-skipping statistic that makes
    `q6_selective_scan`'s pushdown work): rows zone by event_id range; per
    zone the value min/max decides whether the predicate cents ≥ 900.00 can
    PRUNE the zone (max below), must SCAN it partially (straddling), or hits
    it fully (min above). Exchange: one (zone, count, min, max) partial per
    zone per block."""

    path = f"{sf_dir}/events.parquet"
    bounds = (
        ray.data.read_parquet(path, columns=["event_id"])
        .map_batches(
            lambda t: pa.table(
                {"mx": pa.array([t["event_id"].to_numpy(zero_copy_only=False).max()])}
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    max_id = int(bounds["mx"].max())

    def partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        zone = (eid * _ZM_ZONES // (max_id + 1)).astype(np.int64)
        df = pd.DataFrame({"zone": zone, "cents": cents})
        out = df.groupby("zone").agg(
            n=("cents", "size"), mn=("cents", "min"), mx=("cents", "max")
        ).reset_index()
        for c in ("n", "mn", "mx"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    parts = (
        ray.data.read_parquet(path, columns=["event_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ zones rows per block
        .groupby("zone")
        .agg(n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max"))
        .sort_index()
    )
    C = _ZM_THRESHOLD_CENTS
    status = np.where(
        parts["mx"].to_numpy() < C,
        "pruned",
        np.where(parts["mn"].to_numpy() >= C, "full", "partial"),
    )
    return pd.DataFrame(
        {
            "zone_id": parts.index.to_numpy().astype(np.int64),
            "n_rows": parts["n"].to_numpy().astype(np.int64),
            "min_cents": parts["mn"].to_numpy().astype(np.int64),
            "max_cents": parts["mx"].to_numpy().astype(np.int64),
            "status": status,
        }
    )


ORACLES50["events_zonemap_report"] = f"""
WITH mx AS (SELECT max(event_id) AS m FROM events),
z AS (
  SELECT event_id * {_ZM_ZONES} // (mx.m + 1) AS zone_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events CROSS JOIN mx
),
agg AS (
  SELECT CAST(zone_id AS BIGINT) AS zone_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(min(cents) AS BIGINT) AS min_cents,
         CAST(max(cents) AS BIGINT) AS max_cents
  FROM z GROUP BY 1
)
SELECT zone_id, n_rows, min_cents, max_cents,
       CASE WHEN max_cents < {_ZM_THRESHOLD_CENTS} THEN 'pruned'
            WHEN min_cents >= {_ZM_THRESHOLD_CENTS} THEN 'full'
            ELSE 'partial' END AS status
FROM agg"""


# ---------------------------------------------------------------------------
# events_qq_mapping — quantile–quantile distribution mapping
# ---------------------------------------------------------------------------


def q_events_qq_mapping(sf_dir: str):
    """Q–Q distribution mapping (the distribution-matching transform behind
    quantile normalization and CDF-based domain adaptation): for each decile,
    the exact value of the 'view' and the 'purchase' value distributions —
    the per-decile pairs ARE the mapping table view→purchase. Exact
    ceil(k·n/10) ranks off value-domain histograms (the grouped-quantiles
    rank rule); no corpus sort."""

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(
            t["event_type"], value_set=pa.array(["view", "purchase"])
        )
        t = t.filter(mask)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                "cents": cents,
            }
        )
        out = (
            df.groupby(["event_type", "cents"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: value-domain rows per block
        .groupby(["event_type", "cents"])["cnt"]
        .sum()
    )

    def pick(et: str) -> np.ndarray:
        sub = hist.loc[et].sort_index()
        v = sub.index.to_numpy()
        cum = sub.to_numpy().cumsum()
        n = int(cum[-1])
        out = []
        for k in _QQ_DECILES:
            rank = (k * n + 9) // 10  # ceil(k·n/10)
            out.append(v[int(np.argmax(cum >= rank))])
        return np.array(out, dtype=np.int64)

    va = pick("view")
    vb = pick("purchase")
    return pd.DataFrame(
        {
            "decile": np.array(_QQ_DECILES, np.int64),
            "view_cents": va,
            "purchase_cents": vb,
        }
    )


ORACLES50["events_qq_mapping"] = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('view', 'purchase')
),
h AS (
  SELECT event_type, cents, count(*) AS cnt FROM c GROUP BY 1, 2
),
cum AS (
  SELECT event_type, cents,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cc,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
),
deciles AS (SELECT UNNEST(range(1, 10)) AS decile),
picks AS (
  SELECT d.decile, cu.event_type,
         min(cu.cents) AS v
  FROM deciles d JOIN cum cu
    ON cu.cc >= (d.decile * cu.n + 9) // 10
  GROUP BY 1, 2
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(max(CASE WHEN event_type = 'view' THEN v END) AS BIGINT)
         AS view_cents,
       CAST(max(CASE WHEN event_type = 'purchase' THEN v END) AS BIGINT)
         AS purchase_cents
FROM picks GROUP BY decile"""


QUERIES50 = {
    "events_zonemap_report": q_events_zonemap_report,
    "events_qq_mapping": q_events_qq_mapping,
}
