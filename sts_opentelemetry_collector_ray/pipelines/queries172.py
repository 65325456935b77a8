"""Driver-contract queries, wave 172 — latency SLO attainment per tool
(share of span-pair calls inside the 500 ms and 2 s budgets) and routed
daily volume (rows per (sink, day) on the exporter-facing stream — the ops
view that feeds volume alerts). Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES172: dict[str, str] = {}

_SLO_FAST_US = 500_000
_SLO_SLOW_US = 2_000_000
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# sg_slo_attainment — share of calls inside the latency budgets, per tool
# ---------------------------------------------------------------------------


def q_sg_slo_attainment(sf_dir: str):
    """Per tool: calls, calls within 500 ms, calls within 2 s, and both
    attainment shares in micro units.

    Scale shape: the oracled span-pair edge join + a bounded per-tool
    combiner with two threshold masks; driver fold."""
    from ..stages.servicegraph import edge_table
    from .queries2 import _parsed_transcripts

    edges = edge_table(_parsed_transcripts(sf_dir))

    def partial(t: pa.Table) -> pd.DataFrame:
        lat = t["latency_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "tool": np.asarray(t["tool"].to_numpy(zero_copy_only=False)),
                    "n": 1,
                    "fast": (lat <= _SLO_FAST_US).astype(np.int64),
                    "slow": (lat <= _SLO_SLOW_US).astype(np.int64),
                }
            )
            .groupby("tool", sort=False, as_index=False)
            .sum()
        )
        return g.astype({"n": np.int64, "fast": np.int64, "slow": np.int64})

    part = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "tool": pd.Series([], dtype=object),
            "n_calls": pd.Series([], dtype=np.int64),
            "within_500ms": pd.Series([], dtype=np.int64),
            "within_2s": pd.Series([], dtype=np.int64),
            "slo_500ms_micro": pd.Series([], dtype=np.int64),
            "slo_2s_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby("tool", sort=True)
        .agg(n_calls=("n", "sum"), within_500ms=("fast", "sum"),
             within_2s=("slow", "sum"))
        .reset_index()
    )
    n = out["n_calls"].to_numpy(np.float64)
    out["slo_500ms_micro"] = np.floor(
        out["within_500ms"].to_numpy(np.float64) / n * 1_000_000.0 + 0.5
    ).astype(np.int64)
    out["slo_2s_micro"] = np.floor(
        out["within_2s"].to_numpy(np.float64) / n * 1_000_000.0 + 0.5
    ).astype(np.int64)
    return out.astype(
        {"n_calls": np.int64, "within_500ms": np.int64, "within_2s": np.int64}
    )


def _slo_oracle() -> str:
    from .queries2 import _EDGES_SQL

    return (
        _EDGES_SQL
        + f"""
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(*) FILTER (latency_us <= {_SLO_FAST_US}) AS BIGINT)
         AS within_500ms,
       CAST(count(*) FILTER (latency_us <= {_SLO_SLOW_US}) AS BIGINT)
         AS within_2s,
       CAST(floor(CAST(count(*) FILTER (latency_us <= {_SLO_FAST_US})
                       AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS slo_500ms_micro,
       CAST(floor(CAST(count(*) FILTER (latency_us <= {_SLO_SLOW_US})
                       AS DOUBLE) / CAST(count(*) AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS slo_2s_micro
FROM edges GROUP BY 1"""
    )


ORACLES172["sg_slo_attainment"] = _slo_oracle()


# ---------------------------------------------------------------------------
# route_daily_volume — exporter-facing rows per (sink, day)
# ---------------------------------------------------------------------------


def q_route_daily_volume(sf_dir: str):
    """Per (sink, epoch day) over exporter-facing routed rows (error rows
    excluded): row count and the day's share within the sink in micro units.

    Scale shape: the oracled router + a bounded (sink, day) combiner."""
    import pyarrow.compute as pc

    from ..pipelines.flagship import routed_dataset
    from ..sources.transcripts import derive_transcripts_from_events

    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        dedup=False,
        enrich_concurrency=2,
        route_concurrency=None,
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_null(t["error"]))
        day = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
            // _DAY_US
        )
        g = (
            pd.DataFrame(
                {
                    "sink": np.asarray(t["sink"].to_numpy(zero_copy_only=False)),
                    "day": day,
                    "n": 1,
                }
            )
            .groupby(["sink", "day"], sort=False, as_index=False)["n"]
            .sum()
        )
        return g.astype({"day": np.int64, "n": np.int64})

    part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame(
        {
            "sink": pd.Series([], dtype=object),
            "day": pd.Series([], dtype=np.int64),
            "n_rows": pd.Series([], dtype=np.int64),
            "in_sink_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    out = (
        part.groupby(["sink", "day"], sort=True)["n"]
        .sum()
        .reset_index(name="n_rows")
    )
    stot = out.groupby("sink")["n_rows"].transform("sum")
    out["in_sink_micro"] = np.floor(
        out["n_rows"].to_numpy(np.float64)
        / stot.to_numpy(np.float64)
        * 1_000_000.0
        + 0.5
    ).astype(np.int64)
    return out.astype({"day": np.int64, "n_rows": np.int64})


def _daily_volume_oracle() -> str:
    from .queries import _ROUTES_SQL

    return (
        _ROUTES_SQL
        + f""",
ok AS (
  SELECT sink, epoch_us(ts) // {_DAY_US} AS day
  FROM routes JOIN transcripts USING (conv_id, turn_idx)
  WHERE data_source <> 'urn:mapping:bad-required'
),
g AS (
  SELECT sink, CAST(day AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM ok GROUP BY 1, 2
),
st AS (SELECT sink, CAST(sum(n_rows) AS BIGINT) AS tot FROM g GROUP BY 1)
SELECT g.sink, g.day, g.n_rows,
       CAST(floor(CAST(g.n_rows AS DOUBLE) / CAST(st.tot AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS in_sink_micro
FROM g JOIN st USING (sink)"""
    )


ORACLES172["route_daily_volume"] = _daily_volume_oracle()


QUERIES172 = {
    "sg_slo_attainment": q_sg_slo_attainment,
    "route_daily_volume": q_route_daily_volume,
}
