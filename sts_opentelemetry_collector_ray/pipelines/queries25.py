"""Driver-contract queries, wave 25 — CSV wire-format ingest (the third
non-parquet source path beside JSONL) and schema-drift-tolerant union
(heterogeneous file generations with added/missing columns aligned by name,
absent columns null-filled). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import hashlib
import os

import numpy as np  # noqa: F401
import pandas as pd  # noqa: F401
import pyarrow as pa
import ray.data

ORACLES25: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_csv_ingest — CSV source path end-to-end
# ---------------------------------------------------------------------------


def q_events_csv_ingest(sf_dir: str):
    """CSV ingest (the file-receiver analogue, S1 family): the events stream
    materializes once as CSV under /tmp (idempotent per sf), re-ingests with
    `ray.data.read_csv` (Arrow CSV reader — typed, block-parallel), and
    aggregates as exact integer cents — proving the third source format
    beside parquet and JSONL."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    cdir = f"/tmp/graft_csv_{tag}"
    marker = os.path.join(cdir, "_DONE")
    if not os.path.exists(marker):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "event_type", "value"],
        )
        ds.write_csv(cdir)
        open(marker, "w").write("ok")
    c = ray.data.read_csv(
        [os.path.join(cdir, f) for f in sorted(os.listdir(cdir)) if f.endswith(".csv")]
    )

    def agg(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = (
            pa.table({"event_type": t["event_type"], "cents": cents})
            .group_by(["event_type"])
            .aggregate([("cents", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["event_type", "pc", "pn"]).replace_schema_metadata(
            None
        )

    part = c.map_batches(agg, batch_format="pyarrow")
    out = part.groupby("event_type").aggregate(
        Sum("pc", alias_name="c"), Sum("pn", alias_name="n_events")
    )

    def final(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "event_type": t["event_type"],
                "total_value": pc.divide(pc.cast(t["c"], pa.float64()), 100.0),
                "n_events": pc.cast(t["n_events"], pa.int64()),
            }
        )

    return out.map_batches(final, batch_format="pyarrow")


ORACLES25["events_csv_ingest"] = """
SELECT event_type,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type"""


# ---------------------------------------------------------------------------
# events_schema_drift_union — heterogeneous file generations, aligned by name
# ---------------------------------------------------------------------------


def q_events_schema_drift_union(sf_dir: str):
    """Schema-drift-tolerant ingest: generation 1 files lack a column that
    generation 2 added (here: gen-1 = events without `props`, gen-2 = full
    schema), and the union aligns columns BY NAME, null-filling the absent
    ones — the 'old files keep working after a schema migration' contract
    every long-lived pipeline needs. The two generations materialize once
    under /tmp from disjoint halves of the stream (user_id parity), then
    re-ingest with separate typed reads + a map_batches null-fill align.
    Output: per-type row count and count of rows that CAME from the
    props-less generation (props IS NULL)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    gdir = f"/tmp/graft_drift_{tag}"
    marker = os.path.join(gdir, "_DONE")
    def parity_filter(par: int, drop_props: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t["user_id"].to_numpy(zero_copy_only=False) % 2 == par
            out = t.filter(pa.array(m))
            if drop_props:
                out = out.drop_columns(["props"])
            return out.replace_schema_metadata(None)

        return f

    if not os.path.exists(marker):
        os.makedirs(gdir, exist_ok=True)
        # two independent reads — never branch one lazy Dataset (CLAUDE.md rule)
        ray.data.read_parquet(f"{sf_dir}/events.parquet").map_batches(
            parity_filter(0, True), batch_format="pyarrow"
        ).write_parquet(f"{gdir}/gen1")
        ray.data.read_parquet(f"{sf_dir}/events.parquet").map_batches(
            parity_filter(1, False), batch_format="pyarrow"
        ).write_parquet(f"{gdir}/gen2")
        open(marker, "w").write("ok")

    gen1 = ray.data.read_parquet(f"{gdir}/gen1")
    gen2 = ray.data.read_parquet(f"{gdir}/gen2")

    def align_gen1(t: pa.Table) -> pa.Table:
        # gen-1 predates the props column: null-fill it so both generations
        # share one schema (align-by-name union)
        return t.append_column(
            "props", pa.nulls(t.num_rows, pa.string())
        ).select(["event_id", "ts", "user_id", "event_type", "value", "props"])

    def project_gen2(t: pa.Table) -> pa.Table:
        return t.select(
            ["event_id", "ts", "user_id", "event_type", "value", "props"]
        )

    unified = gen1.map_batches(align_gen1, batch_format="pyarrow").union(
        gen2.map_batches(project_gen2, batch_format="pyarrow")
    )

    def agg(t: pa.Table) -> pa.Table:
        legacy = pc.cast(pc.is_null(t["props"]), pa.int64())
        g = (
            pa.table({"event_type": t["event_type"], "legacy": legacy})
            .group_by(["event_type"])
            .aggregate([("legacy", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["event_type", "pl", "pn"]).replace_schema_metadata(
            None
        )

    out = (
        unified.map_batches(agg, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("pl", alias_name="legacy_rows"), Sum("pn", alias_name="n"))
    )
    return out


ORACLES25["events_schema_drift_union"] = """
SELECT event_type,
       CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) AS legacy_rows,
       count(*) AS n
FROM events GROUP BY event_type"""


QUERIES25 = {
    "events_csv_ingest": q_events_csv_ingest,
    "events_schema_drift_union": q_events_schema_drift_union,
}
