"""Driver-contract queries, wave 28 — commutative table checksums (the
order-independent fingerprint replication/verification jobs compare) and
routed output size planning (per-sink byte estimates before the write). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries9 import _fnv64_sql

ORACLES28: dict[str, str] = {}


# ---------------------------------------------------------------------------
# table_checksums — order-independent content fingerprint per table
# ---------------------------------------------------------------------------

_CK_TABLES = (
    ("events", ["event_id", "event_type", "user_id"]),
    ("documents", ["doc_id", "lang"]),
)


def q_table_checksums(sf_dir: str):
    """Commutative table checksum: fnv64 of each row's canonical projection,
    summed modulo 2^64 — order- and partitioning-independent, so two
    replicas (or a pipeline's input and its lossless re-layout) compare with
    one BIGINT per table. Per-batch partials are a single (count, wrapped
    sum) pair; the driver folds |batches| rows. The uint64 wrap-around is the
    modulus — no big-int path needed on the Ray side."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64_arrow

    rows = []
    for name, cols in _CK_TABLES:
        ds = ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=cols)

        def partial(t: pa.Table, cols=cols) -> pa.Table:
            parts = [pc.cast(t[c], pa.string()) for c in cols]
            canon = (
                parts[0]
                if len(parts) == 1
                else pc.binary_join_element_wise(*parts, "|")
            )
            h = fnv1a64_arrow(canon.combine_chunks())
            with np.errstate(over="ignore"):
                s = h.sum(dtype=np.uint64)  # wraps mod 2^64 by construction
            signed = np.array([s], dtype=np.uint64).view(np.int64)[0]
            return pa.table(
                {
                    "pn": pa.array([t.num_rows], pa.int64()),
                    "ps": pa.array([signed], pa.int64()),
                }
            )

        part = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        n = int(part["pn"].sum())
        with np.errstate(over="ignore"):
            total = part["ps"].to_numpy().view(np.uint64).sum(dtype=np.uint64)
        signed = int(np.array([total], dtype=np.uint64).view(np.int64)[0])
        rows.append((name, n, signed))
    return pd.DataFrame(
        {
            "table_name": [r[0] for r in rows],
            "n_rows": np.array([r[1] for r in rows], dtype=np.int64),
            "checksum": np.array([r[2] for r in rows], dtype=np.int64),
        }
    )


def _checksum_sql(table: str, cols: list[str]) -> str:
    canon = " || '|' || ".join(
        f"CAST({c} AS VARCHAR)" if c not in ("event_type", "lang") else c
        for c in cols
    )
    return f"""(
  WITH h AS (SELECT {_fnv64_sql(canon)} AS hv FROM {table}),
  s AS (SELECT count(*) AS n_rows, SUM(hv) % 18446744073709551616 AS m FROM h)
  SELECT '{table}' AS table_name, CAST(n_rows AS BIGINT) AS n_rows,
         CAST(CASE WHEN m < 9223372036854775808 THEN m
                   ELSE m - 18446744073709551616 END AS BIGINT) AS checksum
  FROM s)"""


ORACLES28["table_checksums"] = " UNION ALL ".join(
    _checksum_sql(t, c) for t, c in _CK_TABLES
)


# ---------------------------------------------------------------------------
# routed_size_plan — per-sink byte accounting before the write
# ---------------------------------------------------------------------------


def q_routed_size_plan(sf_dir: str):
    """Write planning over the flagship routed stream: per sink the row count
    and total payload text bytes — the estimate a writer uses to pick file
    counts / row-group sizes before consuming the stream (the
    RoutedParquetDatasink's planning counterpart). Per-batch Arrow group_by
    combiner → |sinks|-row aggregate; metrics/relation sinks carry NULL text
    by contract and count zero bytes."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..sources import derive_transcripts_from_events
    from .flagship import routed_dataset

    ds = routed_dataset(
        derive_transcripts_from_events(sf_dir),
        dedup=False,
        enrich_concurrency=2,
        route_concurrency=None,
    )

    def partial(t: pa.Table) -> pa.Table:
        nbytes = pc.binary_length(pc.fill_null(t["text"], "")).cast(pa.int64())
        g = (
            pa.table({"sink": t["sink"], "b": nbytes})
            .group_by(["sink"])
            .aggregate([("b", "sum"), ([], "count_all")])
        )
        return g.rename_columns(["sink", "pb", "pn"]).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("sink")
        .aggregate(Sum("pb", alias_name="text_bytes"), Sum("pn", alias_name="n_rows"))
    )


def _routed_size_oracle() -> str:
    from .queries import _ROUTES_SQL

    return (
        _ROUTES_SQL
        + """SELECT sink,
       CAST(SUM(strlen(coalesce(text, ''))) AS BIGINT) AS text_bytes,
       count(*) AS n_rows
FROM routes GROUP BY sink"""
    )


ORACLES28["routed_size_plan"] = _routed_size_oracle()


QUERIES28 = {
    "table_checksums": q_table_checksums,
    "routed_size_plan": q_routed_size_plan,
}
