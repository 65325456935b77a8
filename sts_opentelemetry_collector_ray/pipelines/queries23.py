"""Driver-contract queries, wave 23 — BPE-style character-pair counting (the
byte-pair-encoding training inner loop over the word stream) and chi-square
independence cell contributions (statistical drift profiling over a
contingency table). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES23: dict[str, str] = {}


# ---------------------------------------------------------------------------
# docs_bpe_pairs — corpus-wide within-word character-pair counts (BPE step)
# ---------------------------------------------------------------------------


def q_docs_bpe_pairs(sf_dir: str):
    """One BPE training step's statistics: count adjacent character pairs
    inside every [a-z]+ word corpus-wide and rank the merge candidates. Fully
    vectorized off the Arrow string buffers (functions/hashing.py's zero-copy
    view): pair codes pack into uint16 (hi<<8|lo), one np.unique per batch
    counts them, and only the ≤26² distinct pairs decode to strings — the
    exchange carries a few hundred (pair, count) partials per batch no matter
    the corpus size."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..functions.hashing import _arrow_string_bytes

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def local_pairs(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t["text"], "")), r"\s+"
        ).combine_chunks()
        flat = toks.flatten()
        words = flat.filter(pc.match_substring_regex(flat, r"^[a-z]+$"))
        empty = pa.table(
            {"pair": pa.array([], pa.string()), "pn": pa.array([], pa.int64())}
        )
        if len(words) == 0:
            return empty
        data, starts, lens = _arrow_string_bytes(words)
        m = np.maximum(lens - 1, 0)  # pair positions per word
        total = int(m.sum())
        if total == 0:
            return empty
        cm = np.concatenate([[0], np.cumsum(m)])
        intra = np.arange(total, dtype=np.int64) - np.repeat(cm[:-1], m)
        i = np.repeat(starts, m) + intra
        codes = data[i].astype(np.uint16) << 8 | data[i + 1].astype(np.uint16)
        u, cnt = np.unique(codes, return_counts=True)
        pairs = (
            np.stack([(u >> 8).astype(np.uint8), (u & 0xFF).astype(np.uint8)])
            .T.tobytes()
            .decode("ascii")
        )
        return pa.table(
            {
                "pair": pa.array(
                    [pairs[2 * j : 2 * j + 2] for j in range(len(u))], pa.string()
                ),
                "pn": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = ds.map_batches(local_pairs, batch_format="pyarrow")
    agg = partials.groupby("pair").aggregate(Sum("pn", alias_name="n"))
    return agg.sort(["n", "pair"], descending=[True, False]).limit(20)


ORACLES23["docs_bpe_pairs"] = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            x -> regexp_matches(x, '^[a-z]+$'))) AS w
  FROM documents
), pairs AS (
  SELECT substring(w, i, 2) AS pair
  FROM toks, UNNEST(range(1, length(w)::BIGINT)) t(i)
)
SELECT pair, count(*) AS n
FROM pairs GROUP BY 1 ORDER BY n DESC, pair LIMIT 20"""


# ---------------------------------------------------------------------------
# events_chisq_cells — chi-square contingency cell contributions
# ---------------------------------------------------------------------------


def q_events_chisq_cells(sf_dir: str):
    """Chi-square independence profile of event_type × day-of-week: observed
    counts reduce exactly (int64), then expected = row·col/N and the cell
    contribution (o-e)²/e derive per cell with float ops mirroring the SQL
    expression order — per-cell output, no cross-cell float sum, so the
    result hashes. Contingency table is |types|×7 — the aggregate and the
    driver residue are constant-size at any corpus scale. Dow convention
    matches analytics.py::pivot_dow_counts ((epoch_days+4)%7 = DuckDB
    dayofweek)."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        days = ts.astype("datetime64[D]").astype(np.int64)
        dow = ((days + 4) % 7).astype(np.int64)
        g = (
            pa.table({"event_type": t["event_type"], "dow": pa.array(dow)})
            .group_by(["event_type", "dow"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["event_type", "dow", "pn"]).replace_schema_metadata(
            None
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("pn", alias_name="observed"))
        .to_pandas()
    )
    n = cells["observed"].sum()
    row = cells.groupby("event_type")["observed"].transform("sum").to_numpy()
    col = cells.groupby("dow")["observed"].transform("sum").to_numpy()
    o = cells["observed"].to_numpy().astype(np.float64)
    e = row.astype(np.float64) * col.astype(np.float64) / np.float64(n)
    contrib = (o - e) * (o - e) / e
    return pd.DataFrame(
        {
            "event_type": cells["event_type"],
            "dow": cells["dow"].astype(np.int64),
            "observed": cells["observed"].astype(np.int64),
            "expected": e,
            "contrib": contrib,
        }
    )


ORACLES23["events_chisq_cells"] = """
WITH e AS (
  SELECT event_type, dayofweek(ts) AS dow FROM events),
c AS (SELECT event_type, CAST(dow AS BIGINT) AS dow, count(*) AS observed
      FROM e GROUP BY 1, 2),
t AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM c),
r AS (SELECT event_type, CAST(sum(observed) AS BIGINT) AS rt FROM c GROUP BY 1),
k AS (SELECT dow, CAST(sum(observed) AS BIGINT) AS ct FROM c GROUP BY 1)
SELECT c.event_type, c.dow, c.observed,
       CAST(r.rt AS DOUBLE) * CAST(k.ct AS DOUBLE) / CAST(t.n AS DOUBLE)
         AS expected,
       (CAST(c.observed AS DOUBLE) -
        CAST(r.rt AS DOUBLE) * CAST(k.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
       * (CAST(c.observed AS DOUBLE) -
          CAST(r.rt AS DOUBLE) * CAST(k.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
       / (CAST(r.rt AS DOUBLE) * CAST(k.ct AS DOUBLE) / CAST(t.n AS DOUBLE))
         AS contrib
FROM c
JOIN r USING (event_type)
JOIN k USING (dow)
CROSS JOIN t"""


QUERIES23 = {
    "docs_bpe_pairs": q_docs_bpe_pairs,
    "events_chisq_cells": q_events_chisq_cells,
}
