"""Driver-contract queries, wave 42 — Merkle range checksums (the incremental
table-integrity tree: localize WHICH key range diverged between replicas) and
CUSUM changepoint localization (where a metric's mean shifted, exact integer
form). Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .queries9 import _fnv64_sql

ORACLES42: dict[str, str] = {}

_MK_RANGES = 16
_CP_DAY_BUCKETS = 64


def _signed(u: np.ndarray | np.uint64) -> np.int64:
    return np.asarray(u, dtype=np.uint64).view(np.int64)


# ---------------------------------------------------------------------------
# events_merkle_ranges — per-key-range checksums + root
# ---------------------------------------------------------------------------


def q_events_merkle_ranges(sf_dir: str):
    """Merkle range checksums (the replication-verification tree: a flat
    commutative checksum says replicas differ, the range tree says WHERE —
    re-sync only the diverged range). Rows hash to 16 event_id ranges; each
    range's checksum is the order-independent wrapped FNV-64 sum
    (table_checksums' contract); the root hashes the range checksums in range
    order. Exchange: one (range, count, sum) partial row per range per block.
    Output rows: 16 ranges + the root (range_id = -1)."""
    import pyarrow.compute as pc

    from ..functions.hashing import fnv1a64, fnv1a64_arrow

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
        canon = pc.binary_join_element_wise(
            pc.cast(t["event_id"], pa.string()),
            t["event_type"],
            pc.cast(pa.array(cents), pa.string()),
            "|",
        )
        h = fnv1a64_arrow(
            canon.combine_chunks() if isinstance(canon, pa.ChunkedArray) else canon
        )
        rng = (eid * _MK_RANGES // (max_id + 1)).astype(np.int64)
        df = pd.DataFrame({"rng": rng, "h": h})
        with np.errstate(over="ignore"):
            agg = df.groupby("rng", sort=False).agg(
                pn=("h", "size"), ps=("h", lambda s: s.to_numpy().sum(dtype=np.uint64))
            )
        return pa.table(
            {
                "rng": pa.array(agg.index.to_numpy().astype(np.int64)),
                "pn": pa.array(agg["pn"].to_numpy().astype(np.int64)),
                "ps": pa.array(
                    _signed(agg["ps"].to_numpy().astype(np.uint64))
                ),
            }
        )

    parts = (
        ray.data.read_parquet(path, columns=["event_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ ranges rows per block
    )
    rows = []
    for rng, g in parts.groupby("rng"):
        with np.errstate(over="ignore"):
            s = g["ps"].to_numpy().view(np.uint64).sum(dtype=np.uint64)
        rows.append((int(rng), int(g["pn"].sum()), int(_signed(s))))
    rows.sort()
    root_input = "|".join(str(r[2]) for r in rows)
    root = int(_signed(np.uint64(fnv1a64(root_input))))
    rows.append((-1, int(parts["pn"].sum()), root))
    return pd.DataFrame(
        {
            "range_id": np.array([r[0] for r in rows], np.int64),
            "n_rows": np.array([r[1] for r in rows], np.int64),
            "checksum": np.array([r[2] for r in rows], np.int64),
        }
    )


def _merkle_oracle() -> str:
    canon = (
        "CAST(event_id AS VARCHAR) || '|' || event_type || '|' || "
        "CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)"
    )
    return f"""
WITH mx AS (SELECT max(event_id) AS m FROM events),
h AS (
  SELECT event_id * {_MK_RANGES} // (mx.m + 1) AS range_id,
         {_fnv64_sql(canon)} AS hv
  FROM events CROSS JOIN mx
),
ranges AS (
  SELECT CAST(range_id AS BIGINT) AS range_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         SUM(hv) % 18446744073709551616 AS m
  FROM h GROUP BY 1
),
signed AS (
  SELECT range_id, n_rows,
         CAST(CASE WHEN m < 9223372036854775808 THEN m
                   ELSE m - 18446744073709551616 END AS BIGINT) AS checksum
  FROM ranges
),
rootin AS (
  SELECT string_agg(CAST(checksum AS VARCHAR), '|' ORDER BY range_id) AS s,
         CAST(SUM(n_rows) AS BIGINT) AS total
  FROM signed
),
root AS (
  SELECT CAST(-1 AS BIGINT) AS range_id, total AS n_rows,
         CAST(CASE WHEN ({_fnv64_sql("s")}) % 18446744073709551616
                        < 9223372036854775808
                   THEN ({_fnv64_sql("s")}) % 18446744073709551616
                   ELSE ({_fnv64_sql("s")}) % 18446744073709551616
                        - 18446744073709551616 END AS BIGINT) AS checksum
  FROM rootin
)
SELECT * FROM signed UNION ALL SELECT * FROM root"""


ORACLES42["events_merkle_ranges"] = _merkle_oracle()


# ---------------------------------------------------------------------------
# events_cusum_changepoint — exact integer CUSUM mean-shift localization
# ---------------------------------------------------------------------------


def q_events_cusum_changepoint(sf_dir: str):
    """CUSUM changepoint localization (Page 1954): for each event_type the
    position t* maximizing |Σ_{i≤t}(x_i − μ)| — where the running mean
    deviates most, i.e. the most likely mean-shift point. Multiplying through
    by n keeps everything integer: S_t = Σ_{i≤t}(n·cents_i − total).

    Scale shape (the chunk_token_stream offset idiom): per (type, day) bucket
    ONE vectorized scan emits (term_sum, prefix-max/min with earliest local
    index, count); the driver exclusive-scans the bounded (type, day) grid
    into offsets and evaluates only 2 candidates per day — for a fixed offset
    the max of |offset + prefix| is at the prefix max or min. No single task
    ever holds a whole series. Output: event_type, n, t_star, s_abs."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/events.parquet"

    def stats_partial(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "event_type": t["event_type"],
                "cents": pa.array(
                    np.floor(
                        t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                    ).astype(np.int64)
                ),
            }
        )
        return tt.group_by("event_type").aggregate(
            [("cents", "sum"), ([], "count_all")]
        )

    stats = (
        ray.data.read_parquet(path, columns=["event_type", "value"])
        .map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ types rows per block
        .groupby("event_type")
        .agg(total=("cents_sum", "sum"), n=("count_all", "sum"))
    )
    n_map = stats["n"].astype(np.int64)
    total_map = stats["total"].astype(np.int64)
    types_sorted = np.array(sorted(n_map.index), dtype=object)
    n_arr = n_map.loc[types_sorted].to_numpy()
    total_arr = total_map.loc[types_sorted].to_numpy()

    def prep(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = tu // 86_400_000_000
        return pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "tu": pa.array(tu),
                "day": pa.array(day.astype(np.int64)),
                "cents": pa.array(
                    np.floor(
                        t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
                    ).astype(np.int64)
                ),
                "_b": pa.array((day % _CP_DAY_BUCKETS).astype(np.int32)),
            }
        )

    def day_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["event_type", "day", "tu", "event_id"], kind="mergesort")
        et = d["event_type"].to_numpy(dtype=object)
        day = d["day"].to_numpy()
        c = d["cents"].to_numpy()
        ti = np.searchsorted(types_sorted.astype(str), et.astype(str))
        term = n_arr[ti] * c - total_arr[ti]
        key_change = np.concatenate(
            [[True], (et[1:] != et[:-1]) | (day[1:] != day[:-1])]
        )
        starts = np.flatnonzero(key_change)
        grp = np.cumsum(key_change) - 1
        # per-(type,day) local prefix sums
        cs = np.cumsum(term)
        base = np.concatenate([[0], cs[starts[1:] - 1]]) if len(starts) > 1 else np.array([0])
        p = cs - base[grp]
        counts = np.diff(np.concatenate([starts, [len(d)]]))
        rows = []
        for gi, st in enumerate(starts):
            en = st + counts[gi]
            seg = p[st:en]
            imax = int(np.argmax(seg))
            imin = int(np.argmin(seg))
            rows.append(
                (
                    et[st],
                    int(day[st]),
                    int(seg[-1]),
                    int(counts[gi]),
                    int(seg[imax]),
                    imax,
                    int(seg[imin]),
                    imin,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "event_type", "day", "term_sum", "cnt",
                "pmax", "imax", "pmin", "imin",
            ],
        )

    days = (
        ray.data.read_parquet(
            path, columns=["event_id", "ts", "event_type", "value"]
        )
        .map_batches(prep, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: day_partial(g.drop(columns=["_b"])), batch_format="pandas"
        )
        .to_pandas()  # bounded: one row per (type, day)
        .sort_values(["event_type", "day"], kind="mergesort")
        .reset_index(drop=True)
    )
    out = []
    for et, g in days.groupby("event_type", sort=True):
        ts_ = g["term_sum"].to_numpy()
        offs = np.concatenate([[0], np.cumsum(ts_)[:-1]])
        cnts = g["cnt"].to_numpy()
        prior = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        best = None  # (abs desc, t asc)
        for i in range(len(g)):
            for pval, idx in (
                (int(g["pmax"].iloc[i]), int(g["imax"].iloc[i])),
                (int(g["pmin"].iloc[i]), int(g["imin"].iloc[i])),
            ):
                s = int(offs[i]) + pval
                t_global = int(prior[i]) + idx + 1
                cand = (-abs(s), t_global)
                if best is None or cand < best:
                    best = cand
                    best_abs = abs(s)
                    best_t = t_global
        out.append((et, int(n_map.loc[et]), best_t, best_abs))
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in out],
            "n": np.array([r[1] for r in out], np.int64),
            "t_star": np.array([r[2] for r in out], np.int64),
            "s_abs": np.array([r[3] for r in out], np.int64),
        }
    )


ORACLES42["events_cusum_changepoint"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) AS tu, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
st AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS total
  FROM c GROUP BY 1
),
s AS (
  SELECT c.event_type, st.n,
         row_number() OVER w AS t,
         SUM(st.n * c.cents - st.total) OVER w AS sct
  FROM c JOIN st USING (event_type)
  WINDOW w AS (PARTITION BY c.event_type ORDER BY c.tu, c.event_id)
),
pick AS (
  SELECT event_type, n, t, abs(sct) AS a,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(sct) DESC, t ASC) AS r
  FROM s
)
SELECT event_type, n, CAST(t AS BIGINT) AS t_star, CAST(a AS BIGINT) AS s_abs
FROM pick WHERE r = 1"""


QUERIES42 = {
    "events_merkle_ranges": q_events_merkle_ranges,
    "events_cusum_changepoint": q_events_cusum_changepoint,
}
