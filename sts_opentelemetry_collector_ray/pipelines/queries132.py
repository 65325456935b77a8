"""Driver-contract queries, wave 132 — Pearson correlation between quantity
and extended price per linestatus (completing the correlation trio alongside
wave-130 Spearman and wave-131 Kendall: raw-value linear association with
exact integer moments), and per-conversation first-response latency (the turn
gap between the first user turn and the first assistant turn after it — the
responsiveness census of an agent-transcript corpus). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES132: dict[str, str] = {}


# ---------------------------------------------------------------------------
# lineitem_pearson — exact-moment Pearson r per linestatus
# ---------------------------------------------------------------------------


def q_lineitem_pearson(sf_dir: str):
    """Pearson r over (quantity, extendedprice cents) with EXACT integer
    moment sums: per-batch int64 partial sums (y^2 <= 1e14 per row keeps a
    multi-thousand-row block far inside int64), Python-bigint fold on the
    driver, HUGEINT in DuckDB, and ONE identical double finish:
    floor((n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2)) * 1e6
    + 0.5).

    Scale shape: per-batch (linestatus, n, sx, sy, sxx, syy, sxy) combiner
    partials — |statuses| rows per block — fold on the driver; no shuffle."""

    def partial(t: pa.Table) -> pd.DataFrame:
        x = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5).astype(
            np.int64
        )
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        ls = np.asarray(t["l_linestatus"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "ls": ls,
                "n": 1,
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        g = df.groupby("ls", sort=False).sum().reset_index()
        return g.astype(
            {c: np.int64 for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_linestatus", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: <= |statuses| rows per block
    )
    empty = pd.DataFrame(
        {
            "l_linestatus": pd.Series([], dtype=object),
            "n_rows": pd.Series([], dtype=np.int64),
            "pearson_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    rows: list[tuple[str, int, int]] = []
    for ls, g in part.groupby("ls", sort=True):
        # Python bigints: the folded moments exceed int64 at scale
        n = int(g["n"].sum())
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxx = sum(int(v) for v in g["sxx"])
        syy = sum(int(v) for v in g["syy"])
        sxy = sum(int(v) for v in g["sxy"])
        dxx = n * sxx - sx * sx
        dyy = n * syy - sy * sy
        if dxx <= 0 or dyy <= 0:
            continue  # constant column: correlation undefined
        num = n * sxy - sx * sy
        den = math.sqrt(float(dxx)) * math.sqrt(float(dyy))
        rows.append((str(ls), n, int(math.floor(float(num) / den * 1e6 + 0.5))))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["l_linestatus", "n_rows", "pearson_micro"])
    return out.astype({"n_rows": np.int64, "pearson_micro": np.int64})


ORACLES132["lineitem_pearson"] = """
WITH li AS (
  SELECT l_linestatus AS ls,
         CAST(floor(l_quantity + 0.5) AS HUGEINT) AS x,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT) AS y
  FROM lineitem
),
s AS (
  SELECT ls, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM li GROUP BY 1
)
SELECT ls AS l_linestatus,
       CAST(n AS BIGINT) AS n_rows,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS pearson_micro
FROM s
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"""


# ---------------------------------------------------------------------------
# conv_first_response — first user→assistant turn latency per conversation
# ---------------------------------------------------------------------------


def q_conv_first_response(sf_dir: str):
    """Responsiveness census: per conversation, the first user turn, the first
    assistant turn strictly after it, and the wall-clock gap between them in
    exact integer microseconds (ts is nondecreasing along turn_idx by the
    derivation's ordering, so the gap is >= 0). Conversations lacking either
    turn are absent on both engines.

    Scale shape: turns co-locate per conversation through ONE conv-bucket
    exchange; per-bucket lexsort + two np.minimum.reduceat passes (first user
    position, then first assistant position after it) emit one row per
    qualifying conversation — no per-group Python."""
    from ..sources.transcripts import derive_transcripts_from_events
    from .queries125 import _conv_bucket_partial

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = _conv_bucket_partial(t, ("role",))
        df["ts_us"] = (
            t["ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view("i8")
        )
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv", "turn"], kind="mergesort")
        conv = g["conv"].to_numpy(object)
        role = g["role"].to_numpy(object)
        turn = g["turn"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        n = len(g)
        empty = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "user_turn": pd.Series([], dtype=np.int64),
                "assistant_turn": pd.Series([], dtype=np.int64),
                "latency_us": pd.Series([], dtype=np.int64),
            }
        )
        if n == 0:
            return empty
        new = np.r_[True, conv[1:] != conv[:-1]]
        starts = np.flatnonzero(new)
        code = np.cumsum(new) - 1
        idx = np.arange(n)
        pos_user = np.where(role == "user", idx, n)
        fu = np.minimum.reduceat(pos_user, starts)
        fu_row = fu[code]
        pos_asst = np.where((role == "assistant") & (idx > fu_row), idx, n)
        fa = np.minimum.reduceat(pos_asst, starts)
        ok = (fu < n) & (fa < n)
        if not ok.any():
            return empty
        fu, fa = fu[ok], fa[ok]
        return pd.DataFrame(
            {
                "conv_id": conv[fu],
                "user_turn": turn[fu],
                "assistant_turn": turn[fa],
                "latency_us": ts[fa] - ts[fu],
            }
        ).astype(
            {
                "user_turn": np.int64,
                "assistant_turn": np.int64,
                "latency_us": np.int64,
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )
    return out


def _first_response_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
u AS (
  SELECT conv_id, min(turn_idx) AS ut
  FROM transcripts WHERE role = 'user' GROUP BY 1
),
a AS (
  SELECT t.conv_id, min(t.turn_idx) AS at
  FROM transcripts t JOIN u ON t.conv_id = u.conv_id AND t.turn_idx > u.ut
  WHERE t.role = 'assistant' GROUP BY 1
)
SELECT u.conv_id,
       CAST(u.ut AS BIGINT) AS user_turn,
       CAST(a.at AS BIGINT) AS assistant_turn,
       CAST(epoch_us(ta.ts) - epoch_us(tu.ts) AS BIGINT) AS latency_us
FROM u
JOIN a ON a.conv_id = u.conv_id
JOIN transcripts tu ON tu.conv_id = u.conv_id AND tu.turn_idx = u.ut
JOIN transcripts ta ON ta.conv_id = a.conv_id AND ta.turn_idx = a.at"""
    )


ORACLES132["conv_first_response"] = _first_response_oracle()


QUERIES132 = {
    "lineitem_pearson": q_lineitem_pearson,
    "conv_first_response": q_conv_first_response,
}
