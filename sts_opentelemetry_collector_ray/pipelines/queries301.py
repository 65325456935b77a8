"""Driver-contract queries, wave 301 — Poisson-rate score confidence
intervals per event type (closed-form Wilson-style interval for counts
over exposure) and conversational length reciprocity (Pearson
correlation between a user turn's length and the immediately following
assistant turn's length). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES301: dict[str, str] = {}

_Z95 = 1.959963984540054
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# events_rate_score_ci — Poisson score intervals per type
# ---------------------------------------------------------------------------


def q_events_rate_score_ci(sf_dir: str):
    """Daily-rate score CI per event type: with x events over T days
    (the shared observation span), the score interval is
    (x + z^2/2 +- z sqrt(x + z^2/4)) / T. Counts and the span are exact
    integers; the interval algebra is mirrored float. Per type:
    event_type, n, n_days, rate_micro, lo_micro, hi_micro."""

    def partial(t: pa.Table) -> pd.DataFrame:
        us = pa.compute.cast(t["ts"], pa.int64()).to_numpy()
        g = pd.Series(
            t["event_type"].to_numpy(zero_copy_only=False)
        ).value_counts()
        out = pd.DataFrame(
            {"et": g.index.to_numpy(object), "c": g.to_numpy(np.int64)}
        )
        out["mn"] = np.int64(us.min() // _DAY_US)
        out["mx"] = np.int64(us.max() // _DAY_US)
        return out

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "n", "n_days", "rate_micro", "lo_micro", "hi_micro"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if parts.empty:
        return empty
    t_days = int(parts["mx"].max()) - int(parts["mn"].min()) + 1
    m = parts.groupby("et")["c"].sum().sort_index()
    z = _Z95
    rows = []
    for et, x in m.items():
        x = float(int(x))
        center = x + z * z / 2.0
        half = z * float(np.sqrt(x + z * z / 4.0))
        rows.append(
            (
                et, np.int64(int(x)), np.int64(t_days),
                np.int64(np.floor(x / float(t_days) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(
                    (center - half) / float(t_days) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(
                    (center + half) / float(t_days) * 1_000_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES301["events_rate_score_ci"] = f"""
WITH span AS (
  SELECT CAST(max(epoch_us(ts)) // {_DAY_US}
              - min(epoch_us(ts)) // {_DAY_US} + 1 AS BIGINT) AS t
  FROM events
),
m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
)
SELECT m.event_type, m.x AS n, span.t AS n_days,
       CAST(floor(CAST(m.x AS DOUBLE) / CAST(span.t AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rate_micro,
       CAST(floor((CAST(m.x AS DOUBLE) + {_Z95} * {_Z95} / 2.0
                   - {_Z95} * sqrt(CAST(m.x AS DOUBLE)
                                   + {_Z95} * {_Z95} / 4.0))
                  / CAST(span.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS lo_micro,
       CAST(floor((CAST(m.x AS DOUBLE) + {_Z95} * {_Z95} / 2.0
                   + {_Z95} * sqrt(CAST(m.x AS DOUBLE)
                                   + {_Z95} * {_Z95} / 4.0))
                  / CAST(span.t AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
         AS hi_micro
FROM m, span
ORDER BY m.event_type"""


# ---------------------------------------------------------------------------
# conv_length_reciprocity — user/assistant adjacent-length correlation
# ---------------------------------------------------------------------------


def q_conv_length_reciprocity(sf_dir: str):
    """Length accommodation: over adjacent turn pairs (user at
    turn_idx, assistant at turn_idx + 1, same conversation), the
    Pearson correlation between the user's text length and the
    assistant's — do long prompts get long answers? Character counts
    and moments are EXACT integers; one float composition. One row:
    n_pairs, sx, sy, r_micro.

    Scale shape: ONE conv-bucket exchange; per-bucket vectorized sort +
    shifted masks emit (n, Sx, Sy, Sxy, Sxx, Syy) scalars."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events
    import pyarrow.compute as pc

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv": np.asarray(t["conv_id"].to_numpy(zero_copy_only=False)),
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "role": np.asarray(t["role"].to_numpy(zero_copy_only=False)),
                "ln_": pc.utf8_length(t["text"]).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "n": [np.int64(0)], "sx": [np.int64(0)], "sy": [np.int64(0)],
                "sxy": [np.int64(0)], "sxx": [np.int64(0)],
                "syy": [np.int64(0)],
            }
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["conv", "turn"], kind="stable")
        conv = g["conv"].to_numpy(object)
        turn = g["turn"].to_numpy(np.int64)
        role = g["role"].to_numpy(object)
        ln = g["ln_"].to_numpy(np.int64)
        pair = (
            (conv[1:] == conv[:-1])
            & (turn[1:] == turn[:-1] + 1)
            & (role[:-1] == "user")
            & (role[1:] == "assistant")
        )
        x = ln[:-1][pair].astype(object)
        y = ln[1:][pair].astype(object)
        if len(x) == 0:
            return zero
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))],
                "sx": [np.int64(int(x.sum()))],
                "sy": [np.int64(int(y.sum()))],
                "sxy": [np.int64(int((x * y).sum()))],
                "sxx": [np.int64(int((x * x).sum()))],
                "syy": [np.int64(int((y * y).sum()))],
            }
        )

    m = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["n_pairs", "sx", "sy", "r_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = int(m["n"])
    if n < 2:
        return empty
    sx, sy = int(m["sx"]), int(m["sy"])
    sxy, sxx, syy = int(m["sxy"]), int(m["sxx"]), int(m["syy"])
    den = float(np.sqrt(float(n * sxx - sx * sx))) * float(
        np.sqrt(float(n * syy - sy * sy))
    )
    if den == 0.0:
        return empty
    r = float(n * sxy - sx * sy) / den
    return pd.DataFrame(
        [
            (
                np.int64(n), np.int64(sx), np.int64(sy),
                np.int64(np.floor(r * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _reciprocity_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
seq AS (
  SELECT conv_id, turn_idx, role,
         CAST(length(text) AS BIGINT) AS ln_,
         lead(turn_idx) OVER w AS nt,
         lead(role) OVER w AS nrole,
         lead(CAST(length(text) AS BIGINT)) OVER w AS nln
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
pairs AS (
  SELECT ln_ AS x, nln AS y
  FROM seq
  WHERE role = 'user' AND nrole = 'assistant' AND nt = turn_idx + 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pairs
)
SELECT n AS n_pairs, sx, sy,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS r_micro
FROM m
WHERE n >= 2 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0"""
    )


def _register_dynamic() -> None:
    ORACLES301["conv_length_reciprocity"] = _reciprocity_oracle()


_register_dynamic()

QUERIES301 = {
    "events_rate_score_ci": q_events_rate_score_ci,
    "conv_length_reciprocity": q_conv_length_reciprocity,
}
