"""Driver-contract queries, wave 270 — vocabulary-introduction
attribution per conversation (who coins each distinct word first, the
complement of `conv_echo_rate`'s overlap view) and the seasonal
(per-weekday) Mann-Kendall trend test on the daily event series with
exact tie-corrected variance. Same contract as queries.py: column names
AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from sts_opentelemetry_collector_ray.pipelines.queries264 import (
    _daily_counts,
    _grid,
)

ORACLES270: dict[str, str] = {}

_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# conv_vocab_introduction — first-coiner role share per conversation
# ---------------------------------------------------------------------------


def q_conv_vocab_introduction(sf_dir: str):
    """Per conversation with BOTH user and assistant turns: each distinct
    word's first occurrence (min turn_idx — a turn has exactly one role,
    so the coiner is unambiguous) is attributed to that turn's role;
    report how much of the conversation's vocabulary each side coins.
    Per row: conv_id, n_words, n_user_first, n_assistant_first,
    user_share_micro (share of user+assistant-coined words). Tokenizer
    matches docs_vocab.

    Scale shape: per-batch distinct (conv, word, min-turn, role) partials
    ride ONE conv-bucket exchange; the per-bucket re-reduce is a
    vectorized idxmin fold (the conv_echo_rate idiom)."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), r"\s+"
        ).combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        conv = np.repeat(
            np.asarray(t["conv_id"].to_numpy(zero_copy_only=False)), lens
        )
        role = np.repeat(
            np.asarray(t["role"].to_numpy(zero_copy_only=False)), lens
        )
        turn = np.repeat(
            t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        keep = flat != ""
        df = pd.DataFrame(
            {
                "conv": conv[keep], "w": flat[keep],
                "turn": turn[keep], "role": role[keep],
            }
        )
        # local first occurrence per (conv, word)
        df = df.sort_values("turn", kind="stable").drop_duplicates(
            ["conv", "w"]
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_words": pd.Series([], dtype=np.int64),
                "n_user_first": pd.Series([], dtype=np.int64),
                "n_assistant_first": pd.Series([], dtype=np.int64),
                "user_share_micro": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty
        gg = g.sort_values("turn", kind="stable").drop_duplicates(
            ["conv", "w"]
        )
        has_roles = gg.groupby("conv")["role"].agg(
            lambda r: ("user" in set(r.values))
            and ("assistant" in set(r.values))
        )
        # qualifying = conversations where both sides speak (coin words)
        convs = has_roles[has_roles].index
        gg = gg[gg["conv"].isin(convs)]
        if len(gg) == 0:
            return empty
        tot = gg.groupby("conv").size()
        nu = gg[gg["role"] == "user"].groupby("conv").size()
        na = gg[gg["role"] == "assistant"].groupby("conv").size()
        nu_v = nu.reindex(tot.index).fillna(0).to_numpy(np.int64)
        na_v = na.reindex(tot.index).fillna(0).to_numpy(np.int64)
        both = nu_v + na_v
        share = np.floor(
            nu_v.astype(np.float64) / both.astype(np.float64) * 1_000_000.0
            + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "conv_id": tot.index.to_numpy(object),
                "n_words": tot.to_numpy(np.int64),
                "n_user_first": nu_v,
                "n_assistant_first": na_v,
                "user_share_micro": share,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


def _vocab_intro_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + r""",
tok AS (
  SELECT conv_id, turn_idx, role,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS w
  FROM transcripts
),
first_t AS (
  SELECT conv_id, w, min(turn_idx) AS ft
  FROM tok GROUP BY 1, 2
),
coin AS (
  SELECT DISTINCT f.conv_id, f.w, t.role
  FROM first_t f JOIN tok t
    ON t.conv_id = f.conv_id AND t.w = f.w AND t.turn_idx = f.ft
),
qual AS (
  SELECT conv_id FROM coin
  GROUP BY 1
  HAVING count(DISTINCT CASE WHEN role = 'user' THEN 1 END) > 0
     AND count(DISTINCT CASE WHEN role = 'assistant' THEN 1 END) > 0
),
agg AS (
  SELECT c.conv_id,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN c.role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_user_first,
         CAST(sum(CASE WHEN c.role = 'assistant' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_assistant_first
  FROM coin c JOIN qual USING (conv_id)
  GROUP BY 1
)
SELECT conv_id, n_words, n_user_first, n_assistant_first,
       CAST(floor(CAST(n_user_first AS DOUBLE)
                  / CAST(n_user_first + n_assistant_first AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS user_share_micro
FROM agg"""
    )


# ---------------------------------------------------------------------------
# events_seasonal_mann_kendall — per-weekday MK with tie correction
# ---------------------------------------------------------------------------


def q_events_seasonal_mann_kendall(sf_dir: str):
    """Seasonal Mann-Kendall (Hirsch-Slack) on the zero-filled daily
    series: within each epoch-weekday slot, S_w = sum over time-ordered
    pairs of sign(y_j - y_i) and the tie-corrected variance numerator
    var18_w = n_w(n_w-1)(2n_w+5) - sum_t t(t-1)(2t+5) — EXACT integers;
    the overall continuity-corrected z over S = sum S_w,
    Var = sum var18_w / 18 is the single float step. Per slot: slot,
    n_days, s_stat, var18, z_micro (z repeated per row)."""
    days = _daily_counts(sf_dir)
    cols = ["slot", "n_days", "s_stat", "var18", "z_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if days.empty:
        return empty
    y = _grid(days)
    n = len(y)
    if n < 14:
        return empty
    d0 = int(days.index.min())
    slots = (d0 + np.arange(n)) % 7
    rows = []
    s_tot = 0
    v18_tot = 0
    for w in range(7):
        yw = y[slots == w]
        nw = len(yw)
        if nw < 2:
            continue
        diff = yw[None, :] - yw[:, None]  # j (col) later than i (row)
        iu = np.triu_indices(nw, k=1)
        s_w = int(np.sign(diff[iu]).sum())
        _, tcnt = np.unique(yw, return_counts=True)
        ties = int((tcnt * (tcnt - 1) * (2 * tcnt + 5)).sum())
        v18 = nw * (nw - 1) * (2 * nw + 5) - ties
        rows.append((w, nw, s_w, v18))
        s_tot += s_w
        v18_tot += v18
    if not rows or v18_tot <= 0:
        return empty
    var = float(v18_tot) / 18.0
    if s_tot > 0:
        z = (float(s_tot) - 1.0) / float(np.sqrt(var))
    elif s_tot < 0:
        z = (float(s_tot) + 1.0) / float(np.sqrt(var))
    else:
        z = 0.0
    zm = np.int64(np.floor(z * 1_000_000.0 + 0.5))
    return pd.DataFrame(
        [
            (np.int64(w), np.int64(nw), np.int64(s), np.int64(v), zm)
            for w, nw, s, v in rows
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES270["events_seasonal_mann_kendall"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_DAY_US} AS dy, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
g AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM h),
grid AS (
  SELECT g.d0 + CAST(r.range AS BIGINT) AS dy,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 20000) r
  WHERE r.range <= g.d1 - g.d0
),
x AS (
  SELECT grid.t, grid.dy % 7 AS slot, CAST(coalesce(h.cnt, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (dy)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
s AS (
  SELECT a.slot, CAST(sum(sign(b.y - a.y)) AS BIGINT) AS s_stat
  FROM x a JOIN x b ON a.slot = b.slot AND a.t < b.t
  GROUP BY 1
),
szs AS (
  SELECT slot, CAST(count(*) AS BIGINT) AS n_days FROM x GROUP BY 1
),
tie AS (
  SELECT slot,
         CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tsum
  FROM (SELECT slot, y, CAST(count(*) AS BIGINT) AS c
        FROM x GROUP BY 1, 2)
  GROUP BY 1
),
per AS (
  SELECT szs.slot, szs.n_days, coalesce(s.s_stat, 0) AS s_stat,
         szs.n_days * (szs.n_days - 1) * (2 * szs.n_days + 5) - tie.tsum
           AS var18
  FROM szs JOIN tie USING (slot) LEFT JOIN s USING (slot)
  WHERE szs.n_days >= 2
),
tot AS (
  SELECT CAST(sum(s_stat) AS BIGINT) AS st,
         CAST(sum(var18) AS BIGINT) AS v18
  FROM per
),
z AS (
  SELECT CASE WHEN st > 0
              THEN (CAST(st AS DOUBLE) - 1.0)
                   / sqrt(CAST(v18 AS DOUBLE) / 18.0)
              WHEN st < 0
              THEN (CAST(st AS DOUBLE) + 1.0)
                   / sqrt(CAST(v18 AS DOUBLE) / 18.0)
              ELSE 0.0 END AS zval
  FROM tot WHERE v18 > 0
)
SELECT per.slot, per.n_days, per.s_stat, per.var18,
       CAST(floor(z.zval * 1000000.0 + 0.5) AS BIGINT) AS z_micro
FROM per, z, nn
WHERE nn.n >= 14
ORDER BY per.slot"""


def _register_dynamic() -> None:
    ORACLES270["conv_vocab_introduction"] = _vocab_intro_oracle()


_register_dynamic()

QUERIES270 = {
    "conv_vocab_introduction": q_conv_vocab_introduction,
    "events_seasonal_mann_kendall": q_events_seasonal_mann_kendall,
}
