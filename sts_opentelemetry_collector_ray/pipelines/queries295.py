"""Driver-contract queries, wave 295 — lexical adoption latency per
conversation (how fast the assistant picks up user-coined words) and
the actigraphy pair IS/IV (interdaily stability / intradaily
variability) of the hourly event series. Same contract as queries.py:
column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES295: dict[str, str] = {}

_HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# conv_word_adoption — user-coined word pickup latency
# ---------------------------------------------------------------------------


def q_conv_word_adoption(sf_dir: str):
    """Lexical adoption: a word is user-coined when its FIRST occurrence
    in the conversation is a user turn; it is adopted when the assistant
    later uses it. Per conversation with at least one user-coined word:
    n_coined, n_adopted, sum_gap (assistant-first minus coined turn,
    summed over adopted words), rate_micro, avg_gap_micro — pure integer
    counting plus two divisions. Tokenizer matches docs_vocab.

    Scale shape: per-batch (conv, word, role, min-turn) partials ride
    ONE conv-bucket exchange (the `conv_vocab_introduction` idiom)."""
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
                "role": role[keep], "turn": turn[keep],
            }
        )
        df = (
            df.groupby(["conv", "w", "role"], sort=False)["turn"]
            .min()
            .reset_index()
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty_m = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "n_coined": pd.Series([], dtype=np.int64),
                "n_adopted": pd.Series([], dtype=np.int64),
                "sum_gap": pd.Series([], dtype=np.int64),
                "rate_micro": pd.Series([], dtype=np.int64),
                "avg_gap_micro": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return empty_m
        gg = (
            g.groupby(["conv", "w", "role"], sort=False)["turn"]
            .min()
            .reset_index()
        )
        # global first turn per (conv, word) and its role
        first = gg.loc[gg.groupby(["conv", "w"])["turn"].idxmin()]
        coined = first[first["role"] == "user"][["conv", "w", "turn"]]
        if len(coined) == 0:
            return empty_m
        a_first = gg[gg["role"] == "assistant"][["conv", "w", "turn"]]
        m = coined.merge(
            a_first, on=["conv", "w"], how="left", suffixes=("_u", "_a")
        )
        m["adopted"] = (~m["turn_a"].isna()).astype(np.int64)
        m["gap"] = np.where(
            m["adopted"] == 1, m["turn_a"].fillna(0) - m["turn_u"], 0
        ).astype(np.int64)
        agg = m.groupby("conv").agg(
            n_coined=("adopted", "size"),
            n_adopted=("adopted", "sum"),
            sum_gap=("gap", "sum"),
        )
        agg = agg.reset_index().rename(columns={"conv": "conv_id"})
        agg["rate_micro"] = np.floor(
            agg["n_adopted"].to_numpy(np.float64)
            / agg["n_coined"].to_numpy(np.float64) * 1_000_000.0 + 0.5
        ).astype(np.int64)
        has = agg["n_adopted"].to_numpy(np.int64) > 0
        avg = np.zeros(len(agg), np.int64)
        avg[has] = np.floor(
            agg.loc[has, "sum_gap"].to_numpy(np.float64)
            / agg.loc[has, "n_adopted"].to_numpy(np.float64)
            * 1_000_000.0 + 0.5
        ).astype(np.int64)
        agg["avg_gap_micro"] = avg
        return agg.astype(
            {c: np.int64 for c in
             ("n_coined", "n_adopted", "sum_gap", "rate_micro",
              "avg_gap_micro")}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
    )


def _word_adoption_oracle() -> str:
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
per_role AS (
  SELECT conv_id, w, role, min(turn_idx) AS ft
  FROM tok GROUP BY 1, 2, 3
),
gfirst AS (
  SELECT conv_id, w, min(ft) AS gt FROM per_role GROUP BY 1, 2
),
coined AS (
  SELECT g.conv_id, g.w, g.gt
  FROM gfirst g JOIN per_role p
    ON p.conv_id = g.conv_id AND p.w = g.w AND p.ft = g.gt
  WHERE p.role = 'user'
),
ad AS (
  SELECT c.conv_id, c.w, c.gt, a.ft AS at_
  FROM coined c
  LEFT JOIN per_role a
    ON a.conv_id = c.conv_id AND a.w = c.w AND a.role = 'assistant'
),
agg AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_coined,
         CAST(sum(CASE WHEN at_ IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_adopted,
         CAST(coalesce(sum(CASE WHEN at_ IS NOT NULL THEN at_ - gt END), 0)
              AS BIGINT) AS sum_gap
  FROM ad GROUP BY 1
)
SELECT conv_id, n_coined, n_adopted, sum_gap,
       CAST(floor(CAST(n_adopted AS DOUBLE) / CAST(n_coined AS DOUBLE)
                  * 1000000.0 + 0.5) AS BIGINT) AS rate_micro,
       CAST(CASE WHEN n_adopted > 0
                 THEN floor(CAST(sum_gap AS DOUBLE)
                            / CAST(n_adopted AS DOUBLE) * 1000000.0 + 0.5)
                 ELSE 0 END AS BIGINT) AS avg_gap_micro
FROM agg"""
    )


# ---------------------------------------------------------------------------
# events_circadian_is_iv — interdaily stability / intradaily variability
# ---------------------------------------------------------------------------


def q_events_circadian_is_iv(sf_dir: str):
    """Actigraphy rhythm metrics on the zero-filled hourly series:
    IS = (n sum_h c_h (xbar_h - xbar)^2) / (24 sum (x - xbar)^2)
    weighted by each clock-hour's count (robust to partial days), and
    IV = (n sum (x_t - x_{t-1})^2) / ((n-1) sum (x - xbar)^2). All
    moment cores are EXACT integers (scaled by hour counts); two float
    compositions. One row: n_hours, is_micro, iv_micro — high IS means
    a stable daily rhythm, high IV means fragmentation."""

    def partial(t: pa.Table) -> pd.DataFrame:
        hr = pa.compute.cast(t["ts"], pa.int64()).to_numpy() // _HOUR_US
        h = pd.Series(hr).groupby(hr).size()
        return pd.DataFrame(
            {"hr": h.index.to_numpy(np.int64), "c": h.to_numpy(np.int64)}
        )

    hours = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("hr")["c"]
        .sum()
    )
    cols = ["n_hours", "is_micro", "iv_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if hours.empty:
        return empty
    h0, h1 = int(hours.index.min()), int(hours.index.max())
    n = h1 - h0 + 1
    if n < 25:
        return empty
    y = np.zeros(n, np.int64)
    y[hours.index.to_numpy(np.int64) - h0] = hours.to_numpy(np.int64)
    hod = (h0 + np.arange(n)) % 24
    S = int(y.sum())
    s2 = int((y.astype(object) * y.astype(object)).sum())
    ss_tot = float(s2) - float(S) * float(S) / float(n)  # sum (x - xbar)^2
    if ss_tot <= 0.0:
        return empty
    num_is = 0.0
    for h in range(24):
        mask = hod == h
        ch = int(mask.sum())
        if ch == 0:
            continue
        sh = int(y[mask].sum())
        diff = float(sh) / float(ch) - float(S) / float(n)
        num_is += float(ch) * diff * diff
    is_val = (float(n) * num_is) / (24.0 * ss_tot)
    d = y[1:] - y[:-1]
    sd2 = int((d.astype(object) * d.astype(object)).sum())
    iv = (float(n) * float(sd2)) / (float(n - 1) * ss_tot)
    return pd.DataFrame(
        [
            (
                np.int64(n),
                np.int64(np.floor(is_val * 1_000_000.0 + 0.5)),
                np.int64(np.floor(iv * 1_000_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES295["events_circadian_is_iv"] = f"""
WITH h AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS hr, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
g AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
grid AS (
  SELECT g.h0 + CAST(r.range AS BIGINT) AS hr,
         CAST(r.range AS BIGINT) AS t
  FROM g CROSS JOIN range(0, 500000) r
  WHERE r.range <= g.h1 - g.h0
),
x AS (
  SELECT grid.t, grid.hr % 24 AS hod, CAST(coalesce(h.c, 0) AS BIGINT) AS y
  FROM grid LEFT JOIN h USING (hr)
),
nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS s2
  FROM x
),
tot AS (
  SELECT n, CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
           / CAST(n AS DOUBLE) AS ss_tot, s
  FROM nn
),
prof AS (
  SELECT x.hod, CAST(count(*) AS BIGINT) AS ch, CAST(sum(x.y) AS BIGINT)
           AS sh
  FROM x GROUP BY 1
),
isnum AS (
  SELECT sum(CAST(prof.ch AS DOUBLE)
             * (CAST(prof.sh AS DOUBLE) / CAST(prof.ch AS DOUBLE)
                - CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE))
             * (CAST(prof.sh AS DOUBLE) / CAST(prof.ch AS DOUBLE)
                - CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE))) AS v
  FROM prof, tot
  GROUP BY tot.n, tot.s
),
dd AS (
  SELECT y - lag(y) OVER (ORDER BY t) AS d FROM x
),
sd AS (
  SELECT CAST(sum(CAST(d AS HUGEINT) * d) AS HUGEINT) AS sd2
  FROM dd WHERE d IS NOT NULL
)
SELECT tot.n AS n_hours,
       CAST(floor(CAST(tot.n AS DOUBLE) * isnum.v / (24.0 * tot.ss_tot)
                  * 1000000.0 + 0.5) AS BIGINT) AS is_micro,
       CAST(floor(CAST(tot.n AS DOUBLE) * CAST(sd.sd2 AS DOUBLE)
                  / (CAST(tot.n - 1 AS DOUBLE) * tot.ss_tot)
                  * 1000000.0 + 0.5) AS BIGINT) AS iv_micro
FROM tot, isnum, sd
WHERE tot.n >= 25 AND tot.ss_tot > 0"""


def _register_dynamic() -> None:
    ORACLES295["conv_word_adoption"] = _word_adoption_oracle()


_register_dynamic()

QUERIES295 = {
    "conv_word_adoption": q_conv_word_adoption,
    "events_circadian_is_iv": q_events_circadian_is_iv,
}
