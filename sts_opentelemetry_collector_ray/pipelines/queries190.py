"""Driver-contract queries, wave 190 — Haar wavelet detail-energy
decomposition of the daily event-count series (integer-exact numerators)
and Burrows' Delta stylometric distance between document sources.
Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES190: dict[str, str] = {}


# ---------------------------------------------------------------------------
# events_haar_energy — Haar detail energy per dyadic level
# ---------------------------------------------------------------------------


def q_events_haar_energy(sf_dir: str):
    """Per event type over the first 2^L days of the daily count series
    (L = ⌊log₂ n_days⌋): Haar detail coefficients per level j — d_{j,i} =
    (sum of first half of the 2^j-day block i) − (second half); the exact
    integer energy numerator Σd² and each level's share of total energy
    Σ_j (num_j/2^j) in micro units (wavelet synopses, Matias et al. 1998).

    Scale shape: per-batch (type, day, n) combiner → driver folds the
    bounded |types|×|days| table; the level scan is one vectorized
    reduceat-style pass over ≤ 2^L integers per type — no shuffle."""
    path = f"{sf_dir}/events.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["event_type", "ts"]).to_pandas()
        d = df["ts"].dt
        df["day"] = (d.year * 10_000 + d.month * 100 + d.day).astype(np.int64)
        g = (
            df.groupby(["event_type", "day"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return g.astype({"n": np.int64})

    part = (
        ray.data.read_parquet(path, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    cols = ["event_type", "level", "n_blocks", "energy_num", "share_micro"]
    empty = pd.DataFrame(
        {
            "event_type": pd.Series([], dtype=object),
            "level": pd.Series([], dtype=np.int64),
            "n_blocks": pd.Series([], dtype=np.int64),
            "energy_num": pd.Series([], dtype=np.int64),
            "share_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    daily = (
        part.groupby(["event_type", "day"], as_index=False)["n"]
        .sum()
        .sort_values(["event_type", "day"], kind="mergesort")
    )
    rows = []
    for et, sub in daily.groupby("event_type", sort=True):
        x = sub["n"].to_numpy(np.int64)
        n = len(x)
        if n < 2:
            continue
        L = int(np.floor(np.log2(n)))
        w = x[: 1 << L]
        nums, levels, blocks = [], [], []
        for j in range(1, L + 1):
            half = 1 << (j - 1)
            b = w.reshape(-1, 1 << j)
            d = b[:, :half].sum(axis=1) - b[:, half:].sum(axis=1)
            nums.append(int((d.astype(np.int64) ** 2).sum()))
            levels.append(j)
            blocks.append(len(d))
        energies = np.array(nums, np.float64) / np.exp2(np.array(levels, np.float64))
        tot = float(energies.sum())
        for j, nb, num, en in zip(levels, blocks, nums, energies):
            share = 0.0 if tot <= 0.0 else en / tot
            rows.append(
                (et, np.int64(j), np.int64(nb), np.int64(num),
                 np.int64(np.floor(share * 1_000_000.0 + 0.5)))
            )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {"level": np.int64, "n_blocks": np.int64,
         "energy_num": np.int64, "share_micro": np.int64}
    )


ORACLES190["events_haar_energy"] = """
WITH daily AS (
  SELECT event_type,
         CAST(year(ts) * 10000 + month(ts) * 100 + day(ts) AS BIGINT) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS t,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM daily
),
lmax AS (
  SELECT event_type, max(u.range) AS L
  FROM (SELECT DISTINCT event_type, nd FROM idx WHERE nd >= 2),
       range(1, 40) AS u
  WHERE CAST(2 ** u.range AS BIGINT) <= nd GROUP BY 1
),
lvl AS (SELECT event_type, L, unnest(range(1, L + 1)) AS j FROM lmax),
d AS (
  SELECT idx.event_type, lvl.j,
         idx.t // CAST(2 ** lvl.j AS BIGINT) AS blk,
         sum(CASE WHEN (idx.t // CAST(2 ** (lvl.j - 1) AS BIGINT)) % 2 = 0
                  THEN idx.n ELSE -idx.n END) AS dval
  FROM idx
  JOIN lvl ON idx.event_type = lvl.event_type
  WHERE idx.t < CAST(2 ** lvl.L AS BIGINT)
  GROUP BY 1, 2, 3
),
en AS (
  SELECT event_type, j,
         CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(dval * dval) AS BIGINT) AS num
  FROM d GROUP BY 1, 2
),
sh AS (
  SELECT event_type, j, n_blocks, num,
         CAST(num AS DOUBLE) / (2 ** j) AS e,
         sum(CAST(num AS DOUBLE) / (2 ** j)) OVER (PARTITION BY event_type) AS tot
  FROM en
)
SELECT event_type, CAST(j AS BIGINT) AS level, n_blocks, num AS energy_num,
       CAST(floor(CASE WHEN tot > 0.0 THEN e / tot ELSE 0.0 END
                  * 1000000.0 + 0.5) AS BIGINT) AS share_micro
FROM sh ORDER BY event_type, level"""


# ---------------------------------------------------------------------------
# docs_burrows_delta — stylometric distance between sources
# ---------------------------------------------------------------------------

_BD_TOP_M = 30


def q_docs_burrows_delta(sf_dir: str):
    """Burrows' Delta (Burrows 2002) between document sources: over the
    top-30 corpus words (by total count, ties alphabetical), per-source
    relative frequencies are z-scored across sources (population σ; words
    with σ = 0 drop) and Delta(a,b) = mean |z_a − z_b|. Output: the 10
    CLOSEST source pairs (delta_micro ASC, s1, s2).

    Scale shape: one (source, word, n) bounded-vocabulary combiner pass;
    the driver folds |sources|×|vocab| rows and evaluates the z-matrix and
    pair distances as dense numpy — no shuffle."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/documents.parquet"

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), object)
        off = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), np.int64)
        counts = np.diff(off)
        src = np.repeat(
            np.asarray(t["source"].to_numpy(zero_copy_only=False), object), counts
        )
        df = pd.DataFrame({"source": src, "w": flat})
        df = df[df["w"] != ""]
        return (
            df.groupby(["source", "w"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
            .astype({"n": np.int64})
        )

    part = (
        ray.data.read_parquet(path, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {
            "s1": pd.Series([], dtype=object),
            "s2": pd.Series([], dtype=object),
            "n_words": pd.Series([], dtype=np.int64),
            "delta_micro": pd.Series([], dtype=np.int64),
        }
    )
    if part.empty:
        return empty
    tw = part.groupby(["source", "w"], as_index=False)["n"].sum()
    corpus = tw.groupby("w")["n"].sum().reset_index()
    corpus = corpus.sort_values(["n", "w"], ascending=[False, True], kind="mergesort")
    top = corpus["w"].to_numpy(object)[:_BD_TOP_M]
    tot = tw.groupby("source")["n"].sum().sort_index()
    sources = np.asarray(tot.index.to_numpy(object))
    ns = len(sources)
    if ns < 2:
        return empty
    # dense |sources| × |top| relative-frequency matrix
    pivot = (
        tw[tw["w"].isin(top)]
        .pivot_table(index="source", columns="w", values="n", fill_value=0, aggfunc="sum")
        .reindex(index=sources, columns=top, fill_value=0)
    )
    f = pivot.to_numpy(np.float64) / tot.to_numpy(np.float64)[:, None]
    mu = f.sum(axis=0) / ns
    sd = np.sqrt(np.maximum((f * f).sum(axis=0) / ns - mu * mu, 0.0))
    keep = sd > 0.0
    z = (f[:, keep] - mu[keep]) / sd[keep]
    m_eff = int(keep.sum())
    if m_eff == 0:
        return empty
    rows = []
    for i in range(ns):
        for j in range(i + 1, ns):
            delta = float(np.abs(z[i] - z[j]).sum() / m_eff)
            rows.append(
                (sources[i], sources[j], np.int64(m_eff),
                 np.int64(np.floor(delta * 1_000_000.0 + 0.5)))
            )
    out = pd.DataFrame(rows, columns=["s1", "s2", "n_words", "delta_micro"])
    out = out.sort_values(
        ["delta_micro", "s1", "s2"], ascending=[True, True, True], kind="mergesort"
    ).head(10)
    return out.reset_index(drop=True).astype(
        {"n_words": np.int64, "delta_micro": np.int64}
    )


ORACLES190["docs_burrows_delta"] = f"""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
tw AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS n
  FROM tok WHERE w <> '' GROUP BY 1, 2
),
ns AS (SELECT source, sum(n) AS tot FROM tw GROUP BY 1),
top AS (
  SELECT w FROM (SELECT w, sum(n) AS cn FROM tw GROUP BY 1)
  ORDER BY cn DESC, w ASC LIMIT {_BD_TOP_M}
),
grid AS (SELECT ns.source, top.w, ns.tot FROM ns, top),
f AS (
  SELECT grid.source, grid.w,
         coalesce(CAST(tw.n AS DOUBLE), 0.0) / CAST(grid.tot AS DOUBLE) AS f
  FROM grid LEFT JOIN tw ON grid.source = tw.source AND grid.w = tw.w
),
stats AS (
  SELECT w, sum(f) / count(*) AS mu,
         sqrt(greatest(sum(f * f) / count(*)
              - (sum(f) / count(*)) * (sum(f) / count(*)), 0.0)) AS sd
  FROM f GROUP BY 1
),
z AS (
  SELECT f.source, f.w, (f.f - stats.mu) / stats.sd AS z
  FROM f JOIN stats ON f.w = stats.w WHERE stats.sd > 0.0
),
pairs AS (
  SELECT a.source AS s1, b.source AS s2,
         CAST(count(*) AS BIGINT) AS n_words,
         sum(abs(a.z - b.z)) / count(*) AS delta
  FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s1, s2, n_words,
       CAST(floor(delta * 1000000.0 + 0.5) AS BIGINT) AS delta_micro
FROM pairs ORDER BY delta_micro ASC, s1 ASC, s2 ASC LIMIT 10"""


QUERIES190 = {
    "events_haar_energy": q_events_haar_energy,
    "docs_burrows_delta": q_docs_burrows_delta,
}
