"""Driver-contract queries, wave 100 — Mann–Whitney U drift test (the
rank-based two-sample comparison that sees location shifts KS's max-gap can
miss, PURE integer end to end) and per-image luminance histograms (the
exposure profile vision curation filters on, exact integer bins with a
full-pixel SQL replay). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES100: dict[str, str] = {}

_MW_A = "click"
_MW_B = "view"
_LUMA_BINS = 8


# ---------------------------------------------------------------------------
# events_mannwhitney — exact rank-sum drift between two value populations
# ---------------------------------------------------------------------------


def q_events_mannwhitney(sf_dir: str):
    """Mann–Whitney U between '{A}' and '{B}' value distributions on integer
    cents: u2 = 2·Σ wins + ties (twice the U statistic, so ties stay
    integer) and the effect size auc_micro = u2·10⁶ // (2·n_a·n_b) — the
    P(a > b) readout experimentation teams track. PURE integer end to end.

    Scale shape: the MAD-anomaly precedent — ONE (group, cents) histogram
    combiner per batch folds driver-side over the bounded cents domain; the
    U statistic is a single cumulative pass over the merged histogram; rows
    are read once and never shuffle.""".format(A=_MW_A, B=_MW_B)

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        m = (et == _MW_A) | (et == _MW_B)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False)[m] * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({"grp": et[m], "cents": cents})
            .groupby(["grp", "cents"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        g["cnt"] = g["cnt"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(
            None
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: 2 × cents domain
        .groupby(["grp", "cents"])["cnt"]
        .sum()
        .unstack(0, fill_value=0)
        .reindex(columns=[_MW_A, _MW_B], fill_value=0)
        .sort_index()
    )
    na_arr = hist[_MW_A].to_numpy(np.int64)
    nb_arr = hist[_MW_B].to_numpy(np.int64)
    cum_b = np.concatenate([[0], np.cumsum(nb_arr)[:-1]])
    # Python-int fold: u2 can exceed int64 at corpus scale (n_a·n_b pairs)
    u2 = int(sum(2 * int(a) * int(cb) + int(a) * int(b)
                 for a, b, cb in zip(na_arr, nb_arr, cum_b)))
    n_a, n_b = int(na_arr.sum()), int(nb_arr.sum())
    return pd.DataFrame(
        {
            "n_a": np.array([n_a], np.int64),
            "n_b": np.array([n_b], np.int64),
            "u2": np.array([u2], np.int64),
            "auc_micro": np.array(
                [u2 * 1_000_000 // max(2 * n_a * n_b, 1)], np.int64
            ),
        }
    )


ORACLES100["events_mannwhitney"] = f"""
WITH e AS (
  SELECT event_type AS grp,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('{_MW_A}', '{_MW_B}')
),
h AS (
  SELECT cents,
         CAST(count(*) FILTER (grp = '{_MW_A}') AS HUGEINT) AS na,
         CAST(count(*) FILTER (grp = '{_MW_B}') AS HUGEINT) AS nb
  FROM e GROUP BY cents
),
c AS (
  SELECT na, nb,
         coalesce(sum(nb) OVER (ORDER BY cents
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cumb
  FROM h
),
s AS (
  SELECT CAST(sum(na) AS HUGEINT) AS n_a, CAST(sum(nb) AS HUGEINT) AS n_b,
         CAST(sum(2 * na * cumb + na * nb) AS HUGEINT) AS u2
  FROM c
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(u2 AS BIGINT) AS u2,
       CAST(u2 * 1000000 // greatest(2 * n_a * n_b, 1) AS BIGINT) AS auc_micro
FROM s"""


# ---------------------------------------------------------------------------
# image_luma_hist — per-image 8-bin luminance histogram
# ---------------------------------------------------------------------------


def q_image_luma_hist(sf_dir: str):
    """Exposure profile: per synthesized bitmap, the {B}-bin histogram of
    integer luminance (r+g+b)//3, zero-filled bins included — the
    over/under-exposure screen curation filters run. Exact integer counts;
    oracled by a full-pixel SQL replay (the image_thumbs technique).

    Scale shape: actor-pool map_batches; the whole batch's luminance and
    binning is one vectorized add + bincount over the stacked frames;
    output is |images|×{B} long-format rows.""".format(B=_LUMA_BINS)
    from ..stages.multimodal import ImageLumaHistActor, synthesize_image_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_image_batch, batch_format="pyarrow")
    return media.map_batches(
        ImageLumaHistActor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 2),
        num_cpus=1,
    ).select_columns(["media_id", "bin", "n_px"])


def _image_luma_oracle() -> str:
    from ..stages.multimodal import IMG_H, IMG_W

    return f"""
WITH px AS (
  SELECT d.doc_id,
         ((CASE WHEN x.x >= d.doc_id % {IMG_W - 16}
                 AND x.x <  d.doc_id % {IMG_W - 16} + 16
                 AND y.y >= (d.doc_id * 7) % {IMG_H - 12}
                 AND y.y <  (d.doc_id * 7) % {IMG_H - 12} + 12
                THEN 255 - (x.x * 255) // {IMG_W - 1}
                ELSE (x.x * 255) // {IMG_W - 1} END
           + (y.y * 255) // {IMG_H - 1}
           + (d.doc_id * 37) % 256) // 3) // (256 // {_LUMA_BINS}) AS bin
  FROM documents d,
       unnest(range(0, {IMG_H})) AS y(y),
       unnest(range(0, {IMG_W})) AS x(x)
),
bins AS (
  SELECT d.doc_id, CAST(unnest(range(0, {_LUMA_BINS})) AS BIGINT) AS bin
  FROM documents d
)
SELECT b.doc_id AS media_id, b.bin,
       CAST(coalesce(count(px.bin), 0) AS BIGINT) AS n_px
FROM bins b LEFT JOIN px ON px.doc_id = b.doc_id AND px.bin = b.bin
GROUP BY 1, 2"""


ORACLES100["image_luma_hist"] = _image_luma_oracle()


QUERIES100 = {
    "events_mannwhitney": q_events_mannwhitney,
    "image_luma_hist": q_image_luma_hist,
}
