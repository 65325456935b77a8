"""Driver-contract queries, wave 96 — Wilson lower-bound success-rate
ranking (per event type, the uncertainty-aware score a 1-of-2 sample can't
game — the SLO/experiment readout) and autocorrelation pitch tracking
(per-clip f0 over the synthesized PCM corpus via one batched
Wiener–Khinchin ACF — integer-only outputs, class-replay oracle). Same
contract as queries.py: column names AND dtypes match the DuckDB oracle
exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES96: dict[str, str] = {}

_WILSON_Z = 1.96
_WILSON_THRESH = 50.0  # success = value >= this (interior p on the fixture)


# ---------------------------------------------------------------------------
# events_wilson_rates — Wilson lower-bound success rate per event type
# ---------------------------------------------------------------------------


def q_events_wilson_rates(sf_dir: str):
    """Per-type success reliability with uncertainty: the share of events
    with value ≥ {c} and its 95% Wilson lower bound — the ranking that won't
    promote a 1-hit-in-2 type above a 40-in-100 one. Counts are exact
    integers; the Wilson formula is ONE fixed-parenthesization double
    expression evaluated identically in the SQL replay (IEEE ops +
    correctly-rounded sqrt ⇒ bit-equal), rounded half-up at 1e-6.

    Scale shape: per-batch (type, n, n_hit) combiner partials — bounded by
    |types| per block — fold on the driver; no shuffle at all.""".format(
        c=_WILSON_THRESH
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        et = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        hit = (
            t["value"].to_numpy(zero_copy_only=False) >= _WILSON_THRESH
        ).astype(np.int64)
        g = (
            pd.DataFrame({"event_type": et, "hit": hit})
            .groupby("event_type", sort=False)["hit"]
            .agg(["size", "sum"])
            .reset_index()
        )
        g.columns = ["event_type", "n", "n_hit"]
        return g.astype({"n": np.int64, "n_hit": np.int64})

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if part.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "n_hit": pd.Series([], dtype=np.int64),
                "hit_rate": pd.Series([], dtype=np.float64),
                "wilson_lb": pd.Series([], dtype=np.float64),
            }
        )
    g = part.groupby("event_type", sort=True)[["n", "n_hit"]].sum().reset_index()
    n = g["n"].to_numpy(np.int64).astype(np.float64)
    e = g["n_hit"].to_numpy(np.int64).astype(np.float64)
    z = _WILSON_Z
    p = e / n
    # fixed parenthesization — mirrored token-for-token in the SQL replay
    lb = (
        p
        + (z * z) / (2.0 * n)
        - z * np.sqrt((p * (1.0 - p)) / n + (z * z) / (4.0 * (n * n)))
    ) / (1.0 + (z * z) / n)
    return pd.DataFrame(
        {
            "event_type": g["event_type"].to_numpy(object),
            "n": g["n"].to_numpy(np.int64),
            "n_hit": g["n_hit"].to_numpy(np.int64),
            "hit_rate": np.floor(p * 1_000_000.0 + 0.5) / 1_000_000.0,
            "wilson_lb": np.floor(lb * 1_000_000.0 + 0.5) / 1_000_000.0,
        }
    )


ORACLES96["events_wilson_rates"] = f"""
WITH t AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (value >= {_WILSON_THRESH}) AS BIGINT) AS n_hit
  FROM events GROUP BY event_type
),
w AS (
  SELECT event_type, n, n_hit,
         CAST(n_hit AS DOUBLE) / CAST(n AS DOUBLE) AS p,
         CAST(n AS DOUBLE) AS nd
  FROM t
)
SELECT event_type, n, n_hit,
       floor(p * 1000000.0 + 0.5) / 1000000.0 AS hit_rate,
       floor(((p + ({_WILSON_Z} * {_WILSON_Z}) / (2.0 * nd)
               - {_WILSON_Z} * sqrt((p * (1.0 - p)) / nd
                   + ({_WILSON_Z} * {_WILSON_Z}) / (4.0 * (nd * nd))))
              / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / nd)) * 1000000.0 + 0.5)
         / 1000000.0 AS wilson_lb
FROM w"""


# ---------------------------------------------------------------------------
# audio_pitch — autocorrelation f0 per synthesized PCM clip
# ---------------------------------------------------------------------------


def q_audio_pitch(sf_dir: str):
    """REAL pitch path: deterministic PCM clips keyed by doc_id → actor-pool
    ACF pitch tracking (stages/multimodal.py::AudioPitchActor — one batched
    zero-padded rfft→|·|²→irfft per batch, 50–1000 Hz peak search). Outputs
    are integers (lag, round-half-up f0 millihertz). Oracled: payloads
    depend only on doc_id % 40, so the oracle inlines the 40 per-class
    (lag, f0) rows computed by the same kernel and joins them back."""
    from ..stages.multimodal import AudioPitchActor, synthesize_audio_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_audio_batch, batch_format="pyarrow")
    return media.map_batches(
        AudioPitchActor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 2),
        num_cpus=1,
    ).select_columns(["media_id", "lag", "f0_milli"])


def _audio_pitch_oracle() -> str:
    from ..stages.multimodal import AudioPitchActor, synthesize_audio_batch

    rep = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64))})
    pf = AudioPitchActor()(synthesize_audio_batch(rep))
    rows = ",\n    ".join(
        f"({i}, {pf['lag'][i].as_py()}, {pf['f0_milli'][i].as_py()})"
        for i in range(40)
    )
    return f"""
WITH c(k, lag, f0_milli) AS (
  SELECT * FROM (VALUES
    {rows}
  )
)
SELECT d.doc_id AS media_id, CAST(c.lag AS BIGINT) AS lag,
       CAST(c.f0_milli AS BIGINT) AS f0_milli
FROM documents d JOIN c ON d.doc_id % 40 = c.k"""


ORACLES96["audio_pitch"] = _audio_pitch_oracle()


QUERIES96 = {
    "events_wilson_rates": q_events_wilson_rates,
    "audio_pitch": q_audio_pitch,
}
