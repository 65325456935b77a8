"""Driver-contract queries, wave 79 — audio voice-activity detection (exact
integer frame energies over deterministic speech-like PCM: segments, longest
run, voiced ratio) and Q21-shaped sole-blame suppliers (the only late
supplier in a multi-supplier order — the double-correlated EXISTS/NOT-EXISTS
folded to per-order counts). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly.

The VAD oracle uses the media-family class-representative trick: payloads
depend only on doc_id % 40, so the 40 constant VAD rows are computed ONCE by
the same integer kernel and inlined as VALUES (`queries3._audio_features_oracle`
precedent)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

ORACLES79: dict[str, str] = {}

_Q21_LATE_DAYS = 60
_Q21_BUCKETS = 64
_Q21_TOPK = 10
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# audio_vad — energy VAD over speech-like clips
# ---------------------------------------------------------------------------


def q_audio_vad(sf_dir: str):
    """REAL VAD path (no stub): deterministic burst-gated PCM clips keyed by
    doc_id → actor-pool decode (one frombuffer + reshape per batch) → exact
    integer frame energies → division-free half-mean threshold → vectorized
    run analysis (voiced frames, segments, longest run, micro ratio).

    Scale shape: stateless synth batches feed an actor pool sized for binary
    payloads (small batch_size); features are 6 scalar columns per clip —
    the payload column never leaves the stage."""
    from ..stages.multimodal import audio_vad_stage, synthesize_speech_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_speech_batch, batch_format="pyarrow")
    return audio_vad_stage(media, concurrency=2)


def _audio_vad_oracle() -> str:
    from ..stages.multimodal import AudioVADActor, synthesize_speech_batch

    rep = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64))})
    cf = AudioVADActor()(synthesize_speech_batch(rep))
    rows = ",\n    ".join(
        f"({i}, {cf['n_frames'][i].as_py()}, {cf['n_voiced'][i].as_py()}, "
        f"{cf['n_segments'][i].as_py()}, {cf['longest_segment'][i].as_py()}, "
        f"{cf['voiced_ratio_micro'][i].as_py()})"
        for i in range(40)
    )
    return f"""
WITH c(k, n_frames, n_voiced, n_segments, longest_segment,
       voiced_ratio_micro) AS (
  SELECT * FROM (VALUES
    {rows}
  )
)
SELECT d.doc_id AS media_id, CAST(c.n_frames AS BIGINT) AS n_frames,
       CAST(c.n_voiced AS BIGINT) AS n_voiced,
       CAST(c.n_segments AS BIGINT) AS n_segments,
       CAST(c.longest_segment AS BIGINT) AS longest_segment,
       CAST(c.voiced_ratio_micro AS BIGINT) AS voiced_ratio_micro
FROM documents d JOIN c ON d.doc_id % 40 = c.k"""


ORACLES79["audio_vad"] = _audio_vad_oracle()


# ---------------------------------------------------------------------------
# q21_blame — the only late supplier in a multi-supplier order
# ---------------------------------------------------------------------------


def q_q21_blame(sf_dir: str):
    """TPC-H Q21 shape: a supplier earns a 'blame' for an order when it is
    the ONLY supplier whose items shipped late (> 60 days after the order
    date) AND the order involves ≥ 2 suppliers. Top-10 suppliers by blame
    count (count DESC, suppkey ASC) with names.

    Scale shape: lineitems pre-reduce per (orderkey, suppkey) max-shipday
    inside each batch and share ONE orderkey-bucket exchange with the orders
    rows; the per-bucket merge re-maxes, computes per-order supplier/late
    counts, and emits per-supplier partial blame counts — the driver
    re-reduces |suppliers∩buckets| rows, keeps 10, and decorates via a
    key-filtered supplier read."""

    def li_partial(t: pa.Table) -> pd.DataFrame:
        k = t["l_orderkey"].to_numpy().astype(np.int64)
        s = t["l_suppkey"].to_numpy().astype(np.int64)
        d = t["l_shipdate"].cast(pa.int64()).to_numpy() // _DAY_US
        g = pd.DataFrame({"k": k, "s": s, "msd": d}).groupby(
            ["k", "s"], sort=False, as_index=False
        ).max()
        return pd.DataFrame(
            {
                "k": g["k"].to_numpy(np.int64),
                "s": g["s"].to_numpy(np.int64),
                "msd": g["msd"].to_numpy(np.int64),
                "od": np.int64(-1),
                "_b": (g["k"].to_numpy(np.int64) % _Q21_BUCKETS).astype(np.int64),
            }
        )

    def o_rows(t: pa.Table) -> pd.DataFrame:
        k = t["o_orderkey"].to_numpy().astype(np.int64)
        d = t["o_orderdate"].cast(pa.int64()).to_numpy() // _DAY_US
        return pd.DataFrame(
            {
                "k": k,
                "s": np.int64(-1),
                "msd": np.int64(-1),
                "od": d,
                "_b": (k % _Q21_BUCKETS).astype(np.int64),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_o = (g["od"] >= 0).to_numpy()
        o = g.loc[is_o, ["k", "od"]]
        ls = (
            g.loc[~is_o, ["k", "s", "msd"]]
            .groupby(["k", "s"], sort=False, as_index=False)
            .max()
        )
        j = ls.merge(o, on="k")
        j["late"] = (
            j["msd"].to_numpy() > j["od"].to_numpy() + _Q21_LATE_DAYS
        ).astype(np.int64)
        per_o = j.groupby("k", sort=False).agg(ns=("s", "size"), nl=("late", "sum"))
        j = j.merge(per_o, on="k")
        blame = j[(j["late"] == 1) & (j["nl"] == 1) & (j["ns"] >= 2)]
        out = blame.groupby("s", sort=False).size()
        return pd.DataFrame(
            {
                "s": out.index.to_numpy(np.int64),
                "n": out.to_numpy(np.int64),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(li_partial, batch_format="pyarrow")
    o = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(o_rows, batch_format="pyarrow")
    part = (
        li.union(o)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # bounded: per-supplier partials
        .groupby("s", as_index=False)["n"]
        .sum()
        .sort_values(["n", "s"], ascending=[False, True], kind="mergesort")
        .head(_Q21_TOPK)
    )
    keys = part["s"].to_numpy(np.int64)
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys.tolist())],
    ).to_pandas()
    out = part.merge(supp, left_on="s", right_on="s_suppkey").sort_values(
        ["n", "s"], ascending=[False, True], kind="mergesort"
    )
    return pd.DataFrame(
        {
            "s_suppkey": out["s"].to_numpy(np.int64),
            "s_name": out["s_name"].astype(object),
            "n_blame": out["n"].to_numpy(np.int64),
        }
    )


ORACLES79["q21_blame"] = f"""
WITH ls AS (
  SELECT l_orderkey AS k, l_suppkey AS s,
         max(epoch_us(l_shipdate) // {_DAY_US}) AS msd
  FROM lineitem GROUP BY 1, 2
),
j AS (
  SELECT ls.k, ls.s,
         CASE WHEN msd > epoch_us(o_orderdate) // {_DAY_US} + {_Q21_LATE_DAYS}
              THEN 1 ELSE 0 END AS late
  FROM ls JOIN orders ON o_orderkey = k
),
o AS (SELECT k, count(*) AS ns, sum(late) AS nl FROM j GROUP BY 1),
b AS (
  SELECT j.s, CAST(count(*) AS BIGINT) AS n
  FROM j JOIN o ON o.k = j.k
  WHERE j.late = 1 AND o.nl = 1 AND o.ns >= 2
  GROUP BY 1
)
SELECT s AS s_suppkey, s_name, n AS n_blame
FROM b JOIN supplier ON s_suppkey = s
ORDER BY n_blame DESC, s_suppkey ASC LIMIT {_Q21_TOPK}"""


QUERIES79 = {
    "audio_vad": q_audio_vad,
    "q21_blame": q_q21_blame,
}
