"""Driver-contract queries, wave 350 — relative contrast of the
embedding sample (mean/min distance ratio — the classic
nearest-neighbor hardness measure) and error propagation in transcripts
(does an [ERROR] tool turn infect the next turn?). Same contract as
queries.py: column names AND dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

ORACLES350: dict[str, str] = {}

_RC_MAX_ID = 256


# ---------------------------------------------------------------------------
# emb_relative_contrast — NN hardness of the embedding space
# ---------------------------------------------------------------------------


def q_emb_relative_contrast(sf_dir: str):
    """Relative contrast on the vec_id < 256 sample: per point the mean
    cosine DISTANCE to all others over the minimum (its true-NN
    distance); RC near 1 means nearest neighbors are barely closer than
    average — the curse-of-dimensionality regime where ANN degrades.
    Distances bit-mirror the oracle. One row: n, mean_rc_micro,
    min_rc_micro, n_hard (rc < 1.1)."""

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["vec_id"], _RC_MAX_ID))

    t = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    cols = ["n", "mean_rc_micro", "min_rc_micro", "n_hard"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    n = len(t)
    if n < 3:
        return empty
    v = np.stack([np.asarray(e) for e in t["embedding"]]).astype(np.float64)
    d_dim = v.shape[1]
    norms2 = np.zeros(n)
    dots = np.zeros((n, n))
    for j in range(d_dim):
        norms2 = norms2 + v[:, j] * v[:, j]
        dots = dots + v[:, j][:, None] * v[None, :, j]
    dist = 1.0 - dots / (
        np.sqrt(norms2)[:, None] * np.sqrt(norms2)[None, :]
    )
    rcs = []
    for i in range(n):
        others = np.concatenate([dist[i, :i], dist[i, i + 1:]])
        dmin = float(others.min())
        if dmin <= 0.0:
            continue
        rcs.append(float(others.sum()) / float(n - 1) / dmin)
    if not rcs:
        return empty
    arr = np.array(rcs, np.float64)
    return pd.DataFrame(
        [
            (
                np.int64(len(arr)),
                np.int64(np.floor(float(arr.mean()) * 1_000_000.0 + 0.5)),
                np.int64(np.floor(float(arr.min()) * 1_000_000.0 + 0.5)),
                np.int64(int((arr < 1.1).sum())),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES350["emb_relative_contrast"] = f"""
WITH s AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id < {_RC_MAX_ID}
),
d AS (
  SELECT a.vec_id AS ia,
         1.0 - list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS dist
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
per AS (
  SELECT ia, sum(dist) / count(*) / min(dist) AS rc, min(dist) AS dmin
  FROM d GROUP BY 1
),
ok AS (SELECT rc FROM per WHERE dmin > 0),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, avg(rc) AS mean_rc,
         min(rc) AS min_rc,
         CAST(sum(CASE WHEN rc < 1.1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hard
  FROM ok
)
SELECT n, CAST(floor(mean_rc * 1000000.0 + 0.5) AS BIGINT)
         AS mean_rc_micro,
       CAST(floor(min_rc * 1000000.0 + 0.5) AS BIGINT) AS min_rc_micro,
       n_hard
FROM agg
WHERE n > 0"""


# ---------------------------------------------------------------------------
# conv_error_propagation — does a failing tool turn infect the next turn?
# ---------------------------------------------------------------------------


def q_conv_error_propagation(sf_dir: str):
    """Propagation: among tool-role turns carrying '[ERROR]' whose
    immediate next turn exists (turn_idx + 1, same conversation), the
    share where the next turn ALSO carries '[ERROR]', vs the baseline
    error rate of all turns with a predecessor. Pure integer counting.
    One row: n_tool_err, n_next_err, prop_micro, baseline_micro."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv": np.asarray(t["conv_id"].to_numpy(zero_copy_only=False)),
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "role": np.asarray(t["role"].to_numpy(zero_copy_only=False)),
                "err": pc.match_substring(t["text"], "[ERROR]").to_numpy(
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
            {c: pd.Series([], dtype=np.int64)
             for c in ("nte", "nne", "nprev", "nerr")}
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["conv", "turn"], kind="stable")
        conv = g["conv"].to_numpy(object)
        turn = g["turn"].to_numpy(np.int64)
        role = g["role"].to_numpy(object)
        err = g["err"].to_numpy(np.int64)
        adj = (conv[1:] == conv[:-1]) & (turn[1:] == turn[:-1] + 1)
        tool_err = (role[:-1] == "tool") & (err[:-1] == 1) & adj
        nte = int(tool_err.sum())
        nne = int((tool_err & (err[1:] == 1)).sum())
        nprev = int(adj.sum())
        nerr = int(err[1:][adj].sum())
        return pd.DataFrame(
            {
                "nte": [np.int64(nte)], "nne": [np.int64(nne)],
                "nprev": [np.int64(nprev)], "nerr": [np.int64(nerr)],
            }
        )

    p = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sum()
    )
    cols = ["n_tool_err", "n_next_err", "prop_micro", "baseline_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    nte, nne = int(p["nte"]), int(p["nne"])
    nprev, nerr = int(p["nprev"]), int(p["nerr"])
    if nte == 0 or nprev == 0:
        return empty
    return pd.DataFrame(
        [
            (
                np.int64(nte), np.int64(nne),
                np.int64(np.floor(
                    float(nne) / float(nte) * 1_000_000.0 + 0.5
                )),
                np.int64(np.floor(
                    float(nerr) / float(nprev) * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _propagation_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """,
seq AS (
  SELECT conv_id, turn_idx, role,
         CAST(contains(text, '[ERROR]') AS BIGINT) AS err,
         lead(turn_idx) OVER w AS nt,
         lead(CAST(contains(text, '[ERROR]') AS BIGINT)) OVER w AS nerr
  FROM transcripts
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
adj AS (
  SELECT role, err, nerr FROM seq WHERE nt = turn_idx + 1
),
agg AS (
  SELECT
    CAST(sum(CASE WHEN role = 'tool' AND err = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS nte,
    CAST(sum(CASE WHEN role = 'tool' AND err = 1 AND nerr = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS nne,
    CAST(count(*) AS BIGINT) AS nprev,
    CAST(sum(nerr) AS BIGINT) AS nerr_tot
  FROM adj
)
SELECT nte AS n_tool_err, nne AS n_next_err,
       CAST(floor(CAST(nne AS DOUBLE) / nte * 1000000.0 + 0.5) AS BIGINT)
         AS prop_micro,
       CAST(floor(CAST(nerr_tot AS DOUBLE) / nprev * 1000000.0 + 0.5)
            AS BIGINT) AS baseline_micro
FROM agg
WHERE nte > 0 AND nprev > 0"""
    )


def _register_dynamic() -> None:
    ORACLES350["conv_error_propagation"] = _propagation_oracle()


_register_dynamic()

QUERIES350 = {
    "emb_relative_contrast": q_emb_relative_contrast,
    "conv_error_propagation": q_conv_error_propagation,
}
