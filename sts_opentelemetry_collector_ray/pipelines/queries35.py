"""Driver-contract queries, wave 35 — PSI distribution-drift report (the
model-monitoring population stability index between two time halves) and exact
greedy k-center coreset selection over embeddings (the diversity-sampling
data-selection recipe). Same contract as queries.py: column names AND dtypes
match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES35: dict[str, str] = {}

_PSI_BINS = 10
_KC_K = 6  # coreset size


# ---------------------------------------------------------------------------
# events_psi_drift — population stability index, first half vs second half
# ---------------------------------------------------------------------------


def q_events_psi_drift(sf_dir: str):
    """PSI drift report (the model-monitoring standard: Σ (pA−pB)·ln(pA/pB)
    over fixed bins, Laplace-smoothed): the event stream splits at the exact
    midpoint of its time range, values bin into 10 equal-width integer-cent
    bins over the global range, and each event_type gets one PSI score.

    Exact everywhere it matters: bounds ship as 4 integers from a tiny
    first pass; (type, period, bin) counts are int partials — ≤ types×2×10
    rows per block through the exchange; the float PSI derivation runs on the
    driver over the bounded grid in fixed bin order (cumsum, left-to-right)
    so the SQL ordered-list_sum replays it bit-for-bit. Rows never shuffle."""

    path = f"{sf_dir}/events.parquet"

    def bounds_partial(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "mn": pa.array([tu.min()]),
                "mx": pa.array([tu.max()]),
                "mnc": pa.array([cents.min()]),
                "mxc": pa.array([cents.max()]),
            }
        )

    b = (
        ray.data.read_parquet(path, columns=["ts", "value"])
        .map_batches(bounds_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: one row per block
    )
    mn, mx = int(b["mn"].min()), int(b["mx"].max())
    mnc, mxc = int(b["mnc"].min()), int(b["mxc"].max())
    mid = mn + (mx - mn) // 2
    width = (mxc - mnc) // _PSI_BINS + 1

    def count_partial(t: pa.Table) -> pa.Table:
        tu = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        period = (tu > mid).astype(np.int64)
        bins = (cents - mnc) // width
        et = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": et, "period": period, "bin": bins})
        out = (
            df.groupby(["event_type", "period", "bin"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    counts = (
        ray.data.read_parquet(path, columns=["ts", "value", "event_type"])
        .map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: ≤ types×2×bins rows per block
        .groupby(["event_type", "period", "bin"])["cnt"]
        .sum()
    )

    types = sorted(counts.index.get_level_values(0).unique())
    rows = []
    for et in types:
        grid = np.zeros((2, _PSI_BINS), dtype=np.int64)
        sub = counts.loc[et]
        for (p, bn), c in sub.items():
            grid[int(p), int(bn)] = int(c)
        na, nb = grid[0].sum(), grid[1].sum()
        pa_ = (grid[0] + 1.0) / (na + float(_PSI_BINS))
        pb_ = (grid[1] + 1.0) / (nb + float(_PSI_BINS))
        terms = (pa_ - pb_) * np.log(pa_ / pb_)
        psi = terms.cumsum()[-1]  # sequential left-to-right, ≡ SQL list_sum
        rows.append((et, np.int64(np.floor(psi * 1e6 + 0.5))))
    return pd.DataFrame(rows, columns=["event_type", "psi_micro"]).astype(
        {"psi_micro": np.int64}
    )


ORACLES35["events_psi_drift"] = f"""
WITH c AS (
  SELECT event_type, epoch_us(ts) AS tu,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
g AS (SELECT min(tu) mn, max(tu) mx, min(cents) mnc, max(cents) mxc FROM c),
binned AS (
  SELECT event_type,
         CASE WHEN tu > mn + (mx - mn) // 2 THEN 1 ELSE 0 END AS period,
         (cents - mnc) // ((mxc - mnc) // {_PSI_BINS} + 1) AS bin
  FROM c CROSS JOIN g
),
cnts AS (
  SELECT event_type, period, bin, CAST(count(*) AS BIGINT) AS cnt
  FROM binned GROUP BY 1, 2, 3
),
grid AS (
  SELECT t.event_type, pr.period, b.bin
  FROM (SELECT DISTINCT event_type FROM c) t
  CROSS JOIN (VALUES (0), (1)) pr(period)
  CROSS JOIN (SELECT UNNEST(range(0, {_PSI_BINS})) AS bin) b
),
fullc AS (
  SELECT grid.event_type, grid.period, grid.bin, coalesce(cnts.cnt, 0) AS cnt
  FROM grid LEFT JOIN cnts
    ON grid.event_type = cnts.event_type
   AND grid.period = cnts.period AND grid.bin = cnts.bin
),
tot AS (
  SELECT event_type, period, CAST(sum(cnt) AS BIGINT) AS n
  FROM fullc GROUP BY 1, 2
),
terms AS (
  SELECT a.event_type, a.bin,
         ((a.cnt + 1.0) / (ta.n + {_PSI_BINS}.0)
          - (b.cnt + 1.0) / (tb.n + {_PSI_BINS}.0))
         * ln(((a.cnt + 1.0) / (ta.n + {_PSI_BINS}.0))
              / ((b.cnt + 1.0) / (tb.n + {_PSI_BINS}.0))) AS term
  FROM fullc a
  JOIN fullc b ON a.event_type = b.event_type AND a.bin = b.bin
             AND a.period = 0 AND b.period = 1
  JOIN tot ta ON ta.event_type = a.event_type AND ta.period = 0
  JOIN tot tb ON tb.event_type = a.event_type AND tb.period = 1
)
SELECT event_type,
       CAST(floor(list_sum(list(term ORDER BY bin)) * 1000000 + 0.5) AS BIGINT)
         AS psi_micro
FROM terms GROUP BY event_type"""


# ---------------------------------------------------------------------------
# emb_kcenter_coreset — exact greedy k-center (farthest-point) selection
# ---------------------------------------------------------------------------


def q_emb_kcenter_coreset(sf_dir: str):
    """Greedy k-center coreset (Gonzalez 1985 farthest-point traversal — the
    diversity-sampling recipe for training-data selection): start at the
    smallest vec_id, then k−1 times pick the point farthest from the chosen
    set (ties → smallest vec_id). Distances are EXACT int64 squared distances
    in micro-quantized space (the emb_kmeans_update trick), so selection is
    order-independent and the unrolled-CTE oracle replays it bit-for-bit.

    Each round is one streaming pass: the ≤k×dim center matrix broadcasts,
    a per-batch matmul computes min-distance-to-set, and each block emits ONE
    candidate row (argmax, tie-broken) — k passes, k×blocks driver residue.
    At corpus scale the documented alternative is sample-based k-center++;
    the exact pass count is the price of exact greedy semantics."""
    from ..functions.vectors import stack_list_column

    path = f"{sf_dir}/embeddings.parquet"

    def quantize(t: pa.Table) -> np.ndarray:
        mat = stack_list_column(t["embedding"])
        return np.floor(mat * 1e6 + 0.5).astype(np.int64)

    # pass 0: the smallest vec_id and its vector
    def start_partial(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        i = int(np.argmin(vid))
        q = quantize(t)
        return pa.table(
            {
                "vec_id": pa.array([vid[i]]),
                "qv": pa.array([q[i].tolist()], pa.list_(pa.int64())),
            }
        )

    ds = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    starts = ds.map_batches(start_partial, batch_format="pyarrow").to_pandas()
    srow = starts.sort_values("vec_id").iloc[0]
    centers = [np.array(srow["qv"], dtype=np.int64)]
    chosen = [(int(srow["vec_id"]), np.int64(0))]

    for _ in range(_KC_K - 1):
        cmat = np.stack(centers)  # (c, dim) int64
        c2 = (cmat * cmat).sum(axis=1)  # (c,)

        def far_partial(t: pa.Table, _cmat=cmat, _c2=c2) -> pa.Table:
            q = quantize(t)
            vid = t["vec_id"].to_numpy(zero_copy_only=False)
            q2 = (q * q).sum(axis=1)
            d2 = q2[:, None] + _c2[None, :] - 2 * (q @ _cmat.T)  # exact int64
            mind = d2.min(axis=1)
            best = mind.max()
            cand = np.flatnonzero(mind == best)
            i = cand[np.argmin(vid[cand])]  # tie → smallest vec_id
            return pa.table(
                {
                    "vec_id": pa.array([vid[i]]),
                    "md": pa.array([best]),
                    "qv": pa.array([q[i].tolist()], pa.list_(pa.int64())),
                }
            )

        parts = ds.map_batches(far_partial, batch_format="pyarrow").to_pandas()
        parts = parts.sort_values(["md", "vec_id"], ascending=[False, True])
        top = parts.iloc[0]
        centers.append(np.array(top["qv"], dtype=np.int64))
        chosen.append((int(top["vec_id"]), np.int64(top["md"])))

    return pd.DataFrame(
        {
            "step": np.arange(_KC_K, dtype=np.int64),
            "vec_id": np.array([c[0] for c in chosen], dtype=np.int64),
            "radius2": np.array([c[1] for c in chosen], dtype=np.int64),
        }
    )


def _kcenter_oracle(k: int = _KC_K) -> str:
    dist = (
        "SELECT q.vec_id,"
        " CAST(SUM((q.qv[i] - c.qv[i]) * (q.qv[i] - c.qv[i])) AS HUGEINT) AS d2"
        " FROM q, (SELECT qv FROM q JOIN {cent} ON q.vec_id = {cent}.vid) c,"
        " UNNEST(range(1, len(q.qv)::BIGINT + 1)) t(i) GROUP BY q.vec_id"
    )
    ctes = [
        "q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),"
        " x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv FROM embeddings)",
        "c0 AS (SELECT min(vec_id) AS vid FROM q)",
        f"d1 AS (SELECT vec_id, d2 AS md FROM ({dist.format(cent='c0')}) x)",
    ]
    sel = ["SELECT 0 AS step, vid AS vec_id, 0 AS radius2 FROM c0"]
    for j in range(1, k):
        ctes.append(
            f"c{j} AS (SELECT vec_id AS vid, md FROM d{j}"
            " ORDER BY md DESC, vec_id ASC LIMIT 1)"
        )
        sel.append(f"SELECT {j} AS step, vid AS vec_id, CAST(md AS BIGINT)"
                   f" AS radius2 FROM c{j}")
        if j < k - 1:
            ctes.append(
                f"d{j + 1} AS (SELECT d{j}.vec_id, LEAST(d{j}.md, x.d2) AS md"
                f" FROM d{j} JOIN ({dist.format(cent=f'c{j}')}) x USING (vec_id))"
            )
    union = " UNION ALL ".join(sel)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(step AS BIGINT) AS step, vec_id, radius2 FROM ({union})"
    )


ORACLES35["emb_kcenter_coreset"] = _kcenter_oracle()


QUERIES35 = {
    "events_psi_drift": q_events_psi_drift,
    "emb_kcenter_coreset": q_emb_kcenter_coreset,
}
