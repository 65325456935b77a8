"""Driver-contract queries, wave 385 — ship-delay statistics by order
priority (orderkey-bucketed merge of two large tables) and a
nearest-centroid embedding classifier evaluated across an id-parity
split. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES385: dict[str, str] = {}

_SD_BUCKETS = 64
_DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# lineitem_shipdelay_by_priority — delay stats via orderkey merge
# ---------------------------------------------------------------------------


def q_lineitem_shipdelay_by_priority(sf_dir: str):
    """Fulfilment latency: per order priority the distribution of
    l_shipdate - o_orderdate (days). Both large tables exchange on the
    SAME orderkey bucket; per-priority day histograms give exact
    medians. Per priority: orderpriority, n, median_delay_days,
    mean_delay_days_milli."""

    def l_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "ok": df["l_orderkey"].to_numpy(np.int64),
                "sd": df["l_shipdate"].to_numpy("datetime64[us]").astype(
                    np.int64
                ) // _DAY_US,
                "od": np.int64(0),
                "pri": "",
            }
        )
        out["_b"] = (out["ok"] % _SD_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(0)
        return out[["_b", "_src", "ok", "sd", "od", "pri"]]

    def o_partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        out = pd.DataFrame(
            {
                "ok": df["o_orderkey"].to_numpy(np.int64),
                "sd": np.int64(0),
                "od": df["o_orderdate"].to_numpy("datetime64[us]").astype(
                    np.int64
                ) // _DAY_US,
                "pri": df["o_orderpriority"].to_numpy(object),
            }
        )
        out["_b"] = (out["ok"] % _SD_BUCKETS).astype(np.int64)
        out["_src"] = np.int64(1)
        return out[["_b", "_src", "ok", "sd", "od", "pri"]]

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(l_partial, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "pri": pd.Series([], dtype=object),
                "delay": pd.Series([], dtype=np.int64),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        l = g[g["_src"] == 0]
        o = g[g["_src"] == 1]
        if len(l) == 0 or len(o) == 0:
            return zero
        od = o.set_index("ok")[["od", "pri"]]
        l = l.join(od, on="ok", rsuffix="_o").dropna(subset=["pri_o"])
        if l.empty:
            return zero
        h = (
            pd.DataFrame(
                {
                    "pri": l["pri_o"].to_numpy(object),
                    "delay": (
                        l["sd"].to_numpy(np.int64)
                        - l["od_o"].to_numpy(np.int64)
                    ),
                }
            )
            .groupby(["pri", "delay"])
            .size()
            .rename("c")
            .reset_index()
        )
        h["c"] = h["c"].astype(np.int64)
        h["delay"] = h["delay"].astype(np.int64)
        return h

    hist = (
        li.union(orders)
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["pri", "delay"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["orderpriority", "n", "median_delay_days",
            "mean_delay_days_milli"]
    empty = pd.DataFrame(
        {
            "orderpriority": pd.Series([], dtype=object),
            **{c: pd.Series([], dtype=np.int64) for c in cols[1:]},
        }
    )
    if hist.empty:
        return empty
    rows = []
    for pri in sorted(hist["pri"].unique()):
        sub = hist[hist["pri"] == pri].sort_values("delay")
        d = sub["delay"].to_numpy(np.int64)
        c = sub["c"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        med = int(d[int(np.searchsorted(cum, (n + 1) // 2, side="left"))])
        total = int((d.astype(object) * c.astype(object)).sum())
        rows.append(
            (
                pri, np.int64(n), np.int64(med),
                np.int64(np.floor(
                    float(total) / float(n) * 1_000.0 + 0.5
                )),
            )
        )
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols[1:]}
    )


ORACLES385["lineitem_shipdelay_by_priority"] = f"""
WITH j AS (
  SELECT o.o_orderpriority AS pri,
         CAST(epoch_us(l.l_shipdate) // {_DAY_US}
              - epoch_us(o.o_orderdate) // {_DAY_US} AS BIGINT) AS delay
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
h AS (
  SELECT pri, delay, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2
),
nn AS (
  SELECT pri, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CAST(delay AS HUGEINT) * c) AS HUGEINT) AS tot
  FROM h GROUP BY 1
),
cum AS (
  SELECT pri, delay, sum(c) OVER (PARTITION BY pri ORDER BY delay) AS cc
  FROM h
),
med AS (
  SELECT cum.pri, min(cum.delay) AS v
  FROM cum JOIN nn USING (pri)
  WHERE cum.cc >= (nn.n + 1) // 2
  GROUP BY 1
)
SELECT nn.pri AS orderpriority, nn.n, med.v AS median_delay_days,
       CAST(floor(CAST(nn.tot AS DOUBLE) / nn.n * 1000.0 + 0.5)
            AS BIGINT) AS mean_delay_days_milli
FROM nn JOIN med USING (pri)
ORDER BY orderpriority"""


# ---------------------------------------------------------------------------
# emb_centroid_classifier — nearest-centroid accuracy
# ---------------------------------------------------------------------------


def q_emb_centroid_classifier(sf_dir: str):
    """Nearest-centroid classifier: per-label centroids are the mean
    of train vectors (even vec_ids, per-dim folds in vec_id order);
    each odd vec_id classifies to the centroid with the largest cosine
    (ties -> smaller label). One row: n_train, n_test, n_labels,
    n_correct, acc_micro."""

    df = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    cols = ["n_train", "n_test", "n_labels", "n_correct", "acc_micro"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if len(df) < 4:
        return empty
    ids = df["vec_id"].to_numpy(np.int64)
    labels = df["label"].to_numpy(np.int64)
    vecs = [np.asarray(e, np.float64) for e in df["embedding"]]
    d = len(vecs[0])
    train_idx = [i for i in range(len(df)) if int(ids[i]) % 2 == 0]
    test_idx = [i for i in range(len(df)) if int(ids[i]) % 2 == 1]
    if not train_idx or not test_idx:
        return empty

    def fold(vals) -> float:
        acc = 0.0
        for v in vals:
            acc = acc + float(v)
        return acc

    lab_set = sorted(set(int(labels[i]) for i in train_idx))
    if len(lab_set) < 2:
        return empty
    centroids = {}
    for lb in lab_set:
        members = [i for i in train_idx if int(labels[i]) == lb]
        cent = []
        for j in range(d):
            cent.append(
                fold(vecs[i][j] for i in members) / float(len(members))
            )
        centroids[lb] = cent
    cnorm = {
        lb: float(np.sqrt(fold(c[j] * c[j] for j in range(d))))
        for lb, c in centroids.items()
    }
    correct = 0
    for i in test_idx:
        vn = float(np.sqrt(fold(vecs[i][j] * vecs[i][j]
                                for j in range(d))))
        best = None
        best_lb = None
        for lb in lab_set:
            dot = fold(vecs[i][j] * centroids[lb][j] for j in range(d))
            cos = dot / (vn * cnorm[lb])
            if best is None or cos > best:
                best = cos
                best_lb = lb
        if best_lb == int(labels[i]):
            correct += 1
    return pd.DataFrame(
        [
            (
                np.int64(len(train_idx)), np.int64(len(test_idx)),
                np.int64(len(lab_set)), np.int64(correct),
                np.int64(np.floor(
                    float(correct) / float(len(test_idx))
                    * 1_000_000.0 + 0.5
                )),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


ORACLES385["emb_centroid_classifier"] = """
WITH dims AS (
  SELECT vec_id, label, CAST(r.range AS BIGINT) AS i,
         CAST(embedding[CAST(r.range AS BIGINT) + 1] AS DOUBLE) AS v
  FROM embeddings, range(0, 4096) r
  WHERE r.range < len(embedding)
),
cent AS (
  SELECT label, i,
         list_reduce(list_prepend(0.0, list(v ORDER BY vec_id)),
                     (a, b) -> a + b) / count(*) AS cv
  FROM dims WHERE vec_id % 2 = 0
  GROUP BY 1, 2
),
labs AS (SELECT DISTINCT label FROM cent),
nl AS (SELECT CAST(count(*) AS BIGINT) AS k FROM labs),
cnorm AS (
  SELECT label,
         sqrt(list_reduce(list_prepend(0.0, list(cv * cv ORDER BY i)),
                          (a, b) -> a + b)) AS nrm
  FROM cent GROUP BY 1
),
vnorm AS (
  SELECT vec_id,
         sqrt(list_reduce(list_prepend(0.0, list(v * v ORDER BY i)),
                          (a, b) -> a + b)) AS nrm
  FROM dims WHERE vec_id % 2 = 1
  GROUP BY 1
),
scores AS (
  SELECT d.vec_id, cent.label AS cl,
         list_reduce(list_prepend(0.0,
           list(d.v * cent.cv ORDER BY d.i)), (a, b) -> a + b)
           / (vnorm.nrm * cnorm.nrm) AS cos
  FROM dims d
  JOIN cent ON cent.i = d.i
  JOIN vnorm ON vnorm.vec_id = d.vec_id
  JOIN cnorm ON cnorm.label = cent.label
  WHERE d.vec_id % 2 = 1
  GROUP BY d.vec_id, cent.label, vnorm.nrm, cnorm.nrm
),
pick AS (
  SELECT vec_id, cl,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, cl) AS rk
  FROM scores
),
hit AS (
  SELECT e.vec_id,
         CASE WHEN pick.cl = e.label THEN 1 ELSE 0 END AS ok
  FROM pick
  JOIN embeddings e ON e.vec_id = pick.vec_id
  WHERE pick.rk = 1
),
tr AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
  WHERE vec_id % 2 = 0
),
f AS (
  SELECT tr.n AS ntr,
         (SELECT CAST(count(*) AS BIGINT) FROM hit) AS nte,
         (SELECT CAST(sum(ok) AS BIGINT) FROM hit) AS correct,
         nl.k
  FROM tr, nl
)
SELECT ntr AS n_train, nte AS n_test, k AS n_labels,
       correct AS n_correct,
       CAST(floor(CAST(correct AS DOUBLE) / nte * 1000000.0 + 0.5)
            AS BIGINT) AS acc_micro
FROM f
WHERE ntr > 0 AND nte > 0 AND k >= 2"""


QUERIES385 = {
    "lineitem_shipdelay_by_priority": q_lineitem_shipdelay_by_priority,
    "emb_centroid_classifier": q_emb_centroid_classifier,
}
