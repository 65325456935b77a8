"""Driver-contract queries, wave 384 — silhouette coefficients by
embedding label over a cosine-distance sample and an add-one-smoothed
role-bigram language model evaluated train/test across a conv-hash
split. Same contract as queries.py: column names AND dtypes match the
DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES384: dict[str, str] = {}

_SIL_SAMPLE = 120


# ---------------------------------------------------------------------------
# emb_silhouette_by_label — clustering quality per label
# ---------------------------------------------------------------------------


def q_emb_silhouette_by_label(sf_dir: str):
    """Silhouette on cosine distance (1 - cos) over the 120 lowest
    vec_ids: a(i) = mean intra-label distance, b(i) = min over other
    labels of the mean distance, s = (b - a)/max(a, b). All pair
    folds run in (vec_id order) on both sides; per-label means fold in
    vec order. Per label: label, n, mean_silhouette_milli."""

    sample = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding", "label"],
        )
        .to_pandas()
        .sort_values("vec_id")
        .head(_SIL_SAMPLE)
        .reset_index(drop=True)
    )
    cols = ["label", "n", "mean_silhouette_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    m = len(sample)
    if m < 4:
        return empty
    vecs = [np.asarray(e, np.float64) for e in sample["embedding"]]
    ids = sample["vec_id"].to_numpy(np.int64)
    labels = sample["label"].to_numpy(np.int64)
    d = len(vecs[0])

    def fold(vals) -> float:
        acc = 0.0
        for v in vals:
            acc = acc + float(v)
        return acc

    norms = [
        float(np.sqrt(fold(v[i] * v[i] for i in range(d)))) for v in vecs
    ]
    # pair distances, indexed
    dist = {}
    for a in range(m):
        for b in range(m):
            if a == b:
                continue
            dot = fold(vecs[a][i] * vecs[b][i] for i in range(d))
            dist[(a, b)] = 1.0 - dot / (norms[a] * norms[b])
    lab_set = sorted(set(int(x) for x in labels))
    if len(lab_set) < 2:
        return empty
    members = {
        lb: [i for i in range(m) if int(labels[i]) == lb]
        for lb in lab_set
    }
    sils = {lb: [] for lb in lab_set}
    for a in range(m):
        la = int(labels[a])
        own = [i for i in members[la] if i != a]
        if not own:
            continue
        a_val = fold(dist[(a, i)] for i in own) / float(len(own))
        b_val = None
        for lb in lab_set:
            if lb == la:
                continue
            others = members[lb]
            if not others:
                continue
            mval = fold(dist[(a, i)] for i in others) / float(len(others))
            if b_val is None or mval < b_val:
                b_val = mval
        if b_val is None:
            continue
        denom = a_val if a_val > b_val else b_val
        if denom <= 0.0:
            continue
        sils[la].append((b_val - a_val) / denom)
    rows = []
    for lb in lab_set:
        vals = sils[lb]
        if not vals:
            continue
        rows.append(
            (
                np.int64(lb), np.int64(len(vals)),
                np.int64(np.floor(
                    fold(vals) / float(len(vals)) * 1_000.0 + 0.5
                )),
            )
        )
    if not rows:
        return empty
    return pd.DataFrame(rows, columns=cols).astype(
        {c: np.int64 for c in cols}
    )


ORACLES384["emb_silhouette_by_label"] = f"""
WITH sample AS (
  SELECT vec_id, embedding, label,
         row_number() OVER (ORDER BY vec_id) AS rn
  FROM embeddings QUALIFY rn <= {_SIL_SAMPLE}
),
dims AS (
  SELECT vec_id, CAST(r.range AS BIGINT) AS i,
         CAST(embedding[CAST(r.range AS BIGINT) + 1] AS DOUBLE) AS v
  FROM sample, range(0, 4096) r
  WHERE r.range < len(embedding)
),
norms AS (
  SELECT vec_id,
         sqrt(list_reduce(list_prepend(0.0, list(v * v ORDER BY i)),
                          (a, b) -> a + b)) AS nrm
  FROM dims GROUP BY 1
),
pairs AS (
  SELECT a.vec_id AS va, a.label AS la, b.vec_id AS vb, b.label AS lb
  FROM sample a JOIN sample b ON a.vec_id <> b.vec_id
),
dists AS (
  SELECT p.va, p.la, p.vb, p.lb,
         1.0 - list_reduce(list_prepend(0.0,
                 list(da.v * db.v ORDER BY da.i)), (x, y) -> x + y)
               / (na.nrm * nb.nrm) AS dd
  FROM pairs p
  JOIN dims da ON da.vec_id = p.va
  JOIN dims db ON db.vec_id = p.vb AND db.i = da.i
  JOIN norms na ON na.vec_id = p.va
  JOIN norms nb ON nb.vec_id = p.vb
  GROUP BY p.va, p.la, p.vb, p.lb, na.nrm, nb.nrm
),
agg AS (
  SELECT va, la, lb,
         list_reduce(list_prepend(0.0, list(dd ORDER BY vb)),
                     (x, y) -> x + y) / count(*) AS mean_d
  FROM dists GROUP BY va, la, lb
),
aval AS (SELECT va, la, mean_d AS a FROM agg WHERE la = lb),
bval AS (
  SELECT va, min(mean_d) AS b FROM agg WHERE la <> lb GROUP BY 1
),
sil AS (
  SELECT aval.la,
         (bval.b - aval.a) / greatest(aval.a, bval.b) AS s,
         aval.va
  FROM aval JOIN bval USING (va)
  WHERE greatest(aval.a, bval.b) > 0
),
f AS (
  SELECT la, CAST(count(*) AS BIGINT) AS n,
         list_reduce(list_prepend(0.0, list(s ORDER BY va)),
                     (x, y) -> x + y) AS acc
  FROM sil GROUP BY 1
)
SELECT CAST(la AS BIGINT) AS label, n,
       CAST(floor(acc / n * 1000.0 + 0.5) AS BIGINT)
         AS mean_silhouette_milli
FROM f
ORDER BY label"""


# ---------------------------------------------------------------------------
# conv_role_bigram_perplexity — add-one bigram LM train/test
# ---------------------------------------------------------------------------


def q_conv_role_bigram_perplexity(sf_dir: str):
    """A role-sequence bigram language model: conversations split by
    FNV hash parity of conv_id (even = train, odd = test); add-one
    smoothing over the bounded role vocabulary; test cross-entropy
    folds over cells in (prev, cur) order. One row: n_train_bigrams,
    n_test_bigrams, vocab, ce_milli, ppl_milli."""
    from ..functions.hashing import fnv1a64_array
    from ..sources.transcripts import derive_transcripts_from_events

    ds = derive_transcripts_from_events(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "conv": np.asarray(
                    t["conv_id"].to_numpy(zero_copy_only=False)
                ),
                "turn": t["turn_idx"].to_numpy(zero_copy_only=False).astype(
                    np.int64
                ),
                "role": np.asarray(
                    t["role"].to_numpy(zero_copy_only=False)
                ),
            }
        )
        df["_b"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(64)
        ).astype(np.int64)
        df["_tr"] = (
            fnv1a64_array(df["conv"].to_numpy(object)) % np.uint64(2)
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        zero = pd.DataFrame(
            {
                "tr": pd.Series([], dtype=np.int64),
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "c": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return zero
        g = g.sort_values(["conv", "turn"], kind="stable")
        conv = g["conv"].to_numpy(object)
        role = g["role"].to_numpy(object)
        tr = g["_tr"].to_numpy(np.int64)
        same = conv[1:] == conv[:-1]
        out = (
            pd.DataFrame(
                {
                    "tr": tr[1:][same],
                    "a": role[:-1][same],
                    "b": role[1:][same],
                }
            )
            .groupby(["tr", "a", "b"])
            .size()
            .rename("c")
            .reset_index()
        )
        out["c"] = out["c"].astype(np.int64)
        return out

    cube = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .groupby(["tr", "a", "b"])["c"]
        .sum()
        .reset_index()
    )
    cols = ["n_train_bigrams", "n_test_bigrams", "vocab", "ce_milli",
            "ppl_milli"]
    empty = pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    if cube.empty:
        return empty
    vocab = sorted(set(cube["a"]) | set(cube["b"]))
    v = len(vocab)
    train = cube[cube["tr"] == 0]
    test = cube[cube["tr"] == 1]
    n_train = int(train["c"].sum())
    n_test = int(test["c"].sum())
    if n_train == 0 or n_test == 0 or v == 0:
        return empty
    tr_cell = {
        (a_, b_): int(c_)
        for a_, b_, c_ in zip(train["a"], train["b"], train["c"])
    }
    tr_ctx = train.groupby("a")["c"].sum()
    acc = 0.0
    for _, r in test.sort_values(["a", "b"]).iterrows():
        num = tr_cell.get((r["a"], r["b"]), 0) + 1
        den = int(tr_ctx.get(r["a"], 0)) + v
        acc = acc + float(int(r["c"])) * float(
            np.log(float(num) / float(den))
        )
    ce = -acc / float(n_test)
    ppl = float(np.exp(ce))
    return pd.DataFrame(
        [
            (
                np.int64(n_train), np.int64(n_test), np.int64(v),
                np.int64(np.floor(ce * 1_000.0 + 0.5)),
                np.int64(np.floor(ppl * 1_000.0 + 0.5)),
            )
        ],
        columns=cols,
    ).astype({c: np.int64 for c in cols})


def _ppl_oracle() -> str:
    from ..sources.transcripts import TRANSCRIPTS_FROM_EVENTS_SQL

    fnv = (
        "list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), "
        "list_transform(string_split(conv_id, ''), "
        "c -> unicode(c)::HUGEINT)), "
        "(acc, x) -> (xor(acc, x) * 1099511628211) % 18446744073709551616)"
    )
    return (
        TRANSCRIPTS_FROM_EVENTS_SQL
        + f""",
seq AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pr,
         CAST(({fnv}) % 2 AS BIGINT) AS tr
  FROM transcripts
),
big AS (
  SELECT tr, pr AS a, role AS b, CAST(count(*) AS BIGINT) AS c
  FROM seq WHERE pr IS NOT NULL GROUP BY 1, 2, 3
),
vocab AS (
  SELECT CAST(count(*) AS BIGINT) AS v
  FROM (SELECT a AS r FROM big UNION SELECT b FROM big)
),
tr_ctx AS (
  SELECT a, CAST(sum(c) AS BIGINT) AS c FROM big WHERE tr = 0 GROUP BY 1
),
tots AS (
  SELECT
    (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM big WHERE tr = 0)
      AS ntr,
    (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM big WHERE tr = 1)
      AS nte
),
terms AS (
  SELECT te.a, te.b,
         CAST(te.c AS DOUBLE)
           * ln(CAST(coalesce(tr.c, 0) + 1 AS DOUBLE)
                / (coalesce(ctx.c, 0) + vocab.v)) AS t
  FROM big te
  LEFT JOIN big tr ON tr.tr = 0 AND tr.a = te.a AND tr.b = te.b
  LEFT JOIN tr_ctx ctx ON ctx.a = te.a,
  vocab
  WHERE te.tr = 1
),
folded AS (
  SELECT list_reduce(list_prepend(0.0, list(t ORDER BY a, b)),
                     (x, y) -> x + y) AS acc
  FROM terms
),
f AS (
  SELECT tots.ntr, tots.nte, vocab.v,
         -folded.acc / tots.nte AS ce
  FROM tots, vocab, folded
  WHERE tots.ntr > 0 AND tots.nte > 0 AND vocab.v > 0
)
SELECT ntr AS n_train_bigrams, nte AS n_test_bigrams, v AS vocab,
       CAST(floor(ce * 1000.0 + 0.5) AS BIGINT) AS ce_milli,
       CAST(floor(exp(ce) * 1000.0 + 0.5) AS BIGINT) AS ppl_milli
FROM f"""
    )


def _register_dynamic() -> None:
    ORACLES384["conv_role_bigram_perplexity"] = _ppl_oracle()


_register_dynamic()

QUERIES384 = {
    "emb_silhouette_by_label": q_emb_silhouette_by_label,
    "conv_role_bigram_perplexity": q_conv_role_bigram_perplexity,
}
