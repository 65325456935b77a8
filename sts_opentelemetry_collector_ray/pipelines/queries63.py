"""Driver-contract queries, wave 63 — per-label embedding centroids in exact
fixed point (the class-prototype step behind nearest-centroid classifiers and
drift monitors) and per-language character entropy (the corpus-level signal
ID / encoding-health check). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES63: dict[str, str] = {}

_CEN_SCALE = 1 << 20  # fixed-point 2^-20 quantization before summing
_CEN_OFF = 1 << 40  # positive offset so floor-div is replayable (DuckDB
# `//` truncates toward zero on negatives; Python floors)
_CEN_DIM = 64


# ---------------------------------------------------------------------------
# emb_label_centroids — grouped vector mean, exact fixed point
# ---------------------------------------------------------------------------


def q_emb_label_centroids(sf_dir: str):
    """Class prototypes: per label, the mean embedding — computed EXACTLY by
    quantizing each component to 2⁻²⁰ fixed point (floor(x·2²⁰ + 0.5), int64)
    and floor-dividing the integer sums, so the distributed sum is
    order-independent and byte-replayable (a float mean never is). Long
    output: one row per (label, dim).

    Scale shape: zero-copy flatten+reshape per batch; per-label int64 column
    sums (|labels|×d partial per block); ONE tiny exchange bounded by
    |labels|×d; floor-div finalize on the driver."""
    from ..functions.vectors import stack_list_column

    def partial(t: pa.Table) -> pd.DataFrame:
        v = stack_list_column(t["embedding"])
        q = np.floor(v * _CEN_SCALE + 0.5).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        frames = []
        for l in np.unique(lab):
            sel = q[lab == l]
            frames.append(
                pd.DataFrame(
                    {
                        "label": np.full(_CEN_DIM, l, np.int64),
                        "dim": np.arange(_CEN_DIM, dtype=np.int64),
                        "s": sel.sum(axis=0),
                        "n": np.full(_CEN_DIM, len(sel), np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |labels| x d per block
        .groupby(["label", "dim"])
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index()
    )
    s = agg["s"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    agg["centroid_fp"] = s // n  # numpy floor-div == the offset trick below
    out = agg[["label", "dim", "centroid_fp", "n"]].sort_values(
        ["label", "dim"], kind="mergesort"
    ).reset_index(drop=True)
    out["centroid_fp"] = out["centroid_fp"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


ORACLES63["emb_label_centroids"] = f"""
WITH u AS (
  SELECT label, CAST(g.i AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[CAST(g.i AS INT) + 1] AS DOUBLE)
                    * {_CEN_SCALE} + 0.5) AS BIGINT) AS q
  FROM embeddings CROSS JOIN range(0, {_CEN_DIM}) g(i)
),
a AS (
  SELECT CAST(label AS BIGINT) AS label, dim,
         CAST(sum(CAST(q AS HUGEINT)) AS HUGEINT) AS s,
         CAST(count(*) AS HUGEINT) AS n
  FROM u GROUP BY 1, 2
)
SELECT label, dim,
       CAST(((s + n * {_CEN_OFF}) // n) - {_CEN_OFF} AS BIGINT) AS centroid_fp,
       CAST(n AS BIGINT) AS n
FROM a ORDER BY label, dim"""


# ---------------------------------------------------------------------------
# docs_char_entropy_by_lang — corpus character entropy per language
# ---------------------------------------------------------------------------


def q_docs_char_entropy_by_lang(sf_dir: str):
    """Per-language character entropy H = −Σ p·ln p over the corpus char
    histogram — the cheap encoding-health / language-signal scalar. Terms
    sum in codepoint order (sequential cumsum ≡ DuckDB ordered list_sum).

    Scale shape: per-batch (lang, codepoint) counts via one utf-32 reinterpret
    + np.unique per language — no per-char Python; ONE tiny exchange bounded
    by |langs| × char domain; entropy on the driver over that histogram."""

    def partial(t: pa.Table) -> pd.DataFrame:
        langs = t["lang"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_numpy(zero_copy_only=False)
        frames = []
        for l in pd.unique(langs):
            joined = "".join(x for x in texts[langs == l].tolist() if x)
            if not joined:
                continue
            codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
            u, c = np.unique(codes, return_counts=True)
            frames.append(
                pd.DataFrame(
                    {
                        "lang": l,
                        "cp": u.astype(np.int64),
                        "cnt": c.astype(np.int64),
                    }
                )
            )
        if not frames:
            return pd.DataFrame({"lang": [], "cp": [], "cnt": []})
        return pd.concat(frames, ignore_index=True)

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "text"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |langs| x char domain
        .groupby(["lang", "cp"])["cnt"]
        .sum()
    )
    rows = []
    for lang in sorted(hist.index.get_level_values("lang").unique()):
        sub = hist.loc[lang].sort_index()
        c = sub.to_numpy(np.int64).astype(np.float64)
        n = c.sum()
        p = c / n
        terms = p * np.log(p)
        h = -terms.cumsum()[-1]  # codepoint order ≡ ordered list_sum
        rows.append((lang, int(n), len(sub), int(np.floor(h * 1e6 + 0.5))))
    return pd.DataFrame(
        {
            "lang": [r[0] for r in rows],
            "n_chars": np.array([r[1] for r in rows], np.int64),
            "n_distinct": np.array([r[2] for r in rows], np.int64),
            "entropy_micro": np.array([r[3] for r in rows], np.int64),
        }
    )


ORACLES63["docs_char_entropy_by_lang"] = """
WITH ch AS (
  SELECT lang, unicode(c) AS cp
  FROM (SELECT lang, unnest(string_split(text, '')) AS c FROM documents)
  WHERE c <> ''
),
h AS (SELECT lang, cp, CAST(count(*) AS BIGINT) AS cnt FROM ch GROUP BY 1, 2),
n AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct
      FROM h GROUP BY 1),
t AS (
  SELECT h.lang,
         (h.cnt * 1.0 / n.n) * ln(h.cnt * 1.0 / n.n) AS term, h.cp
  FROM h JOIN n USING (lang)
)
SELECT n.lang, n.n AS n_chars, n.n_distinct,
       CAST(floor(-list_sum(list(t.term ORDER BY t.cp)) * 1000000 + 0.5)
            AS BIGINT) AS entropy_micro
FROM t JOIN n USING (lang)
GROUP BY n.lang, n.n, n.n_distinct
ORDER BY n.lang"""


QUERIES63 = {
    "emb_label_centroids": q_emb_label_centroids,
    "docs_char_entropy_by_lang": q_docs_char_entropy_by_lang,
}
