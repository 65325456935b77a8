"""Driver-contract queries, wave 81 — perceptual image hashing (64-bit
block-mean aHash over decoded RGB payloads: the image-dedup fingerprint) and
out-of-vocabulary drift (train a vocabulary on half the corpus, measure the
OOV token rate of the other half per source — the vocab-drift monitor for
tokenizer/corpus mismatches). Same contract as queries.py: column names AND
dtypes match the DuckDB oracle exactly.

The phash oracle is a FULL pixel replay (the `_image_thumbs_oracle`
precedent): every red-channel pixel re-derives from the closed-form synth
formulas, cell sums and the division-free threshold (S_cell·64 > S_total)
are exact integers, and the 64-bit pack replays with an inlined power table
plus two's-complement wraparound."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

ORACLES81: dict[str, str] = {}

_OOV_K = 500
_CELL_W, _CELL_H = 8, 6  # 64×48 bitmap → 8×8 grid of 8×6-pixel cells


# ---------------------------------------------------------------------------
# image_phash — 64-bit block-mean perceptual hash
# ---------------------------------------------------------------------------


class ImagePhashActor:
    """REAL decode + hash: raw RGB24 payloads decode as ONE frombuffer +
    reshape per batch; the red channel's 8×8 block sums are exact integer
    pooling, a bit is set iff its cell sum beats the global mean
    (division-free: S_cell · 64 > S_total), and the 64 bits pack into an
    int64 via uint64 wraparound. No per-pixel Python."""

    def __init__(self):
        from ..stages.multimodal import IMG_H, IMG_W

        self.h, self.w = IMG_H, IMG_W
        self.pow2 = np.left_shift(
            np.uint64(1), np.arange(64, dtype=np.uint64)
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        n = len(payloads)
        if n == 0:
            return pa.table(
                {
                    "media_id": pa.array([], pa.int64()),
                    "phash": pa.array([], pa.int64()),
                    "n_bits": pa.array([], pa.int64()),
                }
            )
        img = np.frombuffer(b"".join(payloads), dtype=np.uint8).reshape(
            n, self.h, self.w, 3
        )
        red = img[..., 0].astype(np.int64)
        cells = red.reshape(
            n, 8, _CELL_H, 8, _CELL_W
        ).sum(axis=(2, 4))  # (n, cy, cx) exact integer block sums
        tot = cells.sum(axis=(1, 2))
        bits = (cells.reshape(n, 64) * 64 > tot[:, None]).astype(np.uint64)
        hv = (bits * self.pow2[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "media_id": t["media_id"],
                "phash": pa.array(hv.view(np.int64)),
                "n_bits": pa.array(bits.sum(axis=1).astype(np.int64)),
            }
        )


def q_image_phash(sf_dir: str):
    """Perceptual fingerprints for image dedup: synthesize → decode →
    block-mean aHash, one row of (media_id, phash, n_bits) per image.

    Scale shape: stateless synth batches feed the hash actor pool (small
    batches for binary payloads); output is 3 scalar columns — payloads
    never leave the stage."""
    from ..stages.multimodal import synthesize_image_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = ds.map_batches(synthesize_image_batch, batch_format="pyarrow")
    return media.map_batches(
        ImagePhashActor,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 2),
        num_cpus=0.75,
    )


def _image_phash_oracle() -> str:
    from ..stages.multimodal import IMG_H, IMG_W

    powers = ",\n    ".join(
        f"({c}, {1 << c})" for c in range(64)
    )
    return f"""
WITH px AS (
  SELECT d.doc_id,
         (y.y // {_CELL_H}) * 8 + (x.x // {_CELL_W}) AS c,
         CASE WHEN x.x >= d.doc_id % {IMG_W - 16}
               AND x.x <  d.doc_id % {IMG_W - 16} + 16
               AND y.y >= (d.doc_id * 7) % {IMG_H - 12}
               AND y.y <  (d.doc_id * 7) % {IMG_H - 12} + 12
              THEN 255 - (x.x * 255) // {IMG_W - 1}
              ELSE (x.x * 255) // {IMG_W - 1} END AS r
  FROM documents d,
       unnest(range(0, {IMG_H})) AS y(y),
       unnest(range(0, {IMG_W})) AS x(x)
),
cell AS (
  SELECT doc_id, c, sum(r) AS s FROM px GROUP BY 1, 2
),
tot AS (SELECT doc_id, sum(s) AS st FROM cell GROUP BY 1),
p(c, pw) AS (SELECT * FROM (VALUES
    {powers}
)),
bits AS (
  SELECT cell.doc_id,
         CASE WHEN cell.s * 64 > tot.st THEN 1 ELSE 0 END AS b,
         p.pw
  FROM cell JOIN tot ON tot.doc_id = cell.doc_id
            JOIN p ON p.c = cell.c
),
h AS (
  SELECT doc_id,
         sum(CAST(b AS HUGEINT) * CAST(pw AS HUGEINT)) AS hv,
         CAST(sum(b) AS BIGINT) AS nb
  FROM bits GROUP BY 1
)
SELECT doc_id AS media_id,
       CAST(CASE WHEN hv >= 9223372036854775808
                 THEN hv - 18446744073709551616 ELSE hv END AS BIGINT)
         AS phash,
       nb AS n_bits
FROM h"""


ORACLES81["image_phash"] = _image_phash_oracle()


# ---------------------------------------------------------------------------
# docs_oov_rate — OOV drift of held-out docs vs a half-corpus vocabulary
# ---------------------------------------------------------------------------


def q_docs_oov_rate(sf_dir: str):
    """Vocabulary drift: build the top-{K} vocabulary (count DESC, token ASC)
    from EVEN doc_ids, then measure per source over ODD doc_ids the token
    count, OOV token count and exact micro OOV rate.

    Scale shape: pass 1 is the docs_vocab wordcount combiner → Ray hash
    aggregate → tiny sort+limit; the vocab set broadcasts in the closure.
    Pass 2 tokenizes odd docs per batch with Arrow kernels and emits
    per-source integer partials — the driver re-reduces |sources|
    rows.""".format(K=_OOV_K)
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    even = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def local_counts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        t = t.filter(pa.array((ids % 2) == 0))  # vectorized parity mask
        toks = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+")
        flat = toks.combine_chunks().flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"token": flat}).group_by(["token"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["token", "pn"])

    top = (
        even.map_batches(local_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("pn", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(_OOV_K)
        .to_pandas()  # bounded: K rows
    )
    vocab = set(top["token"].tolist())

    def oov_partial(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        m = (ids % 2) == 1
        sub = t.filter(pa.array(m))
        toks = pc.split_pattern_regex(pc.utf8_lower(sub["text"]), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        inv = ~np.isin(
            np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object),
            list(vocab),
        )
        row = np.repeat(np.arange(len(counts)), counts)
        src = np.asarray(sub["source"].to_numpy(zero_copy_only=False))
        g = (
            pd.DataFrame(
                {
                    "source": src[row[keep]],
                    "oov": inv[keep].astype(np.int64),
                    "one": np.int64(1),
                }
            )
            .groupby("source", sort=False, as_index=False)[["oov", "one"]]
            .sum()
        )
        return pd.DataFrame(
            {
                "source": g["source"].astype(object),
                "n_oov": g["oov"].to_numpy(np.int64),
                "n_tok": g["one"].to_numpy(np.int64),
            }
        )

    part = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        .map_batches(oov_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: |sources| rows per block
        .groupby("source", as_index=False)[["n_oov", "n_tok"]]
        .sum()
        .sort_values("source", kind="mergesort")
    )
    n_oov = part["n_oov"].to_numpy(np.int64)
    n_tok = part["n_tok"].to_numpy(np.int64)
    rate = np.where(n_tok > 0, (n_oov * 1_000_000) // np.maximum(n_tok, 1), 0)
    return pd.DataFrame(
        {
            "source": part["source"].astype(object),
            "n_tokens": n_tok,
            "n_oov": n_oov,
            "oov_rate_micro": rate.astype(np.int64),
        }
    )


ORACLES81["docs_oov_rate"] = f"""
WITH vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> '')) AS token
          FROM documents WHERE doc_id % 2 = 0)
    GROUP BY token ORDER BY n DESC, token LIMIT {_OOV_K}
  )
),
toks AS (
  SELECT source,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents WHERE doc_id % 2 = 1
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(count(*) FILTER (token NOT IN (SELECT token FROM vocab))
              AS BIGINT) AS n_oov
  FROM toks GROUP BY 1
)
SELECT source, n_tokens, n_oov,
       CAST(CASE WHEN n_tokens > 0
                 THEN (CAST(n_oov AS HUGEINT) * 1000000)
                      // CAST(n_tokens AS HUGEINT)
                 ELSE 0 END AS BIGINT) AS oov_rate_micro
FROM agg ORDER BY source"""


QUERIES81 = {
    "image_phash": q_image_phash,
    "docs_oov_rate": q_docs_oov_rate,
}
