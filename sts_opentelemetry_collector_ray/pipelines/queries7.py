"""Driver-contract queries, wave 7 — model-shaped quality classification
(hashed n-gram linear classifier), DSIR importance weights, byte-entropy
quality signal, HTML boilerplate strip, and keep-BEST-per-cluster near-dup
dedup. Same contract as queries.py: column names AND dtypes match the DuckDB
oracle exactly."""

from __future__ import annotations

import pyarrow as pa  # noqa: F401
import ray.data

ORACLES7: dict[str, str] = {}


def _fnv32_sql(expr: str) -> str:
    """FNV-1a32 of an expression's VARCHAR form (functions/hashing.py replay;
    ASCII corpus ⇒ unicode(c) == utf-8 byte)."""
    return (
        "list_reduce(list_prepend(2166136261::BIGINT, "
        f"list_transform(string_split(CAST({expr} AS VARCHAR), ''), "
        "c -> unicode(c)::BIGINT)), "
        "(acc, x) -> (xor(acc, x) * 16777619) % 4294967296)"
    )


# ---------------------------------------------------------------------------
# docs_classifier — fastText-shaped hashed n-gram linear scoring
# ---------------------------------------------------------------------------


def q_docs_classifier(sf_dir: str):
    """Hashed unigram+bigram linear classifier score per doc
    (stages/classify.py::hash_classifier_batch — broadcast weight table,
    whole-batch reduceat scoring, zero shuffles: the runtime shape of a
    trained fastText quality-classifier pass)."""
    from ..stages.classify import hash_classifier_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(hash_classifier_batch, batch_format="pyarrow")


def _classifier_oracle() -> str:
    """The 512 deterministic bucket weights are constants — inline them as a
    VALUES table (the docs_langid trigram-profile trick) and replay tokenize →
    feature → bucket → weight-sum exactly."""
    from ..stages.classify import CLASSIFIER_BUCKETS, classifier_weights

    w = classifier_weights()
    values = ", ".join(f"({b}, {int(w[b])})" for b in range(CLASSIFIER_BUCKETS))
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws FROM documents
),
feats AS (
  SELECT doc_id, 'u:' || unnest(ws) AS f FROM toks
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> 'b:' || ws[i] || ' ' || ws[i + 1])) AS f
  FROM toks
),
w(b, wt) AS (VALUES {values}),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
         CAST(sum(wt) AS BIGINT) AS score_int
  FROM feats JOIN w ON ({_fnv32_sql('f')} % {CLASSIFIER_BUCKETS}) = w.b
  GROUP BY doc_id
)
SELECT doc_id, n_feat, score_int, score_int > 0 AS quality_pass FROM scored"""


ORACLES7["docs_classifier"] = _classifier_oracle()


# ---------------------------------------------------------------------------
# docs_dsir — DSIR importance weights vs the lang='en' target slice
# ---------------------------------------------------------------------------


def q_docs_dsir(sf_dir: str):
    """DSIR importance weights (Xie et al. 2023): ONE streaming fit pass emits
    256-bucket bincount partials (raw + target slices share the pass), the
    bounded per-bucket log-ratio vector is broadcast, a second pass scores
    each doc (stages/classify.py::dsir_pipeline)."""
    from ..stages.classify import dsir_pipeline

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return dsir_pipeline(ds, target_lang="en")


def _dsir_oracle() -> str:
    from ..stages.classify import DSIR_BUCKETS

    n = DSIR_BUCKETS
    return f"""
WITH tok AS (
  SELECT doc_id, coalesce(lang, '') = 'en' AS tgt,
         unnest(string_split(coalesce(text, ''), ' ')) AS w
  FROM documents
),
bk AS (SELECT doc_id, tgt, {_fnv32_sql('w')} % {n} AS bkt FROM tok),
cnts AS (
  SELECT g.bkt, coalesce(c.r, 0)::DOUBLE AS r, coalesce(c.t, 0)::DOUBLE AS t
  FROM (SELECT unnest(range(0, {n})) AS bkt) g
  LEFT JOIN (SELECT bkt, count(*) AS r, count(*) FILTER (tgt) AS t
             FROM bk GROUP BY bkt) c USING (bkt)
),
tot AS (SELECT sum(r) AS br, sum(t) AS bt FROM cnts),
lam AS (
  SELECT bkt,
         CAST(floor((ln(t + 1.0) - ln(bt + {n}) - ln(r + 1.0) + ln(br + {n}))
                    * 1e6 + 0.5) AS BIGINT) AS l
  FROM cnts, tot
)
SELECT bk.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum(lam.l) AS BIGINT) AS dsir_micro
FROM bk JOIN lam USING (bkt) GROUP BY bk.doc_id"""


ORACLES7["docs_dsir"] = _dsir_oracle()


# ---------------------------------------------------------------------------
# docs_entropy — byte-level Shannon entropy (gibberish / compressibility)
# ---------------------------------------------------------------------------


def q_docs_entropy(sf_dir: str):
    """Byte-entropy per doc in integer micro-nats
    (text_analysis.py::entropy_batch — zero-copy bytes off the Arrow buffers,
    ONE bincount builds every per-doc histogram; no shuffles)."""
    from ..stages.text_analysis import entropy_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(entropy_batch, batch_format="pyarrow")


ORACLES7["docs_entropy"] = """
WITH base AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
ch AS (
  SELECT doc_id, length(t) AS len, unnest(string_split(t, '')) AS c
  FROM base WHERE length(t) > 0
),
hist AS (
  SELECT doc_id, any_value(len) AS len, c, count(*) AS cnt
  FROM ch GROUP BY doc_id, c
),
terms AS (
  SELECT doc_id,
         CAST(floor((cnt::DOUBLE / len) * ln(len::DOUBLE / cnt) * 1e6 + 0.5)
              AS BIGINT) AS term
  FROM hist
),
h AS (SELECT doc_id, CAST(sum(term) AS BIGINT) AS entropy_micro
      FROM terms GROUP BY doc_id)
SELECT b.doc_id, CAST(length(b.t) AS BIGINT) AS n_bytes, h.entropy_micro
FROM base b LEFT JOIN h USING (doc_id)"""


# ---------------------------------------------------------------------------
# docs_html_strip — boilerplate strip over a deterministic HTML wrapping
# ---------------------------------------------------------------------------


def q_docs_html_strip(sf_dir: str):
    """Wrap each doc in deterministic markup, then strip tags/entities and
    collapse whitespace (text_analysis.py::html_strip_batch — Arrow RE2
    kernels, zero shuffles). The wrap step makes the strip non-trivial on a
    plain-text corpus; DuckDB replays both steps."""
    import pyarrow.compute as pc

    from ..stages.text_analysis import html_strip_batch

    def wrap(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t["text"], "")
        html = pc.binary_join_element_wise(
            '<div class="d"><p>', txt, "</p></div> &nbsp;&#10;", ""
        )
        return pa.table({"doc_id": t["doc_id"], "html": html})

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(wrap, batch_format="pyarrow").map_batches(
        lambda t: html_strip_batch(t, col="html"), batch_format="pyarrow"
    )


ORACLES7["docs_html_strip"] = r"""
WITH wrapped AS (
  SELECT doc_id,
         '<div class="d"><p>' || coalesce(text, '') || '</p></div> &nbsp;&#10;'
           AS html
  FROM documents
),
s AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(regexp_replace(html,
              '<[^>]*>', ' ', 'g'),
              '&[a-zA-Z]+;|&#[0-9]+;', ' ', 'g'),
              '[ \t\r\n]+', ' ', 'g'), ' ') AS clean_text
  FROM wrapped
)
SELECT doc_id, clean_text, CAST(length(clean_text) AS BIGINT) AS n_chars FROM s"""


# ---------------------------------------------------------------------------
# docs_neardup_best — near-dup dedup keeping the BEST cluster member
# ---------------------------------------------------------------------------


def q_docs_neardup_best(sf_dir: str):
    """Near-dup dedup electing the highest-quality member per cluster (max
    n_chars, tie → min doc_id) — the production dedup recipe
    (dedup_docs.py::neardup_best_docs: LSH pairs → distributed components →
    two bounded bucket exchanges; labels never visit the driver)."""
    from ..stages.dedup_docs import neardup_best_docs

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
    )
    return neardup_best_docs(ds, jaccard_threshold=0.5)


def _neardup_best_oracle() -> str:
    from .queries3 import _components_sql

    return _components_sql(
        """SELECT doc_id FROM (
  SELECT d.doc_id,
         row_number() OVER (PARTITION BY coalesce(c.component, d.doc_id)
                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
) WHERE rn = 1"""
    )


ORACLES7["docs_neardup_best"] = _neardup_best_oracle()


QUERIES7 = {
    "docs_classifier": q_docs_classifier,
    "docs_dsir": q_docs_dsir,
    "docs_entropy": q_docs_entropy,
    "docs_html_strip": q_docs_html_strip,
    "docs_neardup_best": q_docs_neardup_best,
}
