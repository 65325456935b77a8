"""Round-3 text operators: repetition signals, contamination scan, redaction."""

import numpy as np
import pyarrow as pa

from sts_opentelemetry_collector_ray.stages.redact import redact_batch
from sts_opentelemetry_collector_ray.stages.text_analysis import repetition_batch


def test_repetition_signals():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["a b a b a", "x y z", "", "q q q q"],
        }
    )
    out = repetition_batch(t)
    assert out["n_tokens"].to_pylist() == [5, 3, 1, 4]
    assert out["dup_word_frac"].to_pylist() == [0.6, 0.0, 0.0, 0.75]
    # "a b" occurs twice in doc 1; overlapping runs can push frac past 1.0
    assert out["top_2gram_count"].to_pylist() == [2, 1, 0, 3]
    assert out["top_2gram_frac"].to_pylist() == [0.8, 0.666667, 0.0, 1.5]


def test_redact_rules_sequential_and_counts_on_original():
    t = pa.table(
        {
            "text": [
                "ping a@b.co then call:search(secret 42) via 10.0.0.1 x2",
                "nothing here",
                None,
            ]
        }
    )
    out = redact_batch(t)
    assert out["n_email"].to_pylist() == [1, 0, 0]
    assert out["n_ipv4"].to_pylist() == [1, 0, 0]
    assert out["n_call_arg"].to_pylist() == [1, 0, 0]
    # counts measured on the ORIGINAL text: 42, the IP's digits, and x2
    assert out["n_number"].to_pylist() == [6, 0, 0]
    red = out["redacted"].to_pylist()
    assert red[0] == "ping <EMAIL> then call:search(<ARG>) via <IP> x<NUM>"
    assert red[1] == "nothing here"
    assert red[2] == ""  # null text → empty, never null


def test_contamination_broadcast_scan(ray_session):
    import ray.data

    from sts_opentelemetry_collector_ray.functions.hashing import fnv1a32
    from sts_opentelemetry_collector_ray.stages.dedup_docs import contamination_check

    # craft ids so at least one lands in the probe split (fnv % 5 == 0)
    ids = [str(i) for i in range(40)]
    probe_ids = [i for i in ids if fnv1a32(i) % 5 == 0]
    train_id = next(i for i in ids if i not in probe_ids)
    leak = "alpha beta gamma delta epsilon"
    texts = []
    for i in ids:
        if i == probe_ids[0]:
            texts.append(f"{leak} zeta")  # probe doc carrying the phrase
        elif i == train_id:
            texts.append(f"noise {leak}")  # training doc contaminated by it
        else:
            texts.append(f"doc {i} unique words only {i} {i}x {i}y {i}z here")
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = contamination_check(ds, probe_mod=5).to_pandas()
    assert out["doc_id"].tolist() == [train_id]
    row = out.iloc[0]
    assert row["n_shared"] == 1  # exactly the planted 5-gram
    # probe docs themselves are never reported
    assert not set(out["doc_id"]) & set(probe_ids)


def test_contamination_explicit_probe_ds(ray_session):
    import ray.data

    from sts_opentelemetry_collector_ray.stages.dedup_docs import contamination_check

    leak_a = "alpha beta gamma delta epsilon"
    leak_b = "one two three four five"
    probe = ray.data.from_arrow(
        pa.table({"doc_id": ["p1", "p2"], "text": [f"{leak_a} zeta", f"intro {leak_b}"]})
    )
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": ["t1", "t2", "t3"],
                "text": [
                    f"noise {leak_a} more noise",  # shares one probe 5-gram
                    f"{leak_a} then {leak_b}",  # shares grams from both probes
                    "totally clean text with no overlap at all here",
                ],
            }
        )
    )
    out = (
        contamination_check(train, probe_ds=probe)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # explicit probe side: every training row is scanned (no % carve-out)
    assert out["doc_id"].tolist() == ["t1", "t2"]
    assert out["n_shared"].tolist() == [1, 2]


def test_contamination_broadcast_budget_enforced(ray_session):
    import pytest
    import ray.data

    from sts_opentelemetry_collector_ray.stages.dedup_docs import contamination_check

    probe = ray.data.from_arrow(
        pa.table({"doc_id": ["p"], "text": ["a b c d e f g h i j k l m n o p q r"]})
    )
    train = ray.data.from_arrow(pa.table({"doc_id": ["t"], "text": ["a b c d e x"]}))
    # 14 probe 5-grams × 8 B > 32 B budget → hard error before any broadcast
    with pytest.raises(ValueError, match="broadcast budget"):
        contamination_check(train, probe_ds=probe, broadcast_budget_bytes=32)


def test_contamination_probe_aggregate_is_deduped_distributed(ray_session):
    """Duplicate grams across probe batches must be removed by the bounded-bucket
    exchange BEFORE the driver materialize: the deduped hash set for a probe of
    many repeated docs is exactly the distinct-gram count, so a budget sized to
    the distinct set passes even though the raw (undeduped) gram stream × 8 B
    would blow it."""
    import ray.data

    from sts_opentelemetry_collector_ray.stages.dedup_docs import contamination_check

    leak = "alpha beta gamma delta epsilon"
    # 64 probe docs over ≥2 blocks, all carrying the SAME single 5-gram
    probe = ray.data.from_arrow(
        pa.table({"doc_id": [f"p{i}" for i in range(64)], "text": [leak] * 64})
    ).repartition(4)
    train = ray.data.from_arrow(pa.table({"doc_id": ["t"], "text": [f"x {leak} y"]}))
    # budget of 8 B = exactly ONE u64 hash: only passes if dedup ran distributed
    out = contamination_check(
        train, probe_ds=probe, broadcast_budget_bytes=8
    ).to_pandas()
    assert out["doc_id"].tolist() == ["t"]
    assert out["n_shared"].tolist() == [1]


def test_contamination_empty_probe_set(ray_session):
    """Regression (round-5 advice): an EMPTY probe hash set — explicit probe_ds
    whose texts are all too short to yield a 5-gram, or a carve-out modulus no
    doc_id hits — must yield an empty result, not IndexError from indexing an
    empty sorted array with non-empty candidate positions."""
    import ray.data

    from sts_opentelemetry_collector_ray.stages.dedup_docs import contamination_check

    train = ray.data.from_arrow(
        pa.table({"doc_id": ["t1"], "text": ["alpha beta gamma delta epsilon zeta"]})
    )
    # explicit probe side with zero grams (every text < 5 words)
    probe = ray.data.from_arrow(
        pa.table({"doc_id": ["p1", "p2"], "text": ["too short", "also tiny"]})
    )
    out = contamination_check(train, probe_ds=probe).to_pandas()
    assert len(out) == 0

    # carve-out path: probe_mod so large no fnv1a32(doc_id) % mod == 0
    out2 = contamination_check(train, probe_mod=10**9).to_pandas()
    assert len(out2) == 0


def test_fnv64_gram_oracle_is_byte_exact_non_ascii():
    """The DuckDB `_FNV64_GRAM` oracle expression must replay FNV-1a64 over the
    gram's UTF-8 BYTES — matching `fnv1a64_arrow` (which hashes raw Arrow
    string buffers) for non-ASCII too, not just the ASCII fixtures (round-5
    advice closed: codepoint-folding replaced by arithmetic UTF-8 expansion)."""
    import duckdb
    import numpy as np

    from sts_opentelemetry_collector_ray.functions.hashing import fnv1a64_arrow
    from sts_opentelemetry_collector_ray.pipelines.queries3 import _FNV64_GRAM

    grams = [
        "plain ascii five gram text",
        "naïve café déjà vu résumé",
        "日本語 の 五 グラム です",
        "mixed 🚀 emoji and ünïcode",
    ]
    want = fnv1a64_arrow(pa.array(grams))
    con = duckdb.connect()
    got = [
        int(con.execute(f"SELECT {_FNV64_GRAM} FROM (VALUES (?)) t(gram)", [g]).fetchone()[0])
        for g in grams
    ]
    assert got == [int(x) for x in np.asarray(want, dtype=np.uint64)]


def test_ngram_jaccard_empty_result_keeps_schema(ray_session, tmp_path):
    """Regression (found by the round-5 sf0.1 sweep): when NO doc pair clears
    the Jaccard threshold, Ray drops the all-empty Dataset's schema — the
    query wrapper must still return the typed (a:int64, b:int64,
    jaccard:float64) frame so the strict dtype gate holds at any scale."""
    import numpy as np
    import pyarrow.parquet as pq

    from sts_opentelemetry_collector_ray.pipelines.queries2 import q_docs_ngram_jaccard

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "alpha beta gamma delta",
                "epsilon zeta eta theta",
                "iota kappa lambda mu",
            ],
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q_docs_ngram_jaccard(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["a", "b", "jaccard"]
    assert out["a"].dtype == np.int64 and out["jaccard"].dtype == np.float64


def test_tfidf_top_terms(ray_session):
    import ray.data
    import os

    from sts_opentelemetry_collector_ray.pipelines.queries3 import q_docs_tfidf

    out = q_docs_tfidf("/root/testdata/sf0.001").to_pandas()
    assert set(out["rank"]) == {1, 2, 3}
    g = out.groupby("doc_id")
    assert (g.size() <= 3).all()
    # rank 1 has the max score within each doc
    top = out[out["rank"] == 1].set_index("doc_id")["score"]
    mx = g["score"].max()
    assert (top == mx[top.index]).all()


def test_stratified_sampling_rates(ray_session):
    from sts_opentelemetry_collector_ray.pipelines.queries3 import (
        STRATA_RATES,
        q_docs_sample_stratified,
    )

    out = q_docs_sample_stratified("/root/testdata/sf0.01").to_pandas()
    import duckdb

    full = duckdb.sql(
        "SELECT lang, count(*) n FROM read_parquet('/root/testdata/sf0.01/documents.parquet') GROUP BY 1"
    ).df().set_index("lang")["n"]
    kept = out.groupby("lang").size()
    for lang, rate in STRATA_RATES.items():
        frac = kept.get(lang, 0) / full[lang]
        assert abs(frac - rate / 100) < 0.25  # hash-uniformity within tolerance
    # en downsampled harder than the tail languages
    assert kept["en"] / full["en"] < kept["de"] / full["de"]


def test_lm_score_in_distribution_ordering(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.stages.text_analysis import lm_score_pipeline

    # corpus dominated by "a b" transitions; doc 3 is out-of-distribution,
    # doc 4 has a single token (no transitions → null score)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["a b a b a b", "a b a b", "x y z q", "solo"],
        }
    )
    out = (
        lm_score_pipeline(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_trans"].tolist() == [5, 3, 3, 0]
    assert np.isnan(out["lm_score"][3])
    # frequent transitions score higher (closer to 0) than rare ones
    assert out["lm_score"][0] > out["lm_score"][2]
    assert out["lm_score"][1] > out["lm_score"][2]


def test_line_dedup_within_doc_edges():
    import pyarrow as pa

    from sts_opentelemetry_collector_ray.stages.linededup import line_dedup_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "a b a b c d a b",  # "a b" repeats at widx 0,1,3 → keep first
                "",                  # empty text → one empty chunk
                "solo",              # shorter than the window
                "x y x y x y",       # collapses to one window
            ],
        }
    )
    out = line_dedup_batch(t, window=2)
    assert out["text"].to_pylist() == ["a b c d", "", "solo", "x y"]
    assert out["n_windows"].to_pylist() == [4, 1, 1, 3]
    assert out["n_kept"].to_pylist() == [2, 1, 1, 1]


def test_line_dedup_global_first_wins(ray_session):
    import pyarrow as pa
    import ray.data

    from sts_opentelemetry_collector_ray.stages.linededup import line_dedup_global

    # "a b" first occurs in doc 1 widx 0; doc 2 is entirely shadowed by doc 1
    # and must VANISH; doc 3 keeps only its novel window.
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["a b c d", "c d a b", "a b z z"],
        }
    )
    out = (
        line_dedup_global(ray.data.from_arrow(t), window=2, num_buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 3]
    assert out["text"].tolist() == ["a b c d", "z z"]
    assert out["n_kept"].tolist() == [2, 1]
