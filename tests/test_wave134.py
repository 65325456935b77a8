"""Edge-case tests for wave-134 operators: trigram-novelty attribution on a
hand-built corpus (first-seen ownership, short-doc exclusion, within-doc
duplicate trigrams counted once), and week-stability Jaccard on constructed
user/week event-type sets. The value contract itself is enforced by the
parametrized oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_docs(tmp_path, texts):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["web"] * n,
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/documents.parquet")


def _write_events(tmp_path, ts, users, types):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.asarray(users, dtype=np.int64),
            "event_type": types,
            "value": np.ones(n),
            "props": ['{"k": 1}'] * n,
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/events.parquet")


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_ngram_novelty_first_seen_ownership(tmp_path):
    # doc 0 owns "a b c" and "b c d"; doc 1 repeats "a b c" (stale) and adds
    # "c d e"-style new material; doc 2 is all-stale vs doc 0.
    _write_docs(
        tmp_path,
        [
            "a b c d",       # trigrams: "a b c", "b c d" -> both novel (2/2)
            "a b c x",       # "a b c" stale, "b c x" novel -> 1/2
            "a b c d",       # both stale -> 0/2
        ],
    )
    got = _run("docs_ngram_novelty", tmp_path).sort_values("doc_id")
    assert list(got["n_ngrams"]) == [2, 2, 2]
    assert list(got["n_novel"]) == [2, 1, 0]
    assert list(got["novelty_micro"]) == [1_000_000, 500_000, 0]


def test_ngram_novelty_short_docs_absent_and_dups_once(tmp_path):
    # doc 0: "a a a a" has trigram "a a a" twice -> distinct-counted ONCE;
    # doc 1 has only 2 tokens -> absent from the output entirely.
    _write_docs(tmp_path, ["a a a a", "x y"])
    got = _run("docs_ngram_novelty", tmp_path)
    assert list(got["doc_id"]) == [0]
    assert list(got["n_ngrams"]) == [1]
    assert list(got["n_novel"]) == [1]


def test_ngram_novelty_case_and_whitespace_normalization(tmp_path):
    # doc 1's "A  B\tC" normalizes to the same trigram doc 0 owns.
    _write_docs(tmp_path, ["a b c", "A  B\tC"])
    got = _run("docs_ngram_novelty", tmp_path).sort_values("doc_id")
    assert list(got["n_novel"]) == [1, 0]


def test_week_stability_hand_jaccard(tmp_path):
    # user 1: week0 {a,b}, week1 {b,c} -> J = 1/3; user 2 active week0 only
    # (no adjacent pair -> excluded). Epoch week boundaries: 1970-01-01 is
    # week 0 day 0 (Thursday); stay inside single weeks via day offsets.
    _write_events(
        tmp_path,
        ts=[
            "1970-01-01", "1970-01-02",          # u1 week0: a, b
            "1970-01-08", "1970-01-09",          # u1 week1: b, c
            "1970-01-03",                          # u2 week0: a
        ],
        users=[1, 1, 1, 1, 2],
        types=["a", "b", "b", "c", "a"],
    )
    got = _run("users_week_stability", tmp_path)
    assert list(got["week"]) == [0]
    assert list(got["n_users"]) == [1]
    # floor(1/3 * 1e6 + 0.5) = 333333
    assert list(got["sum_jaccard_micro"]) == [333333]
    assert list(got["avg_jaccard_micro"]) == [333333]


def test_week_stability_duplicate_events_are_set_semantics(tmp_path):
    # repeated (user, week, type) rows collapse: J stays 1.0 not inflated.
    _write_events(
        tmp_path,
        ts=["1970-01-01", "1970-01-02", "1970-01-08", "1970-01-08"],
        users=[1, 1, 1, 1],
        types=["a", "a", "a", "a"],
    )
    got = _run("users_week_stability", tmp_path)
    assert list(got["sum_jaccard_micro"]) == [1_000_000]
    assert list(got["n_users"]) == [1]
