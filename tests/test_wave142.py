"""Edge-case tests for wave-142: suffix extraction semantics (short words,
unicode codepoints, type counting) — the checkpointed-pagerank surface is
covered by tests/test_graph_checkpoint.py and the oracle gate."""

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


def _run(path):
    got = entrymod.queries()["docs_suffix_census"](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def test_suffix_extraction_and_type_counts(tmp_path):
    # "walking talking" share suffix "ing" (2 tokens, 2 types);
    # "ab" is shorter than 3 -> the whole word is its own suffix;
    # "walking" repeated counts tokens but not types.
    _write_docs(tmp_path, ["walking talking walking", "ab ab"])
    got = _run(tmp_path).set_index("suffix")
    assert int(got.loc["ing", "n_tokens"]) == 3
    assert int(got.loc["ing", "n_types"]) == 2
    assert int(got.loc["ab", "n_tokens"]) == 2
    assert int(got.loc["ab", "n_types"]) == 1
    # shares: 5 tokens total
    assert int(got.loc["ing", "share_micro"]) == 600_000
    # rank 1 is the heaviest suffix
    assert got["rank"].loc[got["n_tokens"].idxmax()] == 1


def test_suffix_unicode_codepoints(tmp_path):
    # codepoint (not byte) slicing: "café" -> suffix "afé"
    _write_docs(tmp_path, ["café café"])
    got = _run(tmp_path)
    assert list(got["suffix"]) == ["afé"]
    assert list(got["n_tokens"]) == [2]
