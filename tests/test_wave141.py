"""Edge-case tests for wave-141 operators: first-use depth on the real
derived transcripts (min semantics, tool-role filter) and per-source dup
share on hand-built documents. The value contract itself is enforced by the
parametrized oracle gate (test_queries_vs_oracle)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(name, path):
    got = entrymod.queries()[name](str(path))
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    return got


def _write_docs(tmp_path, sources, texts):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": sources,
            "n_chars": np.asarray([len(t) for t in texts], dtype=np.int64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{tmp_path}/documents.parquet")


def test_first_use_reconciles_with_transcripts():
    from sts_opentelemetry_collector_ray.sources.transcripts import (
        TRANSCRIPTS_FROM_EVENTS_SQL,
    )

    got = _run("conv_tool_first_use", SF)
    assert len(got) > 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    # total histogram mass = number of distinct (conv, tool) pairs
    n_pairs = con.execute(
        TRANSCRIPTS_FROM_EVENTS_SQL
        + """ SELECT count(*) FROM (
            SELECT DISTINCT conv_id, tool FROM transcripts
            WHERE role = 'tool' AND tool <> '')"""
    ).fetchone()[0]
    assert int(got["n_convs"].sum()) == n_pairs
    # spot-check one (tool, conv): the min turn really is the first
    tool = got["tool"].iloc[0]
    mins = con.execute(
        TRANSCRIPTS_FROM_EVENTS_SQL
        + f""" SELECT min(turn_idx) FROM transcripts
             WHERE role = 'tool' AND tool = '{tool}' GROUP BY conv_id"""
    ).fetchall()
    hist = {}
    for (m,) in mins:
        hist[m] = hist.get(m, 0) + 1
    sub = got[got["tool"] == tool]
    assert dict(zip(sub["first_turn"], sub["n_convs"])) == hist


def test_dup_ratio_by_source_hand_case(tmp_path):
    # web: 4 docs, 2 distinct -> dup 0.5; books: 2 docs all distinct -> 0.
    _write_docs(
        tmp_path,
        sources=["web", "web", "web", "web", "books", "books"],
        texts=["a", "a", "b", "b", "x", "y"],
    )
    got = _run("docs_dup_ratio_by_source", tmp_path).set_index("source")
    assert int(got.loc["web", "dup_micro"]) == 500_000
    assert int(got.loc["web", "n_distinct"]) == 2
    assert int(got.loc["books", "dup_micro"]) == 0


def test_dup_ratio_same_text_different_sources_not_merged(tmp_path):
    # identical text under two sources counts as distinct within EACH source.
    _write_docs(tmp_path, ["web", "books"], ["same", "same"])
    got = _run("docs_dup_ratio_by_source", tmp_path)
    assert (got["dup_micro"] == 0).all()
    assert (got["n_distinct"] == 1).all()
