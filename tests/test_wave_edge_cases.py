"""Edge-case tests for the wave 13-15 operators: tiny adversarial tables are
driven through BOTH the Ray query and its DuckDB oracle (the oracle SQL for
these queries is sf-independent — it computes its own fit constants), so the
value contract is checked on inputs the sf testdata can't produce: sub-width
docs, single-item baskets, duplicate basket items, timestamp ties, empty
tools."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod


def _write(dirpath: str, name: str, df: pd.DataFrame, schema: pa.Schema):
    os.makedirs(dirpath, exist_ok=True)
    t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(t.replace_schema_metadata(None), f"{dirpath}/{name}.parquet")


def _compare(name: str, sf_dir: str, tables: list[str]):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](sf_dir)
    import ray.data

    if isinstance(got, ray.data.Dataset):
        got = got.to_pandas()
    elif not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    exp = con.execute(oracles[name]).df()
    cols = sorted(got.columns)
    g = got.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    e = exp.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    assert list(g.dtypes.astype(str)) == list(e.dtypes.astype(str)), (
        f"{name}: dtypes {list(g.dtypes)} != {list(e.dtypes)}"
    )
    assert len(g) == len(e), f"{name}: rows {len(g)} != {len(e)}"
    assert g.equals(e), f"{name}: values diverge\n{g}\nvs\n{e}"
    return g


_DOC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])


@pytest.fixture(scope="module")
def edge_docs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_docs"))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "a b c d e",  # exactly one 5-gram
                "a b c d e f",  # overlaps doc 0's shingle
                "a b c d",  # sub-width: no shingles
                "",  # empty
                None,  # null text
                "x x x x x x x x x x",  # same shingle repeated WITHIN one doc
                "  padded   tokens   here   now   five  ",  # whitespace runs
                "merge window scan merge merge",  # bm25 terms
            ],
        }
    )
    _write(d, "documents", docs, _DOC_SCHEMA)
    return d


def test_dup_spans_edges(edge_docs):
    g = _compare("docs_dup_spans", edge_docs, ["documents"])
    by = {int(r.doc_id): r for r in g.itertuples()}
    # sub-width / empty / null docs emit NO shingle rows at all
    assert set(by) == {0, 1, 5, 6, 7}
    # doc 0's single shingle "a b c d e" also opens doc 1 → dup on both sides
    assert by[0].dup_positions == 1 and by[0].total_positions == 1
    assert by[1].dup_positions == 1 and by[1].total_positions == 2
    # within-doc repetition alone makes every position a dup
    assert by[5].dup_positions == 6 and by[5].total_positions == 6
    # whitespace runs collapse: 5 tokens → 1 unique shingle, not duplicated
    assert by[6].dup_positions == 0 and by[6].total_positions == 1


def test_token_pairs_and_bm25_edges(edge_docs):
    _compare("docs_token_pairs", edge_docs, ["documents"])
    g = _compare("docs_bm25", edge_docs, ["documents"])
    # every doc scores (zero-token docs score 0), and the term-bearing doc wins
    assert len(g) == 8
    assert g.loc[g["bm25"].idxmax()].doc_id == 7
    assert (g[g["doc_id"].isin([3, 4])]["bm25"] == 0.0).all()


_EVENTS_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)


@pytest.fixture(scope="module")
def edge_events(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_events"))
    base = pd.Timestamp("2024-01-01 10:00:00")
    rows = []
    # user 1: five events at the SAME timestamp (rate-cap tie-break by id),
    # all tool-bearing types → four tool transitions
    for i in range(5):
        rows.append((i, base, 1, ["error", "purchase", "view", "error", "view"][i], 1.5, '{"k": 1}'))
    # user 2: events straddling an hour boundary — cap resets per window
    for i in range(4):
        rows.append((10 + i, base + pd.Timedelta(minutes=50 + 5 * i), 2, "click", -2.25, "{}"))
    # user 3: a single event (no transitions, trivially capped)
    rows.append((20, base, 3, "signup", 0.0, '{"k": 9}'))
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    _write(d, "events", df, _EVENTS_SCHEMA)
    return d


def test_rate_cap_tie_break_and_window_reset(edge_events):
    g = _compare("events_rate_cap", edge_events, ["events"])
    u1 = g[g["user_id"] == 1]
    # equal timestamps: the 3 smallest event_ids survive
    assert sorted(u1["event_id"]) == [0, 1, 2]
    u2 = g[g["user_id"] == 2].sort_values("event_id")
    # 10:50/10:55 in hour 10, 11:00/11:05 restart rank 1 in hour 11
    assert list(u2["rk"]) == [1, 2, 1, 2]


def test_running_total_negative_cents_and_transitions(edge_events):
    g = _compare("events_running_total", edge_events, ["events"])
    u2 = g[g["user_id"] == 2].sort_values("event_id")
    assert list(u2["running_cents"]) == [-225, -450, -675, -900]
    t = _compare("conv_tool_transitions", edge_events, ["events"])
    got = {(r.tool_from, r.tool_to): r.n for r in t.itertuples()}
    # user 1 order by (ts, event_id): bash→search→browser→bash→browser
    assert got == {
        ("bash", "search"): 1,
        ("search", "browser"): 1,
        ("browser", "bash"): 1,
        ("bash", "browser"): 1,
    }


_LINEITEM_SCHEMA = pa.schema(
    [("l_orderkey", pa.int64()), ("l_partkey", pa.int64())]
)


def test_basket_pairs_dedup_and_singletons(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_lineitem"))
    df = pd.DataFrame(
        {
            # order 1: parts {7, 7, 9} → the duplicate 7 collapses → one pair
            # order 2: single item → no pairs
            # orders 3,4: same pair {7, 9} again → count 2 total with order 1...
            "l_orderkey": [1, 1, 1, 2, 3, 3, 4, 4],
            "l_partkey": [7, 7, 9, 5, 7, 9, 9, 7],
        }
    )
    _write(d, "lineitem", df, _LINEITEM_SCHEMA)
    g = _compare("basket_pairs", d, ["lineitem"])
    got = {(r.part_a, r.part_b): r.n for r in g.itertuples()}
    assert got == {(7, 9): 3}


def test_ref_integrity_finds_orphans(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_ri"))
    _write(
        d, "customer",
        pd.DataFrame({"c_custkey": np.array([1, 2], dtype=np.int64)}),
        pa.schema([("c_custkey", pa.int64())]),
    )
    _write(
        d, "orders",
        pd.DataFrame(
            {
                "o_orderkey": np.array([10, 11, 12], dtype=np.int64),
                # custkey 99 twice → ONE distinct orphan key
                "o_custkey": np.array([1, 99, 99], dtype=np.int64),
            }
        ),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    )
    _write(
        d, "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": np.array([10, 13, 14], dtype=np.int64),  # 13, 14 orphaned
                "l_partkey": np.array([5, 5, 5], dtype=np.int64),
            }
        ),
        pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64())]),
    )
    _write(
        d, "part",
        pd.DataFrame({"p_partkey": np.array([5], dtype=np.int64)}),
        pa.schema([("p_partkey", pa.int64())]),
    )
    g = _compare("ref_integrity", d, ["customer", "orders", "lineitem", "part"])
    got = {r.check_name: (r.orphan_keys, r.passed) for r in g.itertuples()}
    assert got == {
        "orders_customer": (1, False),
        "lineitem_orders": (2, False),
        "lineitem_part": (0, True),
    }


def test_distinct_rows_drops_real_duplicates(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_dr"))
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "event_id": np.array([1, 1, 1, 2], dtype=np.int64),
            "ts": [base] * 4,
            "user_id": np.array([7, 7, 7, 7], dtype=np.int64),
            "event_type": ["click", "click", "view", "click"],
            "value": [1.5, 1.5, 1.5, 1.5],
            "props": ["{}"] * 4,
        }
    )
    _write(d, "events", df, _EVENTS_SCHEMA)
    g = _compare("events_distinct_rows", d, ["events"])
    # rows 0 and 1 are identical over the projected columns → one survives
    assert len(g) == 3


def test_quality_checks_catch_violations(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_qc"))
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            # event_id 1 duplicated twice → 2 uniqueness violations
            "event_id": np.array([1, 1, 1, 2, 3], dtype=np.int64),
            "ts": [base, base, None, base, base],
            "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "event_type": ["click", "hover", "view", "view", "click"],
            "value": [10.0, -5.0, 900.0, 100.0, np.nan],
            "props": ["{}"] * 5,
        }
    )
    _write(d, "events", df, _EVENTS_SCHEMA)
    g = _compare("events_quality_checks", d, ["events"])
    got = {r.check_name: (r.violations, r.passed) for r in g.itertuples()}
    assert got == {
        "unique_event_id": (2, False),
        "ts_complete": (1, False),
        "value_in_range": (2, False),  # -5 and 900; NULL value is not a range violation
        "event_type_enum": (1, False),  # 'hover'
    }
