"""Transcript corpus sources.

The engine's primary input is a Parquet table of multi-turn conversation / agent
transcripts with columns ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)`` — the flat analogue of the reference's OTLP log stream
(Resource → Scope → LogRecord flattened to one row per leaf; reference:
connector/topologyconnector/internal/signal_traverser.go:386-414).

Two deterministic sources:

1. `derive_transcripts_from_events(sf_dir)` — maps the driver testdata ``events`` table
   to the transcript shape, with a byte-identical DuckDB CTE
   (`TRANSCRIPTS_FROM_EVENTS_SQL`) so every downstream operator gets a value-hash
   oracle. ``turn_idx`` is a per-conversation row number — computed with a bounded
   hash-BUCKET exchange (``hash(conv_id) % B``) and one vectorized sort+cumcount per
   bucket, never one Python group per conversation (CLAUDE.md groupby rule).

2. `generate_transcripts(...)` — the seed-42 synthetic corpus of FIXTURES.md F1
   (Zipf-ish conversation lengths for skew, shuffled row order so the pipeline must
   restore per-conversation order, ~1% unparseable rows, a few null timestamps).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Deterministic event_type → (severity, role, tool) mapping. `signup` rows get a
# non-matching text (no `[SEV]` prefix) to exercise the parse fallback path, mirroring
# the reference's log-body fallback (internal/model.go:159-191).
_EVENT_MAP = {
    "error": ("ERROR", "tool", "bash"),
    "purchase": ("INFO", "assistant", "search"),
    "signup": ("INFO", "system", ""),
    "click": ("DEBUG", "user", ""),
    "view": ("WARN", "user", "browser"),
}

# The same derivation as ANSI SQL over the pre-registered `events` view. Text layout:
#   parseable:   "[SEV] <event_type> k=<k>[ call:<tool>(q<k>)][ attr.et=view attr.zone=z<k>]"
#                (attr tokens on `view` rows only — feeds the attrs→config/status path)
#   unparseable: "session start k=<k>"          (signup rows only)
TRANSCRIPTS_FROM_EVENTS_SQL = """
WITH ev AS (
  SELECT event_id, ts, user_id, event_type, value,
         regexp_extract(props, '"k": (\\d+)', 1) AS k,
         CASE event_type WHEN 'error' THEN 'ERROR' WHEN 'purchase' THEN 'INFO'
              WHEN 'signup' THEN 'INFO' WHEN 'click' THEN 'DEBUG' ELSE 'WARN' END AS sev,
         CASE event_type WHEN 'error' THEN 'tool' WHEN 'purchase' THEN 'assistant'
              WHEN 'signup' THEN 'system' ELSE 'user' END AS role,
         CASE event_type WHEN 'error' THEN 'bash' WHEN 'purchase' THEN 'search'
              WHEN 'view' THEN 'browser' ELSE '' END AS tool
  FROM events
),
transcripts AS (
  SELECT 'conv-' || printf('%08d', CAST(user_id AS BIGINT)) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
         role,
         CASE WHEN event_type = 'signup' THEN 'session start k=' || k
              ELSE '[' || sev || '] ' || event_type || ' k=' || k ||
                   CASE WHEN tool <> '' THEN ' call:' || tool || '(q' || k || ')' ELSE '' END ||
                   CASE WHEN event_type = 'view' AND k <> ''
                        THEN ' attr.et=view attr.zone=z' || k ELSE '' END
         END AS text,
         tool,
         ts
  FROM ev
)
"""


def _events_to_turns(batch: pa.Table) -> pa.Table:
    """Vectorized events → transcript columns (everything except turn_idx)."""
    df = batch.to_pandas()
    k = df["props"].str.extract(r'"k": (\d+)', expand=False).fillna("")
    et = df["event_type"]
    sev = et.map({e: v[0] for e, v in _EVENT_MAP.items()})
    role = et.map({e: v[1] for e, v in _EVENT_MAP.items()})
    tool = et.map({e: v[2] for e, v in _EVENT_MAP.items()})
    call = np.where(tool != "", " call:" + tool + "(q" + k + ")", "")
    # view rows carry span-like attr tokens so the attrs→configuration/status/
    # regex-tag paths get value-level oracles over driver testdata.
    attr = np.where((et == "view") & (k != ""), " attr.et=view attr.zone=z" + k, "")
    text = np.where(
        et == "signup",
        "session start k=" + k,
        "[" + sev + "] " + et + " k=" + k + call + attr,
    )
    out = pd.DataFrame(
        {
            "conv_id": "conv-" + df["user_id"].astype(str).str.zfill(8),
            "event_id": df["event_id"],
            "role": role,
            "text": text,
            "tool": tool,
            "ts": df["ts"],
        }
    )
    # strip the pandas schema metadata: pyarrow 16 schemas carrying it are
    # UNHASHABLE, which defeats Ray's block-schema dedup (a warning per reduce
    # task and a slow unify on every exchange)
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


def _number_turns_bucket(group: pd.DataFrame) -> pd.DataFrame:
    """One hash bucket of conversations: vectorized row_number over (ts, event_id)
    within conv_id — a single mergesort + boundary-scan cumcount, no per-conv calls."""
    group = group.sort_values(["conv_id", "ts", "event_id"], kind="mergesort")
    conv = group["conv_id"].to_numpy()
    n = len(group)
    idx = np.arange(n, dtype=np.int64)
    new_conv = np.empty(n, dtype=bool)
    new_conv[0] = True
    new_conv[1:] = conv[1:] != conv[:-1]
    starts = np.maximum.accumulate(np.where(new_conv, idx, 0))
    group = group.assign(turn_idx=(idx - starts).astype(np.int32))
    return group[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]


TURN_NUMBER_BUCKETS = 64  # bounded exchange key — scale-independent cardinality


def derive_transcripts_from_events(sf_dir: str) -> "ray.data.Dataset":
    """events.parquet → transcript-shaped Dataset (matches TRANSCRIPTS_FROM_EVENTS_SQL).

    Scale note: the per-conversation row-number is the only shuffle; it exchanges on
    ``hash(conv_id) % 64`` (bounded cardinality), then numbers every conversation in a
    bucket with ONE vectorized sort + boundary-scan — the sessionize pattern from
    ``stages/clusters.py``. Real transcript corpora arrive with ``turn_idx``
    materialized, so this stage exists only to manufacture the shape from testdata.
    """
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    ds = ds.map_batches(_events_to_turns, batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t["conv_id"].to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(ids) % TURN_NUMBER_BUCKETS).astype(np.int32)
        return t.append_column("_bucket", pa.array(b))

    ds = ds.map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("_bucket").map_groups(
        lambda g: _number_turns_bucket(g.drop(columns=["_bucket"])),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Synthetic corpus (FIXTURES.md F1) — seed-42, Zipf-ish skew, shuffled row order.
# ---------------------------------------------------------------------------

_ROLES = np.array(["user", "assistant", "tool", "system"])
_SEVS = np.array(["INFO", "WARN", "ERROR", "DEBUG"])
_TOOLS = np.array(["search", "bash", "browser", "python", "editor"])


def generate_transcripts(
    out_dir: str,
    n_turns: int = 10_000,
    seed: int = 42,
    rows_per_file: int = 65_536,
) -> str:
    """Write a deterministic transcript corpus under ``out_dir`` (parquet files).

    Zipf-ish turns-per-conversation (a few hot conversations to exercise skew
    salting), rows written in shuffled order (pipelines must restore per-conversation
    turn order), ~1% rows with no parseable tokens, ~2% null timestamps
    (timestamp-coalesce path, reference signal_traverser.go:111-119).
    """
    rng = np.random.default_rng(seed)
    conv_lens: list[int] = []
    total = 0
    while total < n_turns:
        ln = min(int(rng.zipf(1.5)) * 4, n_turns - total, 4096)
        ln = max(ln, 1)
        conv_lens.append(ln)
        total += ln
    n_convs = len(conv_lens)
    conv_ids = np.repeat(
        np.array([f"conv-{i:08d}" for i in range(n_convs)], dtype=object),
        conv_lens,
    )
    turn_idx = np.concatenate([np.arange(ln, dtype=np.int32) for ln in conv_lens])

    role = _ROLES[rng.integers(0, 4, total)]
    sev = _SEVS[rng.choice(4, total, p=[0.6, 0.15, 0.1, 0.15])]
    has_tool = (role == "tool") | (rng.random(total) < 0.15)
    tool = np.where(has_tool, _TOOLS[rng.integers(0, len(_TOOLS), total)], "")
    arg = rng.integers(0, 1000, total)

    base = np.char.add(np.char.add("[", sev.astype(str)), "] turn msg k=")
    base = np.char.add(base, arg.astype(str))
    call = np.where(
        tool != "",
        np.char.add(
            np.char.add(" call:", tool.astype(str)),
            np.char.add(np.char.add("(q", arg.astype(str)), ")"),
        ),
        "",
    )
    attrs = np.where(
        rng.random(total) < 0.3,
        np.char.add(" attr.env=prod attr.zone=z", (arg % 4).astype(str)),
        "",
    )
    text = np.char.add(np.char.add(base, call), attrs).astype(object)
    unparseable = rng.random(total) < 0.01
    text[unparseable] = "freeform note without tokens"

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    deltas = rng.integers(1, 30_000_000, total).cumsum()
    ts = (t0 + deltas.astype("timedelta64[us]")).astype("datetime64[us]")
    ts_obj = ts.astype(object)
    null_ts = rng.random(total) < 0.02
    ts_arr = pa.array(
        [None if null_ts[i] else ts_obj[i] for i in range(total)], pa.timestamp("us")
    )

    order = rng.permutation(total)
    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()).take(pa.array(order)),
            "turn_idx": pa.array(turn_idx, pa.int32()).take(pa.array(order)),
            "role": pa.array(role.astype(object), pa.string()).take(pa.array(order)),
            "text": pa.array(text, pa.string()).take(pa.array(order)),
            "tool": pa.array(tool.astype(object), pa.string()).take(pa.array(order)),
            "ts": ts_arr.take(pa.array(order)),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    for i in range(0, total, rows_per_file):
        pq.write_table(
            table.slice(i, rows_per_file),
            os.path.join(out_dir, f"transcripts-{i // rows_per_file:05d}.parquet"),
            row_group_size=16_384,  # fine row groups → Ray can split blocks > cores
        )
    return out_dir


def transcripts_path_for(n_turns: int, seed: int = 42, root: str = "/tmp/sts_ray_data") -> str:
    """Cached generation: one directory per (n_turns, seed), created on first use."""
    out = os.path.join(root, f"transcripts_n{n_turns}_s{seed}")
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        generate_transcripts(out, n_turns=n_turns, seed=seed)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def read_transcripts(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return ray.data.read_parquet(path, columns=columns)
