"""Log-body normalization — the polymorphic body fallback chain (M14).

The reference's log view exposes `body` as: a structured map used as-is; raw bytes
JSON-unmarshaled with string fallback; anything else stringified (reference:
connector/topologyconnector/internal/model.go:155-191).

Translation: `normalize_body` takes a string/binary column and produces

- ``body_kind``  — 'map' (valid JSON object), 'string' (fallback), 'empty'
- ``body``       — canonical JSON string for maps, the raw string otherwise
- ``body_keys``  — sorted top-level keys for maps (for has()/pick()/omit() rules)

Vectorized pre-filter: only rows that *look* like JSON objects (`{` prefix) enter
the per-row json.loads fallback loop.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..rules.expr import canonical_json


def normalize_body_batch(t: pa.Table, col: str = "props") -> pa.Table:
    raw = t[col]
    if pa.types.is_binary(raw.type):
        raw = pc.cast(raw, pa.string())
    vals = raw.to_numpy(zero_copy_only=False)
    looks_json = pc.starts_with(pc.utf8_trim_whitespace(raw), "{").to_numpy(
        zero_copy_only=False
    )
    kind = np.full(len(vals), "string", dtype=object)
    body = np.empty(len(vals), dtype=object)
    keys = np.full(len(vals), None, dtype=object)
    for i, v in enumerate(vals):
        if v is None or v == "":
            kind[i] = "empty"
            body[i] = ""
            continue
        if looks_json[i]:
            try:
                parsed = json.loads(v)
                if isinstance(parsed, dict):
                    kind[i] = "map"
                    body[i] = canonical_json(parsed)
                    keys[i] = ",".join(sorted(parsed.keys()))
                    continue
            except (json.JSONDecodeError, ValueError):
                pass  # string fallback (model.go:174-183)
        body[i] = str(v)
    out = t.append_column("body_kind", pa.array(kind, pa.string()))
    out = out.append_column("body", pa.array(body, pa.string()))
    return out.append_column("body_keys", pa.array(keys, pa.string()))


def normalize_body(ds: "ray.data.Dataset", col: str = "props") -> "ray.data.Dataset":
    return ds.map_batches(lambda t: normalize_body_batch(t, col), batch_format="pyarrow")
