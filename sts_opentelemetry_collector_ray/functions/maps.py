"""`pick` / `omit` map functions.

The reference registers these as custom CEL functions: ``pick(map, [keys])`` keeps only
the listed keys, ``omit(map, [keys])`` drops them (reference:
connector/topologyconnector/internal/cel_functions.go:35-101). Used by rules e.g.
``omit(log.body, ['status'])`` (test/e2e/logtopology_test.go:465).
"""

from __future__ import annotations

from collections.abc import Mapping


def pick(m: Mapping, keys) -> dict:
    ks = set(keys)
    return {k: v for k, v in m.items() if k in ks}


def omit(m: Mapping, keys) -> dict:
    ks = set(keys)
    return {k: v for k, v in m.items() if k not in ks}
