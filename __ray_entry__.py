"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already initialised,
local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares it against
the matching ``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

Query registration is by discovery: every ``pipelines/queries*.py`` module is
imported and its ``QUERIES*`` / ``ORACLES*`` dicts (plus ``dynamic_oracles*()``
callables) merged. A duplicate query name across modules is a hard
``ImportError`` at registration time — never a silent shadow (round-3 lesson:
five late waves silently replaced five early-wave queries AND their oracles).
"""

from __future__ import annotations

import importlib
import pkgutil
import re
from collections.abc import Callable
from typing import Any

_PKG = "sts_opentelemetry_collector_ray.pipelines"
_MOD_RE = re.compile(r"^queries(\d*)$")


def _wave_modules() -> list[str]:
    """All pipelines.queries* module names, ordered by wave number (bare
    ``queries`` first). Deterministic so merge order never depends on the OS."""
    pkg = importlib.import_module(_PKG)
    found: list[tuple[int, str]] = []
    for info in pkgutil.iter_modules(pkg.__path__):
        m = _MOD_RE.match(info.name)
        if m:
            found.append((int(m.group(1) or 0), info.name))
    return [name for _, name in sorted(found)]


def _merge(kind: str) -> dict[str, Any]:
    """Merge every module's ``{kind}*`` dicts; raise on duplicate query names.

    ``kind`` is ``"QUERIES"`` or ``"ORACLES"``. For ORACLES, also calls any
    module-level ``dynamic_oracles*()`` functions (oracle SQL that must be
    rendered against the current ruleset/config at call time).
    """
    merged: dict[str, Any] = {}
    owner: dict[str, str] = {}
    for mod_name in _wave_modules():
        mod = importlib.import_module(f"{_PKG}.{mod_name}")
        sources: list[dict[str, Any]] = []
        for attr in dir(mod):
            if attr.startswith(kind) and isinstance(getattr(mod, attr), dict):
                sources.append(getattr(mod, attr))
            if kind == "ORACLES" and attr.startswith("dynamic_oracles") and callable(getattr(mod, attr)):
                sources.append(getattr(mod, attr)())
        for src in sources:
            for name, val in src.items():
                if name in merged:
                    raise ImportError(
                        f"duplicate query name {name!r}: registered by "
                        f"{owner[name]} and again by {mod_name} — rename one"
                    )
                merged[name] = val
                owner[name] = mod_name
    return merged


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: events-derived transcripts →
    parse → enrich → route (rule fan-out) → dedup. Returns the routed Dataset."""
    from sts_opentelemetry_collector_ray.pipelines import routed_dataset
    from sts_opentelemetry_collector_ray.sources import derive_transcripts_from_events

    ds = derive_transcripts_from_events("/root/testdata/sf0.001")
    return routed_dataset(ds, dedup=True, enrich_concurrency=2, route_concurrency=None)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return _merge("QUERIES")


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names and types). Queries
    absent here (LSH/heuristic operators) get the driver's rows-only check; their
    brute-force oracles live in tests/."""
    return _merge("ORACLES")
