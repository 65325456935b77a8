"""Guard against silent query-name shadowing: the driver contract merges
every wave's QUERIESn dict with `{**a, **b}`, so a duplicated key silently
overwrites the earlier operator (this bit wave 247, which shadowed wave
134's docs_ngram_novelty). The merged dict must be exactly as large as the
sum of its parts, and every query key must have an oracle or be a known
rows-only entry."""

import importlib
import re
from pathlib import Path

import __ray_entry__ as entrymod

_PKG = "sts_opentelemetry_collector_ray.pipelines"


def _wave_modules():
    pdir = Path(entrymod.__file__).parent / "sts_opentelemetry_collector_ray" / "pipelines"
    names = []
    for p in pdir.glob("queries*.py"):
        m = re.fullmatch(r"queries(\d*)", p.stem)
        if m:
            names.append((int(m.group(1) or 1), p.stem))
    return [n for _, n in sorted(names)]


def test_no_query_name_collisions():
    total = 0
    seen = {}
    for stem in _wave_modules():
        mod = importlib.import_module(f"{_PKG}.{stem}")
        suffix = stem.removeprefix("queries")
        d = getattr(mod, f"QUERIES{suffix}", None)
        if d is None:
            continue
        for k in d:
            assert k not in seen, (
                f"query {k!r} defined in both {seen[k]} and {stem}"
            )
            seen[k] = stem
        total += len(d)
    merged = entrymod.queries()
    assert len(merged) == total


def test_every_query_has_oracle():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    missing = q - o
    # rows-only entries are allowed but must be deliberate — keep this
    # list empty unless a query genuinely cannot be SQL-expressed
    assert missing == set(), f"queries without oracles: {sorted(missing)}"
    assert o <= q, f"oracles without queries: {sorted(o - q)}"


def test_duplicate_name_raises_importerror(tmp_path, monkeypatch):
    """A duplicated query name across wave modules must be a HARD ImportError
    at registration time — never a silent shadow (round-3 defect class)."""
    import sys
    import textwrap

    import pytest

    pkg_dir = tmp_path / "fakepkg" / "pipelines"
    pkg_dir.mkdir(parents=True)
    (tmp_path / "fakepkg" / "__init__.py").write_text("")
    (pkg_dir / "__init__.py").write_text("")
    (pkg_dir / "queries1.py").write_text(
        textwrap.dedent("""
        QUERIES1 = {"dup_query": lambda sf: None}
        ORACLES1 = {"dup_query": "SELECT 1"}
        """)
    )
    (pkg_dir / "queries2.py").write_text(
        textwrap.dedent("""
        QUERIES2 = {"dup_query": lambda sf: None}
        ORACLES2 = {"dup_query": "SELECT 2"}
        """)
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setattr(entrymod, "_PKG", "fakepkg.pipelines")
    try:
        with pytest.raises(ImportError, match="duplicate query name 'dup_query'"):
            entrymod.queries()
        with pytest.raises(ImportError, match="duplicate query name 'dup_query'"):
            entrymod.oracle_sql()
    finally:
        for m in [k for k in sys.modules if k.startswith("fakepkg")]:
            del sys.modules[m]
