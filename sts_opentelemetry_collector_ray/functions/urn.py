"""URN templating.

The reference expands templates like ``urn:kubernetes:/${cluster}:${ns}/pod/${pod}``
over attribute maps with fasttemplate; a missing tag skips the whole template
(reference: common/identifier/identifier.go:12-100). Here a template compiles once
(driver / actor init) into segments, then expands vectorized over aligned numpy string
columns via element-wise concatenation.
"""

from __future__ import annotations

import re

import numpy as np

_VAR = re.compile(r"\$\{([^}]+)\}")


class UrnTemplate:
    """Compiled ``...${var}...`` template.

    `expand_columns(cols)` takes a dict of equal-length numpy/str arrays and returns an
    object ndarray; rows where any referenced variable is None/'' become None (the
    reference skips templates with missing tags, identifier.go:60-77).
    """

    def __init__(self, template: str):
        self.template = template
        self.parts: list[tuple[bool, str]] = []  # (is_var, text)
        pos = 0
        for m in _VAR.finditer(template):
            if m.start() > pos:
                self.parts.append((False, template[pos : m.start()]))
            self.parts.append((True, m.group(1)))
            pos = m.end()
        if pos < len(template):
            self.parts.append((False, template[pos:]))
        self.variables = [t for is_var, t in self.parts if is_var]

    def expand_row(self, attrs: dict) -> str | None:
        out = []
        for is_var, text in self.parts:
            if is_var:
                v = attrs.get(text)
                if v is None or v == "":
                    return None
                out.append(str(v))
            else:
                out.append(text)
        return "".join(out)

    def expand_columns(self, cols: dict[str, np.ndarray]) -> np.ndarray:
        n = len(next(iter(cols.values()))) if cols else 0
        if not self.variables:
            return np.full(n, self.template, dtype=object)
        result = np.full(n, "", dtype=object)
        missing = np.zeros(n, dtype=bool)
        for is_var, text in self.parts:
            if is_var:
                col = np.asarray(cols[text], dtype=object)
                col_missing = np.array([v is None or v == "" for v in col], dtype=bool)
                missing |= col_missing
                safe = np.where(col_missing, "", col.astype(str))
                result = np.char.add(result.astype(str), safe).astype(object)
            else:
                result = np.char.add(result.astype(str), text).astype(object)
        result = result.astype(object)
        result[missing] = None
        return result
