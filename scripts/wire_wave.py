#!/usr/bin/env python
"""Wire a new queriesN.py wave module into __ray_entry__.py (idempotent).

Usage: python scripts/wire_wave.py <N>
Adds the QUERIESN/ORACLESN imports and merges them into the returned dicts.
"""
import re
import sys


def main() -> None:
    n = int(sys.argv[1])
    prev = n - 1
    path = "__ray_entry__.py"
    s = open(path).read()
    if f"queries{n} import" in s:
        print(f"wave {n} already wired")
        return
    for kind in ("QUERIES", "ORACLES"):
        imp_prev = (
            f"    from sts_opentelemetry_collector_ray.pipelines.queries{prev} "
            f"import {kind}{prev}\n"
        )
        imp_new = (
            imp_prev
            + f"    from sts_opentelemetry_collector_ray.pipelines.queries{n} "
            f"import {kind}{n}\n"
        )
        assert imp_prev in s, f"missing import anchor for {kind}{prev}"
        s = s.replace(imp_prev, imp_new)
        s = re.sub(
            rf"\*\*{kind}{prev}(?=[,}}])",
            f"**{kind}{prev}, **{kind}{n}",
            s,
            count=1,
        )
    open(path, "w").write(s)
    print(f"wired wave {n}")


if __name__ == "__main__":
    main()
