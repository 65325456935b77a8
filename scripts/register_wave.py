#!/usr/bin/env python
"""Register a new pipelines/queriesN.py wave in __ray_entry__.py:
adds the QUERIESN/ORACLESN imports after the previous wave's and extends
both merge dicts. Usage: python scripts/register_wave.py N"""

import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n = int(sys.argv[1])
    p = os.path.join(_ROOT, "__ray_entry__.py")
    src = open(p).read()
    prev = n - 1
    for kind in ("QUERIES", "ORACLES"):
        imp_prev = (
            f"    from sts_opentelemetry_collector_ray.pipelines.queries{prev} "
            f"import {kind}{prev}\n"
        )
        imp_new = (
            f"    from sts_opentelemetry_collector_ray.pipelines.queries{n} "
            f"import {kind}{n}\n"
        )
        if imp_new in src:
            continue
        assert imp_prev in src, f"missing import anchor for {kind}{prev}"
        src = src.replace(imp_prev, imp_prev + imp_new, 1)
        src = src.replace(f"**{kind}{prev},", f"**{kind}{prev}, **{kind}{n},", 1)
        src = src.replace(f"**{kind}{prev}}}", f"**{kind}{prev}, **{kind}{n}}}", 1)
    open(p, "w").write(src)
    # sanity: both names now appear in a merge dict
    for kind in ("QUERIES", "ORACLES"):
        assert re.search(rf"\*\*{kind}{n}[,}}]", src), f"{kind}{n} not merged"
    print(f"registered wave {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
