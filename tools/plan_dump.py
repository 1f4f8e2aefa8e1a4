"""Dump ``explain("formatted")`` for catalog queries to text files.

Usage: python tools/plan_dump.py <out_dir> <suffix> [sf_dir] [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query (default: every
headline query from bench.py).  The optimization rounds commit these as
``plans/r12/<query>_before.txt`` / ``_after.txt`` so plan-shape claims in
OPTIMIZATION_r12.md are checkable without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnics_to_fhir_spark.plans import catalog
from cnics_to_fhir_spark.session import build_session


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("plan_dump")
    entries = catalog()
    failed = []
    for name in names:
        if name not in entries:
            print(f"SKIP {name}: not in catalog")
            continue
        try:
            df = entries[name].spark(spark, sf_dir)
            # _explainString gives us the text instead of stdout printing.
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record and continue
            failed.append(name)
            print(f"FAIL {name}: {exc}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
        spark.catalog.clearCache()
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
