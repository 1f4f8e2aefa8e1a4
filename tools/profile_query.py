"""Per-stage empirical profile of one or more catalog queries (guide §1.1).

Runs each query exactly as the bench does (``.count()`` after a warmup
touch), with the Spark UI enabled, then pulls per-job / per-stage wall
times and shuffle volumes from the UI REST API so the expensive stage —
not just the expensive query — is identifiable without eyeballing a UI.

Usage: python tools/profile_query.py <sf_dir> <query> [query ...]
       SPARK_GRAFT_PROFILE_RUNS=N   (default 1 timed run after 1 warm run)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnics_to_fhir_spark.plans import catalog
from cnics_to_fhir_spark.session import build_session


def rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = build_session("profile", extra_conf={"spark.ui.enabled": "true"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    entries = catalog()
    entries["a01_distinct"].spark(spark, sf_dir).count()  # warmup
    for name in names:
        e = entries[name]
        # warm run (codegen/JIT) exactly like bench's discarded run 1
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        e.spark(spark, sf_dir).count()
        warm = time.perf_counter() - t0
        jobs_before = {j["jobId"] for j in rest(port, f"applications/{app_id}/jobs")}
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        n = e.spark(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j for j in rest(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s (warm-run1 {warm:.3f}s), rows={n}, "
              f"{len(jobs)} jobs ===")
        stage_info = {}
        for s in rest(port, f"applications/{app_id}/stages?status=complete"):
            stage_info[s["stageId"]] = s
        tot_job_ms = 0
        for j in jobs:
            t_sub = j.get("submissionTime", "")
            t_done = j.get("completionTime", "")
            dur = ""
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                d = (datetime.strptime(t_done, fmt) - datetime.strptime(t_sub, fmt)).total_seconds()
                dur = f"{d:7.3f}s"
                tot_job_ms += d
            except Exception:
                pass
            stages = []
            for sid in j.get("stageIds", []):
                s = stage_info.get(sid)
                if s is None:
                    continue
                stages.append(
                    f"s{sid}[{s['numCompleteTasks']}t "
                    f"run={s.get('executorRunTime', 0)/1000:.2f}s "
                    f"in={s.get('inputBytes', 0)>>20}M "
                    f"sh_r={s.get('shuffleReadBytes', 0)>>20}M "
                    f"sh_w={s.get('shuffleWriteBytes', 0)>>20}M]"
                )
            print(f"  job {j['jobId']:4d} {dur} {j.get('name','')[:60]}")
            for st in stages:
                print(f"        {st}")
        print(f"  sum job durations: {tot_job_ms:.3f}s vs wall {wall:.3f}s "
              f"(gap = driver/python time between jobs)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
