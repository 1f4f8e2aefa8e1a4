"""Scaling probe: run representative catalog queries across several scale
factors in ONE warm session and print per-SF wall times plus the log-log
scaling exponent between the two largest points (1.0 = linear in data
size; < 1 = fixed overhead still dominates).

Default span: the three shipped testdata SFs (sf0.001 → sf0.1, 100×).
Override via SPARK_GRAFT_PROBE_DIRS="sf1=/tmp/sf1:1,sf10=/tmp/sf10:10"
(comma-separated name=path:sf triples) to probe synthesized datasets —
e.g. the sf1→sf10 span for entries whose sf0.1→sf1 ratio tracked true
output growth, separating linear-in-output from superlinear-in-input.

Usage: python tools/scaling_probe.py [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cnics_to_fhir_spark.plans import catalog
from cnics_to_fhir_spark.session import build_session

def _sfs() -> list[tuple[str, float, str]]:
    spec = os.environ.get("SPARK_GRAFT_PROBE_DIRS")
    if not spec:
        return [
            (n, sf, f"/root/testdata/{n}")
            for n, sf in [("sf0.001", 0.001), ("sf0.01", 0.01), ("sf0.1", 0.1)]
        ]
    out = []
    for part in spec.split(","):
        name, rest = part.split("=", 1)
        path, sf = rest.rsplit(":", 1)
        out.append((name, float(sf), path))
    return out
DEFAULT = [
    "e2e01_conditions_pipeline",
    "q01_pricing_summary",
    "j06_merge_actions",
    "dd03_minhash_lsh",
    "ann01_cosine_topk",
    "e2e05_corpus_curation",
    "ev02_sessionization",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    sfs = _sfs()
    spark = build_session("scaling", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    entries = catalog()
    out = {}
    for name in names:
        e = entries[name]
        times = {}
        for sf_name, _, sf_dir in sfs:
            best = math.inf
            for _ in range(2):  # best-of-2: isolate from JIT/IO warmup
                t = time.time()
                e.spark(spark, sf_dir).count()
                best = min(best, time.time() - t)
            times[sf_name] = round(best, 3)
        # log-log slope between the two largest SFs (needs >= 2 points)
        if len(sfs) >= 2:
            (na, fa, _), (nb, fb, _) = sfs[-2], sfs[-1]
            slope = round(math.log(times[nb] / times[na]) / math.log(fb / fa), 2)
        else:
            slope = None
        out[name] = {**times, "exp_last_span": slope}
        print(f"# {name}: " + " ".join(f"{k}={v}s" for k, v in times.items()) + f" exp={slope}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
