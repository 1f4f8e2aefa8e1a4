"""S7-S9 — the FHIR REST sink as a partition-parallel batched writer.

Replaces the reference's one-HTTP-call-per-row loop (cnics_to_fhir.py:531,
:631, :714, :899 + deletes :333, :564, :660, :744) with
``df.foreachPartition``: one connection per partition (the reference's own
``requests.Session`` optimization, :246-247, made per-executor), explicit
retry with backoff mirroring the 5×5s SQL retry policy (:163-177), and
idempotent semantics — PUT/DELETE retry safely; POSTs are guarded upstream
by the merge classification (insert only when the key is absent), so a
replayed partition re-POSTs only if the first attempt never landed.

Counters (A5, :309-320) come back through Spark accumulators and — exactly —
from ``action_counts`` over the plan itself.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class WriterConfig:
    base_url: str
    headers: tuple[tuple[str, str], ...] = ()
    max_retries: int = 5  # cnics_to_fhir.py:163 (5 attempts)
    retry_sleep_s: float = 5.0  # :171 (5 s); scaled down in tests
    timeout_s: float = 30.0
    cascade_patient_delete: bool = True  # ?_cascade=delete (:333)


def _send(session, cfg: WriterConfig, method: str, url: str, body: str | None):
    import requests  # deferred: executors need it only when actually writing

    last_exc: Exception | None = None
    for attempt in range(cfg.max_retries):
        try:
            resp = session.request(
                method,
                url,
                data=body,
                headers={"Content-Type": "application/fhir+json;charset=utf-8"} if body else None,
                timeout=cfg.timeout_s,
            )
            resp.raise_for_status()  # E2 (cnics_to_fhir.py:534 etc.)
            return resp
        except Exception as exc:  # noqa: BLE001 — retry loop mirrors E1
            last_exc = exc
            if attempt + 1 < cfg.max_retries:
                time.sleep(cfg.retry_sleep_s)
    raise RuntimeError(f"{method} {url} failed after {cfg.max_retries} attempts") from last_exc


def write_action_plan(plan: DataFrame, cfg: WriterConfig) -> dict[str, int]:
    """Execute an action plan against the FHIR endpoint.

    insert → POST /{type}; update → PUT /{type}/{id};
    delete → DELETE /{type}/{id} (Patient deletes cascade, :333).
    Returns {action_resource: count} gathered via accumulators.
    """
    sc = plan.sparkSession.sparkContext
    counters = {
        a: sc.accumulator(0) for a in ("insert", "update", "delete", "failed")
    }
    headers = dict(cfg.headers)

    def run_partition(rows) -> None:
        import requests

        session = requests.Session()
        session.headers.update(headers)
        for row in rows:
            rtype, action = row["resource_type"], row["action"]
            try:
                if action == "insert":
                    _send(session, cfg, "POST", f"{cfg.base_url}/{rtype}", row["body_json"])
                elif action == "update":
                    _send(
                        session, cfg, "PUT",
                        f"{cfg.base_url}/{rtype}/{row['id']}", row["body_json"],
                    )
                elif action == "delete":
                    url = f"{cfg.base_url}/{rtype}/{row['id']}"
                    if rtype == "Patient" and cfg.cascade_patient_delete:
                        url += "?_cascade=delete"
                    _send(session, cfg, "DELETE", url, None)
                counters[action].add(1)
            except Exception:
                counters["failed"].add(1)
                raise  # let Spark's task retry handle it (idempotent writes)

    plan.foreachPartition(run_partition)
    return {k: v.value for k, v in counters.items()}
