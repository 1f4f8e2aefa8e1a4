"""Local oracle self-check: run every catalog query on Spark AND DuckDB and
compare row count, column names, and an order-insensitive value hash —
a local approximation of the driver's CORRECTNESS gate so mismatches are
caught before a round ends.

Usage: python selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

from cnics_to_fhir_spark.plans import catalog
from cnics_to_fhir_spark.schemas import STAR_TABLES
from cnics_to_fhir_spark.session import build_session


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize column order and dtypes (timestamps → str, floats
    rounded, ints → int64, objects → str). Does NOT sort rows — the
    order-insensitive compare sorts row HASHES instead (sorting a
    multi-hundred-thousand-row frame of JSON strings was the dominant
    compare cost at sf1; sorting a uint64 array is ~free)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df


def sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    """Row-sorted view of a normalized frame — the slow path, used only
    to produce aligned diffs once a hash mismatch is already known."""
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive multiset digest: hash each row, sort the hash
    array, digest it. Stringify first — "1" vs "1.0" must differ, and
    normalize() has already made matching dtypes identical.  Columns that
    are ALREADY strings (normalize stringified objects/timestamps) are
    reused by reference: re-running astype(str) over a multi-GiB JSON
    column doubled the compare's peak RSS for the wide e2e entries."""
    import hashlib

    cols = {
        c: (df[c] if df[c].dtype == object else df[c].astype(str))
        for c in df.columns
    }
    h = pd.util.hash_pandas_object(
        pd.DataFrame(cols, copy=False), index=False
    ).values.copy()
    h.sort()
    return hashlib.md5(h.tobytes()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # 4g result cap: the compare collects full results, and wide-JSON
    # entries (e2e02) exceed the 1g default at sf1-scale probe runs —
    # a harness limit, not an engine one (the engine never collects).
    # (sf10 probes of the wide-JSON verticals need ~8-16g result + 48g
    # driver: SPARK_GRAFT_MAX_RESULT=16g SPARK_DRIVER_MEM=48g — the
    # compare collects the full frame; a harness bound, not an engine one.)
    spark = build_session(
        "selfcheck",
        extra_conf={
            "spark.driver.maxResultSize": os.environ.get(
                "SPARK_GRAFT_MAX_RESULT", "4g"
            )
        },
    )
    con = duckdb.connect()
    # Spill hygiene (verdict r6 #4): the sf10 sweep once died mid-run with
    # DuckDB "No space left on device" on gr01's unmaterialized CTE chain.
    # Pin DuckDB's spill to an explicit temp dir (SPARK_GRAFT_DUCKDB_TMP,
    # default a subdir of $TMPDIR) with a size cap at ~half the free space
    # so one runaway oracle degrades to a single-entry failure instead of
    # filling the disk and poisoning every entry after it.
    import shutil as _shutil

    ddb_tmp = os.environ.get("SPARK_GRAFT_DUCKDB_TMP") or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "selfcheck_duckdb_spill"
    )
    os.makedirs(ddb_tmp, exist_ok=True)
    free_gib = _shutil.disk_usage(ddb_tmp).free / 2**30
    cap_gib = max(1, int(free_gib / 2))
    con.execute(f"SET temp_directory='{ddb_tmp}'")
    con.execute(f"SET max_temp_directory_size='{cap_gib}GiB'")
    # Preflight: a full-catalog sweep at sf10 needs tens of GiB of spill
    # headroom; warn loudly up front rather than failing 3 hours in.
    if free_gib < 20:
        print(
            f"WARN  only {free_gib:.1f} GiB free under {ddb_tmp} "
            f"(oracle spill cap {cap_gib} GiB) — large-SF sweeps may fail; "
            "set SPARK_GRAFT_DUCKDB_TMP to a roomier volume"
        )

    for t in STAR_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (tools/make_sf1.py) are directories of parts
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    entries = catalog()
    failures = []
    n_run = 0
    # Optional machine-readable sidecar (SPARK_GRAFT_SELFCHECK_JSON=path):
    # one record per entry run, so big verification sweeps (e.g. the full
    # catalog at /tmp/sf10) leave a committable artifact instead of only
    # scrollback. Appends come from the main thread (rows-only / spark
    # errors) and the single consumer thread (ok / fail); list.append is
    # atomic under the GIL so no lock is needed.
    results: list[dict] = []
    sidecar = os.environ.get("SPARK_GRAFT_SELFCHECK_JSON")
    import threading as _threading

    _sidecar_lock = _threading.Lock()

    def flush_sidecar() -> None:
        # Rewritten after every entry (the file is tiny): a long sf10
        # sweep killed by a timeout still leaves the completed records.
        if not sidecar:
            return
        import json

        tmp = sidecar + ".tmp"
        with _sidecar_lock:
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "sf_dir": sf_dir,
                        "run": n_run,
                        "passed": n_run - len(failures),
                        "catalog": len(entries),
                        "entries": list(results),
                    },
                    f,
                    indent=1,
                )
            os.replace(tmp, sidecar)

    # Two-stage pipeline: the main thread drives Spark (the cluster-side
    # engine), a single consumer thread drives DuckDB + the pandas compare
    # (driver-side CPU). The two engines share almost no resources, so
    # wall time drops from sum(spark)+sum(oracle) to ~max of the two —
    # the difference between a 23-minute and a ~13-minute full sf1 pass.
    # Queue depth 1 bounds memory to at most two collected results in
    # flight (sf10 probes include a 37M-row frame). A single consumer
    # keeps the output ordered and the DuckDB connection on one thread.
    import queue
    import threading
    import time as _time

    q: queue.Queue = queue.Queue(maxsize=1)

    def compare(name, e, sdf, t_spark):
        t0 = _time.monotonic()
        try:
            odf = con.execute(e.oracle).fetchdf()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"FAIL  {name}: oracle error {str(ex)[:2000]}")
            results.append(
                {"name": name, "status": "fail", "detail": f"oracle error: {ex}"[:500]}
            )
            flush_sidecar()
            return
        # normalize() copies; drop each original immediately after so the
        # peak live set is 3 frames, not 5 (sdf + its copy + odf + its
        # copy + the pipeline's next result OOM-killed the sf10 sweep)
        s_n = normalize(sdf)
        sdf = None  # noqa: F841 — release the pre-normalize original
        o_n = normalize(odf)
        odf = None  # noqa: F841
        problems = []
        if len(s_n) != len(o_n):
            problems.append(f"rowcount spark={len(s_n)} oracle={len(o_n)}")
        if list(s_n.columns) != list(o_n.columns):
            problems.append(f"cols spark={list(s_n.columns)} oracle={list(o_n.columns)}")
        elif len(s_n) == len(o_n) and value_hash(s_n) != value_hash(o_n):
            s_n, o_n = sort_rows(s_n), sort_rows(o_n)
            diff_cols = [
                c for c in s_n.columns if not s_n[c].astype(str).equals(o_n[c].astype(str))
            ]
            problems.append(f"value hash mismatch in cols {diff_cols}")
            for c in diff_cols[:3]:
                mask = s_n[c].astype(str) != o_n[c].astype(str)
                print(f"  {name}.{c} sample diff:")
                print("   spark :", s_n[mask][c].head(3).tolist())
                print("   oracle:", o_n[mask][c].head(3).tolist())
        t_oracle = _time.monotonic() - t0
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
            results.append(
                {
                    "name": name,
                    "status": "fail",
                    "rows": len(s_n),
                    "spark_s": round(t_spark, 2),
                    "oracle_s": round(t_oracle, 2),
                    "detail": "; ".join(problems)[:500],
                }
            )
            flush_sidecar()
        else:
            print(
                f"OK    {name}: {len(s_n)} rows "
                f"[spark {t_spark:.1f}s, oracle {t_oracle:.1f}s]"
            )
            results.append(
                {
                    "name": name,
                    "status": "ok",
                    "rows": len(s_n),
                    "spark_s": round(t_spark, 2),
                    "oracle_s": round(t_oracle, 2),
                }
            )
            flush_sidecar()

    def consumer():
        while True:
            item = q.get()
            if item is None:
                q.task_done()
                return
            try:
                compare(*item)
            finally:
                # release the result BEFORE task_done: the next q.get()
                # blocks, and a loop variable still pinning a multi-GiB
                # frame across that wait defeats the q.join() governor
                item = None
                q.task_done()

    # Memory governor: the two-stage pipeline holds up to THREE collected
    # results at once (one queued, one being compared, one being built) —
    # fine for normal entries, fatal when several multi-GiB wide-JSON
    # frames are adjacent (the sf10 one-invocation sweep OOM-killed at
    # 76 GB RSS with e2e01-04 in flight together).  After handing off a
    # result bigger than this row threshold, the main thread WAITS for the
    # compare queue to drain, bounding the peak to one big spark frame +
    # its oracle frame.  Costs pipelining only on the handful of huge
    # entries, where the compare dominates anyway.
    big_rows = int(os.environ.get("SPARK_GRAFT_BIG_RESULT_ROWS", "2000000"))

    worker = threading.Thread(target=consumer, daemon=True)
    worker.start()
    for name, e in entries.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = _time.monotonic()
        try:
            sdf = e.spark(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"FAIL  {name}: spark error {str(ex)[:2000]}")
            results.append(
                {"name": name, "status": "fail", "detail": f"spark error: {ex}"[:500]}
            )
            flush_sidecar()
            continue
        t_spark = _time.monotonic() - t0
        if e.oracle is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [spark {t_spark:.1f}s]")
            results.append(
                {
                    "name": name,
                    "status": "rows",
                    "rows": len(sdf),
                    "spark_s": round(t_spark, 2),
                }
            )
            flush_sidecar()
            continue
        is_big = len(sdf) > big_rows
        q.put((name, e, sdf, t_spark))
        del sdf  # the queue owns the only reference now
        if is_big:
            q.join()
    q.put(None)
    worker.join()
    print(f"\n{n_run - len(failures)}/{n_run} passed ({len(entries)} in catalog)")
    if sidecar:
        flush_sidecar()
        print(f"sidecar written: {sidecar}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
