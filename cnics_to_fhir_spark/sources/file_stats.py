"""Footer-stats file skipping — Delta/Iceberg-style data skipping built on
plain parquet.

Spark's parquet reader already prunes ROW GROUPS inside every file it opens,
but it still opens every file: on a 100 TB table of ~100k files, a
one-month query pays 100k footer reads and task launches to discard 97% of
them.  Table formats fix this by keeping per-FILE column min/max in a
manifest and pruning the file LIST before the scan is planned.  This module
is that manifest for plain parquet directories:

- ``parquet_file_stats`` builds the manifest DISTRIBUTED — the file list is
  parallelized and each executor task reads only the parquet FOOTER
  (``pyarrow.parquet.ParquetFile.metadata``, no data pages) of its files,
  returning (file, n_rows, min, max) for one column.
- ``read_with_file_skipping`` collects that manifest to the driver — the
  manifest is metadata, O(files) rows, exactly what a Delta log or Iceberg
  snapshot holds driver-side — keeps only files whose [min, max] envelope
  intersects the requested range, and hands Spark the surviving file list,
  with the residual range filter still applied (file stats are an envelope,
  not a guarantee: a kept file may still hold out-of-range rows, and Spark's
  own row-group pruning + predicate pushdown finish the job inside it).

Effectiveness tracks layout: a table written sorted/range-partitioned on the
stat column (``repartitionByRange`` on ingest, or o05's z-order key for
multi-column envelopes) yields tight non-overlapping envelopes and near-
perfect skipping; a randomly laid-out table degrades gracefully to a full
file list.  Stats are read from the live footers, so the manifest can never
go stale the way a sidecar index can.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_SCHEMA = "file string, n_rows long, min_val string, max_val string"


def _iso(v) -> str:
    """Render a footer statistic as a string whose lexicographic order
    matches the value order for the types we prune on (ISO dates/timestamps
    and strings sort correctly; numerics must be compared as numbers by the
    caller — see ``read_with_file_skipping``'s value_type handling)."""
    return v.isoformat() if hasattr(v, "isoformat") else str(v)


def parquet_file_stats(spark: SparkSession, files: list[str], col: str) -> DataFrame:
    """Distributed manifest build: one output row per parquet file with
    (file, n_rows, min_val, max_val) for ``col``, min/max rendered via
    ``_iso``.  Each task touches only the footers of its slice of the file
    list; a file whose footer carries no stats for ``col`` (older writers
    can omit them) comes back with NULL min/max and is never skipped."""
    if not files:
        return spark.createDataFrame([], _MANIFEST_SCHEMA)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["file"]:
                meta = pq.ParquetFile(path).metadata
                idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
                if col not in idx:
                    raise ValueError(f"column {col!r} absent from {path}")
                lo = hi = None
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(idx[col]).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None or st.min < lo else lo
                    hi = st.max if hi is None or st.max > hi else hi
                out.append(
                    {
                        "file": path,
                        "n_rows": meta.num_rows,
                        "min_val": None if lo is None else _iso(lo),
                        "max_val": None if hi is None else _iso(hi),
                    }
                )
            yield pd.DataFrame(out, columns=["file", "n_rows", "min_val", "max_val"])

    n_slices = min(len(files), spark.sparkContext.defaultParallelism)
    listing = spark.createDataFrame(
        [(f,) for f in sorted(files)], "file string"
    ).repartition(n_slices)
    return listing.mapInPandas(scan, _MANIFEST_SCHEMA)


def read_with_file_skipping(
    spark: SparkSession,
    path: str,
    col: str,
    lo: str,
    hi: str,
) -> tuple[DataFrame, int, int]:
    """Prune the file list of the parquet directory at ``path`` to files
    whose [min, max] envelope for ``col`` intersects [lo, hi] (inclusive,
    compared as the manifest's ISO strings — use for date/timestamp/string
    columns), then read only the survivors with the residual
    ``col BETWEEN lo AND hi`` filter still applied.

    Returns (df, n_files_total, n_files_kept) so callers can assert the
    skipping actually skipped (no silent caps in reverse: no silent
    full-scans either).  Files with NULL stats are always kept — an
    envelope you don't have cannot prune."""
    import glob as _glob
    import os

    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    manifest = parquet_file_stats(spark, files, col).collect()
    kept = [
        r["file"]
        for r in manifest
        if r["min_val"] is None
        or r["max_val"] is None
        or not (r["max_val"] < lo or r["min_val"] > hi)
    ]
    if kept:
        df = spark.read.parquet(*kept).filter(F.col(col).between(lo, hi))
    else:
        df = spark.read.parquet(*files).filter(F.lit(False))
    return df, len(files), len(kept)
