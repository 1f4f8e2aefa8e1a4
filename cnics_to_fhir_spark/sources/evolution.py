"""Column-RENAME schema evolution on plain parquet via a sidecar name
mapping — the Iceberg "name mapping" idea without the table format.

``mergeSchema`` (u03) reconciles ADDED columns, but a renamed column is
two different names to a footer-merging scan: the old generation's data
silently lands in the old column and the new column is NULL for it —
rows don't go missing, their VALUES do.  The fix every table format uses
is metadata, not rewrite: a per-generation mapping from physical (as
written) to logical (current) names, applied at scan time.  Here the
mapping is a JSON sidecar under the table root (the model-store manifest
pattern), so renames stay O(1) metadata operations and historical files
are never rewritten — at 100 TB that is the entire point.

Scale shape: the mapping file is O(generations × renamed columns) and is
read once on the driver; each generation is one ordinary parquet scan
(predicate pushdown and column pruning apply AFTER the rename projection,
which Spark pushes through trivially since it is a pure alias), unioned
by name with NULL-fill for genuinely added columns.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAPPING_FILE = "_name_mapping.json"
PARTITION_SPEC_FILE = "_partition_specs.json"


def write_name_mapping(root: str, mapping: dict[str, dict[str, str]]) -> str:
    """Persist the sidecar: ``{generation_subdir: {physical: logical}}``.
    Generations absent from the mapping are read as-is (identity)."""
    path = os.path.join(root, MAPPING_FILE)
    with open(path, "w") as f:
        json.dump({"version": 1, "generations": mapping}, f, indent=2, sort_keys=True)
    return path


def read_name_mapping(root: str) -> dict[str, dict[str, str]]:
    path = os.path.join(root, MAPPING_FILE)
    with open(path) as f:
        doc = json.load(f)
    if doc.get("version") != 1:
        raise ValueError(f"unsupported name-mapping version in {path}: {doc.get('version')}")
    return doc["generations"]


def write_partition_specs(root: str, specs: dict[str, list[str]]) -> str:
    """Persist the per-generation partition spec sidecar:
    ``{generation_subdir: [partition_col, ...]}`` (``[]`` = unpartitioned).
    The Iceberg partition-evolution idea without the table format: old
    data keeps its old directory layout forever; only NEW generations
    adopt the new spec — repartitioning 100 TB of history to change a
    partition scheme is exactly the rewrite this avoids."""
    path = os.path.join(root, PARTITION_SPEC_FILE)
    with open(path, "w") as f:
        json.dump({"version": 1, "specs": specs}, f, indent=2, sort_keys=True)
    return path


def read_partition_specs(root: str) -> dict[str, list[str]]:
    path = os.path.join(root, PARTITION_SPEC_FILE)
    with open(path) as f:
        doc = json.load(f)
    if doc.get("version") != 1:
        raise ValueError(
            f"unsupported partition-spec version in {path}: {doc.get('version')}"
        )
    return doc["specs"]


def _discover_partition_cols(gen_dir: str) -> list[str]:
    """Walk one directory chain down from ``gen_dir`` and read the Hive
    ``col=value`` segments in order — the layout the writer PHYSICALLY
    produced, used to validate the declared spec against reality."""
    cols: list[str] = []
    cur = gen_dir
    while True:
        subdirs = [
            d
            for d in sorted(os.listdir(cur))
            if os.path.isdir(os.path.join(cur, d)) and "=" in d
        ]
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        cur = os.path.join(cur, subdirs[0])


def read_with_partition_specs(spark: SparkSession, root: str) -> DataFrame:
    """Scan a table whose PARTITION SPEC evolved between generations —
    e.g. gen 1 laid out by ``day``, gen 2 by ``(day, site)`` — as ONE
    logical DataFrame.  Each generation is read against its own layout,
    so a pushed-down predicate partition-prunes each generation as deeply
    as ITS directories allow (a ``site`` filter prunes gen-2 directories
    and falls back to row filtering inside gen 1's day dirs); the spec
    sidecar is validated against the physical layout and a mismatch
    raises loudly — a generation whose directories disagree with its
    declared spec would otherwise prune WRONGLY, which is silent data
    loss at read time.

    Scale shape: the sidecar is O(generations) driver metadata; each
    generation is an ordinary pruned parquet scan, unioned by name with
    NULL-fill for columns a generation predates."""
    specs = read_partition_specs(root)
    subdirs = sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith("_")
    )
    if not subdirs:
        raise ValueError(f"no generation subdirectories under {root}")
    missing = [d for d in subdirs if d not in specs]
    if missing:
        raise ValueError(
            f"generations {missing!r} under {root} have no declared partition"
            f" spec — refusing to guess a layout"
        )
    out: DataFrame | None = None
    for gen in subdirs:
        gen_dir = os.path.join(root, gen)
        physical = _discover_partition_cols(gen_dir)
        if physical != list(specs[gen]):
            raise ValueError(
                f"partition spec mismatch for {gen}: declared {specs[gen]!r},"
                f" physical layout is {physical!r}"
            )
        df = spark.read.option("basePath", gen_dir).parquet(gen_dir)
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out


def read_with_name_mapping(spark: SparkSession, root: str) -> DataFrame:
    """Scan every generation subdirectory under ``root``, applying its
    physical→logical rename before the union.  A mapping that names a
    column absent from the generation's footer raises loudly — a silent
    skip would resurrect exactly the NULL-shadowing bug this exists to
    prevent."""
    gens = read_name_mapping(root)
    subdirs = sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith("_")
    )
    if not subdirs:
        raise ValueError(f"no generation subdirectories under {root}")
    out: DataFrame | None = None
    for gen in subdirs:
        df = spark.read.parquet(os.path.join(root, gen))
        for physical, logical in gens.get(gen, {}).items():
            if physical not in df.columns:
                raise ValueError(
                    f"name mapping for {gen} renames {physical!r} -> {logical!r}"
                    f" but the generation's schema has no {physical!r}"
                )
            df = df.withColumnRenamed(physical, logical)
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out


WIDENING_FILE = "_type_widening.json"

# Iceberg's safe promotions: value-preserving, order-preserving widenings
# only. Anything else (narrowing, string<->numeric, ...) must be a real
# backfill, not a scan-time cast that silently corrupts or truncates.
_SAFE_WIDENINGS = {
    ("int", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("float", "double"),
}


def write_type_widening(root: str, widening: dict[str, dict[str, str]]) -> str:
    """Persist ``{generation_subdir: {column: target_type}}`` — the columns
    whose physical type in that generation is NARROWER than the table's
    current logical type."""
    path = os.path.join(root, WIDENING_FILE)
    with open(path, "w") as f:
        json.dump({"version": 1, "generations": widening}, f, indent=2, sort_keys=True)
    return path


def read_type_widening(root: str) -> dict[str, dict[str, str]]:
    path = os.path.join(root, WIDENING_FILE)
    with open(path) as f:
        doc = json.load(f)
    if doc.get("version") != 1:
        raise ValueError(
            f"unsupported type-widening version in {path}: {doc.get('version')}"
        )
    return doc["generations"]


def read_with_type_widening(spark: SparkSession, root: str) -> DataFrame:
    """Scan generations whose column TYPES widened over time (int → bigint,
    float → double) as ONE logical DataFrame — the fourth evolution axis
    after adds (u03), renames (u04) and partition specs (u05).
    ``mergeSchema`` REFUSES mixed int/long footers outright, so without
    this the old generation needs a physical rewrite; with it the cast is
    scan-time metadata.  Only value-preserving promotions are applied —
    a mapping that names a non-widening cast (or a column whose physical
    type isn't the expected narrow side) raises loudly: a silent
    scan-time narrowing is data corruption at read time."""
    gens = read_type_widening(root)
    subdirs = sorted(
        d
        for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and not d.startswith("_")
    )
    if not subdirs:
        raise ValueError(f"no generation subdirectories under {root}")
    out: DataFrame | None = None
    for gen in subdirs:
        df = spark.read.parquet(os.path.join(root, gen))
        types = dict(df.dtypes)
        for col, target in gens.get(gen, {}).items():
            if col not in types:
                raise ValueError(
                    f"type widening for {gen} names {col!r} but the"
                    f" generation's schema has no such column"
                )
            src = types[col]
            if src == target:
                continue  # already wide — mapping kept for documentation
            if (src, target) not in _SAFE_WIDENINGS:
                raise ValueError(
                    f"refusing non-widening cast {src} -> {target} for"
                    f" {gen}.{col}: only value-preserving promotions are"
                    f" scan-time metadata; anything else is a backfill"
                )
            df = df.withColumn(col, F.col(col).cast(target))
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out
