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
