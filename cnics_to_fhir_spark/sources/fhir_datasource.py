"""S5/S6 as a first-class Spark data source — SURVEY §7.3's named future
work ("a DataSourceV2 FHIR connector with filter pushdown"), built on
PySpark 4's Python Data Source API instead of a JVM DSv2 shim.

``spark.read.format("fhir_snapshot")`` returns the same FHIR_SNAPSHOT
relational shape as :func:`cnics_to_fhir_spark.sources.fhir.snapshot_from_bundles`
(same columns, same identifier[0] quirk parity), with two scale levers the
mapInPandas path exposes only by hand:

- **Partition planning**: the ``shards`` option (comma-separated FHIR
  search fragments, built with ``lastupdated_shards``/``site_shards``)
  becomes one InputPartition per shard — Spark schedules each shard's
  ``next``-link page chain as its own task, so a 1000-executor cluster
  walks 1000 chains concurrently.
- **Filter pushdown**: with ``spark.sql.python.filterPushdown.enabled``,
  equality predicates on ``subject_ref`` / ``identifier_0_value`` / ``id``
  translate into FHIR search parameters (``subject=`` / ``identifier=`` /
  ``_id=``) and are REMOVED from Spark's residual — the server sends only
  matching resources, which at reconciliation scale turns "download the
  store" into "download the delta".  Every other filter is returned to
  Spark untouched and still applied engine-side, so an untranslatable
  predicate degrades to correct-but-unpruned.  Spark refuses (loudly) to
  plan a pushFilters-bearing reader while the conf is off — environments
  that keep it off opt out with ``option("pushdown", "false")``, which
  selects a reader variant with no pushFilters at all.

The reference's shape this replaces: one GET per patient per resource type
(cnics_to_fhir.py:354, :543, :640, :723) under a ``_count=50000``
no-pagination hack (:215-217).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# One schema serves spark.read AND spark.readStream (a DataSource has a
# single schema()): the batch columns of snapshot_from_bundles plus
# meta.lastUpdated — in batch it seeds lastupdated_shards / a resume
# cursor; in streaming it IS the offset.
SNAPSHOT_DDL = (
    "resource_type string, id string, subject_ref string, "
    "identifier_0_system string, identifier_0_value string, "
    "has_identifier boolean, last_updated string"
)

# snapshot column -> FHIR search parameter (equality pushdown map)
_PUSHABLE = {
    ("subject_ref",): "subject",
    ("identifier_0_value",): "identifier",
    ("id",): "_id",
}


class _Shard(InputPartition):
    def __init__(self, url: str):
        self.url = url


class PlainFhirSnapshotReader(DataSourceReader):
    """The no-pushdown variant: Spark REFUSES to plan a reader that
    implements pushFilters() while spark.sql.python.filterPushdown.enabled
    is false (loud error, not silent degradation), so environments that
    keep the conf off opt into this class with option("pushdown", "false")
    — same partitions, same page walking, every filter evaluated by Spark
    after transfer."""

    def __init__(self, options):
        url = options.get("url")
        if not url:
            raise ValueError("fhir_snapshot requires the 'url' option (store base URL)")
        self.base_url = url.rstrip("/")
        self.resource_type = options.get("resourcetype", "Condition")
        self.page_size = int(options.get("pagesize", "1000"))
        self.max_pages = int(options.get("maxpages", "10000"))
        self.shards = [s for s in (options.get("shards") or "").split(",") if s]
        self.pushed: list[str] = []

    def partitions(self):
        base = (
            f"{self.base_url}/{self.resource_type}"
            f"?_format=json&_count={self.page_size}"
        )
        extra = "".join(f"&{p}" for p in self.pushed)
        if self.shards:
            return [_Shard(f"{base}&{s}{extra}") for s in self.shards]
        return [_Shard(base + extra)]

    def read(self, partition: _Shard):
        try:
            import requests
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "fhir_snapshot needs the 'requests' package on executors; "
                "use sources.fhir.snapshot_from_bundles over an export instead"
            ) from e

        session = requests.Session()
        next_url, pages = partition.url, 0
        while next_url and pages < self.max_pages:
            resp = session.get(next_url)
            resp.raise_for_status()
            bundle = resp.json()
            for entry in bundle.get("entry") or []:
                r = entry.get("resource") or {}
                ident = r.get("identifier")
                first = ident[0] if ident else {}
                yield (
                    r.get("resourceType"),
                    r.get("id"),
                    (r.get("subject") or {}).get("reference"),
                    first.get("system"),
                    first.get("value"),
                    ident is not None,
                    (r.get("meta") or {}).get("lastUpdated"),
                )
            pages += 1
            next_url = next(
                (
                    link.get("url")
                    for link in bundle.get("link") or []
                    if link.get("relation") == "next"
                ),
                None,
            )


class FhirSnapshotReader(PlainFhirSnapshotReader):
    """The default reader: adds FHIR search-param pushdown.  Requires
    spark.sql.python.filterPushdown.enabled=true (Spark rejects a
    pushFilters-bearing reader otherwise — by design, loudly)."""

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Accept equality filters on the _PUSHABLE columns as FHIR search
        params; yield everything else back for Spark to evaluate.  A yielded
        filter costs transfer, never correctness."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and tuple(f.attribute) in _PUSHABLE
                and isinstance(f.value, str)
            ):
                from urllib.parse import quote

                param = _PUSHABLE[tuple(f.attribute)]
                self.pushed.append(f"{param}={quote(f.value, safe='')}")
            else:
                yield f


class FhirSnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fhir_snapshot"

    def schema(self) -> str:
        return SNAPSHOT_DDL

    def reader(self, schema) -> PlainFhirSnapshotReader:
        if (self.options.get("pushdown") or "true").lower() == "false":
            return PlainFhirSnapshotReader(self.options)
        return FhirSnapshotReader(self.options)

    def simpleStreamReader(self, schema) -> "FhirUpdatesStreamReader":
        return FhirUpdatesStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming: incremental _lastUpdated tailing (spark.readStream)
# ---------------------------------------------------------------------------

class FhirUpdatesStreamReader(SimpleDataSourceStreamReader):
    """Tail a FHIR store's updates as a Structured Streaming source:
    ``spark.readStream.format("fhir_snapshot")`` polls
    ``_lastUpdated=gt{cursor}`` each micro-batch and advances the cursor to
    the max ``meta.lastUpdated`` seen, so reconciliation becomes
    *backfill once (batch source, sharded) + tail the delta forever* —
    the incremental shape the reference's full-store re-fetch
    (cnics_to_fhir.py:354) cannot express.

    Offsets are checkpointed by Spark; recovery replays a committed range
    via ``readBetweenOffsets`` (gt start, le end) — the server is the
    source of truth for the replay, which is exactly how a _lastUpdated
    cursor is meant to be used.  SimpleDataSourceStreamReader fetches on
    the DRIVER: right for delta-sized polls (the backfill path is the
    sharded batch reader above).  Known cursor hazard, documented not
    hidden: a resource committed server-side with a lastUpdated equal to
    an already-advanced cursor is skipped (the strict-gt boundary); real
    deployments poll with a lag watermark (the ``since`` option) behind
    the server clock, the same discipline as any timestamp-cursor CDC."""

    def __init__(self, options):
        url = options.get("url")
        if not url:
            raise ValueError("fhir_snapshot stream requires the 'url' option")
        self.base_url = url.rstrip("/")
        self.resource_type = options.get("resourcetype", "Condition")
        self.page_size = int(options.get("pagesize", "1000"))
        self.max_pages = int(options.get("maxpages", "10000"))
        self.since = options.get("since", "1970-01-01T00:00:00Z")

    def initialOffset(self) -> dict:
        return {"last_updated": self.since}

    def _fetch(self, fragment: str) -> list[tuple]:
        try:
            import requests
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "fhir_snapshot streaming needs the 'requests' package"
            ) from e

        session = requests.Session()
        next_url = (
            f"{self.base_url}/{self.resource_type}"
            f"?_format=json&_count={self.page_size}&{fragment}"
        )
        rows, pages = [], 0
        while next_url and pages < self.max_pages:
            resp = session.get(next_url)
            resp.raise_for_status()
            bundle = resp.json()
            for entry in bundle.get("entry") or []:
                r = entry.get("resource") or {}
                ident = r.get("identifier")
                first = ident[0] if ident else {}
                rows.append(
                    (
                        r.get("resourceType"),
                        r.get("id"),
                        (r.get("subject") or {}).get("reference"),
                        first.get("system"),
                        first.get("value"),
                        ident is not None,
                        (r.get("meta") or {}).get("lastUpdated"),
                    )
                )
            pages += 1
            next_url = next(
                (
                    link.get("url")
                    for link in bundle.get("link") or []
                    if link.get("relation") == "next"
                ),
                None,
            )
        return rows

    def read(self, start: dict):
        rows = self._fetch(f"_lastUpdated=gt{start['last_updated']}")
        # a poll can return entries that all lack meta.lastUpdated (a
        # server that strips meta): hold the cursor rather than letting
        # max() over an empty generator kill the stream
        stamps = [r[6] for r in rows if r[6] is not None]
        if stamps:
            return iter(rows), {"last_updated": max(stamps)}
        return iter(rows), dict(start)

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            self._fetch(
                f"_lastUpdated=gt{start['last_updated']}"
                f"&_lastUpdated=le{end['last_updated']}"
            )
        )
