from cnics_to_fhir_spark.plans.registry import CatalogEntry, catalog

__all__ = ["CatalogEntry", "catalog"]
