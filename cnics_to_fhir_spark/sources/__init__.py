from cnics_to_fhir_spark.sources.tables import load_star_tables, register_star_views

__all__ = ["load_star_tables", "register_star_views"]
