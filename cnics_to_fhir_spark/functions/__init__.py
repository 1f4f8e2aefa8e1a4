from cnics_to_fhir_spark.functions import coding, demographics, labs, medications, text

__all__ = ["coding", "demographics", "labs", "medications", "text"]
