from cnics_to_fhir_spark.assembly.resources import (
    condition_resource,
    medication_request_resource,
    observation_resource,
    patient_resource,
)

__all__ = [
    "condition_resource",
    "medication_request_resource",
    "observation_resource",
    "patient_resource",
]
