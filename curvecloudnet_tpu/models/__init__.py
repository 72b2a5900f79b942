"""Model layer: step modules, spec parsing, and the step-DSL interpreter."""

from .base import CurveCloudNet
from .cloud import Cloud, cloud_from_arrays
from .spec import ModelSpec, StepSpec, parse_model_config

__all__ = [
    "Cloud",
    "CurveCloudNet",
    "ModelSpec",
    "StepSpec",
    "cloud_from_arrays",
    "parse_model_config",
]
