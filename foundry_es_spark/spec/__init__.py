"""Declarative source registry + transform-mapping layer.

The Spark-native analogue of Foundry-ES's config-driven UX: a JSON
"harvest description" per source (ingest method, record path, primary-key
JSONPath, column-mapping block, workflow stage list) drives the whole
pipeline without per-source Python [F-ES: common/.../model/Source.java +
TransformationLanguageInterpreter — UNVERIFIED, SURVEY.md §0].

Unlike the reference's per-record interpreter, mappings here COMPILE
driver-side, once, to native Column expression trees (get_json_object /
casts / regexes inside whole-stage codegen) or registered vectorized
pandas UDFs — there is no interpreter in the row path.
"""

from foundry_es_spark.spec.mapping import BUILTINS, apply_mapping, compile_mapping
from foundry_es_spark.spec.source import SourceRegistry, SourceSpec, run_source

__all__ = [
    "BUILTINS",
    "apply_mapping",
    "compile_mapping",
    "SourceRegistry",
    "SourceSpec",
    "run_source",
]
