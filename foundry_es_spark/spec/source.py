"""Declarative source registry: JSON harvest descriptions → pipelines.

Foundry-ES stores one JSON "harvest description" per source (ingest
method + content spec, primary-key JSONPath, transformation script,
workflow step list) in a Mongo `sources` collection, and the whole ETL is
driven from those documents [F-ES: common/.../model/Source.java —
UNVERIFIED, SURVEY.md §0]. This module is the Spark-native equivalent:

- a :class:`SourceSpec` (loadable from a JSON file) describes WHERE the
  records/events come from, HOW raw fields map onto the target schema
  (the ``mapping`` block — compiled by spec/mapping.py to native
  Columns), and WHICH workflow stages run;
- :func:`run_source` stands the pipeline up: event-shaped sources replay
  through the existing :class:`~foundry_es_spark.plans.CdcPipeline`
  (compaction → vectorized normalization → epoch-fenced merge), record-
  shaped sources (CSV/JSON-lines/XML harvest dumps) produce a mapped
  record DataFrame through the existing S4 readers;
- N sources stand up from N config files with zero per-source Python —
  the reference's core UX, rebuilt on the engine's existing kernels.

Nothing here adds a new execution path: compilation targets
sources/records.py, fixtures.py, functions/normalize.py,
functions/registry.py and plans/pipeline.py exactly as the hand-wired
callers do, which is what makes the config-driven flagship replay
bit-identical to ``__spark_entry__.entry`` (tests/test_spec.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from foundry_es_spark.functions.normalize import with_content_digest, with_normalized_columns
from foundry_es_spark.functions.registry import UdfRegistry, default_registry
from foundry_es_spark.spec.mapping import MappingError, apply_mapping

_EVENT_METHODS = {"parquet_events", "doc_changes"}
_RECORD_METHODS = {"csv", "json_lines", "xml"}


@dataclass
class SourceSpec:
    """One source's harvest description (the Source.java analogue)."""

    source_id: str
    ingest: dict                    # {"method": ..., method-specific keys}
    name: str = ""
    primary_key: list[str] = field(default_factory=lambda: ["repo", "path"])
    mapping: list[dict] = field(default_factory=list)
    workflow: list[str] = field(default_factory=list)  # ordered stage names
    pipeline: dict = field(default_factory=dict)       # PipelineConfig overrides

    def __post_init__(self):
        method = self.ingest.get("method")
        if method not in _EVENT_METHODS | _RECORD_METHODS:
            raise MappingError(
                f"source {self.source_id!r}: unknown ingest method {method!r} "
                f"(expected one of {sorted(_EVENT_METHODS | _RECORD_METHODS)})"
            )
        # compile-time contract: a spec key that would be silently ignored
        # is an error, not a no-op (the misconfiguration must surface at
        # load, never as a wrong table)
        if method == "parquet_events" and self.mapping:
            raise MappingError(
                f"source {self.source_id!r}: parquet_events logs are already "
                f"engine-shaped and replay as-is — a mapping block would be "
                f"ignored; map at generation (doc_changes) or use a record "
                f"source"
            )
        if method in _EVENT_METHODS:
            bad = [s for s in self.workflow if s != "normalize"]
            if bad:
                raise MappingError(
                    f"source {self.source_id!r}: workflow stage(s) {bad} are "
                    f"record-path stages; event sources run the CDC epoch "
                    f"body, whose only workflow toggle is 'normalize' (the "
                    f"T1/T2 enrichment, digest included)"
                )

    @property
    def method(self) -> str:
        return self.ingest["method"]

    @property
    def is_event_source(self) -> bool:
        return self.method in _EVENT_METHODS

    @classmethod
    def from_dict(cls, d: dict) -> "SourceSpec":
        known = {f for f in cls.__dataclass_fields__}
        extra = set(d) - known
        if extra:
            raise MappingError(f"unknown source-spec keys: {sorted(extra)}")
        return cls(**d)

    @classmethod
    def from_file(cls, path: str) -> "SourceSpec":
        with open(path) as f:
            return cls.from_dict(json.load(f))


# ---------------------------------------------------------------- records


def build_records(
    spark: SparkSession, spec: SourceSpec, registry: UdfRegistry | None = None
) -> DataFrame:
    """Record-shaped ingest (the S4 harvest-dump readers) + compiled
    mapping + workflow stages → the mapped record DataFrame.

    json_lines reads the dump as raw text (one JSON record per line) and
    the mapping block addresses fields by JSONPath — the Foundry-ES
    record model. CSV/XML expose parsed columns, addressed by name."""
    from foundry_es_spark.sources.records import (
        read_csv_records,
        read_json_records,
        read_xml_records,
    )

    ing = spec.ingest
    method = spec.method
    json_col = None
    if method == "json_lines":
        if ing.get("schema"):
            # pre-parsed shape: explicit schema, mapping addresses columns
            raw = read_json_records(spark, ing["path"], ing["schema"])
        else:
            raw = spark.read.text(ing["path"]).withColumnRenamed("value", "_raw")
            json_col = "_raw"
    elif method == "csv":
        raw = read_csv_records(
            spark, ing["path"], ing["schema"], delimiter=ing.get("delimiter", ",")
        )
    elif method == "xml":
        raw = read_xml_records(spark, ing["path"], ing["record_tag"], ing["fields"])
    else:  # pragma: no cover - guarded in __post_init__
        raise MappingError(f"not a record method: {method!r}")

    if spec.mapping:
        raw = apply_mapping(raw, spec.mapping, json_col=json_col, registry=registry)
    return _apply_workflow(raw, spec, registry)


def _apply_workflow(
    df: DataFrame, spec: SourceSpec, registry: UdfRegistry | None
) -> DataFrame:
    """Ordered workflow stages over a record frame. Every stage resolves
    to an EXISTING kernel; unknown names fail at compile time."""
    registry = registry or default_registry()
    for stage in spec.workflow:
        if stage == "digest":
            df = with_content_digest(df)
        elif stage == "normalize":
            df = with_normalized_columns(df)
        elif stage.startswith("grouped:"):
            df = registry.apply_grouped(df, stage.split(":", 1)[1])
        elif stage.startswith("scalar:"):
            # scalar:<udf>:<out_col>:<in_col[,in_col...]>
            try:
                _, name, out_col, in_cols = stage.split(":", 3)
            except ValueError as exc:
                raise MappingError(f"bad scalar stage {stage!r}") from exc
            df = registry.apply_scalar(df, name, out_col, *in_cols.split(","))
        else:
            raise MappingError(f"unknown workflow stage {stage!r}")
    return df


# ----------------------------------------------------------------- events


def build_event_log(spark: SparkSession, spec: SourceSpec, work_dir: str) -> str:
    """Materialize (or locate) the source's `epoch=<e>/part=<p>/` event
    log. `parquet_events` points at an existing log; `doc_changes`
    synthesizes the flagship change stream from a testdata documents
    table (fixtures.doc_change_events — the exact entry() synthesis)."""
    from pyspark.sql import functions as F

    from foundry_es_spark.fixtures import doc_change_events, write_event_log

    ing = spec.ingest
    if spec.method == "parquet_events":
        return ing["path"]
    events_dir = os.path.join(work_dir, "events")
    events = doc_change_events(spark, ing["sf_dir"])
    if spec.mapping:
        events = apply_mapping(events, spec.mapping)
    events = events.withColumn(
        "part", F.pmod(F.xxhash64("repo"), F.lit(int(ing.get("parts", 4))))
    )
    write_event_log(events, events_dir, epoch_size=int(ing.get("epoch_size", 2000)))
    return events_dir


def build_pipeline(spark: SparkSession, spec: SourceSpec, table_dir: str | None = None):
    """PipelineConfig from the spec's `pipeline` block (plus the workflow
    toggles), onto the existing CdcPipeline."""
    from foundry_es_spark.plans import CdcPipeline, PipelineConfig

    cfg_kwargs = dict(spec.pipeline)
    cfg_kwargs.setdefault("pipeline_id", spec.source_id)
    if table_dir is not None:
        cfg_kwargs["table_dir"] = table_dir
    if "table_dir" not in cfg_kwargs:
        raise MappingError(
            f"source {spec.source_id!r}: pipeline.table_dir required for event sources"
        )
    if spec.workflow:
        cfg_kwargs.setdefault("normalize", "normalize" in spec.workflow)
    if spec.primary_key != ["repo", "path"]:
        raise MappingError(
            "the CDC engine keys on (repo, path); map other primary keys onto "
            "those columns in the mapping block"
        )
    try:
        return CdcPipeline(spark, PipelineConfig(**cfg_kwargs))
    except TypeError as exc:
        raise MappingError(f"bad pipeline config for {spec.source_id!r}: {exc}") from exc


def run_source(
    spark: SparkSession,
    spec: SourceSpec,
    work_dir: str,
    registry: UdfRegistry | None = None,
):
    """Stand a source up from its description.

    Event-shaped → full CDC replay; returns the CdcPipeline (table, fences,
    lineage all live). Record-shaped → returns the mapped record DataFrame."""
    if spec.is_event_source:
        events_dir = build_event_log(spark, spec, work_dir)
        pipe = build_pipeline(
            spark, spec, table_dir=os.path.join(work_dir, "table", spec.source_id)
            if "table_dir" not in spec.pipeline
            else None,
        )
        pipe.replay_event_dir(events_dir)
        return pipe
    return build_records(spark, spec, registry=registry)


class SourceRegistry:
    """N sources from a config directory — the Mongo `sources` collection
    analogue. ``load_dir`` reads every ``*.json``; ``run_all`` stands each
    one up (its own table dir / record frame), zero per-source Python."""

    def __init__(self, specs: list[SourceSpec] | None = None):
        self.specs: dict[str, SourceSpec] = {}
        for s in specs or []:
            self.add(s)

    def add(self, spec: SourceSpec) -> None:
        if spec.source_id in self.specs:
            raise MappingError(f"duplicate source_id {spec.source_id!r}")
        self.specs[spec.source_id] = spec

    @classmethod
    def load_dir(cls, config_dir: str) -> "SourceRegistry":
        reg = cls()
        for name in sorted(os.listdir(config_dir)):
            if name.endswith(".json"):
                reg.add(SourceSpec.from_file(os.path.join(config_dir, name)))
        return reg

    def run_all(
        self, spark: SparkSession, work_dir: str, registry: UdfRegistry | None = None
    ) -> dict[str, object]:
        return {
            sid: run_source(spark, spec, os.path.join(work_dir, sid), registry=registry)
            for sid, spec in self.specs.items()
        }
