"""Transform-mapping DSL → native Column compiler.

The reference maps raw harvested records into DATS with an interpreted
per-record transformation language (``transform column "$.x" to "dats.y"
apply {toStandardDate(...)}``) [F-ES: common/.../transform/
TransformationLanguageInterpreter — UNVERIFIED, SURVEY.md §0]. Here the
same declarative surface compiles ONCE, driver-side, into a list of
``pyspark.sql.Column`` trees; execution is 100 % native (JSONPath via
``get_json_object``, builtins via built-in functions, both inside
whole-stage codegen) or a registered Arrow-vectorized pandas UDF — never
a per-row Python interpreter (BASELINE.json input_hint: "no per-row
Python").

Mapping entry shape (one per target column)::

    {"from": "$.repository.name", "to": "repo", "apply": ["trim", "lower"]}
    {"from": "language",          "to": "lang", "apply": ["normalizeLang"]}
    {"from": "$.committed_at",    "to": "ts",
     "apply": [{"fn": "toStandardDate", "args": ["MM/dd/yyyy"]}]}
    {"const": "I", "to": "op"}
    {"from": "$.body", "to": "dats.digest", "apply": ["sha256"]}

- ``from`` starting with ``$`` is a JSONPath over the source's raw-JSON
  column (``json_col``); otherwise it is a (possibly nested dotted)
  column reference on the record frame.
- ``const`` emits a literal.
- ``apply`` is an ordered builtin chain; each item is a builtin name or
  ``{"fn": name, "args": [...]}``. ``udf:<name>`` applies a scalar
  enhancer from the UdfRegistry (T7) — pandas_udf-backed by registry
  construction, so the no-per-row-Python rule survives user extensions.
- ``to`` with one dot (``dats.digest``) assembles a one-level struct —
  the DATS-nested target shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from foundry_es_spark.functions.normalize import normalize_lang, standardize_date
from foundry_es_spark.functions.registry import UdfRegistry


class MappingError(ValueError):
    """A mapping entry that cannot compile (unknown builtin, bad shape).

    Raised at COMPILE time, driver-side — a misauthored harvest
    description fails before any executor work starts."""


def _b_to_standard_date(c: Column, *fmts: str) -> Column:
    return standardize_date(c, list(fmts) or None)


def _b_regex_extract(c: Column, pattern: str, group: int = 1) -> Column:
    return F.regexp_extract(c, pattern, int(group))


def _b_json_get(c: Column, path: str) -> Column:
    return F.get_json_object(c, path)


def _b_coalesce(c: Column, default) -> Column:
    return F.coalesce(c, F.lit(default))


def _b_substring(c: Column, pos: int, length: int) -> Column:
    return F.substring(c, int(pos), int(length))


# name → Column-in, Column-out. All native pyspark.sql.functions — the
# compiled expression stays JVM-side in whole-stage codegen.
BUILTINS: dict[str, Callable[..., Column]] = {
    "toStandardDate": _b_to_standard_date,
    "toDate": lambda c, *fmts: _b_to_standard_date(c, *fmts).cast("date"),
    "normalizeLang": normalize_lang,
    "sha256": lambda c: F.sha2(c, 256),
    "sha1": F.sha1,
    "lower": F.lower,
    "upper": F.upper,
    "trim": F.trim,
    "length": F.length,
    "toInt": lambda c: c.try_cast("int"),
    "toLong": lambda c: c.try_cast("long"),
    "toDouble": lambda c: c.try_cast("double"),
    "toBool": lambda c: c.try_cast("boolean"),
    "regexExtract": _b_regex_extract,
    "jsonGet": _b_json_get,
    "coalesce": _b_coalesce,
    "substring": _b_substring,
    "splitWords": lambda c: F.split(c, r"\s+"),
    "arrayJoin": lambda c, sep=" ": F.array_join(c, sep),
}


def _source_col(entry: dict, json_col: str | None) -> Column:
    if "const" in entry:
        return F.lit(entry["const"])
    src = entry.get("from")
    if src is None:
        raise MappingError(f"mapping entry needs 'from' or 'const': {entry!r}")
    if src.startswith("$"):
        if json_col is None:
            raise MappingError(
                f"JSONPath source {src!r} but the source has no raw-JSON column"
            )
        return F.get_json_object(F.col(json_col), src)
    return F.col(src)


def _apply_chain(col: Column, chain: list, registry: UdfRegistry | None) -> Column:
    for step in chain or []:
        if isinstance(step, str):
            fn_name, args = step, []
        elif isinstance(step, dict):
            fn_name, args = step.get("fn"), step.get("args", [])
        else:
            raise MappingError(f"bad apply step: {step!r}")
        if fn_name is None:
            raise MappingError(f"apply step missing 'fn': {step!r}")
        if fn_name.startswith("udf:"):
            name = fn_name[4:]
            if registry is None or name not in registry.scalar:
                raise MappingError(f"enhancer {name!r} not registered")
            col = registry.scalar[name](col, *args)
        elif fn_name in BUILTINS:
            col = BUILTINS[fn_name](col, *args)
        else:
            raise MappingError(f"unknown builtin {fn_name!r}")
    return col


def compile_mapping(
    mapping: list[dict],
    json_col: str | None = None,
    registry: UdfRegistry | None = None,
) -> list[Column]:
    """Compile a mapping block to one aliased Column per TOP-LEVEL target.

    Dotted targets (``dats.digest``) group into a one-level struct per
    prefix, preserving mapping order within the struct. The return value
    plugs straight into ``df.select(*cols)`` — compilation happens here,
    exactly once; the executed plan is pure Catalyst expressions."""
    flat: list[tuple[str, Column]] = []
    for entry in mapping:
        to = entry.get("to")
        if not to:
            raise MappingError(f"mapping entry missing 'to': {entry!r}")
        col = _apply_chain(_source_col(entry, json_col), entry.get("apply"), registry)
        flat.append((to, col))

    # compile-time contract: every collision fails HERE, never later at
    # select/write time (or — worse — silently, as the old prefix-skip did
    # when a plain target preceded a dotted one sharing its name)
    seen: set[str] = set()
    for to, _ in flat:
        if to in seen:
            raise MappingError(f"duplicate target {to!r}")
        seen.add(to)
    plain = {t for t, _ in flat if "." not in t}
    clash = plain & {t.split(".", 1)[0] for t, _ in flat if "." in t}
    if clash:
        raise MappingError(
            f"target(s) {sorted(clash)} used both as a plain column and as "
            f"a struct prefix"
        )

    out: list[Column] = []
    done_prefix: set[str] = set()
    for to, col in flat:
        if "." not in to:
            out.append(col.alias(to))
            continue
        prefix, _ = to.split(".", 1)
        if prefix in done_prefix:
            continue
        done_prefix.add(prefix)
        members = [
            (t.split(".", 1)[1], c) for t, c in flat if t.startswith(prefix + ".")
        ]
        out.append(F.struct(*[c.alias(n) for n, c in members]).alias(prefix))
    return out


def apply_mapping(
    df: DataFrame,
    mapping: list[dict],
    json_col: str | None = None,
    registry: UdfRegistry | None = None,
) -> DataFrame:
    """``df.select`` of the compiled mapping — the record→target projection."""
    return df.select(*compile_mapping(mapping, json_col=json_col, registry=registry))
