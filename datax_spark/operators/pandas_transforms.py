"""Arrow-vectorized transform examples: the dx_groovy escape hatch.

DataX compiles arbitrary Groovy source into a per-record transformer at
runtime (core/.../transport/transformer/GroovyTransformer.java:17-91).
The Spark-idiomatic escape hatch is an Arrow-batched pandas UDF — one
Python invocation per Arrow batch, never per row. This module registers
two production-shaped examples with the transform registry:

- ``py_norm_content``: unicode/whitespace normalization of a column
  (the kind of logic that genuinely needs Python string libraries);
- ``py_cast_safe``: best-effort numeric cast with a sentinel for
  failures — the ColumnCast "illegal conversion -> dirty" semantics
  (common/.../element/ColumnCast.java) as a vectorized kernel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from datax_spark.operators.transforms import TransformSpec, register_pandas_transform


@F.pandas_udf(StringType())
def _norm_content(s: pd.Series) -> pd.Series:
    import unicodedata

    return s.map(
        lambda x: None
        if x is None
        else " ".join(unicodedata.normalize("NFKC", x).split())
    )


@F.pandas_udf(DoubleType())
def _cast_safe(s: pd.Series) -> pd.Series:
    return pd.to_numeric(s, errors="coerce")


def py_norm_content(df: DataFrame, spec: TransformSpec) -> DataFrame:
    return df.withColumn(spec.column, _norm_content(F.col(spec.column)))


def py_cast_safe(df: DataFrame, spec: TransformSpec) -> DataFrame:
    """Cast ``spec.column`` to double; unparseable values become null
    (route them to quarantine with a dirty predicate downstream)."""
    out = spec.parameters.get("output", spec.column)
    return df.withColumn(out, _cast_safe(F.col(spec.column)))


register_pandas_transform("py_norm_content", py_norm_content)
register_pandas_transform("py_cast_safe", py_cast_safe)
