"""DataX transformer registry re-expressed as DataFrame transforms.

The reference executes a config-ordered chain of per-record transformers
between reader and channel (core/.../transport/exchanger/
TransformerExchanger.java:53-127): exception -> dirty record, null return
-> row filtered out. Natively registered transforms
(core/.../transport/transformer/TransformerRegistry.java:28-39):
dx_substr, dx_pad, dx_replace, dx_filter, dx_digest, dx_groovy.

Here each is a pure Column expression (JVM-side, whole-stage codegen —
the fast path the reference lacks), the chain compiles a config list into
one ``select``/``filter`` pipeline, and the dx_groovy escape hatch is an
Arrow-vectorized pandas UDF hook (``register_pandas_transform``).

A key semantic difference, kept deliberately: DataX's dx_filter DROPS the
row when the predicate MATCHES (FilterTransformer.java:14-311) — i.e. it
is a negative filter. ``dx_filter`` below preserves that inverted sense.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Native transforms (SubstrTransformer.java / PadTransformer.java /
# ReplaceTransformer.java semantics, 1-arg-for-1-arg)
# --------------------------------------------------------------------------


def dx_substr(col: Column | str, start_index: int, length: int) -> Column:
    """substring(col, startIndex(0-based), length); null passes through.

    SubstrTransformer.java:15-65 (0-based startIndex; Spark is 1-based).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, start_index + 1, length)


def dx_pad(col: Column | str, pad_type: str, length: int, pad_string: str) -> Column:
    """lpad/rpad to ``length``; truncates when longer; null -> "".

    PadTransformer.java:15-91: padType 'l' or 'r'; null input becomes the
    pad alone (we mirror with coalesce to '').
    """
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    if pad_type == "l":
        return F.lpad(c, length, pad_string)
    if pad_type == "r":
        return F.rpad(c, length, pad_string)
    raise ValueError(f"pad_type must be 'l' or 'r', got {pad_type!r}")


def dx_replace(col: Column | str, start_index: int, length: int, replace_string: str) -> Column:
    """Splice-replace [start, start+length) with ``replace_string``.

    ReplaceTransformer.java:15-66. Expressed with overlay(); when length
    exceeds the remaining string overlay still clips correctly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.overlay(c, F.lit(replace_string), F.lit(start_index + 1), F.lit(length))


_FILTER_CODES = {">", "<", "=", "!=", ">=", "<=", "like", "not like"}


def dx_filter_predicate(col: Column | str, code: str, value: Any) -> Column:
    """The MATCH predicate of dx_filter (row is DROPPED when true).

    FilterTransformer.java:14-311: 'like' is a full-match regex
    (Java ``matches()``), comparisons are type-aware on the column.
    """
    c = F.col(col) if isinstance(col, str) else col
    if code == "like":
        return c.rlike(f"^(?:{value})$")
    if code == "not like":
        return ~c.rlike(f"^(?:{value})$")
    lit = F.lit(value)
    if code == ">":
        return c > lit
    if code == "<":
        return c < lit
    if code == "=":
        return c == lit
    if code == "!=":
        return c != lit
    if code == ">=":
        return c >= lit
    if code == "<=":
        return c <= lit
    raise ValueError(f"unknown filter code {code!r}; expected one of {_FILTER_CODES}")


def dx_filter(df: DataFrame, col: str, code: str, value: Any) -> DataFrame:
    """Drop rows where the predicate matches (DataX inverted-filter sense).

    Null columns are never dropped by >/</>=/<= (Java compare on null
    throws -> dirty in DataX; here they simply survive, the common case).
    """
    pred = dx_filter_predicate(col, code, value)
    return df.filter(~F.coalesce(pred, F.lit(False)))


def dx_digest(col: Column | str, algo: str = "md5") -> Column:
    """Hash a column (DataX DigestTransformer: md5/sha1 of a field)."""
    c = F.col(col) if isinstance(col, str) else col
    algo = algo.lower()
    if algo == "md5":
        return F.md5(c)
    if algo == "sha1":
        return F.sha1(c)
    if algo in ("sha256", "sha-256"):
        return F.sha2(c, 256)
    raise ValueError(f"unsupported digest {algo!r}")


# --------------------------------------------------------------------------
# Registry + config-driven chain (TransformerRegistry / job config analog)
# --------------------------------------------------------------------------


@dataclass
class TransformSpec:
    """One entry of a DataX job's ``transformer`` list."""

    name: str
    column: str | None = None
    parameters: dict[str, Any] = field(default_factory=dict)


ColumnTransform = Callable[..., Column]

_REGISTRY: dict[str, ColumnTransform] = {}
_PANDAS_REGISTRY: dict[str, Callable[[DataFrame, TransformSpec], DataFrame]] = {}


def register_transform(name: str, fn: ColumnTransform) -> None:
    if name.startswith("dx_") and name in _REGISTRY:
        raise ValueError(f"native name {name} reserved")  # TransformerRegistry.java:151-158
    _REGISTRY[name] = fn


def register_pandas_transform(name: str, fn) -> None:
    """The dx_groovy analog: a DataFrame->DataFrame hook, expected to be
    built on Arrow-vectorized pandas_udf / mapInPandas (never per-row)."""
    _PANDAS_REGISTRY[name] = fn


for _n, _f in {
    "dx_substr": dx_substr,
    "dx_pad": dx_pad,
    "dx_replace": dx_replace,
    "dx_digest": dx_digest,
}.items():
    _REGISTRY[_n] = _f


def compile_python_transform(spec: TransformSpec):
    """The CONFIG-EMBEDDED custom transform — the dx_groovy analog.

    DataX compiles Groovy source straight out of the job config, once
    per task, into a Transformer (GroovyTransformer.java:45-88 +
    GroovyTransformerStaticUtil). Here the config carries PYTHON source
    (``parameters.code``) defining ``transform(series) -> series`` over
    a pandas Series, or an import path (``parameters.entryPoint`` =
    "module:function") to the same signature. Either way the function is
    resolved ONCE at chain-compile time and wrapped in an
    Arrow-vectorized pandas_udf — config code never runs per-row, and a
    compile error fails the job at plan time exactly like a Groovy
    compile error fails DataX's job init (not mid-flight).

    Same trust model as the reference: job configs are code. Do not
    feed untrusted job.json to the engine (dx_groovy has the identical
    property — CVE-grade by design in both systems; registry-only
    deployments can simply not enable this transformer).
    """
    import pandas as pd  # noqa: F401  (available to config code)

    p = spec.parameters
    out_type = p.get("outputType", "string")
    if "entryPoint" in p:
        mod_name, _, fn_name = p["entryPoint"].partition(":")
        import importlib

        fn = getattr(importlib.import_module(mod_name), fn_name or "transform")
    elif "code" in p:
        ns: dict[str, Any] = {"pd": pd}
        exec(compile(p["code"], f"<dx_python:{spec.column}>", "exec"), ns)
        fn = ns.get(p.get("functionName", "transform"))
        if not callable(fn):
            raise ValueError(
                "dx_python code must define transform(series) "
                f"(or parameters.functionName), got {sorted(ns)!r}"
            )
    else:
        raise ValueError("dx_python requires parameters.code or .entryPoint")

    udf = F.pandas_udf(fn, out_type)

    def apply(df: DataFrame) -> DataFrame:
        out_col = p.get("output", spec.column)
        return df.withColumn(out_col, udf(F.col(spec.column)))

    return apply


def apply_transform_chain(df: DataFrame, specs: list[TransformSpec]) -> DataFrame:
    """Compile a config-ordered transformer chain into DataFrame ops.

    Column transforms rewrite their column in place (DataX transformers
    mutate the Record cell); dx_filter drops matching rows; dx_python
    compiles config-embedded source once into an Arrow pandas_udf;
    registered pandas transforms take/return whole DataFrames.
    """
    for spec in specs:
        if spec.name == "dx_filter":
            df = dx_filter(
                df, spec.column, spec.parameters["code"], spec.parameters["value"]
            )
        elif spec.name == "dx_python":
            df = compile_python_transform(spec)(df)
        elif spec.name in _REGISTRY:
            newcol = _REGISTRY[spec.name](spec.column, **spec.parameters)
            df = df.withColumn(spec.column, newcol)
        elif spec.name in _PANDAS_REGISTRY:
            df = _PANDAS_REGISTRY[spec.name](df, spec)
        else:
            raise KeyError(f"unknown transformer {spec.name!r}")
    return df
