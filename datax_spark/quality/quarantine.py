"""Dirty-record quarantine + error limits.

DataX captures rows that fail conversion/write as "dirty" with the error,
logs the first N, counts them, and aborts the job when the count or the
dirty/total ratio exceeds configured limits, record-limit first
(core/.../statistics/plugin/task/StdoutPluginCollector.java:22-74,
core/.../util/ErrorRecordChecker.java:18-82).

Here the same contract is set-oriented and runs BEFORE the merge: a
validity predicate splits each batch into clean/dirty DataFrames in one
pass; dirty rows are appended (with a reason column) to a quarantine
parquet log; ``ErrorLimit.check`` raises when limits trip. Filtering
before MERGE is cheaper and deterministic versus the reference's
batch-write + rollback + row-replay fallback
(plugin-rdbms-util/.../writer/CommonRdbmsWriter.java:357-441).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("insert", "update", "delete")
NULL_FORMAT = "\\N"  # DataX nullFormat sentinel
REASON_COL = "_dirty_reason"


def dirty_reason(
    key_cols: list[str] = ("repo", "path", "commit"),
    op_col: str = "op",
    content_col: str | None = "content",
    null_format: str = NULL_FORMAT,
    constraints: dict[str, str] | None = None,
):
    """Column: null for clean rows, else a reason string (first rule wins).

    ``content_col=None`` skips the null_content rule — for payload
    schemas that have no content column (generic envelope-driven tables,
    ADVICE r3); named CHECK constraints still apply.

    ``constraints``: named CHECK expressions (Delta table-constraint
    analog) stored as table properties — a non-delete row violating one
    quarantines with reason ``constraint:<name>``. Delta's three-valued
    semantics: only an expression that is literally FALSE violates (NULL
    passes — the null_* rules own null handling). Pure Column logic,
    evaluated in the same codegen stage as the built-in rules.
    """
    null_key = None
    for k in key_cols:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    out = F.when(~F.col(op_col).isin(*VALID_OPS), F.lit("invalid_op")).when(
        null_key, F.lit("null_key")
    )
    if content_col is not None:
        out = out.when(
            (F.col(op_col) != "delete")
            & (F.col(content_col).isNull() | (F.col(content_col) == null_format)),
            F.lit("null_content"),
        )
    for name, expr_sql in (constraints or {}).items():
        out = out.when(
            (F.col(op_col) != "delete") & F.expr(expr_sql).eqNullSafe(F.lit(False)),
            F.lit(f"constraint:{name}"),
        )
    return out.otherwise(F.lit(None).cast("string"))


def split_dirty(
    events: DataFrame,
    key_cols: list[str] = ("repo", "path", "commit"),
    op_col: str = "op",
    content_col: str | None = "content",
    null_format: str = NULL_FORMAT,
    constraints: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Return (clean, dirty-with-reason). One predicate, no Python UDF.

    ``content_col=None`` skips the null_content rule (see dirty_reason)."""
    tagged = events.withColumn(
        REASON_COL,
        dirty_reason(list(key_cols), op_col, content_col, null_format, constraints),
    )
    clean = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    dirty = tagged.filter(F.col(REASON_COL).isNotNull())
    return clean, dirty


class ErrorLimitExceeded(Exception):
    pass


@dataclass
class ErrorLimit:
    """DataX job.setting.errorLimit: record count and/or percentage.

    Record limit has priority over percentage, matching
    ErrorRecordChecker.java:40-49 (checkRecordLimit before checkPercentageLimit).
    """

    record: int | None = None
    percentage: float | None = None

    def check(self, dirty_count: int, total_count: int) -> None:
        if self.record is not None and dirty_count > self.record:
            raise ErrorLimitExceeded(
                f"dirty record count {dirty_count} > limit {self.record}"
            )
        if self.percentage is not None and total_count > 0:
            ratio = dirty_count / total_count
            if ratio > self.percentage:
                raise ErrorLimitExceeded(
                    f"dirty ratio {ratio:.4f} > limit {self.percentage}"
                )


def append_quarantine(
    dirty: DataFrame, quarantine_dir: str, batch_id: int, count: bool = True
) -> int:
    """Append dirty rows (+batch id) to the quarantine parquet log.

    ``count=False`` skips the pre-count job when the caller already knows
    the batch has dirty rows (e.g. from an Observation).
    """
    n = dirty.count() if count else -1
    if n:
        dirty.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
            quarantine_dir
        )
    return n
