"""datax-spark: a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of hszhsz/DataX
(reader -> channel -> writer ETL mover, see /root/repo/SURVEY.md) as an
idiomatic Spark engine:

- change-event log (insert/update/delete keyed by (repo, path, commit),
  monotone ``seq``) tailed in micro-batches,
- salted, latest-wins per-key dedup (``row_number`` window),
- exactly-once, batch-id-fenced copy-on-write MERGE into a bucketed
  manifest-committed parquet "lake" table (Iceberg-style snapshots,
  implemented here because no lakehouse jar ships in this sandbox),
- dirty-record quarantine + error limits (DataX ErrorRecordChecker
  semantics),
- schema evolution (additive columns),
- per-batch metrics + per-partition lineage.

Everything is DataFrame / SQL / Arrow-vectorized — no per-row Python in
the hot path, no RDDs.
"""

__version__ = "0.1.0"

from datax_spark.config import get_spark  # noqa: F401
