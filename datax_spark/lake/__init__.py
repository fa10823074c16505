from datax_spark.lake.table import CommitConflict, LakeTable  # noqa: F401
