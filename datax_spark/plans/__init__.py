from datax_spark.plans.job import JobSpec, compile_reader, compile_writer, run_job  # noqa: F401
