"""Tests for the job-spec compiler (DataX job.json analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.plans.job import (
    JobSpec,
    compile_reader,
    jdbc_read_options,
    run_job,
)
from datax_spark.quality.quarantine import ErrorLimit


def test_jdbc_options_split_pk():
    opts = jdbc_read_options(
        {
            "jdbcUrl": "jdbc:mysql://h:3306/db",
            "table": "t",
            "column": ["a", "b"],
            "where": "a > 0",
            "splitPk": "a",
            "numPartitions": 8,
            "lowerBound": 0,
            "upperBound": 100,
            "username": "u",
            "password": "p",
        }
    )
    assert opts["dbtable"] == "(SELECT a,b FROM t WHERE a > 0) dx_q"
    assert opts["partitionColumn"] == "a"
    assert opts["numPartitions"] == "8"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "100"


def test_jdbc_options_query_sql():
    opts = jdbc_read_options(
        {"jdbcUrl": "jdbc:x", "table": "t", "querySql": "SELECT 1 AS x", "splitPk": "x"}
    )
    assert opts["dbtable"] == "(SELECT 1 AS x) dx_q"
    assert "partitionColumn" not in opts  # querySql disables split, like DataX


def test_streamreader_generator(spark):
    df = compile_reader(
        spark,
        {
            "name": "streamreader",
            "parameter": {
                "sliceRecordCount": 100,
                "column": [
                    {"value": "hello", "type": "string"},
                    {"random": "0,9", "type": "long"},
                ],
            },
        },
        channel=4,
    )
    rows = df.collect()
    assert len(rows) == 400  # sliceRecordCount per channel, like DataX tasks
    assert all(r["col0"] == "hello" and 0 <= r["col1"] <= 9 for r in rows)


def test_csv_roundtrip_job(spark, tmp_path):
    src = str(tmp_path / "in")
    dst = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "aa", "x"), (2, "bb", "purge"), (3, "\\N", "y")], ["id", "s", "tag"]
    ).write.option("header", "true").csv(src)

    job = {
        "job": {
            "setting": {
                "speed": {"channel": 2},
                "errorLimit": {"record": 10, "percentage": 0.5},
            },
            "content": [
                {
                    "reader": {
                        "name": "txtfilereader",
                        "parameter": {
                            "path": src,
                            "fileType": "csv",
                            "header": True,
                            "nullFormat": "\\N",
                        },
                    },
                    "transformer": [
                        {
                            "name": "dx_filter",
                            "parameter": {"column": "tag", "code": "like", "value": "pur.*"},
                        },
                        {
                            "name": "dx_pad",
                            "parameter": {"column": "s", "pad_type": "l", "length": 4, "pad_string": "0"},
                        },
                    ],
                    "writer": {
                        "name": "txtfilewriter",
                        "parameter": {
                            "path": dst,
                            "fileType": "csv",
                            "header": True,
                            "writeMode": "truncate",
                            "nullFormat": "\\N",
                        },
                    },
                }
            ],
        }
    }
    run_job(spark, job)
    out = spark.read.option("header", "true").option("nullValue", "\\N").csv(dst)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {"1", "3"}  # dx_filter dropped the 'purge' row
    assert rows["1"]["s"] == "00aa"
    assert rows["3"]["s"] == "0000"  # null -> '' -> padded (DataX pad semantics)


def test_parquet_to_lake_job(spark, tmp_path):
    from datax_spark.lake.table import LakeTable
    from pyspark.sql.types import StructType

    src = str(tmp_path / "events")
    df = spark.createDataFrame(
        [("r1", "p1", "c1", "py", "v1", "insert", 1),
         ("r1", "p1", "c1", "py", "v2", "update", 2),
         ("r2", "p2", "c2", "go", "x", "insert", 3)],
        ["repo", "path", "commit", "lang", "content", "op", "seq"],
    )
    df.write.parquet(src)
    tbl_path = str(tmp_path / "lake")
    schema = StructType([f for f in df.schema.fields if f.name not in ("op", "seq")])
    LakeTable.create(spark, tbl_path, schema, ["repo", "path", "commit"], "repo", 4)
    res = run_job(
        spark,
        JobSpec(
            reader={"name": "parquetreader", "parameter": {"path": src}},
            writer={"name": "lakewriter", "parameter": {"path": tbl_path, "batchId": 1}},
        ),
    )
    assert res.applied
    final = LakeTable(spark, tbl_path).read()
    got = {(r["repo"], r["content"]) for r in final.collect()}
    assert got == {("r1", "v2"), ("r2", "x")}


def test_reader_projection_and_where(spark, tmp_path):
    src = str(tmp_path / "p")
    spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("v"), F.lit("z").alias("junk")
    ).write.parquet(src)
    df = compile_reader(
        spark,
        {"name": "parquetreader", "parameter": {"path": src, "column": ["id", "v"], "where": "id >= 5"}},
    )
    assert df.columns == ["id", "v"]
    assert df.count() == 5
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "junk" not in plan.split("ReadSchema")[-1]  # column pruned at scan


def test_writer_empty_as_null_and_encoding(spark, tmp_path):
    """emptyAsNull write normalization (CommonRdbmsWriter.java:477-482)
    and mandatoryEncoding pass-through."""
    src = str(tmp_path / "enc_in")
    dst = str(tmp_path / "enc_out")
    spark.createDataFrame(
        [(1, ""), (2, "x"), (3, None)], ["id", "s"]
    ).write.parquet(src)
    run_job(spark, {"job": {"content": [{
        "reader": {"name": "parquetreader", "parameter": {"path": src}},
        "writer": {"name": "csvwriter", "parameter": {
            "path": dst, "emptyAsNull": True, "header": True,
            "encoding": "UTF-8", "nullFormat": "\\N"}},
    }]}})
    back = (
        spark.read.option("header", "true").option("nullValue", "\\N").csv(dst)
    )
    rows = {int(r["id"]): r["s"] for r in back.collect()}
    assert rows[1] is None and rows[2] == "x" and rows[3] is None


def test_seq_file_reader(spark, tmp_path):
    """hdfsreader SEQ mode (DFSUtil.java:214): value side is a delimited
    text record, key ignored; one of the two legitimate RDD uses."""
    seq = str(tmp_path / "seqdata")
    spark.sparkContext.parallelize(
        [("k1", "a,1"), ("k2", "b,2"), ("k3", "c,3")], 2
    ).saveAsSequenceFile(seq)
    df = compile_reader(
        spark,
        {
            "name": "hdfsreader",
            "parameter": {
                "fileType": "seq",
                "path": seq,
                "fieldDelimiter": ",",
                "column": ["name", "num"],
            },
        },
    )
    rows = {r["name"]: r["num"] for r in df.collect()}
    assert rows == {"a": "1", "b": "2", "c": "3"}


def test_multi_table_job(spark, tmp_path):
    """content[] with several entries runs every reader->writer pair
    (DataX multi-table jobs; ConfigParser splits them into task groups)."""
    import os as _os

    srcs, dsts = [], []
    for i in range(3):
        s = str(tmp_path / f"mt_in{i}")
        d = str(tmp_path / f"mt_out{i}")
        spark.createDataFrame([(i, f"v{i}")], ["id", "s"]).write.parquet(s)
        srcs.append(s)
        dsts.append(d)
    spec = {"job": {"content": [
        {"reader": {"name": "parquetreader", "parameter": {"path": s}},
         "writer": {"name": "parquetwriter", "parameter": {"path": d}}}
        for s, d in zip(srcs, dsts)
    ]}}
    results = run_job(spark, spec)
    assert results == dsts
    for i, d in enumerate(dsts):
        assert _os.path.exists(d)
        assert spark.read.parquet(d).collect()[0]["id"] == i


def test_config_embedded_python_transform_job(spark, tmp_path):
    """dx_groovy analog round trip: job.json carries inline Python source
    (GroovyTransformer.java:45-88 compiles Groovy from config the same
    way); it compiles ONCE into an Arrow pandas_udf at plan time and a
    broken source fails the job up front, not mid-flight."""
    src = str(tmp_path / "pyin")
    dst = str(tmp_path / "pyout")
    spark.createDataFrame(
        [(1, "abc"), (2, "xyz")], ["id", "s"]
    ).write.option("header", "true").csv(src)

    def job_with(code):
        return {"job": {"content": [{
            "reader": {"name": "txtfilereader",
                       "parameter": {"path": src, "fileType": "csv",
                                     "header": True}},
            "transformer": [{
                "name": "dx_python",
                "parameter": {"column": "s", "code": code},
            }],
            "writer": {"name": "txtfilewriter",
                       "parameter": {"path": dst, "fileType": "csv",
                                     "header": True,
                                     "writeMode": "truncate"}},
        }]}}

    run_job(spark, job_with(
        "def transform(series):\n    return series.str.upper() + '!'\n"
    ))
    rows = {r["id"]: r["s"] for r in
            spark.read.option("header", "true").csv(dst).collect()}
    assert rows == {"1": "ABC!", "2": "XYZ!"}

    # compile errors surface at plan time (job init), like a Groovy
    # compile failure in the reference
    import pytest as _pytest
    with _pytest.raises(SyntaxError):
        run_job(spark, job_with("def transform(series:\n    return"))
    with _pytest.raises(ValueError, match="transform"):
        run_job(spark, job_with("x = 1\n"))


def test_entrypoint_python_transform(spark):
    """dx_python via entryPoint import path (the registry-friendly form)."""
    from datax_spark.operators.transforms import (
        TransformSpec,
        apply_transform_chain,
    )

    df = spark.createDataFrame([(1.0,), (2.5,)], ["v"])
    out = apply_transform_chain(df, [TransformSpec(
        "dx_python", "v",
        {"entryPoint": "tests.py_transform_fixture:double_it",
         "outputType": "double"},
    )])
    assert sorted(r["v"] for r in out.collect()) == [2.0, 5.0]


def test_zip_compressed_reader_job(spark, tmp_path):
    """DataX reads zip'd CSV transparently (compress=zip,
    UnstructuredStorageReaderUtil ZipCycleInputStream); Spark has no zip
    codec, so the binaryFile+zipfile route must round-trip a job.json —
    multiple archives, multiple entries per archive, per-entry header."""
    import zipfile

    src = tmp_path / "zin"
    src.mkdir()
    with zipfile.ZipFile(src / "a.zip", "w") as zf:
        zf.writestr("p1.csv", "id,name\n1,aa\n2,bb\n")
        zf.writestr("sub/p2.csv", "id,name\n3,cc\n")
    with zipfile.ZipFile(src / "b.zip", "w") as zf:
        zf.writestr("p3.csv", "id,name\n4,dd\n")
    dst = str(tmp_path / "zout")

    job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "txtfilereader",
                        "parameter": {
                            "path": str(src),
                            "fileType": "csv",
                            "compress": "zip",
                            "header": True,
                            "fieldDelimiter": ",",
                            "column": ["id", "name"],
                        },
                    },
                    "writer": {
                        "name": "txtfilewriter",
                        "parameter": {
                            "path": dst,
                            "fileType": "csv",
                            "header": True,
                            "writeMode": "truncate",
                        },
                    },
                }
            ]
        }
    }
    run_job(spark, job)
    out = spark.read.option("header", True).csv(dst)
    got = {(r["id"], r["name"]) for r in out.collect()}
    assert got == {("1", "aa"), ("2", "bb"), ("3", "cc"), ("4", "dd")}


def test_lzo_compressed_reader_job(spark, tmp_path):
    """DataX reads .lzo CSV transparently (compress=lzo / lzo_deflate,
    UnstructuredStorageReaderUtil.java:118-137); Spark has no LZO codec,
    so the binaryFile + sources/lzo.py route must round-trip a job.json
    — multiple archives, per-file header, both container formats."""
    from datax_spark.sources.lzo import write_lzo_deflate, write_lzop

    src = tmp_path / "lzin"
    src.mkdir()
    (src / "a.lzo").write_bytes(
        write_lzop(b"id,name\n1,aa\n2,bb\n", filename=b"a.csv")
    )
    (src / "b.lzo").write_bytes(write_lzop(b"id,name\n3,cc\n"))
    dst = str(tmp_path / "lzout")

    job = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "txtfilereader",
                        "parameter": {
                            "path": str(src),
                            "fileType": "csv",
                            "compress": "lzo",
                            "header": True,
                            "fieldDelimiter": ",",
                            "column": ["id", "name"],
                        },
                    },
                    "writer": {
                        "name": "txtfilewriter",
                        "parameter": {
                            "path": dst,
                            "fileType": "csv",
                            "header": True,
                            "writeMode": "truncate",
                        },
                    },
                }
            ]
        }
    }
    run_job(spark, job)
    out = spark.read.option("header", True).csv(dst)
    got = {(r["id"], r["name"]) for r in out.collect()}
    assert got == {("1", "aa"), ("2", "bb"), ("3", "cc")}

    # bare block framing (compress=lzo_deflate, LzoInputStream route)
    src2 = tmp_path / "lzdin"
    src2.mkdir()
    (src2 / "c.csv.lzo_deflate").write_bytes(
        write_lzo_deflate(b"4|dd\n5|ee\n")
    )
    df = compile_reader(
        spark,
        {
            "name": "hdfsreader",
            "parameter": {
                "path": str(src2),
                "fileType": "csv",
                "compress": "lzo_deflate",
                "fieldDelimiter": "|",
                "column": ["id", "name"],
            },
        },
    )
    assert {(r["id"], r["name"]) for r in df.collect()} == {
        ("4", "dd"), ("5", "ee")
    }


def test_adjust_channel_number_speed_budgets(spark, tmp_path):
    """adjustChannelNumber (JobContainer.java:416-486): global speed
    budget / per-channel budget -> parallelism; min(byte, record) wins;
    explicit channel is the fallback; a global budget without its
    per-channel divisor is a config error."""
    import pytest

    from datax_spark.plans.job import JobSpec, adjust_channel_number

    core = {"transport": {"channel": {"speed": {"byte": 1048576, "record": 10000}}}}
    # byte-derived: 10 MB/s over 1 MB/s channels -> 10
    assert adjust_channel_number({"speed": {"byte": 10 * 1048576}}, core) == 10
    # record-derived: 25k tps over 10k tps channels -> 2 (floor)
    assert adjust_channel_number({"speed": {"record": 25000}}, core) == 2
    # both: the SMALLER wins (reference takes min)
    assert (
        adjust_channel_number(
            {"speed": {"byte": 10 * 1048576, "record": 25000}}, core
        )
        == 2
    )
    # floors at 1
    assert adjust_channel_number({"speed": {"byte": 1}}, core) == 1
    # explicit channel only applies when no budget is set
    assert adjust_channel_number({"speed": {"channel": 7}}, {}) == 7
    assert (
        adjust_channel_number({"speed": {"byte": 3 * 1048576, "channel": 7}}, core)
        == 3
    )
    # budget without per-channel divisor: config error, like DataX
    with pytest.raises(ValueError, match="speed.byte"):
        adjust_channel_number({"speed": {"byte": 100}}, {})
    # no speed settings at all: Spark sizes itself (documented divergence)
    assert adjust_channel_number({}, {}) is None

    # wired through the job shape: the compiled reader's partition count
    # equals the derived channel count
    src = str(tmp_path / "chan_in")
    spark.range(100).selectExpr("id", "cast(id as string) s").write.parquet(src)
    spec = JobSpec.from_dict(
        {
            "core": core,
            "job": {
                "setting": {"speed": {"record": 25000}},
                "content": [
                    {
                        "reader": {
                            "name": "parquetreader",
                            "parameter": {"path": src, "fileType": "parquet"},
                        },
                        "writer": {"name": "streamwriter", "parameter": {}},
                    }
                ],
            },
        }
    )
    assert spec.channel == 2
    df = compile_reader(spark, spec.reader, spec.channel)
    assert df.rdd.getNumPartitions() == 2


def test_multi_entry_job_keeps_core_speed_budget(spark, tmp_path):
    """run_job's multi-entry recursion must carry the top-level `core`
    key, or a speed budget valid for one entry fails for two
    (code-review r4 finding)."""
    src = str(tmp_path / "me_in")
    spark.range(10).selectExpr("id", "cast(id as string) s").write.parquet(src)
    entry = {
        "reader": {"name": "parquetreader",
                   "parameter": {"path": src, "fileType": "parquet"}},
        "writer": {"name": "streamwriter", "parameter": {}},
    }
    spec = {
        "core": {"transport": {"channel": {"speed": {"record": 10000}}}},
        "job": {
            "setting": {"speed": {"record": 20000}},
            "content": [entry, dict(entry)],
        },
    }
    results = run_job(spark, spec)
    assert len(results) == 2  # both entries ran with the derived channel
