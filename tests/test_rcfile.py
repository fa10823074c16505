"""RCFile read/write (hdfsreader/-writer fileType=rcfile) — the last §2
format gap. Runs in a SUBPROCESS because Hive catalog support must be
chosen at first-session creation and the shared test session is plain."""

import subprocess
import sys


SCRIPT = r'''
import os, sys, tempfile
sys.path.insert(0, {repo!r})
from datax_spark.config import get_spark
from datax_spark.plans.job import run_job

spark = get_spark("rcfile-test", master="local[2]", shuffle_partitions=4,
                  hive=True)
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
root = tempfile.mkdtemp()
src = os.path.join(root, "rc_data")
dst = os.path.join(root, "rc_copy")

df = spark.createDataFrame(
    [(1, "aa", 1.5, True), (2, "bb", 2.5, False), (3, None, None, None)],
    "id bigint, s string, v double, flag boolean",
)
# write path: hdfswriter fileType=rcfile
run_job(spark, {{"job": {{"content": [{{
    "reader": {{"name": "streamreader",
               "parameter": {{"sliceRecordCount": 1, "column": [
                   {{"type": "long", "value": 0}}]}}}},
    "writer": {{"name": "streamwriter", "parameter": {{}}}},
}}]}}}})  # warm the job path
from datax_spark.plans.job import _write_rcfile
_write_rcfile(df, {{"path": src, "writeMode": "append"}})
files = os.listdir(src)
assert files, "rcfile write produced files"

# read path: hdfsreader fileType=rcfile with a typed column list
from datax_spark.plans.job import compile_reader
out = compile_reader(spark, {{"name": "hdfsreader", "parameter": {{
    "path": src, "fileType": "rcfile",
    "column": [
        {{"name": "id", "type": "long"}},
        {{"name": "s", "type": "string"}},
        {{"name": "v", "type": "double"}},
        {{"name": "flag", "type": "boolean"}},
    ],
}}}})
got = sorted((r["id"], r["s"], r["v"], r["flag"]) for r in out.collect())
want = sorted((r["id"], r["s"], r["v"], r["flag"]) for r in df.collect())
assert got == want, (got, want)

# nonConflict refuses a non-empty dir
try:
    _write_rcfile(df, {{"path": src, "writeMode": "nonConflict"}})
    raise SystemExit("nonConflict should have failed")
except FileExistsError:
    pass
# full job.json round trip rcfile -> rcfile
run_job(spark, {{"job": {{"content": [{{
    "reader": {{"name": "hdfsreader", "parameter": {{
        "path": src, "fileType": "rcfile",
        "column": [
            {{"name": "id", "type": "long"}},
            {{"name": "s", "type": "string"}},
            {{"name": "v", "type": "double"}},
            {{"name": "flag", "type": "boolean"}},
        ]}}}},
    "writer": {{"name": "hdfswriter", "parameter": {{
        "path": dst, "fileType": "rcfile", "writeMode": "truncate"}}}},
}}]}}}})
out2 = compile_reader(spark, {{"name": "hdfsreader", "parameter": {{
    "path": dst, "fileType": "rcfile",
    "column": [
        {{"name": "id", "type": "long"}},
        {{"name": "s", "type": "string"}},
        {{"name": "v", "type": "double"}},
        {{"name": "flag", "type": "boolean"}},
    ]}}}})
got2 = sorted((r["id"], r["s"], r["v"], r["flag"]) for r in out2.collect())
assert got2 == want, (got2, want)
print("RCFILE_OK")
spark.stop()
'''


def test_rcfile_roundtrip_subprocess():
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=repo)],
        capture_output=True, text=True, timeout=600,
    )
    assert "RCFILE_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
