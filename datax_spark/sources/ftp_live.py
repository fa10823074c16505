"""Live FTP reader over the real protocol (stdlib ``ftplib``).

Round 4 upgrades ftpreader from "read the mounted path with Spark" to
an executable implementation of the reference's actual transfer path
(ftpreader/.../StandardFtpHelper.java): connect in passive mode
(connectPattern=PASV, StandardFtpHelper.java:37-39), enumerate files by
walking directories up to ``maxTraversalLevel``
(getListFiles:142-187), then stream each file's bytes with RETR
(retrieveFileStream:221) and feed the decoded lines into the SAME
delimited-parse path every unstructured reader shares.

Scale shape: the directory walk is driver-side metadata (one control
connection); the FETCHES are executor-parallel — the file list becomes
a DataFrame, each Arrow batch opens its own FTP connection and streams
its files' LINES out as rows (content never funnels through the
driver). One file is one task unit, exactly DataX's one-reader-task-
per-file split. Tests drive it against an in-process stdlib-socket FTP
server speaking real PASV/RETR/NLST (tests/test_ftp_live.py) — the FTP
twin of the embedded-Derby and mock-ES proofs.
"""

from __future__ import annotations

import ftplib
import io
import posixpath
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _connect(
    host: str, port: int = 21, username: str = "", password: str = "",
    timeout: float = 30.0,
) -> ftplib.FTP:
    ftp = ftplib.FTP()
    ftp.connect(host, port, timeout=timeout)
    ftp.login(username or "anonymous", password or "")
    ftp.set_pasv(True)  # connectPattern=PASV, the reference default
    return ftp


def ftp_list_files(
    host: str,
    port: int = 21,
    username: str = "",
    password: str = "",
    paths: list[str] | str = "/",
    max_traversal_level: int = 100,
) -> list[str]:
    """Walk each path like StandardFtpHelper.getListFiles: a directory
    recurses (bounded by ``max_traversal_level``), a file passes
    through. Directory-ness is probed with CWD, like isDirExist."""
    if isinstance(paths, str):
        paths = [paths]
    ftp = _connect(host, port, username, password)
    out: list[str] = []

    def is_dir(p: str) -> bool:
        cur = ftp.pwd()
        try:
            ftp.cwd(p)
            ftp.cwd(cur)
            return True
        except ftplib.error_perm:
            return False

    def walk(p: str, level: int) -> None:
        if level > max_traversal_level:
            raise ValueError(
                f"FTP traversal exceeded maxTraversalLevel="
                f"{max_traversal_level} at {p!r}"
            )
        if is_dir(p):
            for name in ftp.nlst(p):
                base = posixpath.basename(name.rstrip("/"))
                if base in (".", ".."):
                    continue
                child = name if name.startswith("/") else posixpath.join(p, base)
                walk(child, level + 1)
        else:
            # not a directory: verify it exists as a FILE now (NLST of a
            # file lists itself) — the fetch is lazy/executor-side, and
            # a typo'd path must fail at plan time like the reference's
            # path check, not mid-job
            try:
                listing = ftp.nlst(p)
            except ftplib.error_perm:
                listing = []
            if not listing:
                raise FileNotFoundError(f"ftp path not found: {p!r}")
            out.append(p)

    try:
        for p in paths:
            walk(p, 0)
    finally:
        ftp.quit()
    return sorted(set(out))


def ftp_read_lines(
    spark: SparkSession,
    param: dict[str, Any],
) -> DataFrame:
    """DataX ftpreader parameter block -> DataFrame of text lines
    (column ``value``), fetched executor-parallel over real FTP."""
    host = param["host"]
    port = int(param.get("port", 21))
    user = param.get("username", "")
    password = param.get("password", "")
    encoding = param.get("encoding", "utf-8")
    skip_header = bool(param.get("skipHeader", param.get("header", False)))
    files = ftp_list_files(
        host, port, user, password, param["path"],
        int(param.get("maxTraversalLevel", 100)),
    )
    if not files:
        raise FileNotFoundError(
            f"ftpreader: no files under {param['path']!r} on {host}:{port}"
        )
    files_df = spark.createDataFrame(
        [(f,) for f in files], "remote_path string"
    ).repartition(min(len(files), 64))

    def _batches(it):
        import pandas as pd

        for pdf in it:
            vals: list[str] = []
            if len(pdf) == 0:
                yield pd.DataFrame({"value": vals})
                continue
            ftp = _connect(host, port, user, password)
            try:
                for rp in pdf["remote_path"]:
                    buf = io.BytesIO()
                    ftp.retrbinary(f"RETR {rp}", buf.write)
                    lines = buf.getvalue().decode(encoding).splitlines()
                    if skip_header and lines:
                        lines = lines[1:]
                    vals.extend(ln for ln in lines if ln != "")
            finally:
                try:
                    ftp.quit()
                except Exception:
                    ftp.close()
            yield pd.DataFrame({"value": vals})

    return files_df.mapInPandas(_batches, "value string")
