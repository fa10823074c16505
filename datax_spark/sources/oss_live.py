"""Live OSS (object store) reader/writer over the public REST protocol.

Upgrades ossreader/osswriter from the mounted-path/file-format branch to
an executable path speaking the public OSS HTTP API the reference's SDK
(`com.aliyun.oss`) wraps: `Authorization: OSS id:signature` (HMAC-SHA1
over verb/md5/type/date + canonicalized resource), paginated bucket
listing XML, ranged GETs, and the multipart upload lifecycle
(``?uploads`` initiate -> ``partNumber&uploadId`` PUTs -> complete XML)
— all stdlib (urllib + xml.etree + hmac). Tests drive an in-process
HTTP fixture that implements the same endpoints AND verifies the
request signature with the shared secret, so auth is wire-real — the
same epistemic status as the other live connector proofs.

Reference semantics reproduced:

- reader (ossreader/.../OssReader.java:240-307): object entries with a
  ``*``/``?`` glob expand via a prefix listing of the parent dir + regex
  match; the marker loop follows ``IsTruncated``/``NextMarker``; objects
  round-robin over tasks (file-count split); each object streams through
  the shared delimited-parse core (here: the executor downloads,
  decompresses gzip/bzip2/zip, and splits lines — the same codec set the
  reference whitelists at OssReader.java:166-171).
- writer (osswriter/.../OssWriter.java:119-152 writeMode, :300-430
  multipart loop): ``truncate`` deletes the object prefix up front,
  ``nonConflict`` errors if the prefix is non-empty, ``append`` writes
  alongside; each task writes its own object (`object`__<task>`suffix`),
  optional header line first, buffering ``partSize`` bytes per uploaded
  part and completing the multipart upload at the end.

Scale shape: the driver only lists object names; every download/upload
runs inside ``mapInPandas`` with one connection per slice — object
bytes never pass through the driver.
"""

from __future__ import annotations

import base64
import bz2
import gzip
import hashlib
import hmac
import io
import re
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET
import zipfile
from email.utils import formatdate
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class OssError(RuntimeError):
    def __init__(self, code: str, message: str = ""):
        super().__init__(f"{code}: {message}")
        self.code = code
        self.message = message


def sign_oss(access_key: str, verb: str, content_md5: str,
             content_type: str, date: str, resource: str) -> str:
    """Public OSS signing rule: base64(HMAC-SHA1(secret,
    VERB\\nContent-MD5\\nContent-Type\\nDate\\nCanonicalizedResource))
    (no x-oss-* headers are sent by this client)."""
    msg = f"{verb}\n{content_md5}\n{content_type}\n{date}\n{resource}"
    mac = hmac.new(access_key.encode(), msg.encode(), hashlib.sha1)
    return base64.b64encode(mac.digest()).decode()


# multipart subresources participate in the canonicalized resource
# (sorted); plain listing params (prefix/marker) do not
_SIGNED_PARAMS = ("partNumber", "uploadId", "uploads")


def canonical_resource(bucket: str, key: str, params: dict) -> str:
    res = f"/{bucket}/{key}"
    # a bare subresource travels as '?uploads=' on the wire; canonicalize
    # empty and absent values identically so both sides agree
    sub = sorted(
        (k, (None if v in (None, "") else v))
        for k, v in params.items() if k in _SIGNED_PARAMS
    )
    if sub:
        res += "?" + "&".join(k if v is None else f"{k}={v}"
                              for k, v in sub)
    return res


class OssHttp:
    def __init__(self, endpoint: str, bucket: str, access_id: str,
                 access_key: str, timeout: float = 60.0):
        self.endpoint = endpoint.rstrip("/")
        self.bucket = bucket
        self.access_id = access_id
        self.access_key = access_key
        self.timeout = timeout

    def request(self, verb: str, key: str = "",
                params: dict[str, Any] | None = None,
                data: bytes | None = None,
                headers: dict[str, str] | None = None):
        params = params or {}
        date = formatdate(usegmt=True)
        body = data or b""
        md5 = base64.b64encode(hashlib.md5(body).digest()).decode() \
            if data is not None else ""
        ctype = "application/octet-stream" if data is not None else ""
        sig = sign_oss(self.access_key, verb, md5, ctype, date,
                       canonical_resource(self.bucket, key, params))
        q = urllib.parse.urlencode(
            {k: ("" if v is None else v) for k, v in params.items()}
        )
        url = f"{self.endpoint}/{self.bucket}/{urllib.parse.quote(key)}"
        if q:
            url += "?" + q
        hdrs = {"Date": date,
                "Authorization": f"OSS {self.access_id}:{sig}"}
        if data is not None:
            hdrs["Content-MD5"] = md5
            hdrs["Content-Type"] = ctype
        hdrs.update(headers or {})
        req = urllib.request.Request(url, data=data, headers=hdrs,
                                     method=verb)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return r.read(), dict(r.headers)
        except urllib.error.HTTPError as e:
            raw = e.read()
            code, msg = f"HTTP{e.code}", ""
            try:
                root = ET.fromstring(raw)
                code = root.findtext("Code") or code
                msg = root.findtext("Message") or ""
            except ET.ParseError:
                pass
            raise OssError(code, msg) from None

    # ---- object API ------------------------------------------------------

    def list_objects(self, prefix: str = "") -> list[str]:
        """Marker-paginated listing (OssReader.getRemoteObjects'
        do/while isTruncated loop)."""
        keys: list[str] = []
        marker = None
        while True:
            params: dict[str, Any] = {"prefix": prefix}
            if marker:
                params["marker"] = marker
            raw, _ = self.request("GET", "", params)
            root = ET.fromstring(raw)
            for c in root.iter("Contents"):
                keys.append(c.findtext("Key"))
            if (root.findtext("IsTruncated") or "false") != "true":
                return keys
            marker = root.findtext("NextMarker") or (keys[-1] if keys
                                                     else None)
            if marker is None:
                return keys

    def get_object(self, key: str) -> bytes:
        raw, _ = self.request("GET", key)
        return raw

    def put_object(self, key: str, data: bytes) -> None:
        self.request("PUT", key, data=data)

    def delete_object(self, key: str) -> None:
        self.request("DELETE", key)

    # ---- multipart upload (OssWriter.java:300-430) -------------------

    def initiate_multipart(self, key: str) -> str:
        raw, _ = self.request("POST", key, {"uploads": None}, data=b"")
        uid = ET.fromstring(raw).findtext("UploadId")
        if not uid:
            raise OssError("MalformedXML", "no UploadId")
        return uid

    def upload_part(self, key: str, upload_id: str, part_number: int,
                    data: bytes) -> str:
        _, hdrs = self.request(
            "PUT", key,
            {"partNumber": part_number, "uploadId": upload_id}, data=data)
        return hdrs.get("ETag", "")

    def complete_multipart(self, key: str, upload_id: str,
                           etags: list[tuple[int, str]]) -> None:
        xml = "<CompleteMultipartUpload>" + "".join(
            f"<Part><PartNumber>{n}</PartNumber><ETag>{e}</ETag></Part>"
            for n, e in etags
        ) + "</CompleteMultipartUpload>"
        self.request("POST", key, {"uploadId": upload_id},
                     data=xml.encode())


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------


def expand_objects(client: OssHttp, objects: list[str]) -> list[str]:
    """Glob expansion exactly like OssReader.parseOriginObjects: entries
    with * or ? list the parent-dir prefix and regex-match; plain names
    pass through."""
    out: list[str] = []
    for obj in objects:
        if "*" in obj or "?" in obj:
            parent = obj[: obj.index("*" if "*" in obj else "?")]
            parent = parent.rsplit("/", 1)[0] + "/" if "/" in parent else ""
            pat = re.compile(obj.replace(".", r"\.").replace("*", ".*")
                             .replace("?", ".?") + "$")
            out.extend(k for k in client.list_objects(parent)
                       if pat.match(k))
        else:
            out.append(obj)
    return out


def _decompress(name: str, raw: bytes, compress: str | None) -> bytes:
    c = (compress or "").lower()
    if c == "gzip" or (not c and name.endswith(".gz")):
        return gzip.decompress(raw)
    if c == "bzip2" or (not c and name.endswith(".bz2")):
        return bz2.decompress(raw)
    if c == "zip" or (not c and name.endswith(".zip")):
        zf = zipfile.ZipFile(io.BytesIO(raw))
        return b"".join(zf.read(n) for n in zf.namelist())
    return raw


def oss_read_lines(
    spark: SparkSession,
    endpoint: str,
    bucket: str,
    access_id: str,
    access_key: str,
    objects: list[str],
    encoding: str = "utf-8",
    compress: str | None = None,
    num_slices: int | None = None,
) -> DataFrame:
    """Raw lines of the matched objects as DF[value string] — the input
    to the shared delimited-column split (the unstructured core). One
    object = one work item, round-robined over slices (OssReader's
    file-count split)."""
    client = OssHttp(endpoint, bucket, access_id, access_key)
    keys = expand_objects(client, objects)
    if not keys:
        raise OssError("NoSuchKey", f"no objects match {objects!r}")
    n = min(num_slices or len(keys), len(keys))
    slices = spark.createDataFrame(
        [(i,) for i in range(len(keys))], "obj_id int"
    ).repartition(n)

    def _batches(it):
        import pandas as pd

        cl = OssHttp(endpoint, bucket, access_id, access_key)
        for pdf in it:
            lines: list[str] = []
            for oid in pdf["obj_id"]:
                key = keys[int(oid)]
                raw = _decompress(key, cl.get_object(key), compress)
                text = raw.decode(encoding)
                lines.extend(text.splitlines())
            yield pd.DataFrame({"value": lines})

    return slices.mapInPandas(_batches, "value string")


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------


def oss_write(
    df: DataFrame,
    endpoint: str,
    bucket: str,
    access_id: str,
    access_key: str,
    object_name: str,
    field_delimiter: str = ",",
    write_mode: str = "truncate",
    header: list[str] | None = None,
    suffix: str = "",
    encoding: str = "utf-8",
    part_size: int = 10 * 1024 * 1024,
    null_format: str = "null",
) -> dict[str, int]:
    """Executor-parallel multipart upload, one object per task
    (`<object>__<task><suffix>`), delimiter-joined rows, optional header
    per object, parts flushed at ``part_size`` bytes and the upload
    completed at the end (OssWriter.java:300-430). writeMode truncate /
    append / nonConflict reproduces the Job.prepare cleanup
    (OssWriter.java:119-152). Returns {"objects", "bytes"}."""
    if write_mode not in ("truncate", "append", "nonConflict"):
        raise ValueError(f"writeMode must be truncate|append|nonConflict, "
                         f"got {write_mode!r}")
    client = OssHttp(endpoint, bucket, access_id, access_key)
    existing = client.list_objects(object_name)
    if write_mode == "truncate":
        for k in existing:
            client.delete_object(k)
    elif write_mode == "nonConflict" and existing:
        raise OssError(
            "ObjectAlreadyExists",
            f"nonConflict: prefix {object_name!r} already has "
            f"{len(existing)} object(s)",
        )
    def _partition(it):
        import pandas as pd
        from pyspark import TaskContext

        cl = OssHttp(endpoint, bucket, access_id, access_key)
        task = TaskContext.get().partitionId()
        key = f"{object_name}__{task}{suffix}"
        upload_id = None
        etags: list[tuple[int, str]] = []
        buf = io.BytesIO()
        part = 1
        total = 0

        def flush():
            nonlocal part, total, upload_id
            data = buf.getvalue()
            if not data:
                return
            if upload_id is None:
                upload_id = cl.initiate_multipart(key)
                if header:
                    # each object's header rides the first part
                    # (OssWriter.java:359-361)
                    data = (field_delimiter.join(header) + "\n").encode(
                        encoding) + data
            etags.append((part, cl.upload_part(key, upload_id, part, data)))
            part += 1
            total += len(data)
            buf.seek(0)
            buf.truncate()

        rows = 0
        for pdf in it:
            for rec in pdf.itertuples(index=False):
                line = field_delimiter.join(
                    null_format if v is None
                    or (isinstance(v, float) and v != v) else str(v)
                    for v in rec
                )
                buf.write((line + "\n").encode(encoding))
                rows += 1
                if buf.tell() >= part_size:
                    flush()
        flush()
        if upload_id is not None:
            cl.complete_multipart(key, upload_id, etags)
            yield pd.DataFrame({"objects": [1], "bytes": [total]})
        else:
            yield pd.DataFrame({"objects": [0], "bytes": [0]})

    out = df.mapInPandas(_partition, "objects long, bytes long") \
        .groupBy().sum()
    row = out.collect()[0]
    return {"objects": int(row[0] or 0), "bytes": int(row[1] or 0)}
