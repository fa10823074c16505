"""Live OSS reader/writer (sources/oss_live.py) against an in-process
HTTP fixture implementing the public object-store REST grammar —
signed-listing pagination, glob expansion, ranged object GET/PUT/DELETE
and the multipart upload lifecycle — with REAL signature verification
(the fixture recomputes the HMAC-SHA1 and rejects mismatches)."""

from __future__ import annotations

import gzip
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from datax_spark.sources.oss_live import (
    OssError,
    OssHttp,
    canonical_resource,
    expand_objects,
    oss_read_lines,
    oss_write,
    sign_oss,
)

ACCESS_ID = "ossid"
ACCESS_KEY = "osskey"
BUCKET = "bkt"
PAGE = 5  # listing page size: forces the marker loop


class _Store:
    def __init__(self):
        self.objects: dict[str, bytes] = {}
        self.uploads: dict[str, dict] = {}  # id -> {"key":, "parts": {}}
        self.next_upload = 0
        self.list_calls = 0
        self.part_puts = 0


class _Handler(BaseHTTPRequestHandler):
    store: _Store = None

    def log_message(self, *a):
        pass

    def _fail(self, status, code, msg=""):
        body = (f"<Error><Code>{code}</Code><Message>{msg}</Message>"
                f"</Error>").encode()
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _ok(self, body=b"", headers=None):
        self.send_response(200)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _parse(self):
        parsed = urllib.parse.urlparse(self.path)
        parts = parsed.path.lstrip("/").split("/", 1)
        bucket = parts[0]
        key = urllib.parse.unquote(parts[1]) if len(parts) > 1 else ""
        params = dict(urllib.parse.parse_qsl(parsed.query,
                                             keep_blank_values=True))
        # bare subresource (?uploads) arrives valueless
        if parsed.query == "uploads":
            params = {"uploads": None}
        return bucket, key, params

    def _authed(self, verb, bucket, key, params, body):
        import base64 as b64
        import hashlib

        auth = self.headers.get("Authorization", "")
        date = self.headers.get("Date", "")
        md5 = self.headers.get("Content-MD5", "")
        ctype = self.headers.get("Content-Type", "")
        sigp = {k: v for k, v in params.items()}
        want = sign_oss(ACCESS_KEY, verb, md5, ctype, date,
                        canonical_resource(bucket, key, sigp))
        if auth != f"OSS {ACCESS_ID}:{want}":
            return False
        if body and md5:
            return md5 == b64.b64encode(
                hashlib.md5(body).digest()).decode()
        return True

    def _handle(self, verb):
        st = self.store
        bucket, key, params = self._parse()
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n) if n else b""
        if not self._authed(verb, bucket, key, params, body):
            return self._fail(403, "SignatureDoesNotMatch")
        if bucket != BUCKET:
            return self._fail(404, "NoSuchBucket")

        if verb == "GET" and not key:  # list
            st.list_calls += 1
            prefix = params.get("prefix", "")
            marker = params.get("marker", "")
            keys = sorted(k for k in st.objects if k.startswith(prefix)
                          and k > marker)
            page, rest = keys[:PAGE], keys[PAGE:]
            xml = "<ListBucketResult>"
            for k in page:
                xml += f"<Contents><Key>{k}</Key></Contents>"
            xml += f"<IsTruncated>{'true' if rest else 'false'}</IsTruncated>"
            if rest:
                xml += f"<NextMarker>{page[-1]}</NextMarker>"
            xml += "</ListBucketResult>"
            return self._ok(xml.encode())

        if verb == "GET":
            if key not in st.objects:
                return self._fail(404, "NoSuchKey", key)
            return self._ok(st.objects[key])

        if verb == "PUT" and "uploadId" in params:
            st.part_puts += 1
            up = st.uploads.get(params["uploadId"])
            if up is None or up["key"] != key:
                return self._fail(404, "NoSuchUpload")
            pn = int(params["partNumber"])
            up["parts"][pn] = body
            return self._ok(headers={"ETag": f'"etag-{pn}-{len(body)}"'})

        if verb == "PUT":
            st.objects[key] = body
            return self._ok()

        if verb == "POST" and "uploads" in params:
            st.next_upload += 1
            uid = f"up{st.next_upload}"
            st.uploads[uid] = {"key": key, "parts": {}}
            xml = (f"<InitiateMultipartUploadResult><UploadId>{uid}"
                   f"</UploadId></InitiateMultipartUploadResult>")
            return self._ok(xml.encode())

        if verb == "POST" and "uploadId" in params:
            import xml.etree.ElementTree as ET

            up = st.uploads.pop(params["uploadId"], None)
            if up is None or up["key"] != key:
                return self._fail(404, "NoSuchUpload")
            order = [int(p.findtext("PartNumber"))
                     for p in ET.fromstring(body).iter("Part")]
            st.objects[key] = b"".join(up["parts"][p] for p in order)
            return self._ok(b"<CompleteMultipartUploadResult/>")

        if verb == "DELETE":
            st.objects.pop(key, None)
            return self._ok()

        return self._fail(400, "NotImplemented", f"{verb} {self.path}")

    def do_GET(self):
        self._handle("GET")

    def do_PUT(self):
        self._handle("PUT")

    def do_POST(self):
        self._handle("POST")

    def do_DELETE(self):
        self._handle("DELETE")


@pytest.fixture()
def ossd():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.store = _Store()
    _Handler.store = srv.store
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _client(srv):
    host, port = srv.server_address
    return OssHttp(f"http://{host}:{port}", BUCKET, ACCESS_ID, ACCESS_KEY)


def _endpoint(srv):
    host, port = srv.server_address
    return f"http://{host}:{port}"


def test_auth_and_object_roundtrip(ossd):
    cl = _client(ossd)
    cl.put_object("a/x.csv", b"1,one\n2,two\n")
    assert cl.get_object("a/x.csv") == b"1,one\n2,two\n"
    bad = OssHttp(cl.endpoint, ACCESS_ID, "wrong", BUCKET)
    bad.bucket = BUCKET
    with pytest.raises(OssError) as ei:
        bad.get_object("a/x.csv")
    assert ei.value.code == "SignatureDoesNotMatch"
    with pytest.raises(OssError) as ei2:
        cl.get_object("missing")
    assert ei2.value.code == "NoSuchKey"


def test_list_pagination_and_glob(ossd):
    cl = _client(ossd)
    for i in range(13):
        cl.put_object(f"dir/f{i:02d}.csv", b"x")
    cl.put_object("dir/skip.json", b"x")
    cl.put_object("other/f00.csv", b"x")
    keys = cl.list_objects("dir/")
    assert len(keys) == 14 and ossd.store.list_calls >= 3  # marker loop
    got = expand_objects(cl, ["dir/f*.csv"])
    assert got == [f"dir/f{i:02d}.csv" for i in range(13)]
    # plain names pass through unlisted
    assert expand_objects(cl, ["dir/f00.csv"]) == ["dir/f00.csv"]


def test_multipart_assembles_in_order(ossd):
    cl = _client(ossd)
    uid = cl.initiate_multipart("big.bin")
    e2 = cl.upload_part("big.bin", uid, 2, b"BBB")
    e1 = cl.upload_part("big.bin", uid, 1, b"AAA")
    cl.complete_multipart("big.bin", uid, [(1, e1), (2, e2)])
    assert cl.get_object("big.bin") == b"AAABBB"


def test_oss_read_lines_with_gzip_and_glob(spark, ossd):
    cl = _client(ossd)
    for i in range(6):
        cl.put_object(f"in/part{i}.csv",
                      f"{i},row{i}a\n{i},row{i}b\n".encode())
    cl.put_object("in/zzz.csv.gz",
                  gzip.compress(b"9,gzipped\n"))
    df = oss_read_lines(
        spark, _endpoint(ossd), BUCKET, ACCESS_ID, ACCESS_KEY,
        ["in/part*.csv"], num_slices=3)
    assert sorted(r.value for r in df.collect()) == sorted(
        f"{i},row{i}{s}" for i in range(6) for s in "ab")
    gz = oss_read_lines(
        spark, _endpoint(ossd), BUCKET, ACCESS_ID, ACCESS_KEY,
        ["in/zzz.csv.gz"])
    assert [r.value for r in gz.collect()] == ["9,gzipped"]
    with pytest.raises(OssError):
        oss_read_lines(spark, _endpoint(ossd), BUCKET, ACCESS_ID,
                       ACCESS_KEY, ["in/nothing*.csv"])


def test_oss_write_multipart_and_modes(spark, ossd):
    cl = _client(ossd)
    df = spark.createDataFrame(
        [(i, f"v{i}", None if i % 3 == 0 else float(i))
         for i in range(50)],
        "id long, name string, score double",
    ).repartition(2)
    res = oss_write(df, _endpoint(ossd), BUCKET, ACCESS_ID, ACCESS_KEY,
                    "out/data", suffix=".csv", header=["id", "name", "score"],
                    part_size=64)  # tiny parts: forces the multipart loop
    assert res["objects"] == 2
    keys = cl.list_objects("out/data")
    assert sorted(keys) == ["out/data__0.csv", "out/data__1.csv"]
    assert ossd.store.part_puts > 2  # more parts than objects
    lines = []
    for k in keys:
        body = cl.get_object(k).decode().splitlines()
        assert body[0] == "id,name,score"  # per-object header
        lines.extend(body[1:])
    assert sorted(lines) == sorted(
        f"{i},v{i},{'null' if i % 3 == 0 else float(i)}" for i in range(50))
    # nonConflict refuses a non-empty prefix; truncate clears it
    with pytest.raises(OssError) as ei:
        oss_write(df, _endpoint(ossd), BUCKET, ACCESS_ID, ACCESS_KEY,
                  "out/data", write_mode="nonConflict")
    assert ei.value.code == "ObjectAlreadyExists"
    res2 = oss_write(df.limit(3), _endpoint(ossd), BUCKET, ACCESS_ID,
                     ACCESS_KEY, "out/data", suffix=".csv")
    assert not any(k in cl.list_objects("out/data")
                   for k in keys if k != "out/data__0.csv")


def test_job_compiler_wiring(spark, ossd):
    """ossreader -> osswriter job round trip via compile_reader/
    compile_writer, gated on accessId (the mounted-path branch keeps
    handling credential-less specs)."""
    from datax_spark.plans.job import compile_reader, compile_writer

    cl = _client(ossd)
    for i in range(4):
        cl.put_object(f"src/p{i}.csv", f"{i}\tname{i}\n".encode())
    common = {"endpoint": _endpoint(ossd), "bucket": BUCKET,
              "accessId": ACCESS_ID, "accessKey": ACCESS_KEY}
    df = compile_reader(spark, {
        "name": "ossreader",
        "parameter": {**common, "object": ["src/p*.csv"],
                      "fieldDelimiter": "\t",
                      "column": ["id", "name"]},
    }, channel=2)
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (str(i), f"name{i}") for i in range(4)]
    res = compile_writer(df, {
        "name": "osswriter",
        "parameter": {**common, "object": "dst/out", "suffix": ".tsv",
                      "fieldDelimiter": "\t", "writeMode": "truncate"},
    })
    assert res["objects"] >= 1
    got = []
    for k in cl.list_objects("dst/out"):
        got.extend(cl.get_object(k).decode().splitlines())
    assert sorted(got) == [f"{i}\tname{i}" for i in range(4)]
