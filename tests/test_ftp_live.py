"""Live FTP reader (sources/ftp_live.py) against an in-process
stdlib-socket FTP server speaking real USER/PASS/PASV/NLST/CWD/RETR —
the FTP twin of the embedded-Derby JDBC and mock-ES proofs."""

from __future__ import annotations

import posixpath
import socket
import socketserver
import threading

import pytest

from datax_spark.sources.ftp_live import ftp_list_files, ftp_read_lines


class _FtpState:
    def __init__(self, tree: dict[str, bytes]):
        # tree: absolute file path -> bytes; directories are implied
        self.tree = dict(tree)
        self.logins: list[tuple[str, str]] = []
        self.retrs: list[str] = []

    def is_dir(self, p: str) -> bool:
        p = p.rstrip("/") or "/"
        if p == "/":
            return True
        prefix = p + "/"
        return any(f.startswith(prefix) for f in self.tree)

    def listdir(self, p: str) -> list[str]:
        p = p.rstrip("/") or "/"
        prefix = "/" if p == "/" else p + "/"
        names = set()
        for f in self.tree:
            if f.startswith(prefix):
                rest = f[len(prefix):]
                names.add(rest.split("/", 1)[0])
        return sorted(names)


class _Ctrl(socketserver.StreamRequestHandler):
    state: _FtpState = None

    def _send(self, line: str) -> None:
        self.wfile.write((line + "\r\n").encode())

    def handle(self):
        st = self.state
        cwd = "/"
        data_srv: socket.socket | None = None
        user = ""
        self._send("220 mock ftp ready")
        while True:
            raw = self.rfile.readline()
            if not raw:
                break
            line = raw.decode().strip()
            cmd, _, arg = line.partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                user = arg
                self._send("331 password required")
            elif cmd == "PASS":
                st.logins.append((user, arg))
                self._send("230 logged in")
            elif cmd == "TYPE":
                self._send("200 type set")
            elif cmd == "PWD":
                self._send(f'257 "{cwd}"')
            elif cmd == "CWD":
                target = arg if arg.startswith("/") else posixpath.join(cwd, arg)
                if st.is_dir(target):
                    cwd = target.rstrip("/") or "/"
                    self._send("250 ok")
                else:
                    self._send("550 not a directory")
            elif cmd == "PASV":
                data_srv = socket.socket()
                data_srv.bind(("127.0.0.1", 0))
                data_srv.listen(1)
                p = data_srv.getsockname()[1]
                self._send(
                    f"227 entering passive (127,0,0,1,{p >> 8},{p & 0xFF})"
                )
            elif cmd in ("NLST", "LIST"):
                path = arg or cwd
                path = path if path.startswith("/") else posixpath.join(cwd, path)
                if data_srv is None:
                    self._send("425 use PASV first")
                    continue
                self._send("150 opening data connection")
                conn, _ = data_srv.accept()
                if st.is_dir(path):
                    base = path.rstrip("/") or "/"
                    for n in st.listdir(base):
                        full = "/" + n if base == "/" else f"{base}/{n}"
                        conn.sendall((full + "\r\n").encode())
                elif path in st.tree:
                    conn.sendall((path + "\r\n").encode())
                conn.close()
                data_srv.close()
                data_srv = None
                self._send("226 done")
            elif cmd == "RETR":
                path = arg if arg.startswith("/") else posixpath.join(cwd, arg)
                if path not in st.tree:
                    self._send("550 no such file")
                    continue
                if data_srv is None:
                    self._send("425 use PASV first")
                    continue
                st.retrs.append(path)
                self._send("150 opening data connection")
                conn, _ = data_srv.accept()
                conn.sendall(st.tree[path])
                conn.close()
                data_srv.close()
                data_srv = None
                self._send("226 transfer complete")
            elif cmd == "QUIT":
                self._send("221 bye")
                break
            else:
                self._send(f"502 {cmd} not implemented")


@pytest.fixture()
def ftp_server():
    tree = {
        "/data/part1.csv": b"id,name\n1,aa\n2,bb\n",
        "/data/sub/part2.csv": b"id,name\n3,cc\n",
        "/data/sub/deep/part3.csv": b"id,name\n4,dd\n",
        "/other/readme.txt": b"hello\nworld\n",
    }
    state = _FtpState(tree)
    handler = type("H", (_Ctrl,), {"state": state})
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield "127.0.0.1", srv.server_address[1], state
    finally:
        srv.shutdown()


def test_list_walks_directories(ftp_server):
    host, port, state = ftp_server
    files = ftp_list_files(host, port, "u", "p", "/data")
    assert files == [
        "/data/part1.csv", "/data/sub/deep/part3.csv", "/data/sub/part2.csv",
    ]
    # a direct file path passes through untouched
    assert ftp_list_files(host, port, "u", "p", "/other/readme.txt") == [
        "/other/readme.txt"
    ]
    assert ("u", "p") in state.logins


def test_read_lines_executor_fetch(spark, ftp_server):
    host, port, state = ftp_server
    df = ftp_read_lines(
        spark,
        {"host": host, "port": port, "username": "u", "password": "p",
         "path": "/data", "header": True},
    )
    rows = sorted(r["value"] for r in df.collect())
    assert rows == ["1,aa", "2,bb", "3,cc", "4,dd"]
    assert sorted(state.retrs) == [
        "/data/part1.csv", "/data/sub/deep/part3.csv", "/data/sub/part2.csv",
    ]


def test_ftpreader_job_end_to_end(spark, ftp_server, tmp_path):
    """job.json: live ftpreader -> delimited split -> csv writer."""
    from datax_spark.plans.job import run_job

    host, port, _ = ftp_server
    dst = str(tmp_path / "out")
    run_job(spark, {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "ftpreader",
                        "parameter": {
                            "host": host, "port": port,
                            "username": "u", "password": "p",
                            "path": "/data", "header": True,
                            "fieldDelimiter": ",",
                            "column": ["id", "name"],
                        },
                    },
                    "writer": {
                        "name": "txtfilewriter",
                        "parameter": {"path": dst, "fileType": "csv",
                                      "header": True, "writeMode": "truncate"},
                    },
                }
            ]
        }
    })
    got = {(r["id"], r["name"]) for r in
           spark.read.option("header", True).csv(dst).collect()}
    assert got == {("1", "aa"), ("2", "bb"), ("3", "cc"), ("4", "dd")}


def test_missing_path_raises(spark, ftp_server):
    host, port, _ = ftp_server
    with pytest.raises(Exception):
        ftp_read_lines(
            spark,
            {"host": host, "port": port, "path": "/nope"},
        )
