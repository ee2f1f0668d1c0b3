"""S1 fetch-with-retry + S2 archive extraction sources."""

import gzip
import os
import tarfile
import zipfile

import pytest

from agr_loader_ray.sources.fetch import (
    FetchError,
    extract_archive,
    fetch_with_retry,
    read_extracted,
)


def _mk_tsv(p, rows):
    with open(p, "w") as f:
        for r in rows:
            f.write("\t".join(map(str, r)) + "\n")


def test_fetch_local_and_skip(tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("hello")
    dest = tmp_path / "staged" / "src.txt"
    assert fetch_with_retry(f"file://{src}", str(dest)) == str(dest)
    assert dest.read_text() == "hello"
    # skip-if-exists: source changes, staged copy wins (download.py:37-42)
    src.write_text("changed")
    fetch_with_retry(str(src), str(dest))
    assert dest.read_text() == "hello"


def test_fetch_retries_then_fails(tmp_path):
    sleeps = []
    with pytest.raises(FetchError):
        fetch_with_retry(str(tmp_path / "missing.txt"), str(tmp_path / "d.txt"),
                         retries=4, backoff_s=6.0, _sleep=sleeps.append)
    assert sleeps == [6.0, 6.0, 6.0]  # N-1 backoffs for N attempts


def test_fetch_retries_until_success(tmp_path):
    src = tmp_path / "late.txt"
    dest = tmp_path / "d.txt"
    calls = []

    def sleep_then_create(s):
        calls.append(s)
        if len(calls) == 2:
            src.write_text("finally")

    fetch_with_retry(str(src), str(dest), retries=5, _sleep=sleep_then_create)
    assert dest.read_text() == "finally" and len(calls) == 2


def test_extract_gz(tmp_path):
    raw = tmp_path / "data.tsv"
    _mk_tsv(raw, [[1, "a"], [2, "b"]])
    gz = tmp_path / "data.tsv.gz"
    with open(raw, "rb") as f, gzip.open(gz, "wb") as out:
        out.write(f.read())
    files = extract_archive(str(gz), str(tmp_path / "out"))
    assert [os.path.basename(f) for f in files] == ["data.tsv"]
    assert open(files[0]).read() == raw.read_text()


def test_extract_tar_gz_with_member_filter(tmp_path):
    d = tmp_path / "payload"
    d.mkdir()
    _mk_tsv(d / "keep.gff", [[1]])
    _mk_tsv(d / "skip.txt", [[2]])
    tgz = tmp_path / "arc.tar.gz"
    with tarfile.open(tgz, "w:gz") as tf:
        tf.add(d / "keep.gff", arcname="inner/keep.gff")
        tf.add(d / "skip.txt", arcname="inner/skip.txt")
    files = extract_archive(str(tgz), str(tmp_path / "out"),
                            member_filter=lambda n: n.endswith(".gff"))
    assert [os.path.basename(f) for f in files] == ["keep.gff"]


def test_extract_zip(tmp_path):
    d = tmp_path / "payload"
    d.mkdir()
    _mk_tsv(d / "a.tsv", [[1], [2]])
    _mk_tsv(d / "b.tsv", [[3]])
    z = tmp_path / "arc.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(d / "a.tsv", "a.tsv")
        zf.write(d / "b.tsv", "sub/b.tsv")
    files = sorted(os.path.basename(f)
                   for f in extract_archive(str(z), str(tmp_path / "out")))
    assert files == ["a.tsv", "b.tsv"]


def test_read_extracted_end_to_end(tmp_path):
    d = tmp_path / "payload"
    d.mkdir()
    _mk_tsv(d / "x.tsv", [[i, f"r{i}"] for i in range(10)])
    z = tmp_path / "arc.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(d / "x.tsv", "x.tsv")
    ds = read_extracted(str(z), str(tmp_path / "staging"))
    assert ds.count() == 10


# ---------------------------------------------------------------------------
# S1 loopback HTTP exercise (VERDICT r3 #5): stand up http.server on
# 127.0.0.1 and drive the reference's exact contract
# (/root/reference/src/files/download.py:44-69) — retry on 503 with
# backoff, success after transient failures, skip-if-exists making NO
# request, and exhaustion raising FetchError.  No external network.
# ---------------------------------------------------------------------------

class _FlakyHandler:
    """Factory: a handler that 503s the first ``fail_n`` GETs per path."""

    def __new__(cls, fail_n: int, body: bytes):
        from http.server import BaseHTTPRequestHandler

        counts: dict[str, int] = {}

        class H(BaseHTTPRequestHandler):
            hits = counts

            def do_GET(self):
                n = counts.get(self.path, 0)
                counts[self.path] = n + 1
                if n < fail_n:
                    self.send_error(503, "flaky")
                    return
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        return H


@pytest.fixture()
def loopback_http():
    import threading
    from http.server import ThreadingHTTPServer

    handler = _FlakyHandler(fail_n=2, body=b"payload-bytes")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", handler.hits
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_retry_on_503_then_success(tmp_path, loopback_http):
    base, hits = loopback_http
    sleeps: list[float] = []
    dest = tmp_path / "f.bin"
    got = fetch_with_retry(f"{base}/f.bin", str(dest), retries=5,
                           backoff_s=6.0, _sleep=sleeps.append)
    assert got == str(dest) and dest.read_bytes() == b"payload-bytes"
    # two 503s → two fixed-backoff sleeps, three requests total
    assert sleeps == [6.0, 6.0]
    assert hits["/f.bin"] == 3


def test_http_skip_if_exists_makes_no_request(tmp_path, loopback_http):
    base, hits = loopback_http
    dest = tmp_path / "cached.bin"
    dest.write_bytes(b"already-here")
    got = fetch_with_retry(f"{base}/cached.bin", str(dest), retries=3,
                           _sleep=lambda s: None)
    assert got == str(dest) and dest.read_bytes() == b"already-here"
    assert "/cached.bin" not in hits  # existing file wins: zero requests


def test_http_exhausted_retries_raise(tmp_path, loopback_http):
    base, hits = loopback_http
    sleeps: list[float] = []
    with pytest.raises(FetchError):
        fetch_with_retry(f"{base}/gone.bin", str(tmp_path / "g.bin"),
                         retries=2, backoff_s=1.5, _sleep=sleeps.append)
    assert hits["/gone.bin"] == 2 and sleeps == [1.5]
    assert not (tmp_path / "g.bin").exists()  # no partial file left
