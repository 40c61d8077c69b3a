"""S3 client tests against a local mock object store over real HTTP,
with server-side SigV4 verification written independently from the
client (per the public spec), so a canonicalization bug on either side
fails loudly — the sandbox equivalent of the reference's mocked-uploader
s3 tests, but exercising the actual wire path."""

from __future__ import annotations

import hashlib
import hmac
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote, urlsplit

import pytest

from philotes_spark.sources.s3_client import S3Client, S3Error

ACCESS, SECRET, REGION = "AKIDEXAMPLE", "s3cr3tk3y", "us-east-1"


def _verify_sig(handler: BaseHTTPRequestHandler, body: bytes) -> str | None:
    """Independent SigV4 check (AWS public spec). Returns an error string
    or None. Recomputes the signature from the raw request."""
    auth = handler.headers.get("Authorization", "")
    m = re.fullmatch(
        r"AWS4-HMAC-SHA256 Credential=([^/]+)/(\d{8})/([^/]+)/s3/aws4_request, "
        r"SignedHeaders=([^,]+), Signature=([0-9a-f]{64})",
        auth,
    )
    if not m:
        return f"malformed Authorization: {auth!r}"
    access, datestamp, region, signed_headers, got_sig = m.groups()
    if access != ACCESS or region != REGION:
        return "wrong credential scope"
    payload_hash = handler.headers.get("x-amz-content-sha256", "")
    if hashlib.sha256(body).hexdigest() != payload_hash:
        return "payload hash mismatch"

    split = urlsplit(handler.path)
    names = signed_headers.split(";")
    canonical_headers = "".join(
        f"{n}:{' '.join((handler.headers.get(n) or '').split())}\n" for n in names
    )
    canonical_query = "&".join(sorted(split.query.split("&"))) if split.query else ""
    canonical_request = "\n".join(
        [
            handler.command,
            split.path,
            canonical_query,
            canonical_headers,
            signed_headers,
            payload_hash,
        ]
    )
    amz_date = handler.headers["x-amz-date"]
    scope = f"{datestamp}/{region}/s3/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )
    key = ("AWS4" + SECRET).encode()
    for part in (datestamp, region, "s3", "aws4_request"):
        key = hmac.new(key, part.encode(), hashlib.sha256).digest()
    want = hmac.new(key, string_to_sign.encode(), hashlib.sha256).hexdigest()
    if want != got_sig:
        return "signature mismatch"
    return None


class MockS3(ThreadingHTTPServer):
    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.buckets: set[str] = set()
        self.objects: dict[tuple[str, str], bytes] = {}
        self.uploads: dict[str, list[bytes]] = {}  # uploadId -> parts
        self.sig_errors: list[str] = []
        self.fail_next_put = False  # fault injection for multipart abort
        # countdown fault injection: let N object PUTs succeed, fail the
        # next one (mid-commit failure with orphans already uploaded)
        self.fail_put_after: int | None = None
        self.port = self.server_address[1]


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def _reply(self, status: int, body: bytes = b"", headers: dict | None = None):
        self.send_response(status)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _route(self):
        srv: MockS3 = self.server  # type: ignore[assignment]
        body = self._body()
        err = _verify_sig(self, body)
        if err:
            srv.sig_errors.append(f"{self.command} {self.path}: {err}")
            return self._reply(403, b"<Error>SignatureDoesNotMatch</Error>")
        split = urlsplit(self.path)
        parts = unquote(split.path).lstrip("/").split("/", 1)
        bucket = parts[0]
        key = parts[1] if len(parts) > 1 else None
        q = dict(
            kv.split("=", 1) if "=" in kv else (kv, "")
            for kv in split.query.split("&")
            if kv
        )

        if key is None:  # bucket ops
            if self.command == "HEAD":
                return self._reply(200 if bucket in srv.buckets else 404)
            if self.command == "PUT":
                if bucket in srv.buckets:
                    return self._reply(409)
                srv.buckets.add(bucket)
                return self._reply(200)
            return self._reply(405)

        if "uploads" in q and self.command == "POST":
            uid = uuid.uuid4().hex
            srv.uploads[uid] = []
            return self._reply(
                200, f"<InitiateMultipartUploadResult><UploadId>{uid}</UploadId></InitiateMultipartUploadResult>".encode()
            )
        if "uploadId" in q:
            uid = q["uploadId"]
            if self.command == "PUT":  # upload part
                if srv.fail_next_put:
                    srv.fail_next_put = False
                    return self._reply(500, b"<Error>InternalError</Error>")
                if uid not in srv.uploads:
                    return self._reply(404)
                srv.uploads[uid].append(body)
                etag = hashlib.md5(body).hexdigest()
                return self._reply(200, headers={"ETag": f'"{etag}"'})
            if self.command == "POST":  # complete
                if uid not in srv.uploads:
                    return self._reply(404)
                srv.objects[(bucket, key)] = b"".join(srv.uploads.pop(uid))
                return self._reply(200, b"<CompleteMultipartUploadResult/>")
            if self.command == "DELETE":  # abort
                srv.uploads.pop(uid, None)
                return self._reply(204)

        if self.command == "PUT":
            if srv.fail_next_put:
                srv.fail_next_put = False
                return self._reply(500, b"<Error>InternalError</Error>")
            if srv.fail_put_after is not None:
                if srv.fail_put_after == 0:
                    srv.fail_put_after = None
                    return self._reply(500, b"<Error>InternalError</Error>")
                srv.fail_put_after -= 1
            srv.objects[(bucket, key)] = body
            return self._reply(200, headers={"ETag": f'"{hashlib.md5(body).hexdigest()}"'})
        if self.command == "GET":
            if (bucket, key) not in srv.objects:
                return self._reply(404, b"<Error>NoSuchKey</Error>")
            return self._reply(200, srv.objects[(bucket, key)])
        if self.command == "HEAD":
            return self._reply(200 if (bucket, key) in srv.objects else 404)
        if self.command == "DELETE":
            srv.objects.pop((bucket, key), None)
            return self._reply(204)
        return self._reply(405)

    do_GET = do_PUT = do_POST = do_DELETE = do_HEAD = _route


@pytest.fixture()
def mock_s3():
    srv = MockS3()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture()
def client(mock_s3):
    return S3Client(
        f"http://127.0.0.1:{mock_s3.port}",
        ACCESS,
        SECRET,
        REGION,
        multipart_threshold=1024,
        part_size=512,
    )


def test_bucket_and_object_lifecycle(mock_s3, client):
    assert not client.bucket_exists("lake")
    client.ensure_bucket("lake")
    assert client.bucket_exists("lake")
    client.ensure_bucket("lake")  # idempotent

    payload = b"parquet bytes here"
    client.put_object("lake", "data/part-0.parquet", payload)
    assert client.exists("lake", "data/part-0.parquet")
    assert client.get_object("lake", "data/part-0.parquet") == payload
    client.delete_object("lake", "data/part-0.parquet")
    assert not client.exists("lake", "data/part-0.parquet")
    # every request passed independent server-side SigV4 verification
    assert mock_s3.sig_errors == []


def test_multipart_upload_over_threshold(mock_s3, client):
    client.ensure_bucket("lake")
    big = bytes(range(256)) * 20  # 5120 B > 1024 threshold, 512 B parts
    client.put_object("lake", "big/object.bin", big)
    assert client.get_object("lake", "big/object.bin") == big
    assert mock_s3.uploads == {}  # nothing left open
    assert mock_s3.sig_errors == []


def test_multipart_failure_aborts_upload(mock_s3, client):
    client.ensure_bucket("lake")
    mock_s3.fail_next_put = True
    with pytest.raises(S3Error):
        client.put_object("lake", "big/fail.bin", b"x" * 5000)
    assert mock_s3.uploads == {}, "failed multipart must be aborted, not orphaned"
    assert ("lake", "big/fail.bin") not in mock_s3.objects


def test_snapshot_upload_with_catalog_rollback(mock_s3, client, spark, tmp_path):
    """The reference's writer flow (writer.go:126-180): upload files,
    commit to the catalog, delete uploads if the commit fails."""
    from philotes_spark.sources.object_store import upload_snapshot_to_s3
    from philotes_spark.sources.snapshots import SnapshotTable

    snap = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    snap.commit(df.coalesce(1))

    # happy path: no catalog — files land in the bucket under the version
    keys = upload_snapshot_to_s3(client, "lake", snap, prefix="tbl")
    assert keys and all(k.startswith("tbl/v00000001/") for k in keys)
    for k in keys:
        assert client.exists("lake", k)

    # failing catalog commit → every uploaded object is rolled back
    class FailingCatalog:
        def create_table(self, *a, **kw):
            pass

        def commit_append(self, *a, **kw):
            raise RuntimeError("catalog down")

    snap.commit(spark.createDataFrame([(3, "c")], "k long, v string").coalesce(1))
    before = set(mock_s3.objects)
    with pytest.raises(RuntimeError, match="catalog down"):
        upload_snapshot_to_s3(
            client,
            "lake",
            snap,
            prefix="tbl",
            catalog=FailingCatalog(),
            namespace="ns",
            table="t",
        )
    assert set(mock_s3.objects) == before, "failed commit left orphan uploads"
    assert mock_s3.sig_errors == []


def test_snapshot_upload_mid_commit_failure_rolls_back_orphans(
    mock_s3, client, spark, tmp_path
):
    """VERDICT r04 #8: force the failure MID-upload — some data objects
    have already landed when a later PUT 500s — and assert the rollback
    deletes those orphans (writer.go:165-173), then a clean retry of the
    same version succeeds."""
    from philotes_spark.sources.object_store import upload_snapshot_to_s3
    from philotes_spark.sources.snapshots import SnapshotTable

    snap = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, f"row{i}") for i in range(100)], "k long, v string"
    )
    snap.commit(df.repartition(3))  # three data files in v1

    client.ensure_bucket("lake")
    before = set(mock_s3.objects)
    mock_s3.fail_put_after = 1  # first object lands, second PUT 500s
    with pytest.raises(S3Error):
        upload_snapshot_to_s3(client, "lake", snap, prefix="tbl")
    assert mock_s3.fail_put_after is None, "fault must have fired"
    assert set(mock_s3.objects) == before, (
        "mid-commit failure left orphan objects in the bucket"
    )

    # retry after rollback: idempotent, full version lands
    keys = upload_snapshot_to_s3(client, "lake", snap, prefix="tbl")
    assert len(keys) == 3
    for k in keys:
        assert client.exists("lake", k)
    assert mock_s3.sig_errors == []
