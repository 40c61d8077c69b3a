"""Minimal S3 object-store client, stdlib-only — the working-upload half
of A15 (the reference uses the MinIO SDK: ``internal/iceberg/writer/
s3.go:74-140`` Upload/Delete/Exists/EnsureBucket; this speaks the same
public S3 REST API with AWS Signature V4 from ``hashlib``/``hmac``).

Path-style addressing (MinIO-compatible):

    PUT    /{bucket}                         ensure_bucket
    HEAD   /{bucket}                         bucket_exists
    PUT    /{bucket}/{key}                   put_object
    HEAD   /{bucket}/{key}                   exists
    GET    /{bucket}/{key}                   get_object
    DELETE /{bucket}/{key}                   delete_object
    POST   /{bucket}/{key}?uploads           multipart create
    PUT    /{bucket}/{key}?partNumber&uploadId    upload part
    POST   /{bucket}/{key}?uploadId          multipart complete
    DELETE /{bucket}/{key}?uploadId          multipart abort

``put_object`` switches to multipart above ``multipart_threshold`` (the
SDK behavior the reference relies on), aborting the upload on failure so
no orphan parts bill forever. Transport is injectable like the REST
catalog's; tests run the whole surface against a local mock S3 server
with independent server-side SigV4 verification.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import re
from typing import Callable
from urllib.parse import quote

Transport = Callable[[str, str, dict, bytes | None], tuple[int, dict, bytes]]

_EMPTY_SHA = hashlib.sha256(b"").hexdigest()


def _urllib_transport(method: str, url: str, headers: dict, body: bytes | None):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


class S3Error(RuntimeError):
    def __init__(self, status: int, body: bytes) -> None:
        self.status = status
        super().__init__(
            f"s3 error (status {status}): {body.decode('utf-8', 'replace')[:500]}"
        )


def sign_v4(
    method: str,
    host: str,
    path: str,
    query: str,
    headers: dict[str, str],
    payload_hash: str,
    access_key: str,
    secret_key: str,
    region: str,
    amz_date: str,
    service: str = "s3",
) -> str:
    """AWS Signature Version 4 (public spec) — returns the Authorization
    header value. ``headers`` must already include host and x-amz-*."""
    datestamp = amz_date[:8]
    canonical_query = "&".join(sorted(query.split("&"))) if query else ""
    lower = {k.lower(): " ".join(v.split()) for k, v in headers.items()}
    signed_names = ";".join(sorted(lower))
    canonical_headers = "".join(f"{k}:{lower[k]}\n" for k in sorted(lower))
    canonical_request = "\n".join(
        [
            method,
            quote(path, safe="/-_.~"),
            canonical_query,
            canonical_headers,
            signed_names,
            payload_hash,
        ]
    )
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )

    def _hmac(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = _hmac(("AWS4" + secret_key).encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    return (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_names}, Signature={signature}"
    )


class S3Client:
    def __init__(
        self,
        endpoint: str,
        access_key: str,
        secret_key: str,
        region: str = "us-east-1",
        transport: Transport | None = None,
        multipart_threshold: int = 64 * 1024 * 1024,
        part_size: int = 16 * 1024 * 1024,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.host = re.sub(r"^https?://", "", self.endpoint)
        self.access_key, self.secret_key, self.region = access_key, secret_key, region
        self._transport = transport or _urllib_transport
        self.multipart_threshold = multipart_threshold
        self.part_size = part_size

    # -- signed request core -------------------------------------------------

    def _request(
        self,
        method: str,
        path: str,
        query: str = "",
        body: bytes | None = None,
        content_type: str | None = None,
    ) -> tuple[int, dict, bytes]:
        payload_hash = hashlib.sha256(body or b"").hexdigest()
        amz_date = _dt.datetime.now(_dt.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
        headers = {
            "Host": self.host,
            "x-amz-date": amz_date,
            "x-amz-content-sha256": payload_hash,
        }
        if content_type:
            headers["Content-Type"] = content_type
        headers["Authorization"] = sign_v4(
            method,
            self.host,
            path,
            query,
            headers,
            payload_hash,
            self.access_key,
            self.secret_key,
            self.region,
            amz_date,
        )
        url = f"{self.endpoint}{path}" + (f"?{query}" if query else "")
        send_headers = dict(headers)
        send_headers.pop("Host", None)  # urllib sets Host itself
        return self._transport(method, url, send_headers, body)

    # -- buckets -------------------------------------------------------------

    def bucket_exists(self, bucket: str) -> bool:
        status, _, body = self._request("HEAD", f"/{bucket}")
        if status == 200:
            return True
        if status == 404:
            return False
        raise S3Error(status, body)

    def ensure_bucket(self, bucket: str) -> None:
        """EnsureBucket (s3.go:124-140): create iff missing."""
        if self.bucket_exists(bucket):
            return
        status, _, body = self._request("PUT", f"/{bucket}")
        if status not in (200, 409):  # 409: concurrent create
            raise S3Error(status, body)

    # -- objects -------------------------------------------------------------

    def put_object(
        self, bucket: str, key: str, data: bytes, content_type: str = "application/octet-stream"
    ) -> None:
        """Upload (s3.go:74-91); transparently multipart above the
        threshold, with abort-on-failure so no orphan parts remain."""
        if len(data) > self.multipart_threshold:
            return self._multipart_put(bucket, key, data, content_type)
        status, _, body = self._request(
            "PUT", f"/{bucket}/{key}", body=data, content_type=content_type
        )
        if status != 200:
            raise S3Error(status, body)

    def get_object(self, bucket: str, key: str) -> bytes:
        status, _, body = self._request("GET", f"/{bucket}/{key}")
        if status != 200:
            raise S3Error(status, body)
        return body

    def exists(self, bucket: str, key: str) -> bool:
        status, _, body = self._request("HEAD", f"/{bucket}/{key}")
        if status == 200:
            return True
        if status == 404:
            return False
        raise S3Error(status, body)

    def delete_object(self, bucket: str, key: str) -> None:
        status, _, body = self._request("DELETE", f"/{bucket}/{key}")
        if status not in (200, 204):
            raise S3Error(status, body)

    # -- multipart -----------------------------------------------------------

    def _multipart_put(
        self, bucket: str, key: str, data: bytes, content_type: str
    ) -> None:
        status, _, body = self._request(
            "POST", f"/{bucket}/{key}", query="uploads", content_type=content_type
        )
        if status != 200:
            raise S3Error(status, body)
        m = re.search(rb"<UploadId>([^<]+)</UploadId>", body)
        if not m:
            raise S3Error(status, b"no UploadId in response")
        upload_id = m.group(1).decode()
        etags: list[str] = []
        try:
            for i in range(0, len(data), self.part_size):
                part_no = len(etags) + 1
                status, headers, body = self._request(
                    "PUT",
                    f"/{bucket}/{key}",
                    query=f"partNumber={part_no}&uploadId={upload_id}",
                    body=data[i : i + self.part_size],
                )
                if status != 200:
                    raise S3Error(status, body)
                etag = {k.lower(): v for k, v in headers.items()}.get("etag", "")
                etags.append(etag.strip('"'))
            parts_xml = "".join(
                f"<Part><PartNumber>{n}</PartNumber><ETag>{e}</ETag></Part>"
                for n, e in enumerate(etags, start=1)
            )
            complete = (
                f"<CompleteMultipartUpload>{parts_xml}</CompleteMultipartUpload>"
            ).encode()
            status, _, body = self._request(
                "POST",
                f"/{bucket}/{key}",
                query=f"uploadId={upload_id}",
                body=complete,
                content_type="application/xml",
            )
            if status != 200:
                raise S3Error(status, body)
        except Exception:
            self._request(
                "DELETE", f"/{bucket}/{key}", query=f"uploadId={upload_id}"
            )
            raise

    def object_url(self, bucket: str, key: str) -> str:
        return f"s3://{bucket}/{key}"
