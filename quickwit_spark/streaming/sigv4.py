"""AWS Signature Version 4 request signing (pure stdlib).

Implements the public SigV4 algorithm (docs.aws.amazon.com "Create a
signed AWS API request") so ``http_sqs_transport`` can authenticate
against a real AWS SQS endpoint directly instead of requiring a signing
proxy in front. Pinned by the published AWS test vectors: the IAM
ListUsers example request's exact signature and the documented signing-
key derivation chain.

Parity note: the reference's SQS source authenticates through the AWS
SDK's SigV4 signer (quickwit-indexing/src/source/queue_sources/
sqs_queue.rs via aws-sdk-sqs); this is the same wire algorithm with no
SDK dependency.
"""

from __future__ import annotations

import hashlib
import hmac
from urllib.parse import quote, urlsplit

__all__ = ["derive_signing_key", "sign_request"]

_ALGO = "AWS4-HMAC-SHA256"


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def derive_signing_key(secret_key: str, date: str, region: str,
                       service: str) -> bytes:
    """kSigning = HMAC-chain over date (YYYYMMDD), region, service,
    'aws4_request' seeded with 'AWS4' + secret."""
    k = _hmac(b"AWS4" + secret_key.encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def _uri_encode(s: str, *, encode_slash: bool) -> str:
    # SigV4 uses strict RFC 3986: only unreserved chars stay literal
    return quote(s, safe="-_.~" + ("" if encode_slash else "/"))


def _canonical_query(query: str) -> str:
    if not query:
        return ""
    pairs = []
    for part in query.split("&"):
        if not part:
            continue
        k, _, v = part.partition("=")
        pairs.append((_uri_encode(k, encode_slash=True),
                      _uri_encode(v, encode_slash=True)))
    return "&".join(f"{k}={v}" for k, v in sorted(pairs))


def _canonical_headers(headers: dict[str, str]) -> tuple[str, str]:
    items = sorted((k.lower().strip(), " ".join(str(v).split()))
                   for k, v in headers.items())
    canon = "".join(f"{k}:{v}\n" for k, v in items)
    return canon, ";".join(k for k, _ in items)


def sign_request(method: str, url: str, headers: dict[str, str],
                 body: bytes, *, access_key: str, secret_key: str,
                 region: str, service: str, amz_date: str,
                 session_token: str | None = None) -> dict[str, str]:
    """Return a NEW headers dict carrying Host, X-Amz-Date, the payload
    hash, optional X-Amz-Security-Token, and the SigV4 Authorization
    header. ``amz_date`` is the ISO-basic timestamp (YYYYMMDDTHHMMSSZ);
    the caller controls the clock so tests are deterministic.

    All provided headers are signed (SQS needs content-type and
    x-amz-target covered; signing extras is always legal)."""
    parts = urlsplit(url)
    payload_hash = hashlib.sha256(body).hexdigest()
    out = dict(headers)
    out["Host"] = parts.netloc
    out["X-Amz-Date"] = amz_date
    if session_token is not None:
        out["X-Amz-Security-Token"] = session_token

    path = parts.path or "/"
    canonical_uri = _uri_encode(path, encode_slash=False)
    canon_headers, signed_headers = _canonical_headers(out)
    creq = "\n".join([method.upper(), canonical_uri,
                      _canonical_query(parts.query), canon_headers,
                      signed_headers, payload_hash])

    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    sts = "\n".join([_ALGO, amz_date, scope,
                     hashlib.sha256(creq.encode()).hexdigest()])
    key = derive_signing_key(secret_key, date, region, service)
    sig = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
    out["Authorization"] = (
        f"{_ALGO} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={sig}")
    return out
