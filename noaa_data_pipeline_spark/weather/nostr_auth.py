"""NIP-98 HTTP auth for the oracle write routes.

The reference authenticates event/entry creation with a Nostr NIP-98
header (crates/oracle/src/nostr_extractor.rs:26-110): an
``Authorization: Nostr <base64(event-json)>`` header carrying a
kind-27235 event whose ``u``/``method`` tags must match the request,
whose ``created_at`` must be within 60 s of now, whose content must
be empty, and whose BIP-340 schnorr signature must verify over the
NIP-01 event id. The authenticated pubkey becomes the event's
coordinator (oracle.rs:183-206) and entry creation requires it to
match the event's stored coordinator (oracle.rs:213-240).

Implemented here from the public NIP-01/NIP-98 specs on top of the
repo's own BIP-340 module (functions/schnorr.py) — no new
dependencies. The error taxonomy and status mapping mirror
nostr_extractor.rs:116-206: 401 for missing/expired/mismatched auth,
403 for a bad signature, 400 for malformed payloads.
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import json
import time
from urllib.parse import urlparse

from ..functions import schnorr

KIND_HTTP_AUTH = 27235  # NIP-98
MAX_SKEW_SECONDS = 60   # nostr_extractor.rs:60-63


class NostrAuthError(Exception):
    """Carries the reference's (status, type) error surface."""

    def __init__(self, status: int, kind: str, detail: str):
        super().__init__(detail)
        self.status = status
        self.kind = kind
        self.detail = detail


def _err(status: int, kind: str, detail: str) -> NostrAuthError:
    return NostrAuthError(status, kind, detail)


def event_id(event: dict) -> bytes:
    """NIP-01 event id: sha256 over the canonical serialization
    ``[0, pubkey, created_at, kind, tags, content]`` (compact JSON,
    UTF-8, no escaping beyond JSON's required set)."""
    payload = [
        0,
        event["pubkey"],
        int(event["created_at"]),
        int(event["kind"]),
        event["tags"],
        event["content"],
    ]
    canonical = json.dumps(payload, separators=(",", ":"), ensure_ascii=False)
    return hashlib.sha256(canonical.encode("utf-8")).digest()


def _tag_value(tags: list, key: str) -> str | None:
    for tag in tags:
        if isinstance(tag, list) and len(tag) >= 2 and tag[0] == key:
            return tag[1]
    return None


def _normalize_netloc(scheme: str, netloc: str) -> str:
    """Drop an explicit default port (http:80 / https:443), matching
    the reference's parsed-Url comparison (rust Url strips default
    ports when round-tripping), and lower-case the host."""
    netloc = netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[: -len(":80")]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[: -len(":443")]
    return netloc


def _urls_match(a: str, b: str) -> bool:
    """Component-wise comparison (the reference round-trips through a
    parsed Url, which normalizes default ports and trailing slashes)."""
    pa, pb = urlparse(a), urlparse(b)
    path_a = pa.path or "/"
    path_b = pb.path or "/"
    return (
        pa.scheme == pb.scheme
        and _normalize_netloc(pa.scheme, pa.netloc)
        == _normalize_netloc(pb.scheme, pb.netloc)
        and path_a == path_b
        and pa.query == pb.query
    )


def verify_header(
    auth_header: str | None,
    method: str,
    request_url: str,
    now: float | None = None,
) -> str:
    """Validate a NIP-98 Authorization header against the request's
    method and reconstructed absolute URL. Returns the authenticated
    pubkey (64-char hex). Raises NostrAuthError mirroring
    nostr_extractor.rs's rejection order and status codes."""
    if not auth_header:
        raise _err(401, "no_auth_header", "No authorization header found")
    if not auth_header.startswith("Nostr "):
        raise _err(401, "invalid_auth_format", "Invalid authorization format")
    try:
        event_bytes = base64.b64decode(auth_header[len("Nostr "):], validate=True)
    except (binascii.Error, ValueError) as exc:
        raise _err(400, "invalid_base_64", f"Invalid base64 encoding: {exc}") from exc
    try:
        event = json.loads(event_bytes)
        pubkey_hex = str(event["pubkey"])
        created_at = int(event["created_at"])
        kind = int(event["kind"])
        tags = event["tags"]
        content = str(event["content"])
        sig_hex = str(event["sig"])
    except (json.JSONDecodeError, KeyError, TypeError, ValueError) as exc:
        raise _err(400, "invalid_event_json", f"Invalid event JSON: {exc}") from exc

    if kind != KIND_HTTP_AUTH:
        raise _err(401, "invalid_event_kind", "Invalid event kind")
    now_ts = time.time() if now is None else now
    if abs(now_ts - created_at) > MAX_SKEW_SECONDS:
        raise _err(401, "expired_timestamp", "Event timestamp expired")

    url_tag = _tag_value(tags, "u")
    method_tag = _tag_value(tags, "method")
    if url_tag is None or method_tag is None:
        raise _err(400, "invalid_http_data", "Invalid HTTP data: missing u/method tag")
    if not _urls_match(url_tag, request_url) or method_tag.upper() != method.upper():
        raise _err(401, "url_method_mismatch", "URL or method mismatch")

    if content != "":
        raise _err(400, "non_empty_content", "Event content must be empty")

    try:
        pubkey_x = bytes.fromhex(pubkey_hex)
        sig = bytes.fromhex(sig_hex)
        assert len(pubkey_x) == 32 and len(sig) == 64
    except (ValueError, AssertionError) as exc:
        raise _err(403, "invalid_signature", f"Invalid signature: {exc}") from exc
    if not schnorr.verify(event_id(event), pubkey_x, sig):
        raise _err(403, "invalid_signature", "Invalid signature: schnorr verify failed")
    return pubkey_hex


def build_auth_header(
    seckey: bytes,
    method: str,
    url: str,
    created_at: int | None = None,
) -> str:
    """Client side: construct a signed NIP-98 Authorization header
    value (what nostr_sdk's EventBuilder::http_auth produces)."""
    pubkey_hex = schnorr.pubkey(seckey).hex()
    event = {
        "pubkey": pubkey_hex,
        "created_at": int(time.time()) if created_at is None else int(created_at),
        "kind": KIND_HTTP_AUTH,
        "tags": [["u", url], ["method", method.upper()]],
        "content": "",
    }
    eid = event_id(event)
    event["id"] = eid.hex()
    event["sig"] = schnorr.sign(eid, seckey).hex()
    return "Nostr " + base64.b64encode(
        json.dumps(event, separators=(",", ":")).encode()
    ).decode()
