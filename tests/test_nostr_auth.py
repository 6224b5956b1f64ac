"""NIP-98 auth gate on the oracle write routes (the reference
authenticates event/entry creation — nostr_extractor.rs:26-110,
oracle_routes.rs:92,143): header verification unit tests mirroring
the reference's own scenarios, plus socket-level tests of the gated
shim with valid and invalid signed requests."""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.request
import uuid

import pytest

from noaa_data_pipeline_spark.functions import schnorr
from noaa_data_pipeline_spark.weather import http_api, nostr_auth
from tests.test_event_store_etl import NOW, OBS_DATE, SIGN_DATE, _build_fixture

SECKEY = bytes(range(1, 33))
OTHER_SECKEY = bytes(range(101, 133))
NOW_TS = int(NOW.replace(tzinfo=dt.timezone.utc).timestamp())
URL = "http://127.0.0.1/oracle/events"


def _header(seckey=SECKEY, method="POST", url=URL, created_at=NOW_TS):
    return nostr_auth.build_auth_header(seckey, method, url, created_at)


# -- unit: verify_header (scenarios from nostr_extractor.rs tests) ----


def test_valid_header_roundtrip():
    pk = nostr_auth.verify_header(_header(), "POST", URL, now=NOW_TS)
    assert pk == schnorr.pubkey(SECKEY).hex()


def test_missing_and_malformed_header():
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header(None, "POST", URL, now=NOW_TS)
    assert (e.value.status, e.value.kind) == (401, "no_auth_header")
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header("InvalidFormat", "POST", URL, now=NOW_TS)
    assert (e.value.status, e.value.kind) == (401, "invalid_auth_format")
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header("Nostr not-base64!!", "POST", URL, now=NOW_TS)
    assert (e.value.status, e.value.kind) == (400, "invalid_base_64")


def test_wrong_kind_rejected():
    import base64

    event = {
        "pubkey": schnorr.pubkey(SECKEY).hex(),
        "created_at": NOW_TS,
        "kind": 1,  # text note, not 27235
        "tags": [["u", URL], ["method", "POST"]],
        "content": "",
    }
    eid = nostr_auth.event_id(event)
    event["id"] = eid.hex()
    event["sig"] = schnorr.sign(eid, SECKEY).hex()
    hdr = "Nostr " + base64.b64encode(json.dumps(event).encode()).decode()
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header(hdr, "POST", URL, now=NOW_TS)
    assert (e.value.status, e.value.kind) == (401, "invalid_event_kind")


def test_expired_timestamp():
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header(
            _header(created_at=NOW_TS - 3600), "POST", URL, now=NOW_TS
        )
    assert (e.value.status, e.value.kind) == (401, "expired_timestamp")


def test_url_and_method_mismatch():
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header(
            _header(url="http://127.0.0.1/other"), "POST", URL, now=NOW_TS
        )
    assert (e.value.status, e.value.kind) == (401, "url_method_mismatch")
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header(_header(method="GET"), "POST", URL, now=NOW_TS)
    assert (e.value.status, e.value.kind) == (401, "url_method_mismatch")


def test_non_empty_content_rejected():
    import base64

    event = {
        "pubkey": schnorr.pubkey(SECKEY).hex(),
        "created_at": NOW_TS,
        "kind": nostr_auth.KIND_HTTP_AUTH,
        "tags": [["u", URL], ["method", "POST"]],
        "content": "non-empty",
    }
    eid = nostr_auth.event_id(event)
    event["id"] = eid.hex()
    event["sig"] = schnorr.sign(eid, SECKEY).hex()
    hdr = "Nostr " + base64.b64encode(json.dumps(event).encode()).decode()
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header(hdr, "POST", URL, now=NOW_TS)
    assert (e.value.status, e.value.kind) == (400, "non_empty_content")


def test_tampered_signature_rejected():
    hdr = _header()
    # re-sign with a different key but keep the original pubkey
    import base64

    event = json.loads(base64.b64decode(hdr[len("Nostr "):]))
    event["sig"] = schnorr.sign(
        nostr_auth.event_id(event), OTHER_SECKEY
    ).hex()
    forged = "Nostr " + base64.b64encode(json.dumps(event).encode()).decode()
    with pytest.raises(nostr_auth.NostrAuthError) as e:
        nostr_auth.verify_header(forged, "POST", URL, now=NOW_TS)
    assert (e.value.status, e.value.kind) == (403, "invalid_signature")


# -- socket: gated routes --------------------------------------------


@pytest.fixture(scope="module")
def served_authed(spark, tmp_path_factory):
    store, lake_root, event_id = _build_fixture(spark, tmp_path_factory)
    files_dir = str(tmp_path_factory.mktemp("files_auth"))
    app = http_api.WeatherApp(
        spark, lake_root, store, files_dir, now=lambda: NOW, require_nip98=True
    )
    srv, base = http_api.serve_background(app)
    yield base
    srv.shutdown()


def _post_json(base, path, body, auth: str | None):
    headers = {"Content-Type": "application/json"}
    if auth:
        headers["Authorization"] = auth
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(), headers=headers, method="POST"
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


EVENT_BODY = {
    "observation_date": OBS_DATE.isoformat() + "Z",
    "signing_date": SIGN_DATE.isoformat() + "Z",
    "locations": ["PFNO", "KSAW"],
    "total_allowed_entries": 2,
    "number_of_values_per_entry": 6,
    "number_of_places_win": 1,
}


def test_signed_create_and_entry_flow(served_authed):
    base = served_authed
    new_id = str(uuid.uuid4())
    url = base + "/oracle/events"
    status, ev = _post_json(
        base, "/oracle/events", {**EVENT_BODY, "id": new_id},
        nostr_auth.build_auth_header(SECKEY, "POST", url, NOW_TS),
    )
    assert status == 201
    # the signer became the coordinator
    assert ev["coordinator_pubkey"] == schnorr.pubkey(SECKEY).hex()

    entry_url = f"{base}/oracle/events/{new_id}/entry"
    status, ent = _post_json(
        base, f"/oracle/events/{new_id}/entry",
        {"id": str(uuid.uuid4()), "choices": [{"station": "PFNO", "temp_low": "par"}]},
        nostr_auth.build_auth_header(SECKEY, "POST", entry_url, NOW_TS),
    )
    assert status == 201

    # a different key's valid signature is NOT the coordinator -> 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post_json(
            base, f"/oracle/events/{new_id}/entry",
            {"choices": [{"station": "KSAW", "temp_low": "over"}]},
            nostr_auth.build_auth_header(OTHER_SECKEY, "POST", entry_url, NOW_TS),
        )
    assert exc.value.code == 400


def test_unsigned_and_badly_signed_posts_rejected(served_authed):
    base = served_authed
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post_json(base, "/oracle/events", {**EVENT_BODY, "id": str(uuid.uuid4())}, None)
    assert exc.value.code == 401

    # signature over the WRONG url (replay from another route) -> 401
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post_json(
            base, "/oracle/events", {**EVENT_BODY, "id": str(uuid.uuid4())},
            nostr_auth.build_auth_header(SECKEY, "POST", base + "/other", NOW_TS),
        )
    assert exc.value.code == 401

    # expired timestamp -> 401
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post_json(
            base, "/oracle/events", {**EVENT_BODY, "id": str(uuid.uuid4())},
            nostr_auth.build_auth_header(
                SECKEY, "POST", base + "/oracle/events", NOW_TS - 999
            ),
        )
    assert exc.value.code == 401

    # GET routes stay open (reference only guards the write routes)
    with urllib.request.urlopen(base + "/oracle/events") as resp:
        assert resp.status == 200


# -- unit: URL normalization and pubkey-format canonicalization ------


def test_default_port_url_match():
    # rust Url strips default ports when round-tripping, so a client
    # signing http://host:80/path must match http://host/path
    # (and https :443 likewise); non-default ports still mismatch.
    h = _header(url="http://127.0.0.1:80/oracle/events")
    assert nostr_auth.verify_header(h, "POST", URL, now=NOW_TS)
    assert nostr_auth._urls_match("https://h:443/x", "https://h/x")
    assert nostr_auth._urls_match("http://H/x", "http://h/x")
    assert not nostr_auth._urls_match("http://h:8080/x", "http://h/x")
    assert not nostr_auth._urls_match("https://h:80/x", "https://h/x")


def test_npub_roundtrip_and_vector():
    from noaa_data_pipeline_spark.functions import bech32

    # NIP-19's published example pair
    hex_key = "3bf0c63fcb93463407af97a5e5ee64fa883d107ef9e558472c4eb9aaaefa459d"
    npub = "npub180cvv07tjdrrgpa0j7j7tmnyl2yr6yr7l8j4s3evf6u64th6gkwsyjh6w6"
    assert bech32.npub_encode(hex_key) == npub
    assert bech32.npub_decode(npub) == hex_key
    # normalize accepts either format, canonicalizes to hex
    assert bech32.normalize_pubkey(npub) == hex_key
    assert bech32.normalize_pubkey(hex_key.upper()) == hex_key
    # opaque strings (legacy ids) pass through untouched
    assert bech32.normalize_pubkey("not-a-key") == "not-a-key"
    with pytest.raises(bech32.Bech32Error):
        bech32.npub_decode("npub1qqqqqqqqqqqqqqqqqqqqqqqqqqqqqqqq")


def test_npub_coordinator_accepts_hex_signer(spark, tmp_path_factory):
    """An event whose stored coordinator_pubkey is npub-format (created
    while require_nip98 was off, mirroring oracle.rs:159's bech32
    storage) must still authenticate the same key's NIP-98 hex pubkey
    on add_entry (oracle.rs:234-240 compares in bech32 space)."""
    from noaa_data_pipeline_spark.functions import bech32, schnorr

    store, lake_root, _ = _build_fixture(spark, tmp_path_factory)
    files_dir = str(tmp_path_factory.mktemp("files_npub"))
    app = http_api.WeatherApp(spark, lake_root, store, files_dir, now=lambda: NOW)

    hex_pk = schnorr.pubkey(SECKEY).hex()
    ev_id = str(uuid.uuid4())
    app.create_event({**EVENT_BODY, "id": ev_id,
                      "coordinator_pubkey": bech32.npub_encode(hex_pk)})

    ent = app.add_entry(
        ev_id,
        {"id": str(uuid.uuid4()),
         "choices": [{"station": "PFNO", "temp_low": "par"}]},
        auth_pubkey=hex_pk,
    )
    assert ent["event_id"] == ev_id

    # a different authenticated key is still rejected
    other_pk = schnorr.pubkey(OTHER_SECKEY).hex()
    with pytest.raises(http_api.HTTPError):
        app.add_entry(
            ev_id,
            {"id": str(uuid.uuid4()),
             "choices": [{"station": "KSAW", "temp_low": "over"}]},
            auth_pubkey=other_pk,
        )
