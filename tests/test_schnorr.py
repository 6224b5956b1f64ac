"""BIP-340 / DLC attestation correctness (pure-Python secp256k1).

Anchored on the official BIP-340 test-vector public key for seckey=3
plus algebraic invariants: sign/verify roundtrip (even- and odd-Y
keys), tamper rejection, and the DLC property the reference's
signing flow relies on (oracle.rs:620-655): the revealed attestation
scalar s satisfies s*G == locking_point(P, R, m), and (R_x, s) is a
valid BIP-340 signature."""

from __future__ import annotations

import pytest

from noaa_data_pipeline_spark.functions import schnorr


def sk(i: int) -> bytes:
    return i.to_bytes(32, "big")


def test_bip340_vector_pubkey():
    # BIP-340 test vector 0: d=3 -> x-only pubkey
    assert (
        schnorr.pubkey(sk(3)).hex().upper()
        == "F9308A019258C31049344F85F89D5229B531C845836F99B08601F113BCE036F9"
    )


def test_sign_verify_roundtrip_even_and_odd_y():
    msg = b"\x07" * 32
    for d in (3, 5, 7, 11, 0xDEADBEEF):  # mix of even/odd-Y pubkeys
        pub = schnorr.pubkey(sk(d))
        sig = schnorr.sign(msg, sk(d), aux=b"\x11" * 32)
        assert schnorr.verify(msg, pub, sig)
        # deterministic with fixed aux
        assert sig == schnorr.sign(msg, sk(d), aux=b"\x11" * 32)


def test_verify_rejects_tampering():
    msg = b"event outcome"
    pub = schnorr.pubkey(sk(42))
    sig = schnorr.sign(msg, sk(42), aux=b"\x00" * 32)
    assert schnorr.verify(msg, pub, sig)
    assert not schnorr.verify(msg + b"x", pub, sig)
    assert not schnorr.verify(msg, schnorr.pubkey(sk(43)), sig)
    bad = bytearray(sig)
    bad[40] ^= 1
    assert not schnorr.verify(msg, pub, bytes(bad))


def test_invalid_keys_rejected():
    with pytest.raises(ValueError):
        schnorr.pubkey(sk(0))
    with pytest.raises(ValueError):
        schnorr.pubkey((schnorr.N).to_bytes(32, "big"))
    # x not on curve
    assert not schnorr.verify(b"m", b"\x05" * 32, b"\x00" * 64)


def test_dlc_attestation_locking_point_invariant():
    seckey, nonce = sk(0x1234), sk(0x5678)
    msg = (0).to_bytes(8, "big") + (2).to_bytes(8, "big") + (1).to_bytes(8, "big")
    s = schnorr.attestation_secret(seckey, nonce, msg)
    lock = schnorr.attestation_locking_point(
        schnorr.pubkey(seckey), schnorr.nonce_point(nonce), msg
    )
    assert schnorr._mul(int.from_bytes(s, "big"), schnorr.G) == lock
    # (R_x, s) is a valid BIP-340 signature over the winning bytes
    sig = schnorr.attestation_as_signature(schnorr.nonce_point(nonce), s)
    assert schnorr.verify(msg, schnorr.pubkey(seckey), sig)
    # a different outcome yields a different locking point
    other = schnorr.attestation_locking_point(
        schnorr.pubkey(seckey), schnorr.nonce_point(nonce), b"other"
    )
    assert other != lock
