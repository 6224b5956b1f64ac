"""BIP-340 schnorr + DLC oracle attestation over secp256k1, pure
Python (no crypto dependency in the container).

The reference signs event outcomes with dlctix's
``attestation_secret`` / ``attestation_locking_point``
(oracle/src/oracle.rs:620-655): a DLC oracle pre-commits a nonce R
and later reveals the scalar

    s = k' + e * d'   with  e = H_tag("BIP0340/challenge", R_x || P_x || m)

where k'/d' are the nonce/secret normalized to even-Y points per
BIP-340. The pair (R_x, s) is then exactly a BIP-340 schnorr
signature on ``m``, and anyone can precompute the "locking point"
``S = R + e*P`` for each possible outcome — revealing ``s`` with
``s*G == S`` is what settles the DLC. Both operations are
implemented here from the public BIP-340 specification.

This is control-plane crypto (a few signatures per ETL pass), so
affine arithmetic with Fermat inversion is plenty fast; nothing here
touches the Spark data plane.
"""

from __future__ import annotations

import hashlib
import secrets

# secp256k1 domain parameters (SEC2)
P = 2**256 - 2**32 - 977
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
G = (
    0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
)

Point = tuple[int, int] | None  # None = point at infinity


def _add(a: Point, b: Point) -> Point:
    if a is None:
        return b
    if b is None:
        return a
    if a[0] == b[0] and (a[1] + b[1]) % P == 0:
        return None
    if a == b:
        lam = (3 * a[0] * a[0]) * pow(2 * a[1], P - 2, P) % P
    else:
        lam = (b[1] - a[1]) * pow(b[0] - a[0], P - 2, P) % P
    x = (lam * lam - a[0] - b[0]) % P
    return (x, (lam * (a[0] - x) - a[1]) % P)


def _mul(k: int, pt: Point) -> Point:
    out: Point = None
    while k:
        if k & 1:
            out = _add(out, pt)
        pt = _add(pt, pt)
        k >>= 1
    return out


def lift_x(x: int) -> Point:
    """Even-Y point with the given x (BIP-340 lift_x); raises on
    non-residue."""
    if not (0 < x < P):
        raise ValueError("x out of range")
    y_sq = (pow(x, 3, P) + 7) % P
    y = pow(y_sq, (P + 1) // 4, P)
    if y * y % P != y_sq:
        raise ValueError("no curve point with this x")
    return (x, y if y % 2 == 0 else P - y)


def tagged_hash(tag: str, data: bytes) -> bytes:
    th = hashlib.sha256(tag.encode()).digest()
    return hashlib.sha256(th + th + data).digest()


def _xbytes(pt: Point) -> bytes:
    assert pt is not None
    return pt[0].to_bytes(32, "big")


def _even_scalar(d: int) -> tuple[int, Point]:
    """Normalize a secret scalar so its public point has even Y
    (negating if needed), per BIP-340 x-only keys."""
    pt = _mul(d, G)
    assert pt is not None
    return (d if pt[1] % 2 == 0 else N - d), pt


def pubkey(seckey: bytes) -> bytes:
    """32-byte x-only public key."""
    d = int.from_bytes(seckey, "big")
    if not (0 < d < N):
        raise ValueError("invalid secret key")
    return _xbytes(_mul(d, G))


def _challenge(r_x: bytes, p_x: bytes, msg: bytes) -> int:
    return int.from_bytes(tagged_hash("BIP0340/challenge", r_x + p_x + msg), "big") % N


def sign(msg: bytes, seckey: bytes, aux: bytes | None = None) -> bytes:
    """BIP-340 schnorr signature (64 bytes) with the spec's nonce
    derivation; ``msg`` is signed as-is (BIP-340 allows arbitrary
    length)."""
    d0 = int.from_bytes(seckey, "big")
    if not (0 < d0 < N):
        raise ValueError("invalid secret key")
    d, pt = _even_scalar(d0)
    aux = aux if aux is not None else secrets.token_bytes(32)
    t = (d ^ int.from_bytes(tagged_hash("BIP0340/aux", aux), "big")).to_bytes(32, "big")
    k0 = (
        int.from_bytes(tagged_hash("BIP0340/nonce", t + _xbytes(pt) + msg), "big") % N
    )
    if k0 == 0:
        raise RuntimeError("zero nonce")
    k, rpt = _even_scalar(k0)
    e = _challenge(_xbytes(rpt), _xbytes(pt), msg)
    s = (k + e * d) % N
    sig = _xbytes(rpt) + s.to_bytes(32, "big")
    if not verify(msg, _xbytes(pt), sig):
        raise RuntimeError("self-verification failed")
    return sig


def verify(msg: bytes, pubkey_x: bytes, sig: bytes) -> bool:
    """BIP-340 verification."""
    if len(sig) != 64 or len(pubkey_x) != 32:
        return False
    try:
        ppt = lift_x(int.from_bytes(pubkey_x, "big"))
    except ValueError:
        return False
    r = int.from_bytes(sig[:32], "big")
    s = int.from_bytes(sig[32:], "big")
    if r >= P or s >= N:
        return False
    e = _challenge(sig[:32], pubkey_x, msg)
    rpt = _add(_mul(s, G), _mul(N - e, ppt))
    return rpt is not None and rpt[1] % 2 == 0 and rpt[0] == r


# -- DLC oracle attestation (dlctix semantics, oracle.rs:620-655) -----


def nonce_point(nonce_seckey: bytes) -> bytes:
    """The pre-committed nonce's x-only public point (the reference
    stores this on the event announcement)."""
    return pubkey(nonce_seckey)


def attestation_secret(seckey: bytes, nonce_seckey: bytes, msg: bytes) -> bytes:
    """Reveal the outcome scalar: s = k' + e*d' (mod n). Combined
    with the pre-committed R_x this is a valid BIP-340 signature on
    ``msg``."""
    d, ppt = _even_scalar(int.from_bytes(seckey, "big"))
    k, rpt = _even_scalar(int.from_bytes(nonce_seckey, "big"))
    e = _challenge(_xbytes(rpt), _xbytes(ppt), msg)
    return ((k + e * d) % N).to_bytes(32, "big")


def attestation_locking_point(pubkey_x: bytes, nonce_x: bytes, msg: bytes) -> Point:
    """S = R + e*P — computable by anyone from public data per
    outcome; the revealed attestation scalar satisfies s*G == S.
    Raises ValueError when either x is not on the curve (the
    reference's MaybePoint::Invalid arm)."""
    rpt = lift_x(int.from_bytes(nonce_x, "big"))
    ppt = lift_x(int.from_bytes(pubkey_x, "big"))
    e = _challenge(nonce_x, pubkey_x, msg)
    return _add(rpt, _mul(e, ppt))


def attestation_as_signature(nonce_x: bytes, secret: bytes) -> bytes:
    """(R_x, s) packaged as a 64-byte BIP-340 signature."""
    return nonce_x + secret
