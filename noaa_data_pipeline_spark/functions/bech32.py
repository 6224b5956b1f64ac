"""Bech32 (BIP-173) encoding for Nostr `npub` public keys.

The reference stores and compares event coordinator pubkeys in bech32
form (`/root/reference/crates/oracle/src/oracle.rs:159` returns
`public_key().to_bech32()` and `oracle.rs:234-240` converts the
authenticated NIP-98 hex pubkey to bech32 before the coordinator
equality check).  This module implements the public BIP-173 algorithm
(checksum + 5-bit regrouping) so the HTTP API can accept either
format and compare canonically — pure driver-side protocol code, no
Spark involvement.
"""

from __future__ import annotations

_CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_GEN = (0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3)


class Bech32Error(ValueError):
    pass


def _polymod(values: list[int]) -> int:
    chk = 1
    for v in values:
        top = chk >> 25
        chk = ((chk & 0x1FFFFFF) << 5) ^ v
        for i in range(5):
            if (top >> i) & 1:
                chk ^= _GEN[i]
    return chk


def _hrp_expand(hrp: str) -> list[int]:
    return [ord(c) >> 5 for c in hrp] + [0] + [ord(c) & 31 for c in hrp]


def _create_checksum(hrp: str, data: list[int]) -> list[int]:
    polymod = _polymod(_hrp_expand(hrp) + data + [0] * 6) ^ 1
    return [(polymod >> 5 * (5 - i)) & 31 for i in range(6)]


def _convertbits(data: bytes | list[int], frombits: int, tobits: int, pad: bool) -> list[int]:
    acc = 0
    bits = 0
    ret: list[int] = []
    maxv = (1 << tobits) - 1
    for value in data:
        if value < 0 or value >> frombits:
            raise Bech32Error("value out of range")
        acc = (acc << frombits) | value
        bits += frombits
        while bits >= tobits:
            bits -= tobits
            ret.append((acc >> bits) & maxv)
    if pad:
        if bits:
            ret.append((acc << (tobits - bits)) & maxv)
    elif bits >= frombits or ((acc << (tobits - bits)) & maxv):
        raise Bech32Error("invalid padding")
    return ret


def bech32_encode(hrp: str, payload: bytes) -> str:
    data = _convertbits(payload, 8, 5, True)
    return hrp + "1" + "".join(_CHARSET[d] for d in data + _create_checksum(hrp, data))


def bech32_decode(s: str) -> tuple[str, bytes]:
    if s.lower() != s and s.upper() != s:
        raise Bech32Error("mixed-case bech32 string")
    s = s.lower()
    pos = s.rfind("1")
    if pos < 1 or pos + 7 > len(s) or len(s) > 90:
        raise Bech32Error("malformed bech32 string")
    hrp, rest = s[:pos], s[pos + 1 :]
    try:
        data = [_CHARSET.index(c) for c in rest]
    except ValueError as exc:
        raise Bech32Error(f"invalid bech32 character: {exc}") from exc
    if _polymod(_hrp_expand(hrp) + data) != 1:
        raise Bech32Error("bad bech32 checksum")
    return hrp, bytes(_convertbits(data[:-6], 5, 8, False))


def npub_encode(pubkey_hex: str) -> str:
    """Hex x-only pubkey -> `npub1...` (NIP-19)."""
    raw = bytes.fromhex(pubkey_hex)
    if len(raw) != 32:
        raise Bech32Error("pubkey must be 32 bytes")
    return bech32_encode("npub", raw)


def npub_decode(npub: str) -> str:
    """`npub1...` -> 64-char lowercase hex."""
    hrp, raw = bech32_decode(npub)
    if hrp != "npub" or len(raw) != 32:
        raise Bech32Error("not an npub key")
    return raw.hex()


def normalize_pubkey(key: str | None) -> str | None:
    """Canonicalize a pubkey to 64-char lowercase hex, accepting
    either hex or npub bech32 input.  Unrecognized strings are
    returned unchanged (the store treats them as opaque ids, matching
    the reference's behavior for events created before auth was
    enabled)."""
    if key is None:
        return None
    k = key.strip()
    if k.lower().startswith("npub1"):
        try:
            return npub_decode(k)
        except Bech32Error:
            return key
    if len(k) == 64:
        try:
            bytes.fromhex(k)
            return k.lower()
        except ValueError:
            return key
    return key
