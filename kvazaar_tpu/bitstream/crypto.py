"""Selective encryption (reference --crypto, extras/crypto.cpp: AES-CTR
keystream XORed into chosen bypass-coded bins behind KVZ_SEL_ENCRYPTION;
hooks in src/cabac.c:284 and src/encode_coding_tree.c:639).

Scope here: the keystream encrypts residual-coefficient SIGN bits
(except hidden signs) and MVD sign bits — bypass bins whose flip always
leaves the stream spec-parseable, so any decoder can parse the NALs but
only a key holder reconstructs the real pictures.  AES-128 is
implemented locally (encrypt-only, as CTR needs) — no external crypto
dependency exists in this environment.
"""

from __future__ import annotations

_SBOX = None


def _sbox():
    global _SBOX
    if _SBOX is not None:
        return _SBOX
    # Generate the AES S-box from the multiplicative inverse in
    # GF(2^8) + affine transform (FIPS-197 §5.1.1).
    p, q = 1, 1
    inv = [0] * 256
    for _ in range(255):
        # p *= 3 in GF(2^8)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q /= 3 (multiply by 0xF6... iterate q *= 0xF6 ≡ 3^-1)
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        q ^= 0x09 if q & 0x80 else 0
        inv[p] = q
    inv[1] = 1
    box = [0] * 256
    for i in range(256):
        x = inv[i] if i else 0
        box[i] = (x ^ ((x << 1) | (x >> 7)) ^ ((x << 2) | (x >> 6))
                  ^ ((x << 3) | (x >> 5)) ^ ((x << 4) | (x >> 4))
                  ^ 0x63) & 0xFF
    _SBOX = box
    return box


_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _expand_key(key: bytes):
    sbox = _sbox()
    w = [list(key[4 * i:4 * i + 4]) for i in range(4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [sbox[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [w[4 * r:4 * r + 4] for r in range(11)]


def _xtime(b):
    return ((b << 1) ^ 0x1B) & 0xFF if b & 0x80 else (b << 1)


def _aes128_encrypt_block(block: bytes, round_keys) -> bytes:
    sbox = _sbox()
    # State in column-major order per FIPS-197.
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]

    def add_round_key(rk):
        for c in range(4):
            for r in range(4):
                s[r][c] ^= rk[c][r]

    add_round_key(round_keys[0])
    for rnd in range(1, 11):
        for r in range(4):
            for c in range(4):
                s[r][c] = sbox[s[r][c]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd < 10:
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                for r in range(4):
                    s[r][c] = (_xtime(a[r]) ^ a[(r + 1) % 4]
                               ^ _xtime(a[(r + 1) % 4])
                               ^ a[(r + 2) % 4] ^ a[(r + 3) % 4])
        add_round_key(round_keys[rnd])
    return bytes(s[r][c] for c in range(4) for r in range(4))


class SelectiveCipher:
    """Deterministic AES-128-CTR bit stream shared by encoder and
    decoder: one instance per slice, bits consumed in parse order."""

    def __init__(self, key: bytes, iv: int = 0):
        assert len(key) == 16
        self._rk = _expand_key(key)
        self._ctr = iv
        self._buf = 0
        self._nbits = 0

    def next_bit(self) -> int:
        if self._nbits == 0:
            blk = self._ctr.to_bytes(16, "big")
            ks = _aes128_encrypt_block(blk, self._rk)
            self._ctr += 1
            self._buf = int.from_bytes(ks, "big")
            self._nbits = 128
        self._nbits -= 1
        return (self._buf >> self._nbits) & 1


def key_from_string(s: str) -> bytes:
    """16-byte key from a hex string or passphrase."""
    try:
        b = bytes.fromhex(s)
        if len(b) == 16:
            return b
    except ValueError:
        pass
    import hashlib
    return hashlib.md5(s.encode()).digest()
