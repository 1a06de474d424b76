"""Pure-stdlib AES-128/192/256 (FIPS-197) with CBC mode + PKCS#7 padding.

Used only by the PDF standard-security handler (/V 4 AESV2 crypt
filters and /V 5 AESV3 AES-256, sources/pdf_text.py) — the reference
reaches the same capability through PyPDF2+pycryptodome (reference
sources.py:122-150).
Deliberately table-light and slow: PDFs decrypt kilobytes per stream,
not gigabytes, and every table is DERIVED at import (GF(2^8) inverses +
the affine map) rather than pasted, so the implementation is auditable
against the spec. Correctness is pinned by the FIPS-197 Appendix C.1
vector and NIST SP 800-38A CBC vectors in tests/test_pdf_text.py.
"""

from __future__ import annotations


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x11B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a = _xtime(a)
        b >>= 1
    return r


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverses in GF(2^8) via exp/log over generator 3
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= _xtime(x)  # x *= 3 (generator)
    inv = [0] * 256
    for a in range(1, 256):
        # 255 - log[a] mod 255: a=1 has log 0, and exp[255] is unset —
        # without the mod, inv[1] collapses the S-box into a non-bijection
        inv[a] = exp[(255 - log[a]) % 255]

    def affine(b: int) -> int:
        r = 0x63
        for i in range(8):
            bit = (
                (b >> i)
                ^ (b >> ((i + 4) % 8))
                ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8))
                ^ (b >> ((i + 7) % 8))
            ) & 1
            r ^= bit << i
        return r

    sbox = [affine(inv[a]) for a in range(256)]
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]
# GF(2^8) multiplication tables for the MixColumns constants, derived
# at import like the S-box. The PDF 2.0 /R 6 hardened hash (Algorithm
# 2.B) runs >= 64 AES-CBC rounds over ~6 KB per invocation — per-call
# _mul loops made that minutes; tables + a cached key schedule make it
# sub-second while staying derived-not-pasted.
_MUL = {c: [_mul(c, b) for b in range(256)] for c in (2, 3, 9, 11, 13, 14)}
_MUL[1] = list(range(256))


import functools


@functools.lru_cache(maxsize=64)
def _expand_key(key: bytes) -> list[list[int]]:
    """AES key schedule (FIPS-197 §5.2) for 128/192/256-bit keys:
    Nr+1 round keys of 16 bytes (Nr = 10/12/14). The Nk > 6 branch adds
    AES-256's extra SubWord at i % Nk == 4."""
    if len(key) not in (16, 24, 32):
        raise ValueError("AES requires a 16-, 24- or 32-byte key")
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[i : i + 4]) for i in range(0, len(key), 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]  # RotWord
            t = [_SBOX[b] for b in t]  # SubWord
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]  # SubWord only (AES-256)
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _shift_rows(s: list[int], inverse: bool) -> list[int]:
    # state is column-major (FIPS-197): s[r + 4c]
    out = [0] * 16
    for r in range(4):
        for c in range(4):
            shift = -r if inverse else r
            out[r + 4 * c] = s[r + 4 * ((c + shift) % 4)]
    return out


def _mix_columns(s: list[int], inverse: bool) -> list[int]:
    m0, m1, m2, m3 = (
        (_MUL[14], _MUL[11], _MUL[13], _MUL[9])
        if inverse
        else (_MUL[2], _MUL[3], _MUL[1], _MUL[1])
    )
    out = [0] * 16
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            out[r + 4 * c] = (
                m0[col[r]] ^ m1[col[(r + 1) % 4]] ^ m2[col[(r + 2) % 4]] ^ m3[col[(r + 3) % 4]]
            )
    return out


def encrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    nr = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[0])]
    for rnd in range(1, nr):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s, inverse=False)
        s = _mix_columns(s, inverse=False)
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s, inverse=False)
    s = [b ^ k for b, k in zip(s, rk[nr])]
    return bytes(s)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    nr = len(rk) - 1
    s = [b ^ k for b, k in zip(block, rk[nr])]
    for rnd in range(nr - 1, 0, -1):
        s = _shift_rows(s, inverse=True)
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        s = _mix_columns(s, inverse=True)
    s = _shift_rows(s, inverse=True)
    s = [_INV_SBOX[b] for b in s]
    s = [b ^ k for b, k in zip(s, rk[0])]
    return bytes(s)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC decrypt WITHOUT padding removal (caller strips)."""
    if len(iv) != 16 or len(data) % 16 != 0:
        raise ValueError("CBC ciphertext must be 16-byte aligned with a 16-byte IV")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, block), prev))
        prev = block
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt WITHOUT padding (caller pads)."""
    if len(iv) != 16 or len(data) % 16 != 0:
        raise ValueError("CBC plaintext must be 16-byte aligned with a 16-byte IV")
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = encrypt_block(key, bytes(a ^ b for a, b in zip(data[i : i + 16], prev)))
        out += prev
    return bytes(out)


def pkcs7_pad(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def pkcs7_unpad(data: bytes) -> bytes:
    """Strict PKCS#7 strip: malformed padding raises (a wrong key must
    fail loudly, never yield silently wrong plaintext)."""
    if not data or len(data) % 16 != 0:
        raise ValueError("PKCS#7: ciphertext length not block-aligned")
    n = data[-1]
    if not (1 <= n <= 16) or data[-n:] != bytes([n]) * n:
        raise ValueError("PKCS#7: invalid padding")
    return data[:-n]
