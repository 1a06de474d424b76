"""Pure-stdlib AES-128 (FIPS-197) with CBC mode + PKCS#7 padding.

Used only by the PDF standard-security handler (/V 4 crypt filters with
/CFM /AESV2, sources/pdf_text.py) — the reference reaches the same
capability through PyPDF2+pycryptodome (reference sources.py:122-150).
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


def _expand_key(key: bytes) -> list[list[int]]:
    """AES-128 key schedule: 11 round keys of 16 bytes each."""
    if len(key) != 16:
        raise ValueError("AES-128 requires a 16-byte key")
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]  # RotWord
            t = [_SBOX[b] for b in t]  # SubWord
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _shift_rows(s: list[int], inverse: bool) -> list[int]:
    # state is column-major (FIPS-197): s[r + 4c]
    out = [0] * 16
    for r in range(4):
        for c in range(4):
            shift = -r if inverse else r
            out[r + 4 * c] = s[r + 4 * ((c + shift) % 4)]
    return out


def _mix_columns(s: list[int], inverse: bool) -> list[int]:
    m = (14, 11, 13, 9) if inverse else (2, 3, 1, 1)
    out = [0] * 16
    for c in range(4):
        col = s[4 * c : 4 * c + 4]
        for r in range(4):
            out[r + 4 * c] = (
                _mul(m[0], col[r])
                ^ _mul(m[1], col[(r + 1) % 4])
                ^ _mul(m[2], col[(r + 2) % 4])
                ^ _mul(m[3], col[(r + 3) % 4])
            )
    return out


def encrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    s = [b ^ k for b, k in zip(block, rk[0])]
    for rnd in range(1, 10):
        s = [_SBOX[b] for b in s]
        s = _shift_rows(s, inverse=False)
        s = _mix_columns(s, inverse=False)
        s = [b ^ k for b, k in zip(s, rk[rnd])]
    s = [_SBOX[b] for b in s]
    s = _shift_rows(s, inverse=False)
    s = [b ^ k for b, k in zip(s, rk[10])]
    return bytes(s)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    rk = _expand_key(key)
    s = [b ^ k for b, k in zip(block, rk[10])]
    for rnd in range(9, 0, -1):
        s = _shift_rows(s, inverse=True)
        s = [_INV_SBOX[b] for b in s]
        s = [b ^ k for b, k in zip(s, rk[rnd])]
        s = _mix_columns(s, inverse=True)
    s = _shift_rows(s, inverse=True)
    s = [_INV_SBOX[b] for b in s]
    s = [b ^ k for b, k in zip(s, rk[0])]
    return bytes(s)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-128-CBC decrypt WITHOUT padding removal (caller strips)."""
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
    """AES-128-CBC encrypt WITHOUT padding (caller pads)."""
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
