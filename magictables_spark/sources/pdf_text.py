"""Minimal pure-stdlib PDF text extraction (reference parity:
sources.py:122-150 — PyPDF2 ``page.extract_text()`` per page, one row
per page).

No PDF library ships in this environment, so this is a small real
parser for the common case rather than an import stub:

- objects located by scanning ``N G obj ... endobj`` (no xref needed —
  robust against the linearized/append-updated files where offsets lie);
- page ORDER comes from walking ``/Root -> /Pages -> /Kids`` exactly
  like a conforming reader; documents without a resolvable tree fall
  back to object order of ``/Type /Page`` dicts;
- content streams support ``/FlateDecode`` (zlib) and raw streams;
- text collected from ``Tj``, ``'``, ``\"`` and ``TJ`` show operators
  inside BT/ET blocks; literal strings handle the ``\\``-escapes and
  octal forms of the spec, hex strings handled too; a ``TJ`` kern gap
  <= -180/1000 em and the ``Td/TD/T*`` line operators introduce
  whitespace the way simple extractors do.

- object streams (``/ObjStm``, PDF 1.5+ linearized writers) ARE
  unpacked: the FlateDecode container's (objnum, offset) header is
  parsed and the packed bodies join the object table, so page trees
  compressed into ObjStm resolve like top-level objects.

- RC4-encrypted PDFs (standard security handler, /V 1-2 / /R 2-3,
  empty user password — the classic "owner-locked" files PyPDF2
  decrypts transparently) ARE decrypted: Algorithms 2/3/4/5 of the
  spec (ISO 32000-1 §7.6.3) in pure stdlib (hashlib.md5 + a 15-line
  RC4).

- AES-128 crypt-filter PDFs (/V 4 /R 4, /CFM /AESV2 — what Acrobat 7+
  writes by default) ARE decrypted too: same Algorithm 2 key (plus the
  R4 /EncryptMetadata step), per-object key salted with 'sAlT', then
  AES-128-CBC with the leading 16 payload bytes as IV and a STRICT
  PKCS#7 strip (wrong key -> refusal, never wrong text). The AES core
  is pure stdlib (sources/aes.py, pinned by FIPS-197 vectors).
  Password-protected files (non-empty user password) and /V 5 AES-256
  (R 5-6, SHA-256 key derivation) raise ``UnsupportedPdfError``.

This intentionally does NOT cover AES-256 PDFs or CID/Type0 composite
fonts — those genuinely need a real PDF library (or a later round);
such files raise ``UnsupportedPdfError`` so callers can fall back or
skip, never silently return wrong text.
"""

from __future__ import annotations

import hashlib
import re
import zlib

_OBJ_HDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_OPEN_RE = re.compile(rb"stream\r?\n")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
# a direct integer /Length (an indirect `/Length N G R` must NOT match)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


class UnsupportedPdfError(ValueError):
    """PDF uses features beyond this minimal parser (encryption,
    object streams, composite fonts)."""


def _stream_payload_span(body: bytes) -> tuple[int, int] | None:
    """(start, end) byte span of the stream payload inside one object
    body, or None if the body has no stream. Prefers the dict's direct
    integer ``/Length`` to delimit the payload — compressed or encrypted
    payloads can legitimately contain the literal bytes ``endstream``,
    so the regex delimiter is only the fallback (for writers that emit
    an indirect /Length we can't resolve here)."""
    sm = _STREAM_OPEN_RE.search(body)
    if not sm:
        return None
    lm = _LENGTH_RE.search(body[: sm.start()])
    start = sm.end()
    if lm:
        end = start + int(lm.group(1))
        if end <= len(body) and re.match(rb"\s*endstream", body[end : end + 16]):
            return (start, end)
    m = _STREAM_RE.search(body)
    return (m.start(1), m.end(1)) if m else None


def _scan_objects(data: bytes) -> dict[int, tuple[int, bytes]]:
    """Sequential ``N G obj ... endobj`` scan returning
    {objnum: (gen, body)}. Stream payloads are skipped via the direct
    integer ``/Length`` when available, so payload bytes that happen to
    contain ``endstream``/``endobj``/another object header (routine in
    Flate-compressed or RC4-encrypted payloads) cannot mis-split the
    object table. Later duplicates win (incremental updates)."""
    out: dict[int, tuple[int, bytes]] = {}
    pos = 0
    while True:
        hm = _OBJ_HDR_RE.search(data, pos)
        if not hm:
            break
        num, gen = int(hm.group(1)), int(hm.group(2))
        body_start = hm.end()
        sm = _STREAM_OPEN_RE.search(data, body_start)
        em = data.find(b"endobj", body_start)
        if sm is not None and (em == -1 or sm.start() < em):
            # stream object: delimit the payload before trusting endobj
            lm = _LENGTH_RE.search(data[body_start : sm.start()])
            search_from = None
            if lm:
                pend = sm.end() + int(lm.group(1))
                if pend <= len(data) and re.match(
                    rb"\s*endstream", data[pend : pend + 16]
                ):
                    search_from = pend
            if search_from is None:
                es = data.find(b"endstream", sm.end())
                search_from = es if es != -1 else sm.end()
            em = data.find(b"endobj", search_from)
        if em == -1:
            # truncated trailing object: keep what's there and stop
            out[num] = (gen, data[body_start:])
            break
        out[num] = (gen, data[body_start:em])
        pos = em + len(b"endobj")
    return out


def _objects(data: bytes) -> dict[int, bytes]:
    objs = {num: body for num, (_, body) in _scan_objects(data).items()}
    _expand_object_streams(objs)
    return objs


def _expand_object_streams(objs: dict[int, bytes]) -> None:
    """Unpack /ObjStm containers (PDF 1.5+): a FlateDecode stream whose
    first /First bytes are N (objnum, offset) pairs, followed by the
    packed object bodies (plain dicts/values — the spec forbids nested
    streams). Modern linearized writers put the page tree here, so
    without this most current PDFs would have no reachable /Pages.
    Packed bodies are added to ``objs`` keyed by their object number;
    a top-level object with the same number wins (incremental updates
    override compressed originals)."""
    for num in list(objs):
        body = objs[num]
        head = _dict_part(body)
        if not re.search(rb"/Type\s*/ObjStm\b", head):
            continue
        span = _stream_payload_span(body)
        if span is None:
            raise UnsupportedPdfError("ObjStm object has no stream data")
        raw = body[span[0] : span[1]]
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise UnsupportedPdfError(f"bad ObjStm FlateDecode stream: {exc}") from exc
        m_n = re.search(rb"/N\s+(\d+)", head)
        m_first = re.search(rb"/First\s+(\d+)", head)
        if not (m_n and m_first):
            raise UnsupportedPdfError("ObjStm missing /N or /First")
        n, first = int(m_n.group(1)), int(m_first.group(1))
        header = raw[:first].split()
        if len(header) < 2 * n:
            raise UnsupportedPdfError("ObjStm header truncated")
        try:
            nums = [int(x) for x in header[0 : 2 * n : 2]]
            offs = [int(x) for x in header[1 : 2 * n : 2]]
        except ValueError as exc:
            raise UnsupportedPdfError(f"ObjStm header malformed: {exc}") from exc
        for i in range(n):
            start = first + offs[i]
            end = first + offs[i + 1] if i + 1 < n else len(raw)
            if start > len(raw):
                raise UnsupportedPdfError("ObjStm offset past stream end")
            objs.setdefault(nums[i], raw[start:end])


# ---------------------------------------------------------------------------
# standard security handler (RC4, ISO 32000-1 §7.6.3) — empty user password
# ---------------------------------------------------------------------------

# §7.6.3.3 padding string, appended/truncating passwords to 32 bytes
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
        0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (spec test vector asserted in tests/test_pdf_text.py)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) % 256
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) % 256
        j = (j + s[i]) % 256
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) % 256]
    return bytes(out)


def _string_value(body: bytes, key: bytes) -> bytes:
    """The string value of ``/key`` in a dict body — literal or hex."""
    m = re.search(rb"/" + key + rb"\s*", body)
    if not m:
        raise UnsupportedPdfError(f"encrypt dict missing /{key.decode()}")
    i = m.end()
    if body[i : i + 1] == b"(":
        s, _ = _literal_string(body, i)
        return s
    if body[i : i + 1] == b"<":
        j = body.find(b">", i)
        if j < 0:
            raise UnsupportedPdfError(f"unterminated hex string for /{key.decode()}")
        return _hex_bytes(re.sub(rb"\s", b"", body[i + 1 : j]))
    raise UnsupportedPdfError(f"/{key.decode()} is not a string")


def _parse_encrypt(enc_body: bytes, data: bytes) -> dict:
    """Parse the /Encrypt dictionary + the trailer /ID first element.
    Standard handler only: RC4 (/V 1-2, /R 2-3), AES-128 crypt filters
    (/V 4 /R 4 with /CFM /AESV2 or /V2) and AES-256 (/V 5 /R 5-6 with
    /CFM /AESV3, the 2008+ handler: SHA-2 key derivation, 48-byte /O
    and /U, /OE /UE encrypted file keys)."""
    if not re.search(rb"/Filter\s*/Standard\b", enc_body):
        raise UnsupportedPdfError("non-standard security handler")
    v = int(m.group(1)) if (m := re.search(rb"/V\s+(\d+)", enc_body)) else 0
    r = int(m.group(1)) if (m := re.search(rb"/R\s+(\d+)", enc_body)) else 2
    cfm = "rc4"
    if v > 2 or r > 3:
        if v == 4 and r == 4:
            # crypt filters: the stream filter (/StmF, default /StdCF)
            # names a /CF entry whose /CFM picks the cipher
            if re.search(rb"/StmF\s*/Identity\b", enc_body):
                cfm = "identity"
            elif re.search(rb"/CFM\s*/AESV2\b", enc_body):
                cfm = "aesv2"
            elif re.search(rb"/CFM\s*/V2\b", enc_body):
                cfm = "rc4"
            else:
                raise UnsupportedPdfError("unsupported /V 4 crypt filter (no AESV2/V2 /CFM)")
        elif v == 5 and r in (5, 6):
            if re.search(rb"/StmF\s*/Identity\b", enc_body):
                cfm = "identity"
            elif re.search(rb"/CFM\s*/AESV3\b", enc_body):
                cfm = "aesv3"
            else:
                raise UnsupportedPdfError("unsupported /V 5 crypt filter (no AESV3 /CFM)")
        else:
            raise UnsupportedPdfError(
                f"unknown encryption unsupported (/V {v} /R {r})"
            )
    p = int(m.group(1)) if (m := re.search(rb"/P\s+(-?\d+)", enc_body)) else -1
    # The TOP-LEVEL /Length is the key length in BITS. For /V 4 the nested
    # /CF <</StdCF <<...>>>> subdictionary may carry its own '/Length 16'
    # (key length in BYTES, ISO 32000-1 Table 25) — and common Acrobat
    # layouts put the CF dict before the top-level /Length or omit the
    # top-level entry entirely. Strip the CF subdictionary before
    # searching, and default AESV2 to 128 bits (its only legal length).
    length_src = enc_body
    if v == 4:
        cfm_start = re.search(rb"/CF\s*<<", length_src)
        if cfm_start:
            i, depth = cfm_start.end(), 1
            while depth and i < len(length_src):
                if length_src[i : i + 2] == b"<<":
                    depth, i = depth + 1, i + 2
                elif length_src[i : i + 2] == b">>":
                    depth, i = depth - 1, i + 2
                else:
                    i += 1
            length_src = length_src[: cfm_start.start()] + length_src[i:]
    lm = re.search(rb"/Length\s+(\d+)", length_src)
    if lm:
        length = int(lm.group(1))
    elif v == 4 and cfm == "aesv2":
        length = 128
    else:
        length = 40
    encrypt_metadata = not re.search(rb"/EncryptMetadata\s+false\b", enc_body)
    o = _string_value(enc_body, b"O")
    u = _string_value(enc_body, b"U")
    oe = ue = None
    if v == 5:
        # /Length is fixed at 256 bits for AESV3; /O and /U are 48 bytes
        # (32-byte verification hash + 8-byte validation salt + 8-byte
        # key salt), /OE and /UE hold the AES-256-CBC-wrapped file key
        length = 256
        if len(o) < 48 or len(u) < 48:
            raise UnsupportedPdfError("malformed /O or /U entry (V5 needs 48 bytes)")
        o, u = o[:48], u[:48]
        oe = _string_value(enc_body, b"OE")
        ue = _string_value(enc_body, b"UE")
        if len(oe) != 32 or len(ue) != 32:
            raise UnsupportedPdfError("malformed /OE or /UE entry")
    else:
        # §7.6.3.2: 40-128 bits, multiple of 8. Out-of-range values
        # (seen in corrupted files) would derive an empty/oversized RC4
        # key — the empty case crashes key scheduling (i % 0) instead
        # of refusing.
        if not (40 <= length <= 128 and length % 8 == 0):
            raise UnsupportedPdfError(f"invalid /Length {length} (spec: 40-128, mult of 8)")
        if len(o) != 32 or len(u) != 32:
            raise UnsupportedPdfError("malformed /O or /U entry")
    idm = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", data)
    id0 = _hex_bytes(re.sub(rb"\s", b"", idm.group(1))) if idm else b""
    return {
        "v": v,
        "r": r,
        "p": p,
        "n": length // 8,
        "o": o,
        "u": u,
        "oe": oe,
        "ue": ue,
        "id0": id0,
        "cfm": cfm,
        "encrypt_metadata": encrypt_metadata,
    }


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (/R 6 hardened hash): iterated
    SHA-256/384/512 interleaved with AES-128-CBC, at least 64 rounds,
    terminating when the last byte of the AES output <= rounds - 32."""
    from magictables_spark.sources import aes as _aes

    k = hashlib.sha256(password + salt + udata).digest()
    rounds = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes.cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        rounds += 1
        if rounds >= 64 and e[-1] <= rounds - 32:
            return k[:32]


def _hash_v5(r: int, password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """/R 5 (AESV3, 2008 extension): single SHA-256; /R 6 (PDF 2.0):
    the hardened Algorithm 2.B."""
    if r == 5:
        return hashlib.sha256(password + salt + udata).digest()
    return _hash_2b(password, salt, udata)


def _encryption_key_v5(enc: dict, password: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.A: verify ``password`` as the user
    password (hash against /U) or the owner password (hash over /O with
    the full /U string), then unwrap the 32-byte file key from /UE or
    /OE with AES-256-CBC (zero IV, no padding). A failed check raises —
    never wrong text."""
    from magictables_spark.sources import aes as _aes

    pwd = password[:127]  # spec: UTF-8, truncated to 127 bytes
    r, o, u = enc["r"], enc["o"], enc["u"]
    if _hash_v5(r, pwd, u[32:40]) == u[:32]:  # user password
        inter = _hash_v5(r, pwd, u[40:48])
        return _aes.cbc_decrypt(inter, b"\x00" * 16, enc["ue"])
    if _hash_v5(r, pwd, o[32:40], u) == o[:32]:  # owner password
        inter = _hash_v5(r, pwd, o[40:48], u)
        return _aes.cbc_decrypt(inter, b"\x00" * 16, enc["oe"])
    raise UnsupportedPdfError("password-protected PDF (user password required)")


def _encryption_key(enc: dict, password: bytes = b"") -> bytes:
    """Algorithm 2: the file encryption key; then Algorithm 4/5 to
    verify ``password`` as the user password (empty = the common
    owner-locked case). A failed check raises — never wrong text."""
    if enc["v"] == 5:
        return _encryption_key_v5(enc, password)
    padded = (password + _PAD)[:32]
    seed = (
        padded
        + enc["o"]
        + (enc["p"] & 0xFFFFFFFF).to_bytes(4, "little")
        + enc["id0"]
    )
    if enc["r"] >= 4 and not enc.get("encrypt_metadata", True):
        seed += b"\xff\xff\xff\xff"  # Algorithm 2 step f (R4, plaintext metadata)
    h = hashlib.md5(seed).digest()
    n = enc["n"] if enc["r"] >= 3 else 5
    if enc["r"] >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]

    if enc["r"] == 2:  # Algorithm 4
        expect = _rc4(key, _PAD)
        ok = expect == enc["u"]
    else:  # Algorithm 5 (first 16 bytes significant)
        x = hashlib.md5(_PAD + enc["id0"]).digest()
        u = _rc4(key, x)
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        ok = u == enc["u"][:16]
    if not ok:
        raise UnsupportedPdfError("password-protected PDF (user password required)")
    return key


def _object_key(key: bytes, num: int, gen: int, aes: bool = False) -> bytes:
    """§7.6.2 Algorithm 1: per-object key. AESV2 appends the spec's
    'sAlT' salt bytes before hashing."""
    h = hashlib.md5(
        key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(key) + 5, 16)]


def _decrypt_body_streams(
    body: bytes, key: bytes, num: int, gen: int, cfm: str = "rc4"
) -> bytes:
    """Decrypt the stream payload of one object body in place (strings
    outside streams aren't needed for text extraction): RC4 for /V 1-2
    and /V 4 /CFM /V2; AES-128-CBC (first 16 payload bytes = IV, strict
    PKCS#7 strip) for /CFM /AESV2. The payload span comes from the
    dict's /Length when present — ciphertext may contain the literal
    bytes ``endstream``, so the regex delimiter alone could silently
    truncate the payload."""
    if cfm == "identity":
        return body
    span = _stream_payload_span(body)
    if span is None:
        return body
    start, end = span
    payload = body[start:end]
    if cfm in ("aesv2", "aesv3"):
        from magictables_spark.sources import aes as _aes

        if len(payload) == 0:
            # Some writers emit genuinely empty streams even in encrypted
            # files (RC4 of empty is empty; AES has no ciphertext at all).
            # Empty plaintext, not a malformed-stream refusal.
            return body
        if len(payload) < 16 or (len(payload) - 16) % 16 != 0:
            raise UnsupportedPdfError("malformed AES stream (bad length)")
        # AESV3 (/V 5) uses the 32-byte FILE key for every stream — the
        # per-object md5 derivation (Algorithm 1) is V1-V4 only
        stream_key = key if cfm == "aesv3" else _object_key(key, num, gen, aes=True)
        try:
            raw = _aes.pkcs7_unpad(
                _aes.cbc_decrypt(stream_key, payload[:16], payload[16:])
            )
        except ValueError as exc:
            # wrong key / corrupt ciphertext: refuse, never wrong text
            raise UnsupportedPdfError(f"AES stream decryption failed: {exc}") from exc
        # plaintext is shorter than ciphertext (IV + padding): update the
        # dict's /Length so later span lookups on the decrypted body stay
        # exact instead of falling back to the endstream regex
        head = _LENGTH_RE.sub(b"/Length %d" % len(raw), body[:start], count=1)
        return head + raw + body[end:]
    raw = _rc4(_object_key(key, num, gen), payload)
    return body[:start] + raw + body[end:]


def _dict_part(body: bytes) -> bytes:
    """The object's top-level dictionary (before any stream data)."""
    i = body.find(b"stream")
    return body[:i] if i >= 0 else body


def _find_ref(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _kids(body: bytes) -> list[int]:
    m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
    if not m:
        return []
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def _page_order(data: bytes, objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in document order via Root -> Pages -> Kids;
    fallback: object-number order of /Type /Page dicts."""
    root = None
    for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", data):
        root = int(m.group(1))  # last trailer wins (incremental updates)
    pages_root = _find_ref(objs.get(root, b""), b"/Pages") if root is not None else None

    order: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64 or num not in objs:
            return
        body = _dict_part(objs[num])
        kids = _kids(body)
        if kids:
            for k in kids:
                walk(k, depth + 1)
        elif re.search(rb"/Type\s*/Page\b", body):
            order.append(num)

    if pages_root is not None:
        walk(pages_root)
    if not order:
        order = sorted(
            n
            for n, b in objs.items()
            if re.search(rb"/Type\s*/Page\b", _dict_part(b))
            and not re.search(rb"/Type\s*/Pages\b", _dict_part(b))
        )
    return order


def _content_bytes(objs: dict[int, bytes], page_body: bytes) -> bytes:
    """Concatenated decoded content streams for one page."""
    m = re.search(rb"/Contents\s*\[(.*?)\]", page_body, re.S)
    if m:
        refs = [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    else:
        ref = _find_ref(page_body, b"/Contents")
        refs = [ref] if ref is not None else []
    out = bytearray()
    for ref in refs:
        body = objs.get(ref, b"")
        span = _stream_payload_span(body)
        if span is None:
            continue
        raw = body[span[0] : span[1]]
        head = _dict_part(body)
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error as exc:
                raise UnsupportedPdfError(f"bad FlateDecode stream: {exc}") from exc
        elif re.search(rb"/Filter\s*/(?!FlateDecode)\w+", head) or re.search(
            rb"/Filter\s*\[", head
        ):
            raise UnsupportedPdfError("unsupported stream filter")
        out += raw + b"\n"
    return bytes(out)


_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _hex_bytes(hx: bytes) -> bytes:
    """Decode a PDF hex string body, mapping malformed hex (non-hex
    chars, non-ascii) to UnsupportedPdfError instead of a bare
    ValueError escaping mid-parse."""
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (ValueError, UnicodeDecodeError) as e:
        raise UnsupportedPdfError(f"malformed hex string: {e}") from e


def _literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal starting at the '(' — returns (bytes,
    index after the closing paren). Handles escapes, octal, nesting."""
    out = bytearray()
    depth = 1
    i += 1
    while i < len(data) and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt and nxt in b"01234567":
                # octal digits ONLY: bytes.isdigit() accepts \8 and \9,
                # which int(x, 8) rejects mid-parse; the PDF spec says a
                # backslash before a non-escape char is ignored, so \8
                # falls through to the branch below and yields '8'
                j = i + 1
                while j < min(i + 4, len(data)) and data[j : j + 1] in b"01234567":
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\r", b"\n"):  # line continuation
                i += 2
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")


def _page_text(content: bytes) -> str:
    """Walk the content stream's text operators. A tiny tokenizer: we
    only need strings, numbers and operator words between BT/ET."""
    parts: list[str] = []
    i = 0
    n = len(content)
    in_text = False
    pending: list[tuple[str, object]] = []  # operands since last operator

    def flush_show(strings: list[bytes]) -> None:
        txt = b"".join(strings).decode("latin-1")
        if txt:
            parts.append(txt)

    while i < n:
        c = content[i : i + 1]
        if c in b" \t\r\n\0":
            i += 1
        elif c == b"(":
            s, i = _literal_string(content, i)
            pending.append(("str", s))
        elif c == b"<" and content[i + 1 : i + 2] != b"<":
            j = content.find(b">", i)
            if j < 0:
                break
            hx = re.sub(rb"\s", b"", content[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            pending.append(("str", _hex_bytes(hx)))
            i = j + 1
        elif c == b"[":
            # collect a TJ array: strings + kern numbers
            j = i + 1
            arr: list[tuple[str, object]] = []
            while j < n and content[j : j + 1] != b"]":
                cj = content[j : j + 1]
                if cj == b"(":
                    s, j = _literal_string(content, j)
                    arr.append(("str", s))
                elif cj == b"<":
                    k = content.find(b">", j)
                    hx = re.sub(rb"\s", b"", content[j + 1 : k])
                    if len(hx) % 2:
                        hx += b"0"
                    arr.append(("str", _hex_bytes(hx)))
                    j = k + 1
                else:
                    m = _NUM_RE.match(content, j)
                    if m:
                        arr.append(("num", float(m.group(0))))
                        j = m.end()
                    else:
                        j += 1
            pending.append(("arr", arr))
            i = j + 1
        elif c == b"<" :  # '<<' dict — skip balanced
            depth = 0
            while i < n:
                if content[i : i + 2] == b"<<":
                    depth += 1
                    i += 2
                elif content[i : i + 2] == b">>":
                    depth -= 1
                    i += 2
                    if depth == 0:
                        break
                else:
                    i += 1
        else:
            m = _NUM_RE.match(content, i)
            if m:
                pending.append(("num", float(m.group(0))))
                i = m.end()
                continue
            m = re.compile(rb"[A-Za-z'\"*]+").match(content, i)
            if not m:
                i += 1
                continue
            op = m.group(0)
            i = m.end()
            if op == b"BT":
                in_text = True
            elif op == b"ET":
                in_text = False
                parts.append("\n")
            elif in_text and op == b"Tj":
                flush_show([v for t, v in pending if t == "str"])
            elif in_text and op in (b"'", b'"'):
                parts.append("\n")
                flush_show([v for t, v in pending if t == "str"])
            elif in_text and op == b"TJ":
                for t, v in pending:
                    if t == "arr":
                        buf: list[bytes] = []
                        for tt, vv in v:
                            if tt == "str":
                                buf.append(vv)
                            elif tt == "num" and vv <= -180:
                                buf.append(b" ")  # big kern gap = word break
                        flush_show(buf)
            elif in_text and op in (b"Td", b"TD", b"T*"):
                parts.append("\n")
            pending = []
    text = "".join(parts)
    # normalize: collapse blank-line runs, strip trailing space per line
    lines = [ln.rstrip() for ln in text.split("\n")]
    out: list[str] = []
    for ln in lines:
        if ln or (out and out[-1]):
            out.append(ln)
    return "\n".join(out).strip()


def extract_pdf_pages(data: bytes) -> list[str]:
    """bytes -> per-page extracted text (reference: PyPDF2
    page.extract_text() loop, sources.py:131-139)."""
    if not data.startswith(b"%PDF-"):
        raise UnsupportedPdfError("not a PDF (missing %PDF- header)")
    enc_ref = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", data)
    if enc_ref:
        # RC4 standard security handler: decrypt every stream payload
        # with the per-object key, THEN expand ObjStm containers (the
        # packed bodies inside are plaintext once the container is).
        # _scan_objects delimits payloads by /Length, so ciphertext
        # containing `endobj`/`endstream` bytes cannot mis-split here.
        raw = _scan_objects(data)
        enc_num = int(enc_ref.group(1))
        if enc_num not in raw:
            raise UnsupportedPdfError("unresolvable /Encrypt reference")
        enc = _parse_encrypt(_dict_part(raw[enc_num][1]), data)
        key = _encryption_key(enc)
        objs = {
            num: (
                body
                if num == enc_num
                else _decrypt_body_streams(body, key, num, gen, cfm=enc["cfm"])
            )
            for num, (gen, body) in raw.items()
        }
        _expand_object_streams(objs)
    else:
        objs = _objects(data)
    if not objs:
        raise UnsupportedPdfError("no PDF objects found")
    pages = _page_order(data, objs)
    return [_page_text(_content_bytes(objs, _dict_part(objs[p]))) for p in pages]


# ---------------------------------------------------------------------------
# fixture writer (tests only need Tj/TJ + Flate on one page)
# ---------------------------------------------------------------------------


def build_simple_pdf(pages: list[str], compress_from: int = 1) -> bytes:
    """Deterministic minimal PDF: one content stream per page showing
    each text line with Tj; pages with index >= ``compress_from`` get a
    FlateDecode stream so the inflate path is exercised."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1")
        )

    objects: list[bytes] = []  # bodies, 1-indexed object numbers

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    font_obj = 3 + 2 * n_pages
    for i, page in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        lines = page.split("\n")
        ops = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(lines):
            if j:
                ops += b"0 -14 Td\n"
            ops += b"(" + esc(line) + b") Tj\n"
        ops += b"ET"
        if i >= compress_from:
            data = zlib.compress(bytes(ops))
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = bytes(ops)
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_objstm_pdf(pages: list[str]) -> bytes:
    """Deterministic PDF-1.5-style fixture: the whole page tree
    (catalog, pages node, page dicts) is PACKED into one FlateDecode
    /ObjStm container, the way modern linearized writers emit it;
    only the content streams stay top-level (the spec forbids streams
    inside an ObjStm). Exercises _expand_object_streams end-to-end."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1")
        )

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3..2+n page dicts (all
    # packed); 10+i content streams and 30 the ObjStm container are
    # top-level
    packed: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (
            2,
            (
                "<< /Type /Pages /Kids ["
                + " ".join(f"{3 + i} 0 R" for i in range(n_pages))
                + f"] /Count {n_pages} >>"
            ).encode(),
        ),
    ]
    for i in range(n_pages):
        packed.append(
            (
                3 + i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Contents {10 + i} 0 R >>"
                ).encode(),
            )
        )

    bodies = b""
    header_parts = []
    for num, body in packed:
        header_parts.append(f"{num} {len(bodies)}".encode())
        bodies += body + b"\n"
    header = b" ".join(header_parts) + b"\n"
    payload = zlib.compress(header + bodies)

    out = bytearray(b"%PDF-1.5\n")
    for i, page in enumerate(pages):
        ops = b"BT /F1 12 Tf 72 720 Td\n(" + esc(page) + b") Tj\nET"
        out += (
            f"{10 + i} 0 obj\n<< /Length {len(ops)} >>\nstream\n".encode()
            + ops
            + b"\nendstream\nendobj\n"
        )
    out += (
        f"30 0 obj\n<< /Type /ObjStm /N {len(packed)} /First {len(header)} "
        f"/Length {len(payload)} /Filter /FlateDecode >>\nstream\n".encode()
        + payload
        + b"\nendstream\nendobj\n"
    )
    out += b"trailer\n<< /Size 31 /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def build_rc4_pdf(
    pages: list[str],
    user_pw: bytes = b"",
    owner_pw: bytes = b"owner",
    r: int = 3,
    key_bits: int = 40,
    cipher: str = "rc4",
) -> bytes:
    """Deterministic encrypted fixture (standard security handler):
    same page tree as build_simple_pdf, with every content stream
    encrypted under the per-object key and a spec-computed /Encrypt
    dict (Algorithms 2 and 3) + /ID in the trailer. ``cipher='rc4'``
    covers /R 2-3; ``cipher='aes'`` (use r=4, key_bits=128, or call
    ``build_aes_pdf``) emits the /V 4 crypt-filter form with AESV2
    streams (deterministic per-object IV = md5 of the object number).
    Written independently from the reader against ISO 32000-1 §7.6.3
    so the round-trip test exercises both directions of the spec."""

    def esc(s: str) -> bytes:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1")

    n = key_bits // 8
    id0 = hashlib.md5(b"fixture-id:" + str(pages).encode()).digest()

    # Algorithm 3: the /O entry
    h = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    rc4_key = h[:n]
    o = _rc4(rc4_key, (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in rc4_key), o)

    p = -44  # print allowed, modify denied — a typical owner-locked mask
    enc = {"o": o, "p": p, "id0": id0, "r": r, "n": n}

    # Algorithm 2: file key (from the USER password), then the /U entry
    padded = (user_pw + _PAD)[:32]
    h = hashlib.md5(padded + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + id0).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[: (n if r >= 3 else 5)]
    if r == 2:
        u = _rc4(key, _PAD)
    else:
        x = hashlib.md5(_PAD + id0).digest()
        u = _rc4(key, x)
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16

    objects: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())  # 2
    font_obj = 3 + 2 * n_pages
    for i, page in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        ops = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(page.split("\n")):
            if j:
                ops += b"0 -14 Td\n"
            ops += b"(" + esc(line) + b") Tj\n"
        ops += b"ET"
        # alternate raw/Flate so decrypt-then-inflate is exercised
        plain = zlib.compress(bytes(ops)) if i % 2 else bytes(ops)
        filt = b" /Filter /FlateDecode" if i % 2 else b""
        if cipher == "aes":
            from magictables_spark.sources import aes as _aes

            iv = hashlib.md5(b"fixture-iv:%d" % content_num).digest()
            data = iv + _aes.cbc_encrypt(
                _object_key(key, content_num, 0, aes=True), iv, _aes.pkcs7_pad(plain)
            )
        else:
            data = _rc4(_object_key(key, content_num, 0), plain)
        objects.append(
            f"<< /Length {len(data)}".encode() + filt + b" >>\nstream\n" + data + b"\nendstream"
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    enc_num = len(objects) + 1
    if cipher == "aes":
        objects.append(
            (
                f"<< /Filter /Standard /V 4 /R 4 /Length {key_bits} /P {p} "
                "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                "/StmF /StdCF /StrF /StdCF "
            ).encode()
            + b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> >>"
        )
    else:
        objects.append(
            (
                f"<< /Filter /Standard /V {1 if r == 2 else 2} /R {r} "
                f"/Length {key_bits} /P {p} "
            ).encode()
            + b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> >>"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R "
        f"/Encrypt {enc_num} 0 R /ID [<".encode()
        + id0.hex().encode()
        + b"> <"
        + id0.hex().encode()
        + b">] >>\n"
        + f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return bytes(out)


def build_aes_pdf(
    pages: list[str], user_pw: bytes = b"", owner_pw: bytes = b"owner"
) -> bytes:
    """AES-128 /V 4 /R 4 crypt-filter fixture (see build_rc4_pdf)."""
    return build_rc4_pdf(
        pages, user_pw=user_pw, owner_pw=owner_pw, r=4, key_bits=128, cipher="aes"
    )


def build_aes256_objstm_pdf(pages: list[str], r: int = 5) -> bytes:
    """AES-256 /V 5 fixture with the page tree PACKED in an encrypted
    FlateDecode /ObjStm (the modern-writer layout): container payload
    is compress-then-encrypt (filters apply to plaintext per ISO
    32000), content streams are top-level AES-256-CBC under the file
    key. Exercises decrypt -> inflate -> object-stream expansion as
    one path."""
    from magictables_spark.sources import aes as _aes

    def esc(s: str) -> bytes:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1")

    seed = b"fixture-v5-objstm:" + str(pages).encode()
    file_key = hashlib.sha256(b"filekey:" + seed).digest()
    u_vsalt = hashlib.md5(b"uv:" + seed).digest()[:8]
    u_ksalt = hashlib.md5(b"uk:" + seed).digest()[:8]
    o_vsalt = hashlib.md5(b"ov:" + seed).digest()[:8]
    o_ksalt = hashlib.md5(b"ok:" + seed).digest()[:8]
    u = _hash_v5(r, b"", u_vsalt) + u_vsalt + u_ksalt
    ue = _aes.cbc_encrypt(_hash_v5(r, b"", u_ksalt), b"\x00" * 16, file_key)
    o = _hash_v5(r, b"owner", o_vsalt, u) + o_vsalt + o_ksalt
    oe = _aes.cbc_encrypt(_hash_v5(r, b"owner", o_ksalt, u), b"\x00" * 16, file_key)
    id0 = hashlib.md5(b"fixture-id:" + seed).digest()

    n_pages = len(pages)
    packed: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (
            2,
            (
                "<< /Type /Pages /Kids ["
                + " ".join(f"{3 + i} 0 R" for i in range(n_pages))
                + f"] /Count {n_pages} >>"
            ).encode(),
        ),
    ]
    for i in range(n_pages):
        packed.append(
            (
                3 + i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Contents {10 + i} 0 R >>"
                ).encode(),
            )
        )
    bodies = b""
    header_parts = []
    for num, body in packed:
        header_parts.append(f"{num} {len(bodies)}".encode())
        bodies += body + b"\n"
    header = b" ".join(header_parts) + b"\n"
    iv = hashlib.md5(b"fixture-iv:30").digest()
    payload = iv + _aes.cbc_encrypt(
        file_key, iv, _aes.pkcs7_pad(zlib.compress(header + bodies))
    )

    out = bytearray(b"%PDF-2.0\n")
    for i, page in enumerate(pages):
        ops = b"BT /F1 12 Tf 72 720 Td\n(" + esc(page) + b") Tj\nET"
        civ = hashlib.md5(b"fixture-iv:%d" % (10 + i)).digest()
        data = civ + _aes.cbc_encrypt(file_key, civ, _aes.pkcs7_pad(ops))
        out += (
            f"{10 + i} 0 obj\n<< /Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream\nendobj\n"
        )
    out += (
        f"30 0 obj\n<< /Type /ObjStm /N {len(packed)} /First {len(header)} "
        f"/Length {len(payload)} /Filter /FlateDecode >>\nstream\n".encode()
        + payload
        + b"\nendstream\nendobj\n"
    )
    out += (
        (
            f"31 0 obj\n<< /Filter /Standard /V 5 /R {r} /Length 256 /P -44 "
            "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            "/StmF /StdCF /StrF /StdCF "
        ).encode()
        + b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> "
        + b"/OE <" + oe.hex().encode() + b"> /UE <" + ue.hex().encode() + b"> >>\nendobj\n"
    )
    out += (
        b"trailer\n<< /Size 32 /Root 1 0 R /Encrypt 31 0 R /ID [<"
        + id0.hex().encode()
        + b"> <"
        + id0.hex().encode()
        + b">] >>\n%%EOF\n"
    )
    return bytes(out)


def build_aes256_pdf(
    pages: list[str],
    user_pw: bytes = b"",
    owner_pw: bytes = b"owner",
    r: int = 6,
) -> bytes:
    """AES-256 /V 5 fixture (/R 5 AESV3 or /R 6 PDF-2.0): deterministic
    file key, spec-computed 48-byte /O and /U (verification hash +
    validation salt + key salt) and /OE /UE wrapped keys per ISO
    32000-2 Algorithms 8/9, every content stream AES-256-CBC under the
    FILE key (V5 has no per-object derivation). Written independently
    from the reader so the round-trip test exercises both directions."""
    from magictables_spark.sources import aes as _aes

    def esc(s: str) -> bytes:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)").encode("latin-1")

    seed = b"fixture-v5:" + str(pages).encode()
    file_key = hashlib.sha256(b"filekey:" + seed).digest()  # 32 bytes
    u_vsalt = hashlib.md5(b"uv:" + seed).digest()[:8]
    u_ksalt = hashlib.md5(b"uk:" + seed).digest()[:8]
    o_vsalt = hashlib.md5(b"ov:" + seed).digest()[:8]
    o_ksalt = hashlib.md5(b"ok:" + seed).digest()[:8]
    upwd, opwd = user_pw[:127], owner_pw[:127]
    # Algorithm 8: /U and /UE from the user password
    u = _hash_v5(r, upwd, u_vsalt) + u_vsalt + u_ksalt
    ue = _aes.cbc_encrypt(_hash_v5(r, upwd, u_ksalt), b"\x00" * 16, file_key)
    # Algorithm 9: /O and /OE from the owner password over the full /U
    o = _hash_v5(r, opwd, o_vsalt, u) + o_vsalt + o_ksalt
    oe = _aes.cbc_encrypt(_hash_v5(r, opwd, o_ksalt, u), b"\x00" * 16, file_key)
    p = -44
    id0 = hashlib.md5(b"fixture-id:" + seed).digest()

    objects: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())  # 2
    font_obj = 3 + 2 * n_pages
    for i, page in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        ops = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(page.split("\n")):
            if j:
                ops += b"0 -14 Td\n"
            ops += b"(" + esc(line) + b") Tj\n"
        ops += b"ET"
        plain = zlib.compress(bytes(ops)) if i % 2 else bytes(ops)
        filt = b" /Filter /FlateDecode" if i % 2 else b""
        iv = hashlib.md5(b"fixture-iv:%d" % content_num).digest()
        data = iv + _aes.cbc_encrypt(file_key, iv, _aes.pkcs7_pad(plain))
        objects.append(
            f"<< /Length {len(data)}".encode() + filt + b" >>\nstream\n" + data + b"\nendstream"
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    enc_num = len(objects) + 1
    objects.append(
        (
            f"<< /Filter /Standard /V 5 /R {r} /Length 256 /P {p} "
            "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
            "/StmF /StdCF /StrF /StdCF "
        ).encode()
        + b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> "
        + b"/OE <" + oe.hex().encode() + b"> /UE <" + ue.hex().encode() + b"> >>"
    )

    out = bytearray(b"%PDF-2.0\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R "
        f"/Encrypt {enc_num} 0 R /ID [<".encode()
        + id0.hex().encode()
        + b"> <"
        + id0.hex().encode()
        + b">] >>\n"
        + f"startxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return bytes(out)
