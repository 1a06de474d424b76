"""PDF text extraction tests (sources/pdf_text.py): golden round trip
through the fixture writer, filter/escape/ordering edge cases, and the
PDFSource one-row-per-page contract (reference sources.py:122-150)."""

from __future__ import annotations

import zlib

import pytest

from magictables_spark.sources import PDFSource
from magictables_spark.sources.pdf_text import (
    UnsupportedPdfError,
    build_simple_pdf,
    extract_pdf_pages,
)


def test_two_page_roundtrip():
    pdf = build_simple_pdf(["Hello first page", "Second page here"])
    pages = extract_pdf_pages(pdf)
    assert len(pages) == 2
    assert pages[0] == "Hello first page"
    assert pages[1] == "Second page here"


def test_multiline_and_flate_page():
    # page 0 raw, page 1 FlateDecode (compress_from=1 default)
    pdf = build_simple_pdf(["line one\nline two\nline three", "compressed\ncontent"])
    assert b"/FlateDecode" in pdf
    pages = extract_pdf_pages(pdf)
    assert pages[0].split("\n") == ["line one", "line two", "line three"]
    assert pages[1].split("\n") == ["compressed", "content"]


def test_escapes_and_parens():
    text = r"paren (nested) and \ backslash 50% (a)(b)"
    pages = extract_pdf_pages(build_simple_pdf([text]))
    assert pages[0] == text


def test_tj_array_and_hex_strings():
    # hand-built content: TJ with kern gaps + hex string Tj
    content = b"BT /F1 12 Tf [ (Hel) -20 (lo) -500 (world) ] TJ ET\nBT <68692074686572> Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    pages = extract_pdf_pages(pdf)
    # small kern (-20) joins, large kern (-500) becomes a space
    assert "Hello world" in pages[0]
    assert "hi ther" in pages[0]


def test_page_order_follows_kids_not_object_numbers():
    pdf = build_simple_pdf(["alpha", "beta", "gamma"])
    # reverse the /Kids array: document order must follow Kids
    assert b"/Kids [3 0 R 5 0 R 7 0 R]" in pdf
    flipped = pdf.replace(b"/Kids [3 0 R 5 0 R 7 0 R]", b"/Kids [7 0 R 5 0 R 3 0 R]")
    assert extract_pdf_pages(flipped) == ["gamma", "beta", "alpha"]


def test_rejects_non_pdf_encrypted_and_objstm():
    with pytest.raises(UnsupportedPdfError):
        extract_pdf_pages(b"not a pdf")
    pdf = build_simple_pdf(["x"])
    with pytest.raises(UnsupportedPdfError):
        extract_pdf_pages(pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"))
    objstm = b"%PDF-1.5\n9 0 obj\n<< /Type /ObjStm >>\nstream\n" + zlib.compress(b"x") + b"\nendstream\nendobj\n"
    with pytest.raises(UnsupportedPdfError):
        extract_pdf_pages(objstm)


def test_pdf_source_one_row_per_page():
    pdf = build_simple_pdf(["page A", "page B"])
    src = PDFSource("http://example.com/doc.pdf", fetcher=lambda url, params=None: pdf)
    rows = src.fetch_data()
    assert rows == [{"page_content": "page A"}, {"page_content": "page B"}]
    assert src.get_type() == "pdf"
    assert src.get_identifier() == "http://example.com/doc.pdf"

def test_literal_string_non_octal_escapes_ignored_backslash():
    r"""Per the PDF spec, a backslash before a non-escape char is
    dropped: \8 -> '8', \9 -> '9' — must not crash int(x, 8).
    Content is hand-built: build_simple_pdf would escape the
    backslashes and never exercise this path."""
    content = rb"BT (code \8 and \9 and \123 octal) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    pages = extract_pdf_pages(pdf)
    # \123 IS octal (= 'S'); \8 and \9 fall through with backslash dropped
    assert "code 8 and 9 and" in pages[0]
    assert "S octal" in pages[0]


def test_malformed_hex_string_is_unsupported_pdf_error():
    content = b"BT <68692ZZ> Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(UnsupportedPdfError):
        extract_pdf_pages(pdf)


def test_objstm_page_tree_extracts_all_pages():
    """PDF-1.5 object streams: catalog/pages/page dicts live inside a
    FlateDecode /ObjStm container (the modern linearized layout the
    reference handles via PyPDF2); both pages must extract in order."""
    from magictables_spark.sources.pdf_text import build_objstm_pdf

    pdf = build_objstm_pdf(["compressed first page", "compressed second page"])
    pages = extract_pdf_pages(pdf)
    assert pages == ["compressed first page", "compressed second page"]


def test_objstm_top_level_object_wins():
    """An incremental update appending a top-level object with the same
    number must override the ObjStm-packed original."""
    from magictables_spark.sources.pdf_text import build_objstm_pdf

    pdf = build_objstm_pdf(["original text"])
    updated = (
        pdf
        + b"10 0 obj\n<< /Length 36 >>\nstream\nBT /F1 12 Tf (updated text) Tj ET\nendstream\nendobj\n"
        b"trailer\n<< /Size 31 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_pages(updated) == ["updated text"]


def test_rc4_spec_vector():
    """Public RC4 test vector (key 'Key', plaintext 'Plaintext') — the
    cipher is validated independently of the PDF machinery, so the
    encrypt-fixture/decrypt-reader round trip below can't pass on a
    shared cipher bug."""
    from magictables_spark.sources.pdf_text import _rc4

    assert _rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert _rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert _rc4(b"Key", bytes.fromhex("bbf316e8d940af0ad3")) == b"Plaintext"


def test_rc4_encrypted_roundtrip_r3():
    """Owner-locked (empty user password) /R 3 128-bit file: the common
    'encrypted' PDF in the wild. Both raw and Flate streams decrypt."""
    from magictables_spark.sources.pdf_text import build_rc4_pdf

    pages = ["secret page one", "secret page two\nwith a second line"]
    out = extract_pdf_pages(build_rc4_pdf(pages, r=3, key_bits=128))
    assert out[0] == "secret page one"
    assert "second line" in out[1]


def test_rc4_encrypted_roundtrip_r2_40bit():
    from magictables_spark.sources.pdf_text import build_rc4_pdf

    out = extract_pdf_pages(build_rc4_pdf(["legacy forty bit"], r=2, key_bits=40))
    assert out == ["legacy forty bit"]


def test_rc4_user_password_protected_raises():
    """Non-empty USER password cannot be decrypted without the password:
    must refuse loudly, never emit garbage text."""
    from magictables_spark.sources.pdf_text import build_rc4_pdf

    pdf = build_rc4_pdf(["cannot read me"], user_pw=b"hunter2", r=3, key_bits=128)
    with pytest.raises(UnsupportedPdfError, match="password"):
        extract_pdf_pages(pdf)


def test_aes_crypt_filter_raises():
    """/V 4 (AESV2 crypt filters) is beyond RC4 support: refuse."""
    from magictables_spark.sources.pdf_text import build_rc4_pdf

    pdf = build_rc4_pdf(["x"], r=3, key_bits=128)
    pdf = pdf.replace(b"/V 2 /R 3", b"/V 4 /R 4")
    with pytest.raises(UnsupportedPdfError, match="AES"):
        extract_pdf_pages(pdf)


def test_invalid_key_length_refuses():
    """Fuzz-found: a corrupted /Length below 40 bits derives an empty
    RC4 key, which crashed key scheduling (i % 0) instead of refusing."""
    from magictables_spark.sources.pdf_text import build_rc4_pdf

    pdf = build_rc4_pdf(["x"], r=3, key_bits=128)
    pdf = pdf.replace(b"/Length 128", b"/Length 4")
    with pytest.raises(UnsupportedPdfError, match="Length"):
        extract_pdf_pages(pdf)


def test_unterminated_hex_string_in_encrypt_dict_refuses():
    """Fuzz-found: a /U hex string with NO closing '>' anywhere after it
    escaped as a bare ValueError from bytes.index instead of the
    UnsupportedPdfError contract."""
    from magictables_spark.sources.pdf_text import _string_value

    with pytest.raises(UnsupportedPdfError, match="unterminated"):
        _string_value(b"/Filter /Standard /U <25d51e56a778", b"U")


def test_stream_span_prefers_length_over_embedded_endstream():
    """ADVICE r3: a payload whose BYTES contain '\\nendstream' (routine in
    Flate or RC4 output) must be delimited by the dict's direct /Length,
    not the first endstream match — otherwise the payload is silently
    truncated, breaking the 'never silently wrong text' contract."""
    from magictables_spark.sources.pdf_text import _stream_payload_span

    payload = b"AAAA\nendstream\nBBBB"
    body = (
        b"<< /Length %d >>\nstream\n" % len(payload)
        + payload
        + b"\nendstream"
    )
    span = _stream_payload_span(body)
    assert span is not None
    assert body[span[0] : span[1]] == payload
    # regex fallback still works when /Length is absent or indirect
    body2 = b"<< /Length 7 0 R >>\nstream\nCCCC\nendstream"
    span2 = _stream_payload_span(body2)
    assert span2 is not None and body2[span2[0] : span2[1]] == b"CCCC"


def test_scan_objects_survives_endobj_bytes_inside_stream():
    """An object whose stream payload contains 'endobj'/'endstream' and
    even a fake 'N G obj' header must not corrupt the object table when
    /Length delimits it."""
    from magictables_spark.sources.pdf_text import _scan_objects

    payload = b"xx endobj yy\nendstream\n9 0 obj zz"
    data = (
        b"1 0 obj\n<< /Length %d >>\nstream\n" % len(payload)
        + payload
        + b"\nendstream\nendobj\n"
        + b"2 0 obj\n<< /Type /Page >>\nendobj\n"
    )
    objs = _scan_objects(data)
    assert set(objs) == {1, 2}
    assert payload in objs[1][1]
    assert b"/Type /Page" in objs[2][1]


def test_extract_with_literal_endstream_text_in_content():
    """End-to-end: a page whose VISIBLE TEXT is the word 'endstream'
    round-trips — the content stream contains the literal bytes but the
    correct /Length keeps extraction exact."""
    text = "before endstream after\nendobj on line two"
    pages = extract_pdf_pages(build_simple_pdf([text], compress_from=99))
    assert pages[0] == text


def test_rc4_encrypted_stream_with_length_delimiters():
    """Encrypted path: build_rc4_pdf emits direct /Length dicts; the
    decryptor must use them (ciphertext bytes are adversarially random —
    at corpus scale some file WILL contain '\\nendstream')."""
    from magictables_spark.sources.pdf_text import build_rc4_pdf

    text = "secret endstream words"
    pages = extract_pdf_pages(build_rc4_pdf([text], r=3, key_bits=128))
    assert pages[0] == text


# ---------------------------------------------------------------------------
# AES-128 /V 4 crypt filters (round 4)
# ---------------------------------------------------------------------------


def test_aes_core_fips_197_vectors():
    """Pin the pure-stdlib AES core to the public FIPS-197 vectors
    (Appendix C.1 + Appendix B) and an SP 800-38A CBC block."""
    from magictables_spark.sources import aes

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes.encrypt_block(key, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes.decrypt_block(key, ct) == pt
    key2 = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt2 = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    assert aes.encrypt_block(key2, pt2).hex() == "3925841d02dc09fbdc118597196a0b32"
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    p1 = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    c1 = aes.cbc_encrypt(key2, iv, p1)
    assert c1.hex() == "7649abac8119b246cee98e9b12e9197d"
    assert aes.cbc_decrypt(key2, iv, c1) == p1


def test_aes_pkcs7_strictness():
    from magictables_spark.sources import aes

    assert aes.pkcs7_unpad(aes.pkcs7_pad(b"abc")) == b"abc"
    assert aes.pkcs7_unpad(aes.pkcs7_pad(b"x" * 16)) == b"x" * 16
    with pytest.raises(ValueError):
        aes.pkcs7_unpad(b"A" * 15 + b"\x00")  # pad byte 0 invalid
    with pytest.raises(ValueError):
        aes.pkcs7_unpad(b"A" * 14 + b"\x03\x02")  # inconsistent run


def test_aes_encrypted_pdf_roundtrip():
    """/V 4 /R 4 AESV2 fixture (raw + FlateDecode pages) decrypts to the
    exact text — the PyPDF2+pycryptodome capability of the reference
    (sources.py:122-150) in pure stdlib."""
    from magictables_spark.sources.pdf_text import build_aes_pdf

    pages = ["Hello AES world", "page two\nsecond line", "third (page) 50%"]
    got = extract_pdf_pages(build_aes_pdf(pages))
    assert got == pages


def test_aes_pdf_user_password_refuses():
    from magictables_spark.sources.pdf_text import build_aes_pdf

    pdf = build_aes_pdf(["secret"], user_pw=b"hunter2")
    with pytest.raises(UnsupportedPdfError, match="password"):
        extract_pdf_pages(pdf)


def test_aes_corrupt_ciphertext_refuses_not_garbage():
    """Flipping ciphertext bytes must surface as a refusal (strict
    PKCS#7 / length checks), never as silently-wrong extracted text."""
    from magictables_spark.sources.pdf_text import build_aes_pdf

    pdf = bytearray(build_aes_pdf(["only page"]))
    # truncate one byte off the first AES stream payload: breaks the
    # 16-byte alignment the spec guarantees
    i = pdf.find(b"stream\n")
    j = pdf.find(b"\nendstream", i)
    del pdf[j - 1]
    with pytest.raises(UnsupportedPdfError):
        extract_pdf_pages(bytes(pdf))


def test_aes256_v5_r5_roundtrip():
    """/V 5 /R 5 (AESV3) fixture decrypts to the exact text: SHA-256
    key derivation + /UE unwrap + file-key AES-256-CBC streams —
    completing PyPDF2+pycryptodome parity (reference sources.py:122-150)."""
    from magictables_spark.sources.pdf_text import build_aes256_pdf

    pages = ["Hello AES-256 world", "page two\nsecond line", "third (page) 50%"]
    assert extract_pdf_pages(build_aes256_pdf(pages, r=5)) == pages


def test_aes256_v5_r6_hardened_hash_roundtrip():
    """/R 6 (PDF 2.0) uses the iterated Algorithm 2.B hash — one page
    keeps the >=64-round AES-heavy derivation affordable in CI."""
    from magictables_spark.sources.pdf_text import build_aes256_pdf

    pages = ["R6 hardened (hash) page"]
    assert extract_pdf_pages(build_aes256_pdf(pages, r=6)) == pages


def test_aes256_user_password_refuses():
    from magictables_spark.sources.pdf_text import build_aes256_pdf

    pdf = build_aes256_pdf(["secret"], user_pw=b"hunter2", r=5)
    with pytest.raises(UnsupportedPdfError, match="password"):
        extract_pdf_pages(pdf)


def test_aes256_owner_password_unwraps_same_key():
    """Algorithm 2.A owner branch: hashing over /O with the full /U
    string unwraps the SAME 32-byte file key as the user branch."""
    import re

    from magictables_spark.sources.pdf_text import (
        _dict_part,
        _encryption_key,
        _parse_encrypt,
        _scan_objects,
        build_aes256_pdf,
    )

    data = build_aes256_pdf(["owner test"], user_pw=b"userpw", owner_pw=b"bosspw", r=5)
    raw = _scan_objects(data)
    enc_num = int(re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", data).group(1))
    enc = _parse_encrypt(_dict_part(raw[enc_num][1]), data)
    k_user = _encryption_key(enc, b"userpw")
    k_owner = _encryption_key(enc, b"bosspw")
    assert k_user == k_owner and len(k_user) == 32
    with pytest.raises(UnsupportedPdfError, match="password"):
        _encryption_key(enc, b"wrong")


def test_aes256_corrupt_ue_refuses_not_garbage():
    """A tampered /UE yields a wrong file key; the strict PKCS#7 strip
    must surface that as a refusal, never silently-wrong text."""
    from magictables_spark.sources.pdf_text import build_aes256_pdf

    pdf = bytearray(build_aes256_pdf(["only page"], r=5))
    i = pdf.find(b"/UE <")
    pdf[i + 5] = ord("f") if pdf[i + 5] != ord("f") else ord("0")
    pdf[i + 6] = ord("f") if pdf[i + 6] != ord("f") else ord("0")
    with pytest.raises(UnsupportedPdfError):
        extract_pdf_pages(bytes(pdf))


def test_aes_192_256_block_vectors():
    """FIPS-197 Appendix C.2 / C.3 pin the widened key schedule."""
    from magictables_spark.sources import aes

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k192 = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    assert aes.encrypt_block(k192, pt).hex() == "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert aes.encrypt_block(k256, pt).hex() == "8ea2b7ca516745bfeafc49904b496089"
    for k in (k192, k256):
        assert aes.decrypt_block(k, aes.encrypt_block(k, pt)) == pt


def test_aes_pdf_source_rows(spark):
    """PDFSource over an AES-encrypted PDF: one row per page."""
    from magictables_spark.sources.pdf_text import build_aes_pdf

    data = build_aes_pdf(["alpha", "beta"])
    src = PDFSource("http://x/enc.pdf", fetcher=lambda url, params=None: data)
    rows = src.fetch_data()
    assert [r["page_content"] for r in rows] == ["alpha", "beta"]


def test_aes_cf_dict_before_toplevel_length():
    """Acrobat layout: the /CF <</StdCF <</CFM /AESV2 /Length 16>>>>
    subdictionary precedes the top-level /Length 128. The CF /Length is
    in BYTES (ISO 32000-1 Table 25); naively taking the first /Length
    match reads 16 and refuses a perfectly valid file (round-4
    advisory, verified by experiment)."""
    from magictables_spark.sources.pdf_text import build_aes_pdf

    pages = ["cf-first layout page"]
    pdf = build_aes_pdf(pages)
    old = (
        b"/V 4 /R 4 /Length 128 /P -44 "
        b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
    )
    new = (
        b"/V 4 /R 4 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        b"/Length 128 /P -44 "
    )
    assert old in pdf, "fixture layout changed; update this test"
    assert extract_pdf_pages(pdf.replace(old, new)) == pages


def test_aes_no_toplevel_length_defaults_128():
    """Legal per ISO 32000-1 for /V 4: the top-level /Length may be
    omitted entirely (the CF subdict carries the key length). AESV2's
    only legal key length is 128 bits — default to it."""
    from magictables_spark.sources.pdf_text import build_aes_pdf

    pages = ["no top-level length"]
    pdf = build_aes_pdf(pages)
    old = b"/V 4 /R 4 /Length 128 /P -44 "
    new = b"/V 4 /R 4 /P -44 "
    assert old in pdf, "fixture layout changed; update this test"
    assert extract_pdf_pages(pdf.replace(old, new)) == pages


def test_aes_zero_length_stream_is_empty_not_refusal():
    """Some writers emit genuinely empty streams inside encrypted files;
    a 0-byte AES payload is empty plaintext (there is no ciphertext),
    not a malformed-stream refusal that aborts the whole document
    (round-4 advisory)."""
    from magictables_spark.sources.pdf_text import _decrypt_body_streams

    body = b"<< /Length 0 >>\nstream\n\nendstream"
    out = _decrypt_body_streams(body, b"k" * 16, 7, 0, cfm="aesv2")
    assert out == body


def test_aes256_objstm_combination_roundtrip():
    """/V 5 encryption + /ObjStm page tree in one file: decrypt ->
    inflate -> object-stream expansion as a single path (the modern
    encrypted-writer layout; closes the COVERAGE.md 'untested combo'
    row)."""
    from magictables_spark.sources.pdf_text import build_aes256_objstm_pdf

    pages = ["encrypted objstm page one", "and (page) two", "third\nmultiline"]
    assert extract_pdf_pages(build_aes256_objstm_pdf(pages)) == pages
