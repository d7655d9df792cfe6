"""Real PDF text extraction (F4): from-scratch reader for linear PDFs
with Flate content streams (reference parity target: PyPDF2
extract_text over all pages, content_processor.py:236-268), plus the
BT/ET-marker stub fallback the fixture's report1.pdf uses."""

from __future__ import annotations

import zlib

from wormpy_spark.fixtures.webgen import generate_corpus
from wormpy_spark.functions.extract import pdf_info, pdf_stub_text, pdf_text
from wormpy_spark.operators.fetch import process_row


def _flate_pdf(content: bytes) -> bytes:
    comp = zlib.compress(content)
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + comp
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )


def test_flate_stream_tj():
    body = _flate_pdf(b"BT /F1 12 Tf 72 712 Td (hello world) Tj ET")
    assert pdf_text(body) == "hello world"


def test_multiple_text_blocks_and_streams():
    body = (
        _flate_pdf(b"BT (first) Tj ET junk BT (-second) Tj ET")[:-6]  # strip %%EOF
        + _flate_pdf(b"BT (-third) Tj ET")
    )
    assert pdf_text(body) == "first-second-third"


def test_uncompressed_stream_and_tj_array():
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 44 >>\nstream\n"
        b"BT [(a) -120 (b)] TJ (c) Tj ET"
        b"\nendstream\nendobj\n%%EOF"
    )
    assert pdf_text(body) == "abc"


def test_escapes_and_octal():
    body = _flate_pdf(rb"BT (par\(en\) o\053k\\) Tj ET")  # \053 = '+'
    assert pdf_text(body) == "par(en) o+k\\"


def test_stub_fallback_unchanged():
    body = b"%PDF-1.4\nBT plain marker text ET\n%%EOF"
    assert pdf_text(body) == "plain marker text"
    assert pdf_stub_text(body) == "plain marker text"


def test_corrupt_flate_falls_back_empty():
    body = (
        b"%PDF-1.4\n<< /Filter /FlateDecode >>\nstream\n"
        b"not-zlib-data\nendstream\n%%EOF"
    )
    assert pdf_text(body) == ""


def test_fixture_report2_extracts_through_engine_path():
    corpus = generate_corpus(seed=5, n_hosts=1, pages_per_host=5)
    web = corpus["web"]
    row = web[web["url_norm"] == "https://host0.test/doc/report2.pdf"].iloc[0]
    out = process_row(
        {
            "seq": 0, "round": 0, "url_norm": row["url_norm"],
            "host": "host0.test", "host_shard": 0,
            "status": int(row["status"]), "content_type": row["content_type"],
            "body": bytes(row["body"]), "fail_attempts": 0,
            "selenium_fail_attempts": 0, "raise_in_loop": False,
            "dynamic_body": None, "dynamic_links": None, "image_id": None,
        },
        True,
    )
    assert out["error"] is None
    assert out["text"].startswith("compressed report of host0.test:")
    assert "stream" not in out["text"]
    # F3 PDF half: trailer /Info doc-info merged into metadata with
    # PyPDF2-style '/Title' keys (reference content_processor.py:177-184)
    assert out["metadata"]["/Title"] == "Compressed Report host0.test"
    assert out["metadata"]["/Author"] == "wormpy fixtures"
    assert out["metadata"]["url"] == row["url_norm"]


def test_pdf_info_parsing():
    # report1 (marker-style) carries a parseable trailer Info too
    corpus = generate_corpus(seed=5, n_hosts=1, pages_per_host=5)
    web = corpus["web"]
    row = web[web["url_norm"] == "https://host0.test/doc/report1.pdf"].iloc[0]
    info = pdf_info(bytes(row["body"]))
    assert info == {
        "/Title": "Annual Report host0.test",
        "/Author": "wormpy fixtures",
        "/Producer": "webgen",
    }
    # escapes inside literals, /Name values, UTF-16BE text strings
    body = (
        b"%PDF-1.4\n3 0 obj\n<< /Title (a \\(b\\) c) /Trapped /False"
        b" /Subject (\xfe\xff\x00h\x00i) >>\nendobj\n"
        b"trailer << /Info 3 0 R >>\n%%EOF"
    )
    assert pdf_info(body) == {
        "/Title": "a (b) c", "/Trapped": "False", "/Subject": "hi"
    }
    # absent or dangling Info → {} (reference catches + skips)
    assert pdf_info(b"%PDF-1.4\n%%EOF") == {}
    assert pdf_info(b"%PDF-1.4\ntrailer << /Info 4 0 R >>\n%%EOF") == {}
