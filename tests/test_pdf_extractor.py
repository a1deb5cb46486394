from __future__ import annotations

from batch_doc_vqa_spark.functions import encode_spdf, extract_spdf
from batch_doc_vqa_spark.functions.pdf_extract import decode_spdf


def test_roundtrip():
    blocks = [((0.0, 0.0, 10.0, 5.0), "hello"), ((0.0, 20.0, 10.0, 25.0), "wörld ✓")]
    boxes, texts = decode_spdf(encode_spdf(blocks))
    assert texts == ["hello", "wörld ✓"]
    assert boxes.shape == (2, 4)


def test_single_column_reading_order():
    blocks = [
        ((10.0, 100.0, 200.0, 120.0), "second"),
        ((10.0, 10.0, 200.0, 30.0), "first"),
        ((10.0, 200.0, 200.0, 220.0), "third"),
    ]
    text, spans = extract_spdf(encode_spdf(blocks))
    assert text == "first\n\nsecond\n\nthird"
    assert [text[s:e] for s, e, _ in spans] == ["first", "second", "third"]
    assert all(lab == "pdf_block" for _, _, lab in spans)


def test_two_column_reads_column_major():
    # left column x:10-200, right column x:300-490; rows interleaved in y
    blocks = [
        ((300.0, 10.0, 490.0, 30.0), "R1"),
        ((10.0, 10.0, 200.0, 30.0), "L1"),
        ((10.0, 50.0, 200.0, 70.0), "L2"),
        ((300.0, 50.0, 490.0, 70.0), "R2"),
    ]
    text, _ = extract_spdf(encode_spdf(blocks))
    assert text == "L1\n\nL2\n\nR1\n\nR2"


def test_title_band_then_columns():
    # full-width title separated by a large gap, then two columns
    blocks = [
        ((10.0, 10.0, 490.0, 40.0), "TITLE"),
        ((300.0, 100.0, 490.0, 120.0), "R1"),
        ((10.0, 100.0, 200.0, 120.0), "L1"),
        ((10.0, 140.0, 200.0, 160.0), "L2"),
    ]
    text, _ = extract_spdf(encode_spdf(blocks))
    assert text == "TITLE\n\nL1\n\nL2\n\nR1"


def test_empty_payload():
    text, spans = extract_spdf(encode_spdf([]))
    assert text == "" and spans == []
