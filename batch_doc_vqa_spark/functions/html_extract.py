"""Main-content extraction kernel: HTML tokenizer + block classifier.

This is the engine's analogue of the reference's per-document understanding
stage (batch-doc-vqa runs a VLM per page image — see
/root/reference/src/batch_doc_vqa/openrouter/inference.py:1175-2166 for the
per-row pipeline and /root/reference/src/batch_doc_vqa/openrouter/api.py:202-248
for its parse-cascade). Here the document is Common-Crawl-style HTML bytes and
the "model" is a deterministic Boilerpipe/Readability-style classifier:

1. tokenizer — single linear scan over the markup producing *blocks*
   (text runs delimited by block-level tags) annotated with tag label,
   enclosing boilerplate container, raw char count and anchor char count;
2. features — per-block word count, char count, link density; scored
   vectorized with NumPy across all blocks of a document;
3. classifier — precision pass (strict thresholds, boilerplate containers
   excluded, Boilerpipe-style neighborhood smoothing) with a trafilatura-style
   fallback: if the precision pass yields too little text, a recall pass with
   relaxed thresholds re-runs on the same block array;
4. output — extracted text (blocks joined by "\\n\\n") plus span offsets
   (start, end, label) into that text.

The kernel is a pure function of the input bytes: same bytes → byte-identical
text (the north-rule invariant). The Spark pandas UDFs in ``udfs.py`` call
exactly this code on Arrow batches, so the oracle and the engine cannot drift.
"""

from __future__ import annotations

import html as _html
import re
from dataclasses import dataclass

import numpy as np

from . import pdf_real
from .pdf_extract import SPDF_MAGIC, extract_spdf

# ---------------------------------------------------------------- tokenizer

# elements whose entire content is non-text
_STRIP_RE = re.compile(
    r"<(script|style|noscript|svg|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9]*)[^>]*?(/?)\s*>")
_WS_RE = re.compile(r"\s+")

# tags that terminate the current text block
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td th "
    "section article aside header footer nav blockquote pre br hr main form "
    "figure figcaption fieldset legend address center body html head title".split()
)
# containers whose content is boilerplate by position
_BOILER_CONTAINERS = frozenset("nav aside footer form".split())
_HEADER_CONTAINER = "header"
_HEADINGS = frozenset("h1 h2 h3 h4 h5 h6".split())
_LISTY = frozenset("li dt dd".split())
_CELLS = frozenset("td th".split())

# ---------------------------------------------------------------- thresholds

MIN_WORDS_STRICT = 8
MIN_WORDS_HEADING_STRICT = 2
MAX_LINK_DENSITY_STRICT = 0.33
MIN_WORDS_RELAXED = 3
MIN_WORDS_HEADING_RELAXED = 1
MAX_LINK_DENSITY_RELAXED = 0.66
# smoothing: weak-but-plausible blocks between two content blocks are kept
SMOOTH_MIN_WORDS = 3
SMOOTH_MAX_LINK_DENSITY = 0.5
# recall cascade triggers when the precision pass yields less than this
MIN_YIELD_CHARS = 150
# runaway-header repair: a real masthead is small. When "header" blocks hold
# more than this share of the document's chars AND more than this many
# non-heading blocks, the header tag was left unclosed (a common crawl
# pathology) and its contents are reclassified as ordinary body content.
HEADER_RUNAWAY_CHAR_SHARE = 0.5
HEADER_RUNAWAY_MIN_BLOCKS = 2


@dataclass
class ExtractResult:
    text: str
    spans: list[tuple[int, int, str]]  # (start, end, label) into ``text``
    status: str  # 'ok' | 'ok_recall' | 'empty' | 'pdf' | 'pdf_text' | 'unsupported_format' | 'error'
    error: str = ""


def _label_of(tag: str) -> str:
    if tag in _HEADINGS:
        return "heading"
    if tag in _LISTY:
        return "list"
    if tag in _CELLS:
        return "cell"
    return "para"


def _tokenize(doc: str) -> list[tuple[str, str, str, int, int]]:
    """Linear scan → raw blocks (tag, container, text, anchor_chars, chars).

    One pass over ``_TAG_RE.split`` output (interleaved [text, closing, tag,
    selfclose, text, ...] — no Match objects allocated), maintaining a
    boilerplate-container stack and an anchor depth; inline tags do not flush
    the current block.
    """
    doc = _STRIP_RE.sub(" ", doc)
    doc = _COMMENT_RE.sub(" ", doc)

    parts = _TAG_RE.split(doc)
    blocks: list[tuple[str, str, str, int, int]] = []
    container_stack: list[str] = []
    cur_tag, cur_container = "p", ""
    buf: list[str] = []
    anchor_chars = total = 0
    anchor_depth = 0

    def flush(next_tag: str) -> None:
        nonlocal buf, anchor_chars, total, cur_tag, cur_container
        if total:
            blocks.append((cur_tag, cur_container, "".join(buf), anchor_chars, total))
            buf = []
            anchor_chars = 0
            total = 0
        cur_tag = next_tag
        cur_container = container_stack[-1] if container_stack else ""

    text = parts[0]
    if text:
        buf.append(text)
        total = len(text)
    n = len(parts)
    idx = 1
    while idx + 2 < n:
        closing = parts[idx] == "/"
        tag = parts[idx + 1].lower()
        selfclose = parts[idx + 2] == "/"
        text = parts[idx + 3] if idx + 3 < n else ""
        idx += 4
        if tag == "a":
            if closing:
                if anchor_depth:
                    anchor_depth -= 1
            elif not selfclose:
                anchor_depth += 1
        elif tag in _BLOCK_TAGS:
            if tag in _BOILER_CONTAINERS or tag == _HEADER_CONTAINER:
                if closing:
                    flush("p")
                    if container_stack and container_stack[-1] == tag:
                        container_stack.pop()
                    cur_container = container_stack[-1] if container_stack else ""
                else:
                    flush(tag)
                    container_stack.append(tag)
                    cur_container = tag
            else:
                flush(tag if not closing else "p")
        if text:
            buf.append(text)
            total += len(text)
            if anchor_depth > 0:
                anchor_chars += len(text)
    flush("p")
    return blocks


def _normalize(raw: str) -> str:
    # early strip: whitespace-only fragments (the text between adjacent tags)
    # skip unescape + regex entirely. Equivalent to collapsing first: edge
    # whitespace dies either way, and entities can't span the strip boundary;
    # the final strip catches entity-introduced edge whitespace (&nbsp; → \xa0).
    raw = raw.strip()
    if not raw:
        return ""
    if "&" in raw:  # unescape only when an entity can exist (hot-path save)
        raw = _html.unescape(raw)
    return _WS_RE.sub(" ", raw).strip()


def _decode_markup(payload: bytes) -> str:
    """bytes → str honoring BOMs (a real crawl-corpus edge): UTF-8 BOM is
    stripped, UTF-16/32 BOMs select their codec; everything else decodes as
    UTF-8 with replacement (deterministic — same bytes, same string)."""
    if payload[:4] in (b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff"):
        return payload.decode("utf-32", errors="replace")
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return payload.decode("utf-16", errors="replace")
    if payload[:3] == b"\xef\xbb\xbf":
        payload = payload[3:]
    return payload.decode("utf-8", errors="replace")


def extract_html(payload: bytes | str) -> ExtractResult:
    """Extract main content from one HTML document. Pure and deterministic."""
    if isinstance(payload, bytes):
        doc = _decode_markup(payload)
    else:
        doc = payload
    raw_blocks = _tokenize(doc)
    if not raw_blocks:
        return ExtractResult("", [], "empty")

    texts: list[str] = []
    labels: list[str] = []
    n = 0
    words = []
    chars = []
    link_density = []
    boiler = []
    headerish = []
    heading = []
    for tag, container, raw, anchor_chars, total_chars in raw_blocks:
        t = _normalize(raw)
        if not t:
            continue
        texts.append(t)
        lab = _label_of(tag)
        labels.append(lab)
        words.append(len(t.split(" ")))
        chars.append(len(t))
        link_density.append(anchor_chars / total_chars if total_chars else 0.0)
        boiler.append(container in _BOILER_CONTAINERS)
        headerish.append(container == _HEADER_CONTAINER)
        heading.append(lab == "heading")
        n += 1
    if n == 0:
        return ExtractResult("", [], "empty")

    w = np.asarray(words, dtype=np.int64)
    ld = np.asarray(link_density, dtype=np.float64)
    is_boiler = np.asarray(boiler, dtype=bool)
    is_header = np.asarray(headerish, dtype=bool)
    is_heading = np.asarray(heading, dtype=bool)
    ch = np.asarray(chars, dtype=np.int64)

    # runaway-header repair (see HEADER_RUNAWAY_*): an unclosed <header>
    # swallows the rest of the document into the header container; a
    # "masthead" holding most of the text and several non-heading blocks is
    # not a masthead — demote its blocks to ordinary content
    if is_header.any():
        header_share = ch[is_header].sum() / ch.sum()
        non_heading_header_blocks = int((is_header & ~is_heading).sum())
        if (
            header_share > HEADER_RUNAWAY_CHAR_SHARE
            and non_heading_header_blocks > HEADER_RUNAWAY_MIN_BLOCKS
        ):
            is_header = np.zeros_like(is_header)

    def classify(min_words: int, min_words_heading: int, max_ld: float) -> np.ndarray:
        min_w = np.where(is_heading, min_words_heading, min_words)
        kept = (w >= min_w) & (ld <= max_ld) & ~is_boiler
        # header containers contribute only their headings (the headline)
        kept &= ~is_header | is_heading
        # Boilerpipe-style context smoothing: weak blocks flanked by content
        # (header/boilerplate containers are never rescued by context)
        quasi = (
            (w >= SMOOTH_MIN_WORDS)
            & (ld <= SMOOTH_MAX_LINK_DENSITY)
            & ~is_boiler
            & ~is_header
            & ~kept
        )
        if quasi.any() and kept.any():
            prev_kept = np.concatenate(([False], kept[:-1]))
            next_kept = np.concatenate((kept[1:], [False]))
            kept = kept | (quasi & prev_kept & next_kept)
        return kept

    kept = classify(MIN_WORDS_STRICT, MIN_WORDS_HEADING_STRICT, MAX_LINK_DENSITY_STRICT)
    status = "ok"
    if int(ch[kept].sum()) < MIN_YIELD_CHARS:
        relaxed = classify(MIN_WORDS_RELAXED, MIN_WORDS_HEADING_RELAXED, MAX_LINK_DENSITY_RELAXED)
        if int(ch[relaxed].sum()) > int(ch[kept].sum()):
            kept = relaxed
            status = "ok_recall"
    if not kept.any():
        return ExtractResult("", [], "empty")

    out: list[str] = []
    spans: list[tuple[int, int, str]] = []
    offset = 0
    for i in np.flatnonzero(kept):
        t = texts[i]
        if out:
            offset += 2  # "\n\n"
        spans.append((offset, offset + len(t), labels[i]))
        offset += len(t)
        out.append(t)
    return ExtractResult("\n\n".join(out), spans, status)


def extract_payload(payload: bytes) -> ExtractResult:
    """Dispatch on payload type: SPDF layout, real %PDF-, or HTML bytes.

    Real PDFs (what the reference rasterizes via ``pdf_to_imgs``,
    /root/reference/src/batch_doc_vqa/utils/image_processing.py:8-53) go to
    the text-layer parser; outside its supported subset they fail LOUDLY as
    ``status='unsupported_format'`` lineage rows — binary payloads are never
    fed to the HTML tokenizer (which would "extract" garbage with status ok).
    """
    try:
        if payload is None:
            return ExtractResult("", [], "empty")
        if payload[:2] == b"\x1f\x8b":  # gzip member (crawl payloads often are)
            import gzip as _gzip
            import zlib as _zlib

            try:
                payload = _gzip.decompress(payload)
            # the common real-world corruption modes raise three different
            # types: BadGzipFile(OSError) for bad magic/header, zlib.error
            # for a corrupt deflate body, EOFError for a truncated member —
            # all are the same taxonomy bucket: unsupported_format
            except (OSError, EOFError, _zlib.error) as exc:
                return ExtractResult("", [], "unsupported_format", f"gzip: {exc}")
        if payload[: len(SPDF_MAGIC)] == SPDF_MAGIC:
            text, spans = extract_spdf(payload)
            return ExtractResult(text, spans, "pdf")
        if pdf_real.looks_like_pdf(payload):
            try:
                text, spans = pdf_real.extract_pdf_text(payload)
                return ExtractResult(text, spans, "pdf_text")
            except pdf_real.UnsupportedPdf as exc:
                return ExtractResult("", [], "unsupported_format", str(exc))
        return extract_html(payload)
    except Exception as exc:  # record-and-continue: failures become lineage rows
        return ExtractResult("", [], "error", f"{type(exc).__name__}: {exc}")
