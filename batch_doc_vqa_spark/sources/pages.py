"""Seeded generator for the Common-Crawl-style ``pages`` table.

BASELINE.json's input_hint fixes the input shape: ``url:string,
warc_ts:timestamp, html:binary, text:string, lang:string``. The sandbox has no
crawl data, so this module synthesizes it — deterministically, the way the
reference generates its synthetic PDF suite from fixed seeds and difficulty
profiles (/root/reference/src/batch_doc_vqa/tools/generate_synthetic_pdf_task.py:23-45;
plan determinism asserted at /root/reference/tests/test_synthetic_benchmark_suite.py:49-66).

Key properties:

- **per-row determinism independent of partitioning**: row ``i`` under seed
  ``s`` is a pure function of ``(s, i)`` (sha256-keyed RNG), so the table is
  byte-identical no matter how many partitions generate it — the distributed
  generator is ``spark.range(n)`` → ``mapInPandas`` (no driver-side loop);
- **Zipf-skewed hosts**: a few hosts own most rows, so salted repartitioning
  has something real to fix;
- **difficulty profiles** ``clean / tabular / noisy_mixed`` mirroring the
  reference's suite, with link-farms, inline scripts, comments and malformed
  tags in the noisy tier;
- ~10% rows carry an SPDF binary layout payload instead of HTML, exercising
  the XY-cut path;
- the ``text`` column is deliberately stale/truncated — the extractor must
  work from ``html`` bytes, never trust the pre-extracted field.

``page_row(seed, i)`` additionally returns ``intent_text`` — the exact text a
correct extractor should recover on ``clean`` pages (golden assertions in
tests/test_html_extractor.py).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import random
from collections.abc import Iterator

import pandas as pd

from ..functions.pdf_extract import encode_spdf

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_BASE_TS = _dt.datetime(2025, 3, 1, tzinfo=_dt.timezone.utc)

_WORDS = (
    "archive baseline cascade density document engine fragment gradient harbor "
    "index journal kernel lattice manifold nucleus orbit partition quantum relay "
    "signal tensor uplink vector wavelet xenon yield zephyr anchor beacon circuit "
    "delta ember flux glyph horizon ingot joule karst lumen meridian nadir opal "
    "prism quartz rubric summit timber umbra vertex willow atlas bridge canyon "
    "draft estuary fjord garnet hollow isthmus jetty knoll ledge mesa notch oxbow "
    "plateau quarry ridge spur terrace upland vale wharf basin cove dune escarp "
    "floodplain gorge headland inlet lagoon moraine"
).split()

_LANG_MARKERS = {
    "en": ["the", "and", "with", "from", "that"],
    "de": ["und", "der", "nicht", "mit", "aber"],
    "fr": ["les", "dans", "avec", "pour", "mais"],
    "es": ["los", "para", "pero", "como", "donde"],
}
_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr", "es", "en"]

_N_HOSTS = 40
_HOSTS = [f"site{k:02d}.example.org" for k in range(_N_HOSTS)]
# Zipf-ish weights: host 0 owns ~20% of rows
_HOST_CUM = []
_acc = 0.0
_tot = sum(1.0 / (k + 1) ** 1.1 for k in range(_N_HOSTS))
for _k in range(_N_HOSTS):
    _acc += (1.0 / (_k + 1) ** 1.1) / _tot
    _HOST_CUM.append(_acc)

PROFILES = ("clean", "tabular", "noisy_mixed")
# Hard-mode tiers (VERDICT r3 #5), mirroring the reference generator's
# difficulty profiles (tools/generate_synthetic_pdf_task.py:23-45): drawn
# from an INDEPENDENT rng stream (key[8:16]) so enabling them left every
# non-hard row byte-identical to the previous fixture generation.
HARD_PROFILES = ("malformed_nest", "table_heavy", "near_empty")
HARD_FRACTION = 0.15
PDF_FRACTION = 0.10


def rows_for_sf(sf: float) -> int:
    """Scale-factor → row count (sf0.1 → 50k pages)."""
    return max(200, int(sf * 500_000))


def _sentence(rng: random.Random, lang: str, lo: int = 6, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    # sprinkle language markers so lang-ID heuristics have signal
    for _ in range(max(1, n // 4)):
        ws[rng.randrange(n)] = rng.choice(_LANG_MARKERS.get(lang, _LANG_MARKERS["en"]))
    return ws[0].capitalize() + " " + " ".join(ws[1:]) + "."


def _paragraph(rng: random.Random, lang: str, n_sent: tuple[int, int] = (2, 4)) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(rng.randint(*n_sent)))


def _nav_html(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS).capitalize()}</a></li>'
        for _ in range(rng.randint(4, 8))
    )
    return f"<nav><ul>{items}</ul></nav>"


def _link_farm(rng: random.Random) -> str:
    links = " ".join(
        f'<a href="/t/{rng.choice(_WORDS)}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a>'
        for _ in range(rng.randint(6, 14))
    )
    return f'<div class="related">{links}</div>'


def _footer_html(rng: random.Random) -> str:
    return (
        f'<footer><a href="/about">About</a> <a href="/privacy">Privacy</a>'
        f"<p>Copyright 2025 {rng.choice(_WORDS)} media group all rights reserved</p></footer>"
    )


def _malformed_nest_html(title: str, paras: list[str], rng: random.Random) -> str:
    """Hard tier 1: pathologically malformed nesting — unclosed divs/spans
    accumulating depth, crossed inline tags (<b><i></b></i>), stray closers,
    never-closed body/html. A stack-strict parser chokes; the extractor's
    linear tokenizer must still recover every paragraph."""
    out = [f"<header><h1>{title}</h1>"]  # header never closed
    for p in paras:
        opens = "".join(f"<div class=l{k}><span>" for k in range(rng.randint(1, 3)))
        words = p.split(" ")
        mid = len(words) // 2
        crossed = (
            " ".join(words[:mid]) + " <b>bold <i>both</b> italic</i> " + " ".join(words[mid:])
        )
        out.append(f"{opens}<p>{crossed}")
        if rng.random() < 0.5:
            out.append("</div></div></div></span>")  # mismatched strays
    return "<html><body>" + "".join(out)


def _table_heavy_html(title: str, paras: list[str], rng: random.Random) -> str:
    """Hard tier 2: 2000s-style layout-table page — three levels of nested
    tables, real content in inner cells surrounded by ad/link junk cells."""
    def ad() -> str:
        return f'<td><a href="/ad">{rng.choice(_WORDS)}</a></td>'

    content_rows = "".join(f"<tr><td><p>{p}</p></td>{ad()}</tr>" for p in paras)
    junk_rows = "".join(f"<tr>{ad()}{ad()}{ad()}</tr>" for _ in range(rng.randint(4, 8)))
    inner = f"<table>{content_rows}</table>"
    mid = f"<table><tr><td>{inner}</td><td>{_link_farm(rng)}</td></tr>{junk_rows}</table>"
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<table><tr><td>{_nav_html(rng)}</td></tr><tr><td><h1>{title}</h1>{mid}</td></tr>"
        f"<tr><td>{_footer_html(rng)}</td></tr></table></body></html>"
    )


def _near_empty_html(title: str, paras: list[str], rng: random.Random) -> str:
    """Hard tier 3: near-empty markup — bare text separated by <br> runs,
    HTML entities in the text, no <p>/<div> structure, nothing closed."""
    blocks = [title] + [p.replace(" ", " &amp; ", 1) for p in paras[:1]] + paras[1:]
    sep = "<br><br>" if rng.random() < 0.5 else "\n<br>\n<br>\n"
    return "<html><body>" + sep.join(blocks)


def page_row(seed: int, i: int) -> dict:
    """Pure function (seed, i) → one pages row (+ profile/intent metadata)."""
    key = hashlib.sha256(f"pages:{seed}:{i}".encode()).digest()
    rng = random.Random(int.from_bytes(key[:8], "big"))
    u = rng.random()
    host = _HOSTS[next(k for k, c in enumerate(_HOST_CUM) if u <= c or k == _N_HOSTS - 1)]
    lang = rng.choice(_LANGS)
    url = f"https://{host}/{rng.choice(_WORDS)}/{rng.choice(_WORDS)}-{i}"
    ts = _BASE_TS + _dt.timedelta(seconds=i * 7 + rng.randrange(0, 6))
    is_pdf = rng.random() < PDF_FRACTION
    profile = rng.choice(PROFILES)

    title = " ".join(rng.choice(_WORDS).capitalize() for _ in range(rng.randint(3, 5)))
    paras = [_paragraph(rng, lang) for _ in range(rng.randint(3, 7))]
    intent_blocks = [title] + paras

    if is_pdf:
        # 1- or 2-column layout, blocks stacked with ≥8pt gaps
        cols = rng.choice([1, 1, 2])
        blocks = []
        texts = [title] + paras
        for j, t in enumerate(texts):
            col = 0 if cols == 1 or j <= len(texts) // 2 else 1
            row_in_col = j if col == 0 else j - (len(texts) // 2 + 1)
            x0 = 40.0 + col * 300.0
            y0 = 50.0 + row_in_col * 60.0
            blocks.append(((x0, y0, x0 + 250.0, y0 + 40.0), t))
        payload = encode_spdf(blocks)
        intent = "\n\n".join(t for _, t in sorted(blocks, key=lambda b: (b[0][0] >= 300.0, b[0][1], b[0][0])))
        return {
            "url": url, "warc_ts": ts, "html": payload,
            "text": "", "lang": lang, "profile": "pdf", "intent_text": intent,
        }

    body = [_nav_html(rng), f"<header><h1>{title}</h1></header>", '<div class="content">']
    if profile == "clean":
        body += [f"<p>{p}</p>" for p in paras]
    elif profile == "tabular":
        cells = "".join(
            f"<tr><td>{rng.choice(_WORDS)}</td><td>{rng.randint(0, 999)}</td></tr>" for _ in range(rng.randint(3, 6))
        )
        mid = len(paras) // 2
        body += [f"<p>{p}</p>" for p in paras[:mid]]
        body += [f"<table>{cells}</table>"]
        body += [f"<p>{p}</p>" for p in paras[mid:]]
    else:  # noisy_mixed
        for j, p in enumerate(paras):
            if j % 2 == 1:
                body.append(_link_farm(rng))
                body.append(f"<script>var x_{j} = track('{rng.choice(_WORDS)}');</script>")
                body.append(f"<!-- rendered {rng.choice(_WORDS)} -->")
            body.append(f"<p>{p}</p>")
            if rng.random() < 0.3:
                body.append(f"<div class=badnest><span>{rng.choice(_WORDS)}")  # malformed: unclosed
    body.append("</div>")
    body.append(f'<aside>{_link_farm(rng)}<p>{rng.choice(_WORDS)} promo {rng.choice(_WORDS)}</p></aside>')
    body.append(_footer_html(rng))
    html_doc = (
        f"<html><head><title>{title}</title><style>.x{{color:red}}</style>"
        f'<script src="/bundle.js"></script></head><body>{"".join(body)}</body></html>'
    )
    stale = paras[0][: rng.randint(20, 60)] if rng.random() < 0.5 else ""

    # hard-mode override AFTER all rng draws: the independent rng2 stream
    # decides hard membership, so url/ts/lang/title/paras/stale of every row
    # — and every byte of every NON-hard row — are unchanged by this tier
    rng2 = random.Random(int.from_bytes(key[8:16], "big"))
    if rng2.random() < HARD_FRACTION:
        profile = HARD_PROFILES[rng2.randrange(len(HARD_PROFILES))]
        builder = {
            "malformed_nest": _malformed_nest_html,
            "table_heavy": _table_heavy_html,
            "near_empty": _near_empty_html,
        }[profile]
        html_doc = builder(title, paras, rng2)

    return {
        "url": url, "warc_ts": ts, "html": html_doc.encode("utf-8"),
        "text": stale, "lang": lang, "profile": profile,
        "intent_text": "\n\n".join(intent_blocks),
    }


def _gen_batch(ids, seed: int) -> pd.DataFrame:
    rows = [page_row(seed, int(i)) for i in ids]
    return pd.DataFrame(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )


def pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic generation: spark.range(n) → mapInPandas.

    Partition-count-independent output (row i depends only on (seed, i)).
    """
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_batch(b["id"].to_numpy(), seed)

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=PAGES_SCHEMA)
