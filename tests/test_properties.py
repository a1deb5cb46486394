"""Property-based kernel tests (hypothesis): robustness + invariants the
golden fixtures can't enumerate — arbitrary byte soup never crashes, spans
always index exactly into the text, extraction is idempotent-deterministic."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# deterministic example generation: the driver's verify must see the same
# inputs every run (a flaky counterexample should arrive as a code change,
# not a CI surprise)
settings.register_profile("ci", derandomize=True)
settings.load_profile("ci")

from batch_doc_vqa_spark.functions import extract_html, extract_payload

TAGS = ["p", "div", "h1", "li", "nav", "aside", "footer", "a", "span", "table", "td", "br"]


@st.composite
def html_soup(draw):
    parts = []
    for _ in range(draw(st.integers(0, 25))):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(st.text(max_size=80)))
        elif kind == 1:
            parts.append(f"<{draw(st.sampled_from(TAGS))}>")
        elif kind == 2:
            parts.append(f"</{draw(st.sampled_from(TAGS))}>")
        else:
            parts.append("<script>x</script>" if draw(st.booleans()) else "<!-- c -->")
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(html_soup())
def test_spans_index_into_text(doc):
    r = extract_html(doc)
    assert r.status in ("ok", "ok_recall", "empty")
    for start, end, label in r.spans:
        assert 0 <= start <= end <= len(r.text)
        seg = r.text[start:end]
        assert seg == seg.strip()
        assert label in ("heading", "para", "list", "cell")
    # blocks joined by exactly \n\n and spans tile the text
    if r.spans:
        assert r.spans[0][0] == 0 and r.spans[-1][1] == len(r.text)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400))
def test_arbitrary_bytes_never_crash(payload):
    r1 = extract_payload(payload)
    r2 = extract_payload(payload)
    assert r1.text == r2.text and r1.spans == r2.spans and r1.status == r2.status


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_plain_text_roundtrip(text):
    # a document with no markup: output is whitespace-normalized input (or empty)
    r = extract_html(f"<p>{text}</p>")
    assert "\n\n" not in r.text or len(r.spans) > 1


# ---- vectorized-simhash == per-doc reference formulation ------------------


def _simhash_ref_one(t: str):
    """Per-doc reference formulation (the pre-vectorization kernel)."""
    import numpy as np
    import pandas as pd

    if not t:
        return 0
    toks = pd.Series(str(t).lower().split())
    if toks.empty:
        return 0
    from batch_doc_vqa_spark.operators.dedup import stable_token_hash64

    counts = toks.value_counts()
    hashes = stable_token_hash64(list(counts.index))
    w = counts.to_numpy(dtype=np.int64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
    score = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    return int(np.packbits(score > 0, bitorder="little").view(np.uint64)[0].view(np.int64))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(alphabet="ab cD\t", max_size=40), min_size=0, max_size=12))
def test_simhash_batch_matches_per_doc(texts):
    import numpy as np
    import pandas as pd

    from batch_doc_vqa_spark.operators.dedup import simhash_batch_kernel

    got = simhash_batch_kernel(pd.Series(texts)).to_numpy()
    exp = np.array([_simhash_ref_one(t) for t in texts], dtype=np.int64)
    assert np.array_equal(got, exp)


# ---- winnow kernel invariants ---------------------------------------------


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=120))
def test_winnow_fingerprints_are_substring_stable(text):
    """Winnow guarantees: every fingerprint is the hash of SOME k-gram of the
    text, count is bounded by number of windows, and the kernel is a pure
    function (same input → same output)."""
    from batch_doc_vqa_spark.operators.textstats import winnow_fingerprint_kernel

    a = winnow_fingerprint_kernel(text, 5, 4)
    b = winnow_fingerprint_kernel(text, 5, 4)
    assert a == b
    n = len(text) - 5 + 1
    if n <= 0:
        assert a == []
    else:
        assert 1 <= len(a) <= max(1, n)
