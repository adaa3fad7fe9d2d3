"""Property tests for the pure-Python PDF writer/extractor pair and
the separator chunker (no Spark session — pure functions)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_using_hugging_face_and_vector_database_spark.operators.chunker import (
    _split_separator,
)
from pdf_using_hugging_face_and_vector_database_spark.sources.pdf_text import (
    extract_pdf_pages_text,
    make_pdf,
)

# latin-1-encodable text with the characters that exercise PDF string
# escaping: parens, backslashes, newlines
_line = st.text(
    alphabet=st.sampled_from(
        list("abcdefghij ()\\/<>[]{}.#%éü0123456789")
    ),
    max_size=40,
)
_page = st.lists(_line, min_size=1, max_size=6).map("\n".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(_page, min_size=1, max_size=4), st.booleans())
def test_pdf_roundtrip_property(pages, compress):
    assert extract_pdf_pages_text(make_pdf(pages, compress=compress)) == pages


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet=list("ab def ghi "), max_size=300),
    st.integers(min_value=5, max_value=60),
    st.integers(min_value=0, max_value=4),
)
def test_split_separator_invariants(text, size, overlap):
    chunks = _split_separator(text, size, overlap, " ")
    if not text:
        assert chunks == []
        return
    # every split of the source appears, in order, across the chunks
    # (reconstruction modulo the overlap): concatenating chunks and
    # re-splitting must contain the source's splits as a subsequence
    src = text.split(" ")
    joined = " ".join(chunks).split(" ") if chunks else []
    it = iter(joined)
    assert all(any(s == j for j in it) for s in src), (src, chunks)
    # provable size bound: a chunk is emitted before the split that
    # would overflow it, but the retained overlap tail plus ONE split
    # may itself exceed `size` — the bound is
    # max(size, overlap + sep + longest split)
    bound = max(size, overlap + 1 + max((len(s) for s in src), default=0))
    for c in chunks:
        assert len(c) <= bound, (c, size, overlap, bound)
