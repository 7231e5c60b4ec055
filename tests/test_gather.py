"""Streaming gatherer (pipeline/gather.py) must produce extraction output
identical to the DOM path (parse_document + heuristics walk) — including
repair flows: multi-root shell wraps, re-wraps after stray ends, root-level
tails, kept-buffer concat quirks."""
import pytest

from tests.conftest import (EXTRA_PAYLOADS, PARSER_FIXTURES,
                            dirty_html_corpus, norm_error)
from pyxml_spark.engine.parse import parse_document
from pyxml_spark.pipeline.gather import gather_document
from pyxml_spark.pipeline.heuristics import (extract_main, score_fragments,
                                             select_main)

hypothesis = pytest.importorskip('hypothesis')
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

CHUNKS = st.sampled_from([
    '<', '>', '/', '=', '"', "'", ' ', '\n', '!', '?', '-', '&', 'a', 'p',
    'div', 'nav', '<p>', '</p>', '</em>', '</td>', '</document>', '<div ',
    'class', '="v"', 'text', '&amp;', '<!--', '-->', '<a', '</', '<script>',
    '</script>', '<li>', '<td ', 'q&a', 'é', 'ab="v"', 'bare', '<aside>',
    'footer', '<ul>', '</ul>', 'id="nav"', '<style>', '</style>',
])
payloads = st.lists(CHUNKS, min_size=0, max_size=35).map(
    lambda parts: ''.join(parts).encode())


def via_dom(payload: bytes):
    root = parse_document(payload, mode='html', fix_broken=True,
                          track_spans=True)
    return extract_main(root)


def via_stream(payload: bytes):
    frags, block_boiler, n_nodes = gather_document(payload)
    return select_main(score_fragments(frags, block_boiler), n_nodes)


def both(payload: bytes):
    out = []
    for fn in (via_dom, via_stream):
        try:
            out.append(('ok', fn(payload)))
        except Exception as exc:  # noqa: BLE001 - intentional broad compare
            out.append(('err', norm_error(exc)))
    return out


def test_corpus_stream_equals_dom():
    corpus = (list(PARSER_FIXTURES.values()) + EXTRA_PAYLOADS
              + dirty_html_corpus(200, seed=9))
    for payload in corpus:
        if isinstance(payload, str):
            payload = payload.encode()
        a, b = both(payload)
        assert a == b, payload


def test_repair_shapes():
    cases = [
        b'<a>1</a><b>2</b>',                      # multi-root wrap
        b'<a>1</a>tail<b>2</b>',                  # root tail before wrap
        b'<a>x</a></document>gone',               # walk-root tail dropped
        b'="v"<script></document>t1\n<a</p>="v"<div <ul>',  # re-wrap binding
        b'<div><p>deep<ul><li>x</ul></div>extra<em>y</em>',
        b'<p>a<p>b<p>c',                          # sibling autoclose chain
    ]
    for payload in cases:
        a, b = both(payload)
        assert a == b, payload


@settings(max_examples=600, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payloads)
def test_fuzz_stream_equals_dom(payload):
    a, b = both(payload)
    assert a == b, payload
