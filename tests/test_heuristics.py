"""Unit tests for main-content heuristics + per-turn extraction contract."""
from pyxml_spark.engine import html
from pyxml_spark.pipeline.extract import extract_payload
from pyxml_spark.pipeline.heuristics import ExtractConfig, extract_main
from tests.conftest import requires_reference

PAGE = b'''<html><head><title>T</title><style>.x{}</style></head>
<body><nav><a href="/">Home</a> <a href="/about">About</a></nav>
<article><h1>A Headline Of Note</h1>
<p>This is the first real paragraph with enough text to keep.</p>
<p>ad</p>
<div class="sidebar widget"><p>subscribe to our newsletter today</p></div>
<p>Second real paragraph, also long enough to be kept around.</p>
</article><footer>copyright fine print</footer></body></html>'''


def test_boilerplate_dropped():
    root = html.fromstring(PAGE)
    got = extract_main(root)
    assert 'Headline' in got.main_text
    assert 'first real paragraph' in got.main_text
    assert 'Second real paragraph' in got.main_text
    assert 'Home' not in got.main_text          # nav
    assert 'newsletter' not in got.main_text    # class hint
    assert 'fine print' not in got.main_text    # footer
    assert 'T' != got.main_text[:1] or 'title' not in got.main_text  # head
    assert '\nad\n' not in got.main_text        # short block
    assert got.n_nodes > 10
    assert got.n_text_chars > len(got.main_text) > 0


def test_spans_point_into_raw_payload():
    raw = PAGE.decode()
    root = html.fromstring(PAGE, track_spans=True)
    got = extract_main(root)
    assert got.spans, 'kept blocks must carry spans'
    for start, end in got.spans:
        assert 0 <= start < end <= len(PAGE)
    joined = ' '.join(raw[s:e].strip() for s, e in got.spans)
    assert 'first real paragraph' in joined


def test_fast_path_identity():
    out = extract_payload('plain words no markup at all')
    assert out['main_text'] == 'plain words no markup at all'
    assert out['spans'] == [(0, 28)]
    assert out['parse_error'] is None


def test_null_and_error_contract():
    assert extract_payload(None)['parse_error'] == 'null'
    bad = extract_payload('<?php never terminated')
    assert bad['parse_error'] and bad['main_text'] == ''
    empty = extract_payload('')
    assert empty['main_text'] == '' and empty['parse_error'] is None


def test_deterministic():
    a = extract_payload(PAGE.decode())
    b = extract_payload(PAGE.decode())
    assert a == b


@requires_reference
def test_heuristics_portable_to_reference_dom():
    """the same heuristic function over the reference's DOM must produce the
    same main_text — this is the bridge the per-turn equality gate stands on"""
    import pyxml.html
    ours = extract_main(html.fromstring(PAGE))
    refs = extract_main(pyxml.html.fromstring(PAGE))
    assert ours.main_text == refs.main_text
    assert ours.n_text_chars == refs.n_text_chars


def test_config_thresholds():
    root = html.fromstring(PAGE)
    keep_all = extract_main(root, ExtractConfig(min_block_chars=1,
                                                max_link_density=1.0))
    assert 'ad' in keep_all.main_text
    # boiler-tag subtrees (nav/footer) stay dropped regardless of thresholds
    assert 'Home' not in keep_all.main_text
    assert 'fine print' not in keep_all.main_text
