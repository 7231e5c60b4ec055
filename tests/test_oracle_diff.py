"""Oracle-diff suite: our engine vs the actual reference implementation.

This is the per-turn text-equality gate in miniature (BASELINE.md): for every
payload in the corpus, the parsed DOM shape, serialized bytes, xpath results,
and escape/unescape outputs must match the reference exactly (exceptions
compare by mapped class name).
"""
import pytest

from pyxml_spark import engine as eng
from pyxml_spark.engine import html as eng_html
from tests.conftest import (EXTRA_PAYLOADS, PARSER_FIXTURES, XPATH_DOC,
                            dirty_html_corpus, norm_error, requires_reference,
                            run_to_shape, tree_shape)

ALL_PAYLOADS = (list(PARSER_FIXTURES.values()) + [XPATH_DOC] + EXTRA_PAYLOADS
                + dirty_html_corpus())

XPATHS = [
    '/*', '//*', '//article', '//article/span', './article/span', '/[1]',
    '//p[@class]', '//[name()="span"]', '//span[contains(@class, "threadLabel")]',
    '//span[starts-with(@class, "threadLabel")]',
    '//span[ends-with(@class, "threadLabel")]',
    '//span[not(ends-with(@class, "threadLabel"))]', '//h1/text()',
    '//h1/upper-case(text())', '//span/@class', '//span/position()',
    '//p/contains(upper-case(text()), "FINAL")',
    '//article[@class="message-body"]/[1]/p[contains(text(), "Final")]',
    '//p/..', '..', '.', '//p[2]', '//p[last()]', '//div/count(p)',
    '//p/name()', '//p/substring(text(), 0, 4)',
    '//p/translate(text(), "Paragraph", "P")', '//p[position() > 1]',
    '//a/substring-before(@href, ".com")', '//a/substring-after(@href, "https://")',
    '//em/../p', '//p[index(2)]', '//p/notempty(@class)', '//*[count(p)=3]',
    '//p[contains(text(), "Final")]/text()', '//article/[2]/text()',
    '//p/lower-case(text())', '//span[position() = 0]', '//p[1 < 2]',
    '//p[not(false)]', '//p[@class="p1" and contains(text(), "1")]',
]

ESCAPE_SAMPLES = [
    '', 'plain', 'a b', 'a&b<c>d', 'he said "hi"', "it's", 'line\nbreak',
    'tab\there', 'cr\rhere', '&amp;lt;', '&#xe9;', '&#233;', '&nbsp;',
    '&quot;&#39;', 'a&amp;#65;b', '&#x00e9;', 'mixed &lt;x&gt; &amp; more',
]


@requires_reference
@pytest.mark.parametrize('mode', ['xml', 'html'])
def test_dom_shape_parity(mode):
    import pyxml
    import pyxml.html
    ref_parse = pyxml.fromstring if mode == 'xml' else pyxml.html.fromstring
    my_parse = eng.fromstring if mode == 'xml' else eng_html.fromstring
    bad = []
    for payload in ALL_PAYLOADS:
        ref = run_to_shape(ref_parse, payload)
        mine = run_to_shape(my_parse, payload)
        if ref != mine:
            bad.append((payload[:80], ref, mine))
    assert not bad, f'{len(bad)} mismatches, first: {bad[0]}'


@requires_reference
@pytest.mark.parametrize('mode', ['xml', 'html'])
def test_serialize_parity(mode):
    import pyxml
    import pyxml.html
    ref_parse = pyxml.fromstring if mode == 'xml' else pyxml.html.fromstring
    my_parse = eng.fromstring if mode == 'xml' else eng_html.fromstring
    bad = []
    for payload in ALL_PAYLOADS:
        for method in ('xml', 'html'):
            for short in (True, False):
                def ser(parse, tostring):
                    try:
                        return tostring(parse(payload), method=method,
                                        short_empty_elements=short)
                    except Exception as exc:  # noqa: BLE001
                        return ('err', norm_error(exc))
                ref = ser(ref_parse, pyxml.tostring)
                mine = ser(my_parse, eng.tostring)
                if ref != mine:
                    bad.append((payload[:60], method, short, ref, mine))
    assert not bad, f'{len(bad)} mismatches, first: {bad[0]}'


@requires_reference
def test_roundtrip_parity():
    """fromstring -> tostring(html) -> fromstring — hermetic version of
    reference tests/html.py:18-30. Invariance does not hold universally (the
    reference itself perturbs some dirty payloads), so the gate is parity:
    our round-trip sequence must equal the reference's round-trip sequence."""
    import pyxml.html

    def roundtrip(fromstring, tostring, payload):
        try:
            tree = fromstring(payload)
            again = fromstring(tostring(tree))
            return [(n.tag if isinstance(n.tag, str) else type(n).__name__,
                     n.text or '', n.tail or '') for n in again.iter()]
        except Exception as exc:  # noqa: BLE001
            return ('err', norm_error(exc))

    for payload in ALL_PAYLOADS:
        ref = roundtrip(pyxml.html.fromstring, pyxml.html.tostring, payload)
        mine = roundtrip(eng_html.fromstring, eng_html.tostring, payload)
        assert ref == mine, payload[:80]


@requires_reference
def test_xpath_parity():
    import pyxml
    from pyxml.xpath import findall as ref_findall
    from pyxml_spark.engine.xq import findall as my_findall

    def norm(values):
        out = []
        for v in values:
            if hasattr(v, 'attrib'):
                out.append(('E',) + tree_shape(v)[0])
            else:
                out.append(('V', v))
        return out

    docs = [XPATH_DOC] + [p for p in dirty_html_corpus(40)]
    bad = []
    for payload in docs:
        try:
            ref_root = pyxml.html.fromstring(payload)
            my_root = eng_html.fromstring(payload)
        except Exception:
            continue
        for path in XPATHS:
            def run(fn, root):
                try:
                    return ('ok', norm(fn(root, path)))
                except Exception as exc:  # noqa: BLE001
                    return ('err', norm_error(exc))
            ref = run(ref_findall, ref_root)
            mine = run(my_findall, my_root)
            if ref != mine:
                bad.append((payload[:50], path, ref, mine))
    assert not bad, f'{len(bad)} mismatches, first: {bad[0]}'


@requires_reference
def test_escape_parity():
    from pyxml import escape as ref_escape
    for s in ESCAPE_SAMPLES:
        assert eng.escape_cdata(s) == ref_escape.escape_cdata(s)
        assert eng.escape_attrib(s) == ref_escape.escape_attrib(s)
        def une(fn):
            try:
                return fn(s)
            except Exception as exc:  # noqa: BLE001
                return ('err', type(exc).__name__)
        assert une(eng.unescape) == une(ref_escape.unescape), s


@requires_reference
def test_token_stream_parity():
    """scanner event stream == reference lexer token stream"""
    from io import BytesIO

    from pyxml.lexer import Lexer
    from pyxml.parser import stream_file

    from pyxml_spark.engine.scanner import Scanner

    def ref_tokens(payload):
        lexer = Lexer(stream_file(BytesIO(payload)))
        out = []
        try:
            for r in lexer.iter():
                out.append((int(r.token), bytes(r.value), r.lineno, r.position))
        except Exception as exc:  # noqa: BLE001
            out.append(('err', type(exc).__name__))
        return out

    def my_tokens(payload):
        sc = Scanner(payload)
        out = []
        try:
            while True:
                ev = sc.scan()
                if ev is None:
                    break
                out.append((ev[0], ev[1], ev[2], ev[3]))
        except Exception as exc:  # noqa: BLE001
            out.append(('err', type(exc).__name__))
        return out

    bad = []
    for payload in ALL_PAYLOADS:
        ref = ref_tokens(payload)
        mine = my_tokens(payload)
        if ref != mine:
            bad.append((payload[:80], ref[:6], mine[:6]))
    assert not bad, f'{len(bad)} mismatches, first: {bad[0]}'
