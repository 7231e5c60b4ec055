"""Property-based parity fuzzing: arbitrary markup-ish byte soup must produce
identical observable behavior in our engine and the reference (DOM shape,
errors by mapped type, token streams, serialization)."""
import pytest

from tests.conftest import has_reference, norm_error, tree_shape

hypothesis = pytest.importorskip('hypothesis')
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason='reference pyxml not importable')

# alphabet biased toward markup machinery: tags, attrs, quotes, escapes,
# comments, PIs, brackets, newlines, unicode
MARKUP_CHUNKS = st.sampled_from([
    '<', '>', '/', '=', '"', "'", ' ', '\n', '\t', '!', '?', '-', '[', ']',
    '&', '#', ';', '\\', 'a', 'b', 'p', 'x', 'div', 'span', 'script',
    'style', 'br', 'img', '<p>', '</p>', '<div ', 'class', '="v"', 'text',
    '&amp;', '&lt;', '&#65;', '&#xe9;', '<!--', '-->', '<?', '?>',
    '<!DOCTYPE', 'é', '1', '<a', '</', '<<', '>>',
])

payloads = st.lists(MARKUP_CHUNKS, min_size=0, max_size=40).map(
    lambda parts: ''.join(parts).encode())


def ref_modules():
    import pyxml
    import pyxml.html
    return pyxml, pyxml.html


@settings(max_examples=400, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payloads)
def test_fuzz_dom_parity(payload):
    pyxml, pyxml_html = ref_modules()
    from pyxml_spark import engine as eng
    from pyxml_spark.engine import html as eng_html

    for ref_parse, my_parse in ((pyxml.fromstring, eng.fromstring),
                                (pyxml_html.fromstring, eng_html.fromstring)):
        try:
            ref = ('ok', tree_shape(ref_parse(payload)))
        except RecursionError:
            return  # reference recursion limits are not part of the contract
        except Exception as exc:  # noqa: BLE001
            ref = ('err', norm_error(exc))
        try:
            mine = ('ok', tree_shape(my_parse(payload)))
        except Exception as exc:  # noqa: BLE001
            mine = ('err', norm_error(exc))
        assert ref == mine, payload


@settings(max_examples=400, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payloads)
def test_fuzz_token_parity(payload):
    from io import BytesIO

    from pyxml.lexer import Lexer
    from pyxml.parser import stream_file

    from pyxml_spark.engine.scanner import Scanner

    def ref_tokens():
        lexer = Lexer(stream_file(BytesIO(payload)))
        out = []
        try:
            for r in lexer.iter():
                out.append((int(r.token), bytes(r.value),
                            r.lineno, r.position))
        except Exception as exc:  # noqa: BLE001
            out.append(('err', type(exc).__name__))
        return out

    def my_tokens():
        sc = Scanner(payload)
        out = []
        try:
            while True:
                ev = sc.scan()
                if ev is None:
                    break
                out.append((ev[0], bytes(ev[1]), ev[2], ev[3]))
        except Exception as exc:  # noqa: BLE001
            out.append(('err', type(exc).__name__))
        return out

    assert ref_tokens() == my_tokens(), payload


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payloads)
def test_fuzz_serialize_parity(payload):
    import pyxml
    import pyxml.html

    from pyxml_spark import engine as eng
    from pyxml_spark.engine import html as eng_html

    def ser(parse, tostring):
        try:
            return tostring(parse(payload), method='html')
        except RecursionError:
            return ('rec',)
        except Exception as exc:  # noqa: BLE001
            return ('err', norm_error(exc))

    ref = ser(pyxml.html.fromstring, pyxml.html.tostring)
    if ref == ('rec',):
        return
    mine = ser(eng_html.fromstring, eng_html.tostring)
    assert ref == mine, payload


PATH_CHUNKS = st.sampled_from([
    '/', '//', '.', '..', '*', 'p', 'a', 'span', 'div', 'article', 'em',
    '[1]', '[2]', '[@class]', '[@href]', '[last()]', '[position() > 0]',
    '[contains(@class, "message")]', '[not(false)]', '[name()="p"]',
    'text()', '@class', 'position()', 'name()', 'count(p)',
    'upper-case(text())', 'substring(text(), 0, 3)',
    '[starts-with(@class, "m")]', '[1 < 2]', '[@class="p1"]',
    'contains(text(), "a")', '[count(p) = 0]', ' ', '[', ']', '(', ')',
    '"x"', '=',
])


_XPATH_ROOTS = None


def _xpath_roots():
    global _XPATH_ROOTS
    if _XPATH_ROOTS is None:
        import pyxml
        from pyxml_spark import engine as eng
        from tests.conftest import XPATH_DOC
        _XPATH_ROOTS = (pyxml.fromstring(XPATH_DOC),
                        eng.fromstring(XPATH_DOC))
    return _XPATH_ROOTS


@settings(max_examples=250, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(PATH_CHUNKS, min_size=1, max_size=4).map(''.join))
def test_fuzz_xpath_parity(path):
    """random path strings over the xpath fixture doc: results (elements by
    shape, values verbatim) and errors (by type) must match the reference"""
    from pyxml.xpath import findall as ref_findall

    from pyxml_spark.engine.xq import findall as my_findall

    ref_root, my_root = _xpath_roots()

    def norm(values):
        out = []
        for v in values:
            if hasattr(v, 'attrib'):
                tag = v.tag if isinstance(v.tag, str) else type(v).__name__
                out.append(('E', tag, v.text, dict(v.attrib)))
            else:
                out.append(('V', v))
        return out

    def run(fn, root):
        try:
            return ('ok', norm(fn(root, path)))
        except Exception as exc:  # noqa: BLE001
            return ('err', type(exc).__name__)

    assert run(ref_findall, ref_root) == run(my_findall, my_root), path


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(
    list('abc &<>"\'\r\n\t#;xX019') + ['&amp;', '&#xe9;', '&#65;', '&#zz;',
                                      '&nbsp;', '&#x1F600;', '&amp;lt;']),
    max_size=20).map(''.join))
def test_fuzz_unescape_parity(text):
    from pyxml.escape import unescape as ref_unescape

    from pyxml_spark.engine.entities import unescape as my_unescape

    def run(fn):
        try:
            return fn(text)
        except Exception as exc:  # noqa: BLE001
            return ('err', type(exc).__name__)

    assert run(ref_unescape) == run(my_unescape), repr(text)
