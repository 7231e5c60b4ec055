"""compat-layer parity: the stdlib-flavored aliases a user porting reference
code hits first (reference compat/ElementTree.py:26-43), plus the Parser
ingest protocol's mutual-exclusion rules (reference parser.py:83-121).

The stdlib monkey-patch itself (compat/__init__.py monkey_patch) is
deliberately not ported — see pyxml_spark/engine/compat.py docstring.
"""
import io

import pytest

from conftest import requires_reference


def test_alias_identity():
    from pyxml_spark.engine import compat
    from pyxml_spark.engine.compose import TreeComposer
    from pyxml_spark.engine.doc import ProcessingInstruction
    from pyxml_spark.engine.parse import Parser, fromstring
    assert compat.XML is fromstring
    assert compat.PI is ProcessingInstruction
    assert compat.XMLParser is Parser
    assert compat.TreeBuilder is TreeComposer


def test_subelement_appends_and_overlays_attrib():
    from pyxml_spark.engine.compat import Element, SubElement
    root = Element('root', {})
    child = SubElement(root, 'c', {'a': '1', 'b': '2'}, b='3', d='4')
    assert list(root) == [child]
    assert child.tag == 'c'
    # extra kwargs overlay the attrib dict (reference semantics)
    assert child.attrib == {'a': '1', 'b': '3', 'd': '4'}


@requires_reference
def test_subelement_matches_reference():
    from pyxml.compat.ElementTree import (Element as RefElement,
                                          SubElement as RefSubElement)
    from pyxml_spark.engine.compat import Element, SubElement
    ours_root = Element('r', {})
    ours = SubElement(ours_root, 'x', {'k': 'v'}, k='w', z='1')
    ref_root = RefElement('r')
    ref = RefSubElement(ref_root, 'x', {'k': 'v'}, k='w', z='1')
    assert ours.attrib == ref.attrib
    assert len(ours_root) == len(ref_root) == 1


def test_xml_alias_parses_and_tostring_roundtrips():
    from pyxml_spark.engine.compat import XML, tostring
    root = XML(b'<a><b>hi</b></a>')
    assert root.tag == 'a'
    # tostring defaults to xml method incl. declaration (reference parity)
    assert tostring(root).endswith(b'<a><b>hi</b></a>')


def test_xmlparser_feed_close():
    from pyxml_spark.engine.compat import XMLParser
    p = XMLParser()
    p.feed(b'<a><b>h')
    p.feed(b'i</b></a>')
    root = p.close()
    assert root.tag == 'a' and root[0].text == 'hi'


# --- Parser ingest mutual-exclusion protocol (reference parser.py:83-121) --

def test_feed_then_set_stream_rejected():
    from pyxml_spark.engine.parse import Parser
    p = Parser()
    p.feed(b'<a/>')
    with pytest.raises(RuntimeError, match='memory buffer already assigned'):
        p.set_stream(iter([b'<b/>']))


def test_set_stream_twice_rejected():
    from pyxml_spark.engine.parse import Parser
    p = Parser()
    p.set_stream(iter([b'<a/>']))
    with pytest.raises(RuntimeError, match='data-stream already set'):
        p.set_stream(iter([b'<b/>']))


def test_set_stream_then_feed_rejected():
    from pyxml_spark.engine.parse import Parser
    p = Parser()
    p.set_stream(iter([b'<a/>']))
    with pytest.raises(RuntimeError, match='data-stream already provided'):
        p.feed(b'<b/>')
    with pytest.raises(RuntimeError, match='data-stream already provided'):
        p.readfrom(io.BytesIO(b'<b/>'))


def test_readfrom_then_feed_rejected():
    from pyxml_spark.engine.parse import Parser
    p = Parser()
    p.readfrom(io.BufferedReader(io.BytesIO(b'<a/>')))
    with pytest.raises(RuntimeError, match='`readfrom` already called'):
        p.feed(b'<b/>')


def test_feed_then_readfrom_rejected_once_used():
    from pyxml_spark.engine.parse import Parser
    p = Parser()
    p.feed(b'<a/>')
    with pytest.raises(RuntimeError, match='memory buffer already in use'):
        p.readfrom(io.BytesIO(b'<b/>'))


def test_each_source_parses():
    from pyxml_spark.engine.parse import Parser
    p = Parser()
    p.readfrom(io.BytesIO(b'<a><b/></a>'))
    assert p.close().tag == 'a'
    p = Parser()
    p.set_stream(iter([b'<a>', b'<b/></a>']))
    assert p.close().tag == 'a'


@requires_reference
def test_exclusion_errors_match_reference():
    """same RuntimeError strings as the reference protocol"""
    import pyxml
    from pyxml_spark.engine.parse import Parser

    def probe(make, *ops):
        p = make()
        try:
            for op in ops:
                op(p)
        except RuntimeError as exc:
            return str(exc)
        return None

    scenarios = [
        (lambda p: p.feed(b'<a/>'), lambda p: p.set_stream(iter([b'']))),
        (lambda p: p.set_stream(iter([b''])),
         lambda p: p.set_stream(iter([b'']))),
        (lambda p: p.set_stream(iter([b''])), lambda p: p.feed(b'<a/>')),
        (lambda p: p.set_stream(iter([b''])),
         lambda p: p.readfrom(io.BytesIO(b''))),
        (lambda p: p.feed(b'<a/>'), lambda p: p.readfrom(io.BytesIO(b''))),
        (lambda p: p.close(),),  # no source at all: protocol error
    ]
    for ops in scenarios:
        ours = probe(Parser, *ops)
        ref = probe(pyxml.Parser, *ops)
        assert ours == ref, (ours, ref)


def test_patched_scopes_and_restores():
    """patched() is the scoped equivalent of the reference's permanent
    monkey_patch: inside the block the stdlib import resolves to our
    module; afterwards the original is back untouched"""
    import sys
    import xml.etree.ElementTree as stdlib_et
    orig = sys.modules['xml.etree.ElementTree']
    from pyxml_spark.engine import compat
    with compat.patched():
        import xml.etree.ElementTree as inside
        assert inside is compat
        root = inside.XML(b'<a><b>hi</b></a>')
        assert root.tag == 'a'
    import xml.etree.ElementTree as after
    assert after is orig
    assert sys.modules['xml.etree.ElementTree'] is orig
    # stdlib still functional
    assert stdlib_et.fromstring('<x/>').tag == 'x'


def test_elementpath_face():
    """the reference's compat/ElementPath re-exports (iterfind/find/
    findall/findtext) are available from the compat module"""
    from pyxml_spark.engine import compat
    root = compat.XML(b'<a><b>one</b><b>two</b></a>')
    assert [e.text for e in compat.findall(root, '//b')] == ['one', 'two']
    assert compat.find(root, '//b').text == 'one'
    assert compat.findtext(root, '//b') == 'one'
    assert [e.text for e in compat.iterfind(root, '//b')] == ['one', 'two']
