"""Reference ParserTests re-expressed against our engine.

Mirrors /root/reference/pyxml/tests/parser.py:94-193 — same fixtures, same
expected error codes/positions, same golden trees.
"""
import pytest

from pyxml_spark.engine import Element, ParseFailure, Parser
from tests.conftest import PARSER_FIXTURES


def _text(e):
    return e.text.strip() if e.text else ''


def _tail(e):
    return e.tail.strip() if e.tail else ''


def parse(payload: bytes):
    p = Parser()
    p.feed(payload)
    return p.close()


def assert_parse_error(payload: bytes, code: bytes, pos):
    with pytest.raises(ParseFailure) as err:
        parse(payload)
    assert err.value.code == code
    assert err.value.position == pos


def assert_tree(payload: bytes, expected: Element):
    root = parse(payload)
    parsed = list(root.iter())
    wanted = list(expected.iter())
    assert len(parsed) == len(wanted)
    for p, e in zip(parsed, wanted):
        assert p.tag == e.tag
        assert _text(p) == _text(e), f'{p.tag} text mismatch'
        assert _tail(p) == _tail(e), f'{p.tag} tail mismatch'
        assert p.attrib == e.attrib, f'{p.tag} attrib mismatch'


def test_broken_pi():
    with pytest.raises(ValueError):
        parse(PARSER_FIXTURES['incomplete_pi'])


def test_broken_start_tag():
    assert_parse_error(PARSER_FIXTURES['incomplete_start_tag'], b'/p', (4, 43))


def test_broken_end_tag():
    assert_parse_error(PARSER_FIXTURES['incomplete_end_tag'], b'p', (5, 1))


def test_unexpected_token():
    assert_parse_error(PARSER_FIXTURES['broken_xml'], b'', (1, 0))


def test_bad_attributes():
    assert_tree(PARSER_FIXTURES['bad_attributes'],
                Element.new('document', children=[
                    Element.new('p', {'attr': 'a', 'b': 'true',
                                      'c': 'true', 'd': 'true'})]))


def test_edgecase_slashes():
    assert_tree(PARSER_FIXTURES['edgecase_slashes'],
                Element.new('document', children=[
                    Element.new('p', {'class': 'abc'}, text='/', tail='/'),
                    Element.new('h1', text='/Content')]))


def test_edgecase_style():
    assert_tree(PARSER_FIXTURES['edgecase_style'],
                Element.new('document', children=[
                    Element.new('head', children=[
                        Element.new('title', text='Title'),
                        Element.new('style',
                                    text='.main > .body { color: blue; }')])]))


def test_edgecase_script():
    assert_tree(PARSER_FIXTURES['edgecase_script'],
                Element.new('document', children=[
                    Element.new('h1', text='Script Below'),
                    Element.new('script', {'type': 'text/javascript',
                                           'src': '/test.js'}),
                    Element.new('script', {'type': 'text/javascript'},
                                text='console.log("<<\\"<><>{}[]))");')]))


def test_edgecase_comment():
    assert_tree(PARSER_FIXTURES['edgecase_comment'],
                Element.new('document', children=[
                    Element.new('head', text='Title'),
                    Element.new('body', children=[
                        Element.new('div', text='Content!')])]))
