"""Reference XpathTests re-expressed against our xq engine.

Mirrors /root/reference/pyxml/tests/xpath.py:42-167 — including the verified
non-standard expectations (0-based position, child-not-root leading slash).
"""
import pytest

from pyxml_spark.engine import fromstring
from tests.conftest import XPATH_DOC


@pytest.fixture(scope='module')
def doc():
    return fromstring(XPATH_DOC)


def assert_tag_count(elements, tag, number):
    assert sum(1 for e in elements if e.tag == tag) == number


def test_child(doc):
    children = doc.findall('/*')
    assert len(children) == 4
    assert_tag_count(children, 'h1', 1)
    assert_tag_count(children, 'article', 2)
    assert_tag_count(children, 'span', 1)


def test_decendants(doc):
    d = doc.findall('//*')
    assert_tag_count(d, 'h1', 1)
    assert_tag_count(d, 'article', 4)
    assert_tag_count(d, 'span', 3)
    assert_tag_count(d, 'div', 2)
    assert_tag_count(d, 'p', 6)
    assert_tag_count(d, 'a', 2)


def test_tag_filter(doc):
    articles = doc.findall('//article')
    assert len(articles) == 4
    assert_tag_count(articles, 'article', 4)


def test_tag_chain(doc):
    spans = doc.findall('//article/span')
    assert len(spans) == 2
    assert_tag_count(spans, 'span', 2)


def test_relative_path(doc):
    spans = doc.findall('./article/span')
    assert len(spans) == 2


def test_index(doc):
    headers = doc.findall('/[1]')
    assert len(headers) == 1
    assert_tag_count(headers, 'h1', 1)


def test_notempty(doc):
    pgraphs = doc.findall('//p[@class]')
    assert len(pgraphs) == 2
    for p in pgraphs:
        assert 'class' in p.attrib


def test_name(doc):
    spans = doc.findall('//[name()="span"]')
    assert len(spans) == 3
    assert_tag_count(spans, 'span', 3)


def test_contains(doc):
    threads = doc.findall('//span[contains(@class, "threadLabel")]')
    assert len(threads) == 2


def test_starts_with(doc):
    assert len(doc.findall('//span[starts-with(@class, "threadLabel")]')) == 1


def test_ends_with(doc):
    assert len(doc.findall('//span[ends-with(@class, "threadLabel")]')) == 1


def test_not(doc):
    spans = doc.findall('//span[not(ends-with(@class, "threadLabel"))]')
    assert len(spans) == 2


def test_get_text(doc):
    text = doc.findall('//h1/text()')
    assert len(text) == 1
    assert isinstance(text[0], str)
    assert text[0].strip() == 'Article Header'


def test_get_text_upper(doc):
    text = doc.findall('//h1/upper-case(text())')
    assert text[0].strip() == 'ARTICLE HEADER'


def test_get_attr(doc):
    classes = doc.findall('//span/@class')
    assert classes == ['threadLabel ', ' threadLabel', 'footer']


def test_get_position(doc):
    pos = doc.findall('//span/position()')
    assert pos == [0, 0, 3]


def test_get_expr(doc):
    finals = doc.findall('//p/contains(upper-case(text()), "FINAL")')
    assert finals == [False, False, True, False, False, True]


def test_complex_child(doc):
    children = doc.findall(
        '//article[@class="message-body"]/[1]/p[contains(text(), "Final")]')
    assert len(children) == 2
    assert_tag_count(children, 'p', 2)
