"""Reference BuilderTests re-expressed against TreeComposer.

Mirrors /root/reference/pyxml/tests/builder.py:14-86.
"""
import pytest

from pyxml_spark.engine import ComposeError, TreeComposer


def assert_tags(root, tags):
    elements = list(root.iter())
    assert len(elements) == len(tags)
    for elem, tag in zip(elements, tags):
        assert elem.tag == tag


def test_multi_document():
    b = TreeComposer()
    b.start('document', {})
    b.end('document')
    with pytest.raises(ComposeError):
        b.start('document', {})


def test_empty_document():
    with pytest.raises(ComposeError):
        TreeComposer().close()


def test_incomplete_document():
    b = TreeComposer()
    b.start('document', {})
    with pytest.raises(ComposeError):
        b.close()


def test_empty_tree():
    b = TreeComposer()
    b.start('ul', {})
    b.end('ul')
    with pytest.raises(ComposeError):
        b.end('ul')


def test_double_end():
    b = TreeComposer()
    b.start('ul', {})
    b.start('li', {})
    b.end('li')
    with pytest.raises(ComposeError):
        b.end('li')


def test_fix_incomplete_inner():
    b = TreeComposer(fix_broken=True)
    b.start('ul', {})
    b.start('li-a', {})
    b.end('li-a')
    b.start('li-b', {})
    b.start('a', {})
    b.end('a')
    b.end('ul')
    assert_tags(b.close(), ['ul', 'li-a', 'li-b', 'a'])


def test_fix_incomplete_outer():
    b = TreeComposer(fix_broken=True)
    b.start('html', {})
    b.start('head', {})
    b.start('title', {})
    b.data('Title Page')
    b.end('title')
    b.start('style', {})
    b.end('style')
    assert_tags(b.close(), ['html', 'head', 'title', 'style'])


def test_fix_double_end():
    b = TreeComposer(fix_broken=True)
    b.start('ul', {})
    b.start('li', {})
    b.end('li')
    b.end('li')
    assert_tags(b.close(), ['ul', 'li'])


def test_flushed_text_is_empty_string():
    """verified quirk: parsed elements get '' text/tail, never None"""
    b = TreeComposer()
    b.start('a', {})
    b.end('a')
    root = b.close()
    assert root.text == ''
