"""Serialization back to markup.

Behavior parity target: /root/reference/pyxml/etree.py:17-28,49-104,139-159:

* attributes whose value is ``'true'`` (the bare-attr parse default) or empty
  are written as bare names (etree.py:76-80);
* ``short_empty_elements`` writes ``<x/>`` when no children and falsy text;
* HTML method: void tags get no end tag, style/script are never shortened;
* the xml method emits ``<?xml version='1.0' encoding='...'?>\\n`` by default.
"""
from __future__ import annotations

from io import BytesIO
from typing import Callable, Optional, Set

from .doc import Comment, Declaration, Element, ProcessingInstruction, _Marker
from .entities import escape_attrib, escape_cdata
from .parse import HTML_KEEP_FULL, HTML_VOID, fromstring

__all__ = ['tostring', 'serialize_xml', 'serialize_html', 'ElementTree']

_EMPTY: Set[str] = set()


def _render(write: Callable[[str], None],
            elem: Element,
            short_empty: bool,
            no_end_tags: Set[str],
            no_short: Set[str]):
    """iterative writer with an explicit work stack (byte output matches
    etree.py:49-95 exactly; the explicit stack keeps serialization linear
    on pathologically deep trees where recursion would hit the interpreter
    limit — mirroring the parser's iterative guarantee)"""
    # work items: Element to open, or a literal string to emit (used for
    # the deferred end-tag + tail after a subtree)
    work = [elem]
    pop = work.pop
    push = work.append
    while work:
        item = pop()
        if type(item) is str:
            write(item)
            continue
        if isinstance(item, _Marker):
            if isinstance(item, Comment):
                write('<!-- ' + escape_cdata(item.text or '') + '-->')
            elif isinstance(item, Declaration):
                write('<!' + escape_cdata(item.text or '') + '>')
            elif isinstance(item, ProcessingInstruction):
                write('<? ' + (item.text or '') + ' ?>')
            else:
                raise RuntimeError('unsupported element', item)
            write(escape_cdata(item.tail or ''))
            continue
        tag = item.tag
        skip_end = tag in no_end_tags
        write('<' + tag)
        for name, value in item.attrib.items():
            write(' ' + name)
            if value and value != 'true':
                write('="' + escape_attrib(value) + '"')
        children = item.children
        if short_empty and not skip_end and tag not in no_short \
                and not children and not item.text:
            write('/>')
            write(escape_cdata(item.tail or ''))
            continue
        write('>')
        write(escape_cdata(item.text or ''))
        # after the subtree: end tag (unless void) then the tail
        push(escape_cdata(item.tail or ''))
        if not skip_end:
            push('</' + tag + '>')
        for child in reversed(children):
            push(child)


def serialize_xml(write, element, short_empty_elements: bool = False):
    _render(write, element, short_empty_elements, _EMPTY, _EMPTY)


def serialize_html(write, element, short_empty_elements: bool = False):
    _render(write, element, short_empty_elements, set(HTML_VOID),
            set(HTML_KEEP_FULL))


def tostring(element: Element, **kwargs) -> bytes:
    """serialize an element (and children) to bytes"""
    out = BytesIO()
    ElementTree(element).write(out, **kwargs)
    return out.getvalue()


class ElementTree:
    """document wrapper (etree.py:108-159)"""

    def __init__(self, element: Optional[Element] = None, source=None):
        self.root = element
        if source:
            self.parse(source)

    def getroot(self) -> Element:
        if self.root is None:
            raise ValueError('No XML Root Element')
        return self.root

    def parse(self, source, **kwargs) -> Element:
        data = source.read() if hasattr(source, 'read') else source
        self.root = fromstring(data, **kwargs)
        return self.getroot()

    def iter(self, tag=None):
        return self.getroot().iter(tag)

    def find(self, path: str):
        return self.getroot().find(path)

    def findall(self, path: str):
        return self.getroot().findall(path)

    def finditer(self, path: str):
        return self.getroot().finditer(path)

    def findtext(self, path: str):
        return self.getroot().findtext(path)

    def write(self, f,
              encoding: Optional[str] = None,
              xml_declaration: Optional[str] = None,
              default_namespace: Optional[str] = None,
              method: Optional[str] = None,
              short_empty_elements: bool = True):
        encoding = encoding or 'utf-8'

        def write(s: str):
            f.write(s.encode(encoding))

        serialize = serialize_xml
        if not method or method == 'xml':
            if xml_declaration is not None:
                write(xml_declaration)
            else:
                write(f"<?xml version='1.0' encoding='{encoding}'?>\n")
        elif method == 'html':
            serialize = serialize_html
        return serialize(write, self.getroot(), short_empty_elements)
