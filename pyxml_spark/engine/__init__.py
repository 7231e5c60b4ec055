"""Single-document HTML/XML engine with pyxml-parity semantics.

A fresh implementation (cursor scanner + composer + renderer + xpath) whose
observable behavior matches imgurbot12/pyxml (/root/reference) — DOM shape,
repair semantics, escape quirks, query results, serialized bytes. Used inside
Arrow-batched Spark UDFs by :mod:`pyxml_spark.pipeline`.
"""
from . import xq
from .callbacks import CallbackParser
from .compose import ComposeError, TreeComposer
from .doc import (Comment, Declaration, Element, ProcessingInstruction,
                  prettify)
from .entities import escape_attrib, escape_cdata, unescape
from .parse import (HTML_KEEP_FULL, HTML_VOID, EventPump, Parser,
                    ParseFailure, fromstring, parse_document)
from .render import ElementTree, serialize_html, serialize_xml, tostring
from .scanner import Scanner

__all__ = [
    'Element', 'Comment', 'Declaration', 'ProcessingInstruction', 'prettify',
    'Scanner', 'TreeComposer', 'ComposeError', 'EventPump', 'Parser',
    'CallbackParser',
    'ParseFailure', 'parse_document', 'fromstring', 'tostring',
    'ElementTree', 'serialize_xml', 'serialize_html',
    'escape_cdata', 'escape_attrib', 'unescape',
    'HTML_VOID', 'HTML_KEEP_FULL', 'xq',
]
