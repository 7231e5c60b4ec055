"""Character escaping / unescaping with pyxml-compatible semantics.

Behavior parity target: /root/reference/pyxml/escape.py (observable behavior
re-implemented fresh; the quirks below are deliberate):

* ``escape_attrib`` maps a literal space to ``&nbsp;`` (escape.py:30-38) and
  CR/LF/TAB/' to numeric refs — non-standard but required for round-trip parity.
* ``unescape`` applies the reverse table as *sequential global replaces* in
  fixed order (escape.py:67-72), so ``&amp;lt;`` double-unescapes to ``<``.
* charrefs are resolved after the table pass (escape.py:74-82): hex form needs
  an odd token length (``x`` + even digit count) and decodes via latin-1, so
  ``&#xe9;`` -> ``é`` while ``&#x1F600;`` raises ``ValueError``.
"""
from __future__ import annotations

import re
from typing import List

__all__ = [
    'escape_cdata',
    'escape_attrib',
    'unescape',
    'find_charrefs',
    'find_entityrefs',
]

# (char, entity) pairs; tuple order IS the replace order and must not change.
_CDATA_PAIRS = (
    ('&', '&amp;'),
    ('<', '&lt;'),
    ('>', '&gt;'),
)

_ATTRIB_PAIRS = _CDATA_PAIRS + (
    ('"', '&quot;'),
    (' ', '&nbsp;'),
    ('\r', '&#13;'),
    ('\n', '&#10;'),
    ('\t', '&#09;'),
    ("'", '&#39;'),
)

# reverse direction, same relative order (escape.py:41)
_UNESCAPE_PAIRS = tuple((ent, ch) for ch, ent in _ATTRIB_PAIRS)

_CHARREF_RX = re.compile(r'&#\w+;')
_ENTITYREF_RX = re.compile(r'&\w+;')


def find_charrefs(text: str) -> List[str]:
    """return all numeric character references present in ``text``"""
    return _CHARREF_RX.findall(text)


def find_entityrefs(text: str) -> List[str]:
    """return all named entity references present in ``text``"""
    return _ENTITYREF_RX.findall(text)


def escape_cdata(text: str) -> str:
    """escape text-block special characters (sequential replaces)"""
    for ch, ent in _CDATA_PAIRS:
        if ch in text:
            text = text.replace(ch, ent)
    return text


def escape_attrib(text: str) -> str:
    """escape attribute-value special characters, including the space quirk"""
    for ch, ent in _ATTRIB_PAIRS:
        if ch in text:
            text = text.replace(ch, ent)
    return text


def _decode_charref(token: str) -> str:
    """decode the inner body of one ``&#...;`` reference"""
    body = token.strip('#&;')
    if len(body) % 2 == 1 and body[:1] == 'x':
        return bytes.fromhex(body[1:]).decode('latin1')
    if not body.isdigit():
        raise ValueError('invalid charref', token)
    return chr(int(body))


def unescape(text: str) -> str:
    """reverse :func:`escape_attrib` with order-sensitive global replaces"""
    if '&' not in text:  # fast path: nothing escaped
        return text
    for ent, ch in _UNESCAPE_PAIRS:
        if ent in text:
            text = text.replace(ent, ch)
    if '&#' in text:
        for token in find_charrefs(text):
            text = text.replace(token, _decode_charref(token))
    return text
