"""XPath path-step tokenizer.

Behavior parity target: /root/reference/pyxml/xpath/lexer.py (XLexer):

* ``/`` means *children-of* (not root), ``//`` descendants-including-self;
* N dots = N-1 parent hops; parent steps only work standalone/leading;
* a ``/`` followed by an expression (quote/@/paren before the next slash)
  collapses into SELF so ``//h1/text()`` evaluates over the h1 set
  (xpath/lexer.py:112-131,164-172);
* a NODE token that is not alphanumeric is re-lexed as FILTER or EXPRESSION
  (xpath/lexer.py:182-193);
* anything ending in ``()`` outside a filter is a FUNCTION token.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional

__all__ = [
    'S_SELF', 'S_PARENT', 'S_CHILD', 'S_DESC', 'S_NODE', 'S_WILD',
    'S_FILTER', 'S_FUNC', 'S_EXPR', 'PathStep', 'lex_path',
]

# step kinds; ordinals mirror the reference XToken (xpath/lexer.py:41-51)
(S_SELF, S_PARENT, S_CHILD, S_DESC, S_NODE,
 S_WILD, S_FILTER, S_FUNC, S_EXPR) = range(1, 10)

_WS = frozenset(b'\n\r\t ')
_QUOTES = frozenset(b'"\'')
_XSPECIAL = frozenset(b'*[]/')
_BSLASH = 0x5C
_DOT, _SLASH, _STAR, _LBRACK, _RBRACK, _AT = 0x2E, 0x2F, 0x2A, 0x5B, 0x5D, 0x40
_LPAREN, _RPAREN = 0x28, 0x29


class PathStep(NamedTuple):
    kind: int
    value: bytes


class _PCursor:
    __slots__ = ('data', 'i', 'n')

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.n = len(data)

    def get(self) -> Optional[int]:
        if self.i >= self.n:
            return None
        b = self.data[self.i]
        self.i += 1
        return b

    def back(self, k: int = 1):
        self.i -= k

    def quoted(self, quote: int, val: bytearray):
        data, i0 = self.data, self.i
        j = i0
        while True:
            j = data.find(quote, j)
            if j < 0:
                val += data[i0:]
                self.i = self.n
                return
            k = j
            while k > i0 and data[k - 1] == _BSLASH:
                k -= 1
            if (j - k) % 2 == 0:
                val += data[i0:j]
                self.i = j + 1
                return
            j += 1

    def word(self, val: bytearray):
        """word until whitespace (consumed) or a path special (kept)"""
        while True:
            c = self.get()
            if c is None or c in _WS:
                break
            if c in _XSPECIAL:
                self.back(1)
                break
            val.append(c)

    def bracketed(self, val: bytearray):
        """filter body to the closing bracket; quoted runs keep their quote
        chars doubled at the head exactly like xpath/lexer.py:73-86"""
        while True:
            c = self.get()
            if c is None or c == _RBRACK:
                break
            if c in _QUOTES:
                val.append(c)
                self.quoted(c, val)
            val.append(c)

    def freeform(self, val: bytearray):
        """top-level expression: runs until whitespace outside parens/brackets
        (xpath/lexer.py:88-110)"""
        depth: List[int] = []
        while True:
            c = self.get()
            if c is None:
                break
            if c in _WS and not depth:
                self.back(1)
                break
            elif c in _QUOTES:
                val.append(c)
                self.quoted(c, val)
            elif c == _LPAREN:
                depth.append(_RPAREN)
            elif c == _LBRACK:
                depth.append(_RBRACK)
            elif c in (_RPAREN, _RBRACK) and depth:
                if c == depth[-1]:
                    depth.pop()
            val.append(c)

    def expr_follows(self) -> bool:
        """after a lone '/', look ahead for an expression signature: a quote,
        '@' or '(' before the next '/'; '[' past the first byte stops the
        scan (xpath/lexer.py:112-131). Always rewinds."""
        i0 = self.i
        seen = 0
        found = False
        while True:
            c = self.get()
            if c is None:
                break
            seen += 1
            if c == _SLASH:
                break
            elif seen > 1 and c == _LBRACK:
                break
            elif c in b'\'"@(':
                found = True
                break
        self.i = i0
        return found


def _lex_step(cur: _PCursor) -> Optional[PathStep]:
    """one path step (xpath/lexer.py:133-197)"""
    kind = 0
    val = bytearray()
    while True:
        c = cur.get()
        if c is None:
            break
        if not kind:
            if c == _DOT:
                kind = S_SELF
            elif c == _SLASH:
                val.append(c)
                kind = S_CHILD
            elif c == _STAR:
                val.append(c)
                kind = S_WILD
                break
            elif c == _LBRACK:
                kind = S_FILTER
                cur.bracketed(val)
                break
            else:
                kind = S_NODE
                val.append(c)
                cur.word(val)
                break
            continue
        if kind == S_CHILD:
            if c == _SLASH:
                kind = S_DESC
                val.append(c)
                break
            cur.back(1)
            if cur.expr_follows():
                kind = S_SELF
            break
        elif kind in (S_SELF, S_PARENT):
            if c == _DOT:
                kind = S_PARENT
                val.append(c)
                continue
            cur.back(1)
            break
        raise ValueError('invalid character?', kind, chr(c))
    # a NODE that cannot be a tag re-lexes as FILTER or EXPRESSION; the
    # reference pushes back only the value bytes (a consumed separator space
    # stays consumed, xpath/lexer.py:183), so rebuild the buffer rather than
    # rewinding the cursor
    if kind == S_NODE and not val.isalnum():
        cur.data = bytes(val) + cur.data[cur.i:]
        cur.i = 0
        cur.n = len(cur.data)
        val = bytearray()
        c = cur.get()
        if c == _LBRACK:
            kind = S_FILTER
            cur.bracketed(val)
        else:
            if c is not None:
                cur.back(1)
            kind = S_EXPR
            cur.freeform(val)
    if kind != S_FILTER and val.endswith(b'()'):
        kind = S_FUNC
    if kind == 0 and not val:
        return None
    return PathStep(kind, bytes(val))


def lex_path(path: bytes) -> List[PathStep]:
    cur = _PCursor(path)
    steps = []
    while True:
        before = (cur.i, cur.n)
        step = _lex_step(cur)
        if step is None:
            break
        steps.append(step)
        if (cur.i, cur.n) == before:
            # zero-progress step (e.g. a bare space re-lexed into an empty
            # EXPRESSION): the reference's lazy pipeline would produce this
            # token forever, but evaluation always terminates at the first
            # one (IndexError on the empty arg list, or the
            # traverse-after-expression/pure-mode ValueError), so emitting
            # it once is observably identical (engine.py:117-151,
            # functions.py:69-84).
            break
    return steps
