"""XPath filter-expression lexing, compilation, and function library.

Behavior parity target: /root/reference/pyxml/xpath/lexer.py (ELexer),
engine.py:36-90 (expression folding) and functions.py (all 17 functions plus
comparison builtins), with the verified non-standard semantics:

* strict left-to-right folding, no operator precedence (engine.py:69-75);
* ``[N]`` is 1-based child position, ``position()`` is 0-based;
* ``substring(s, a, b)`` is the python slice ``s[a:b]``;
* ``translate(s, a, b)`` is substring replacement, not charset mapping;
* ``text()`` is own text plus space-joined child tails;
* ``last()`` is a predicate (is-last-sibling), not an index;
* ``=`` compares strings, ``< <= > >=`` parse ints strictly;
* a bare ``[@attr]`` filter means attr-present-and-non-empty.
"""
from __future__ import annotations

import re
import string
from typing import Callable, List, NamedTuple, Optional, Tuple, Union

from ..doc import Element

__all__ = [
    'T_BOOL', 'T_STR', 'T_INT', 'T_VAR', 'T_COMMA', 'T_EXPR', 'T_EQ',
    'T_FUNC', 'T_LT', 'T_GT', 'T_LTE', 'T_GTE', 'T_AND', 'T_OR',
    'ExprToken', 'lex_expression', 'compile_filter', 'compile_pipeline',
    'collect_args', 'coerce_value', 'ArgVal', 'ArgFn', 'EvalFn',
]

# token kinds, ordinals mirror the reference EToken (xpath/lexer.py:53-68)
(T_BOOL, T_STR, T_INT, T_VAR, T_COMMA, T_EXPR, T_EQ,
 T_FUNC, T_LT, T_GT, T_LTE, T_GTE, T_AND, T_OR) = range(1, 15)

_WS = frozenset(b'\n\r\t ')
_QUOTES = frozenset(b'"\'')
_ESPECIAL = frozenset(b'*[]()/<>,=.')
_DIGITS = frozenset(string.digits.encode())
_BSLASH = 0x5C

_VAR_RX = re.compile(r'^@\w+$')


class ExprToken(NamedTuple):
    kind: int
    value: bytes


class ArgVal(NamedTuple):
    """an evaluated argument: the producing token kind + stringified value"""
    kind: int
    value: str


EvalFn = Callable[[Element], Union[int, bool, str]]
ArgFn = Callable[[Element], ArgVal]


# ---------------------------------------------------------------- lexing

class _Cursor:
    """index cursor over expression bytes"""

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

    def skip_ws(self):
        while self.i < self.n and self.data[self.i] in _WS:
            self.i += 1

    def quoted(self, quote: int, val: bytearray):
        """same escape-parity rule as the scanner (_tokenize.py:105-120)"""
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
        """word until whitespace (consumed) or an expression special (kept)"""
        while True:
            c = self.get()
            if c is None or c in _WS:
                break
            if c in _ESPECIAL:
                self.back(1)
                break
            val.append(c)

    def parens(self, val: bytearray):
        """parenthesized run, quote-aware, to the matching close paren
        (xpath/lexer.py:205-223: brackets are counted but still appended)"""
        depth = 1
        while True:
            c = self.get()
            if c is None:
                break
            if c in _QUOTES:
                val.append(c)
                self.quoted(c, val)
            elif c == 0x28:  # (
                depth += 1
            elif c == 0x29:  # )
                depth -= 1
                if depth == 0:
                    break
            val.append(c)


def _first_byte(cur: _Cursor, c: int, val: bytearray) -> int:
    """classify a token from its first byte (xpath/lexer.py:225-251)"""
    if c == 0x40:  # @
        cur.word(val)
        return T_VAR
    if c == 0x2C:  # ,
        return T_COMMA
    if c == 0x3D:  # =
        return T_EQ
    if c == 0x3C:  # <
        return T_LT
    if c == 0x3E:  # >
        return T_GT
    if c == 0x28:  # (
        cur.parens(val)
        return T_EXPR
    if c in _DIGITS:
        val.append(c)
        cur.word(val)
        return T_INT
    if c in _QUOTES:
        cur.quoted(c, val)
        return T_STR
    val.append(c)
    return 0


def _lex_one(cur: _Cursor) -> Optional[ExprToken]:
    """one expression token (xpath/lexer.py:253-292)"""
    kind = 0
    val = bytearray()
    while True:
        c = cur.get()
        if c is None or c in _WS:
            break
        if not kind and not val:
            kind = _first_byte(cur, c, val)
            if kind and kind <= T_EQ:
                cur.skip_ws()
                break
            continue
        if kind in (T_LT, T_GT):
            if c == 0x3D:
                kind = T_LTE if kind == T_LT else T_GTE
            else:
                cur.back(1)
            cur.skip_ws()
            break
        if c == 0x28:  # ( after a word: function name
            kind = T_FUNC
            cur.back(1)
            break
        val.append(c)
    if not kind:
        word = bytes(val)
        if word == b'and':
            kind = T_AND
        elif word == b'or':
            kind = T_OR
        elif word in (b'true', b'false'):
            kind = T_BOOL
    if kind == 0 and not val:
        return None
    return ExprToken(kind, bytes(val))


def lex_expression(data: bytes) -> List[ExprToken]:
    cur = _Cursor(data)
    out = []
    while True:
        tok = _lex_one(cur)
        if tok is None:
            break
        out.append(tok)
    return out


# ------------------------------------------------------------ coercions

def _as_int(arg: ArgVal) -> int:
    if not arg.value.isdigit():
        raise ValueError('invalid integer', arg)
    return int(arg.value)


def _as_bool(arg: ArgVal) -> bool:
    if arg.value not in ('0', '1', 'true', 'false'):
        raise ValueError('invalid boolean', arg)
    return arg.value in ('1', 'true')


def coerce_value(arg: ArgVal) -> Union[bool, int, str]:
    """python value for an argument (functions.py:98-106)"""
    if arg.kind in (T_VAR, T_STR):
        return arg.value
    if arg.kind == T_INT:
        return _as_int(arg)
    if arg.value in ('0', '1', 'true', 'false'):
        return _as_bool(arg)
    return arg.value


# ------------------------------------------------------- function library

def _fn_index(e: Element, idx: ArgVal) -> bool:
    want = _as_int(idx)
    actual = 0
    if e.parent is not None:
        actual = e.parent.children.index(e) + 1
    return actual == want


def _fn_notempty(e: Element, var: ArgVal) -> bool:
    return bool(var.value)


def _fn_name(e: Element) -> str:
    return e.tag


def _fn_text(e: Element) -> str:
    """own text plus ' '-joined child tails (functions.py:158-164)"""
    out = e.text or ''
    for child in e.children:
        if child.tail:
            out += ' ' + child.tail
    return out


def _fn_count(e: Element, tag: ArgVal) -> int:
    return sum(c.tag == tag.value for c in e.children)


def _fn_position(e: Element) -> int:
    """0-based sibling index (functions.py:170-176; W3C is 1-based)"""
    if e.parent is not None:
        for n, elem in enumerate(e.parent.children):
            if elem is e:
                return n
    return 0


def _fn_not(e: Element, one: ArgVal) -> bool:
    return not _as_bool(one)


def _fn_contains(e: Element, one: ArgVal, two: ArgVal) -> bool:
    return two.value in one.value


def _fn_starts_with(e: Element, one: ArgVal, two: ArgVal) -> bool:
    return one.value.startswith(two.value)


def _fn_ends_with(e: Element, one: ArgVal, two: ArgVal) -> bool:
    return one.value.endswith(two.value)


def _fn_concat(e: Element, one: ArgVal, two: ArgVal) -> str:
    return one.value + two.value


def _fn_substring(e: Element, base: ArgVal, s: ArgVal, t: ArgVal) -> str:
    return base.value[_as_int(s):_as_int(t)]


def _fn_substring_before(e: Element, base: ArgVal, sub: ArgVal) -> str:
    at = base.value.find(sub.value)
    at = at if at >= 0 else len(base.value)
    return base.value[:at]


def _fn_substring_after(e: Element, base: ArgVal, sub: ArgVal) -> str:
    at = base.value.find(sub.value)
    at = at if at >= 0 else len(base.value)
    return base.value[at:]


def _fn_translate(e: Element, base: ArgVal, old: ArgVal, new: ArgVal) -> str:
    return base.value.replace(old.value, new.value)


def _fn_lower(e: Element, v: ArgVal) -> str:
    return v.value.lower()


def _fn_upper(e: Element, v: ArgVal) -> str:
    return v.value.upper()


def _fn_last(e: Element) -> bool:
    if e.parent is not None:
        children = e.parent.children
        return children.index(e) == len(children) - 1
    return True


def _op_eq(e, a: ArgVal, b: ArgVal) -> bool:
    return a.value == b.value


def _op_or(e, a: ArgVal, b: ArgVal) -> bool:
    return bool(coerce_value(a) or coerce_value(b))


def _op_and(e, a: ArgVal, b: ArgVal) -> bool:
    return bool(coerce_value(a) and coerce_value(b))


def _op_lt(e, a, b):
    return _as_int(a) < _as_int(b)


def _op_lte(e, a, b):
    return _as_int(a) <= _as_int(b)


def _op_gt(e, a, b):
    return _as_int(a) > _as_int(b)


def _op_gte(e, a, b):
    return _as_int(a) >= _as_int(b)


OPERATORS = {
    T_EQ: _op_eq,
    T_OR: _op_or,
    T_AND: _op_and,
    T_LT: _op_lt,
    T_LTE: _op_lte,
    T_GT: _op_gt,
    T_GTE: _op_gte,
}

FUNCTIONS = {
    b'index': _fn_index,
    b'notempty': _fn_notempty,
    b'name': _fn_name,
    b'text': _fn_text,
    b'count': _fn_count,
    b'position': _fn_position,
    b'not': _fn_not,
    b'contains': _fn_contains,
    b'starts-with': _fn_starts_with,
    b'ends-with': _fn_ends_with,
    b'substring': _fn_substring,
    b'substring-before': _fn_substring_before,
    b'substring-after': _fn_substring_after,
    b'translate': _fn_translate,
    b'lower-case': _fn_lower,
    b'upper-case': _fn_upper,
    b'last': _fn_last,
}


# ------------------------------------------------------------- compiling

def _literal_arg(tok: ExprToken) -> ArgFn:
    """argument getter for a literal or @attr token (functions.py:69-84)"""
    kind = tok.kind
    text = tok.value.decode()

    def getter(e: Element) -> ArgVal:
        val = e.attrib.get(text, '') if kind == T_VAR else text
        if kind == T_INT and not text.isdigit():
            raise ValueError('invalid integer', tok)
        return ArgVal(kind, val)

    return getter


def _expr_arg(kind: int, fn: EvalFn) -> ArgFn:
    """wrap a compiled sub-expression as an argument (functions.py:36-52)"""

    def getter(e: Element) -> ArgVal:
        raw = fn(e)
        if isinstance(raw, bool):
            value = 'true' if raw else 'false'
        elif isinstance(raw, int):
            value = str(raw)
        elif isinstance(raw, str):
            value = raw
        else:
            raise ValueError('unexpected expression result', kind, raw)
        return ArgVal(kind, value)

    return getter


def _bind(action: ExprToken, args: List[ArgFn]) -> EvalFn:
    """bind an operator/function token to its argument getters"""
    fn = OPERATORS.get(action.kind)
    if action.kind == T_FUNC and fn is None:
        fn = FUNCTIONS.get(action.value)
    if fn is None:
        raise ValueError('unsupported func', action)
    frozen = list(args)

    def invoke(e: Element):
        return fn(e, *[getter(e) for getter in frozen])

    return invoke


def compile_pipeline(expr: bytes, pure: bool = True
                     ) -> Tuple[List[ArgFn], Optional[ExprToken], EvalFn]:
    """left-to-right fold of an expression's tokens (engine.py:36-76).

    Returns (pending args, pending action, last compiled function). An action
    token is applied when the *next* argument arrives; the compiled result
    becomes argument #1 of the following action.
    """
    args: List[ArgFn] = []
    action: Optional[ExprToken] = None
    compiled: EvalFn = lambda _e: False
    if expr.isdigit():
        action = ExprToken(T_FUNC, b'index')
    if pure and _VAR_RX.match(expr.decode()):
        action = ExprToken(T_FUNC, b'notempty')
    for tok in lex_expression(expr):
        if tok.kind >= T_EQ:
            action = tok
            continue
        elif tok.kind <= T_VAR:
            args.append(_literal_arg(tok))
        elif tok.kind == T_EXPR:
            args.extend(collect_args(tok.value, pure))
        elif tok.kind == T_COMMA:
            pass
        else:
            raise ValueError('unsupported action?', tok)
        if action:
            compiled = _bind(action, args)
            args = [_expr_arg(action.kind, compiled)]
            action = None
    return args, action, compiled


def collect_args(expr: bytes, pure: bool = True) -> List[ArgFn]:
    args, action, _ = compile_pipeline(expr, pure)
    if action:
        raise ValueError('invalid arguments', action, args)
    return args


def compile_filter(expr: bytes, pure: bool = True) -> EvalFn:
    """compile a complete filter expression into one predicate"""
    args, action, compiled = compile_pipeline(expr, pure)
    if action and args:
        raise ValueError('incomplete expression', action, args)
    return compiled
