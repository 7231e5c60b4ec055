"""XPath evaluation pipeline.

Behavior parity target: /root/reference/pyxml/xpath/engine.py:102-151 and
xpath/__init__.py:14-60. Each path step is a set transformation over a
materialized element list; a trailing expression/function converts elements
to values, after which further traversal is an error.

Improvement over the reference (observably equivalent): a path can be
compiled once via :func:`compile_path` and reused across documents — the
reference re-lexes and re-compiles on every ``findall``. The Spark batch UDF
compiles each query once on the driver and applies it per document.
"""
from __future__ import annotations

from typing import Any, Callable, Iterator, List, Optional, Sequence

from ..doc import Element
from .exprs import coerce_value, collect_args, compile_filter, compile_pipeline
from .paths import (S_CHILD, S_DESC, S_EXPR, S_FILTER, S_FUNC, S_NODE,
                    S_PARENT, S_SELF, S_WILD, PathStep, lex_path)

__all__ = ['compile_path', 'run_steps', 'iter_xpath',
           'iterfind', 'find', 'findall', 'findtext']


def _ancestor(elem: Element, hops: int) -> Optional[Element]:
    for _ in range(hops):
        if elem.parent is None:
            return None
        elem = elem.parent
    return elem


class CompiledPath:
    """pre-lexed steps with pre-compiled filter/value programs"""

    __slots__ = ('steps', 'pure', 'source')

    def __init__(self, path: bytes, pure: bool):
        self.source = path
        self.pure = pure
        steps = []
        for step in lex_path(path):
            kind, value = step
            if kind == S_FILTER:
                steps.append((kind, value, compile_filter(value)))
            elif kind == S_EXPR and not pure:
                steps.append((kind, value, compile_pipeline(value, False)))
            elif kind == S_FUNC and not pure:
                steps.append((kind, value, compile_filter(value)))
            else:
                steps.append((kind, value, None))
        self.steps = steps


def compile_path(path, pure: bool = False) -> CompiledPath:
    if isinstance(path, str):
        path = path.encode()
    return CompiledPath(path, pure)


def run_steps(prog: CompiledPath, elems: Sequence[Element]) -> List[Any]:
    """apply compiled steps to an element set (engine.py:112-151)"""
    elements: List[Any] = list(elems)
    values: Optional[List[Any]] = None
    pure = prog.pure
    for kind, value, compiled in prog.steps:
        if values:
            raise ValueError('cannot traverse elemtree after expression', value)
        elif kind == S_CHILD:
            elements = [c for e in elements for c in e]
        elif kind == S_DESC:
            elements = [c for e in elements for c in e.iter()]
        elif kind == S_NODE:
            tag = value.decode()
            elements = [e for e in elements if e.tag == tag]
        elif kind in (S_WILD, S_SELF):
            continue
        elif kind == S_PARENT:
            hops = len(value)
            parents = (_ancestor(e, hops) for e in elements)
            elements = [p for p in parents if p is not None]
        elif kind == S_FILTER:
            elements = [e for e in elements if compiled(e)]
        elif pure and kind in (S_EXPR, S_FUNC):
            raise ValueError('toplevel expression disallowed', value)
        elif kind == S_EXPR:
            values = elements if values is None else values
            args, action, func = compiled
            if action and func:
                values = [func(v) for v in values]
            elif not action:
                getter = args[0]
                values = [coerce_value(getter(v)) for v in values]
        elif kind == S_FUNC:
            values = elements if values is None else values
            values = [compiled(v) for v in values]
        else:
            raise ValueError('unsupported token', kind, value)
    return values if values else elements


def iter_xpath(path: bytes, elems: Sequence[Element],
               pure: bool = False) -> Iterator[Any]:
    return iter(run_steps(compile_path(path, pure), elems))


def iterfind(elem: Element, path: str, namespaces=None) -> Iterator[Any]:
    return iter_xpath(path.encode(), (elem,), False)


def find(elem: Element, path: str, namespaces=None) -> Optional[Any]:
    try:
        return next(iterfind(elem, path, namespaces))
    except StopIteration:
        return None


def findall(elem: Element, path: str, namespaces=None) -> List[Any]:
    return list(iterfind(elem, path, namespaces))


def findtext(elem: Element, path: str, default=None, namespaces=None):
    match = find(elem, path, namespaces)
    if match is None:
        return default
    if not match.text:
        return ''
    return match.text
