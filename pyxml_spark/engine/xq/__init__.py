"""XPath-style query language (pyxml-semantics) over the engine DOM.

Parity target: /root/reference/pyxml/xpath/ — see paths.py / exprs.py / run.py
for the per-module citations.
"""
from .exprs import FUNCTIONS, OPERATORS, compile_filter, lex_expression
from .paths import PathStep, lex_path
from .run import (compile_path, find, findall, findtext, iter_xpath, iterfind,
                  run_steps)

__all__ = [
    'compile_path', 'run_steps', 'iter_xpath',
    'iterfind', 'find', 'findall', 'findtext',
    'lex_path', 'lex_expression', 'compile_filter',
    'FUNCTIONS', 'OPERATORS', 'PathStep',
]
