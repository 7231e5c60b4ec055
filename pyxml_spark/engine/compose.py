"""Tree composition from parse events.

Behavior parity target: /root/reference/pyxml/builder.py (TreeBuilder). The
event API (``start/end/startend/data/comment/declaration/pi/close``) and every
repair path are preserved, including these verified quirks:

* flushed text/tail becomes ``''`` (never ``None``) because the reference's
  empty-buffer guard is dead code (builder.py:39);
* under ``fix_broken`` a duplicate text/tail assignment concatenates *without*
  clearing the buffer (builder.py:44-58);
* a second root under ``fix_broken`` wraps everything in a synthetic
  ``document`` element with ``text='\\n'`` (builder.py:68-75);
* an end tag that matches nothing deeper still pops the current element
  (builder.py:94-111);
* ``close`` auto-closes the whole open stack under ``fix_broken``
  (builder.py:137-148).

The implementation is structured differently from the reference: text/tail
settling is one slot-generic path (``getattr``/``setattr`` over the slot
name) instead of two mirrored branches, mismatched-end repair is an
iterative pop loop instead of recursion, and the multi-root document wrap
is factored out of adoption. Differential fuzzing (tests/test_builder_ported,
test_fuzz_parity, test_oracle_diff) pins the observable behavior —
including the exact ''-assignment side effects of repeated settles during
repair — to the reference byte for byte.

Extension over the reference: optional span tracking — ``data`` accepts the
raw-payload char span of each fragment and ``_settle`` attaches the collected
spans to the element's ``text_spans``/``tail_spans``.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Type

from .doc import Comment, Declaration, Element, ProcessingInstruction

__all__ = ['ComposeError', 'TreeComposer']

Span = Tuple[int, int]


class ComposeError(SyntaxError):
    """raised when the event stream cannot form a (repairable) tree"""


class TreeComposer:
    """assembles Elements from start/end/data events"""

    __slots__ = ('root', 'element_factory', 'comment_factory', 'declare_factory',
                 'pi_factory', 'insert_comments', 'insert_declares', 'insert_pis',
                 'fix_broken', 'last', 'open', 'frags', 'spans', 'in_tail', 'final')

    def __init__(self,
                 root: Optional[Element] = None,
                 element_factory: Type[Element] = Element,
                 comment_factory: Type[Element] = Comment,
                 declare_factory: Type[Element] = Declaration,
                 pi_factory: Type[Element] = ProcessingInstruction,
                 insert_comments: bool = False,
                 insert_declares: bool = False,
                 insert_pis: bool = False,
                 fix_broken: bool = False):
        self.root = root
        self.element_factory = element_factory
        self.comment_factory = comment_factory
        self.declare_factory = declare_factory
        self.pi_factory = pi_factory
        self.insert_comments = insert_comments
        self.insert_declares = insert_declares
        self.insert_pis = insert_pis
        self.fix_broken = fix_broken
        self.last: Optional[Element] = root
        self.open: List[Element] = [] if root is None else [root]
        self.frags: List[str] = []
        self.spans: List[Span] = []
        self.in_tail = False
        self.final = 0 if root is None else 1

    # ------------------------------------------------------------- internal

    def _settle(self):
        """assign the buffered text into ``last.text`` or ``last.tail`` —
        one slot-generic path for both destinations. Mirrors the observable
        contract of the reference ``_flush``: always joins (the reference's
        empty-buffer guard is dead code, so '' lands where no text came),
        and under fix_broken a duplicate assignment concatenates while
        keeping the buffer."""
        last = self.last
        if last is None:
            self.frags = []
            self.spans = []
            return
        slot = 'tail' if self.in_tail else 'text'
        text = ''.join(self.frags)
        existing = getattr(last, slot)
        if existing:
            if not self.fix_broken:
                raise ComposeError(f'Element {slot} already assigned')
            # repair: concatenate and deliberately keep the buffer
            # (reference builder.py:47-49)
            setattr(last, slot, existing + text)
            return
        setattr(last, slot, text)
        if self.spans:
            span_slot = slot + '_spans'
            setattr(last, span_slot,
                    (getattr(last, span_slot) or []) + self.spans)
        self.frags = []
        self.spans = []

    def _wrap_multiroot(self):
        """second toplevel element under fix_broken: nest the current root
        inside a synthetic ``document`` shell that becomes the new root"""
        shell = Element('document')
        shell.text = '\n'
        shell.append(self.root)
        self.root = shell
        self.open.insert(0, shell)

    def _adopt(self, elem: Element):
        """place a finished/opened element into the tree"""
        self.last = elem
        if not self.open:
            if self.root is None:
                self.root = elem
                return
            if not self.fix_broken:
                raise ComposeError('more than one tree present')
            self._wrap_multiroot()
        self.open[-1].append(elem)

    def _inline(self, factory, *args):
        self._settle()
        self._adopt(factory(*args))
        self.in_tail = True

    # ----------------------------------------------------------- event API

    def start(self, tag: str, attrs: Dict[str, str]):
        self._settle()
        elem = self.element_factory(tag, attrs)
        self._adopt(elem)
        self.open.append(elem)
        self.in_tail = False

    def end(self, tag: str):
        # iterative form of the reference's recursive repair: keep settling
        # and popping while the wanted tag exists deeper in the stack; a
        # stray end that matches nothing still consumes the current element
        while True:
            if not self.open:
                if self.fix_broken:
                    return
                raise ComposeError(f'Unexpected End. Tree Is Empty: {tag}')
            self._settle()
            self.last = self.open.pop()
            if self.last.tag != tag:
                if not self.fix_broken:
                    raise ComposeError(
                        f'End Tag Mismatch (Expected {self.last.tag}, '
                        f'Got {tag})')
                if any(e.tag == tag for e in self.open):
                    continue
            break
        self.in_tail = True

    def startend(self, tag: str, attrs: Dict[str, str]):
        self.start(tag, attrs)
        self.end(tag)

    def data(self, data: str, span: Optional[Span] = None):
        self.frags.append(data)
        if span is not None:
            self.spans.append(span)

    def comment(self, text: str):
        if self.insert_comments:
            self._inline(self.comment_factory, text)

    def declaration(self, declaration: str):
        if self.root is not None and self.insert_declares:
            self._inline(self.declare_factory, declaration)

    def pi(self, target: str, pi: str):
        if self.insert_pis:
            self._inline(self.pi_factory, target, pi)

    def close(self) -> Element:
        if len(self.open) != self.final:
            if not self.fix_broken:
                raise ComposeError(
                    f'Missing End Tags {[e.tag for e in self.open]}')
            while len(self.open) != self.final:
                self.end(self.open[-1].tag)
        if self.root is None:
            raise ComposeError('Missing Toplevel Element')
        return self.root
