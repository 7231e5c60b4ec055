"""DOM node types (ElementTree-compatible API).

Behavior parity target: /root/reference/pyxml/element.py. The public surface
(`__iter__/__len__/__getitem__/append/get/set/iter/itertext/find*`) matches the
reference; internals are our own. Extra ``text_spans``/``tail_spans`` slots
carry char-offset spans into the raw payload (the reference only tracks
line/col; our pipeline needs absolute offsets — SURVEY.md §7 hard-part 2).
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

__all__ = [
    'Element',
    'Comment',
    'Declaration',
    'ProcessingInstruction',
    'prettify',
]

Span = Tuple[int, int]


class Element:
    """a single DOM node with parent/children links"""

    __slots__ = ('tag', 'attrib', 'parent', 'children', 'text', 'tail',
                 'text_spans', 'tail_spans')

    def __init__(self, tag, attrib: Optional[Dict[str, str]] = None, **extra):
        self.tag = tag
        if extra:
            self.attrib = {**(attrib or {}), **extra}
        else:
            self.attrib = dict(attrib) if attrib else {}
        self.parent: Optional['Element'] = None
        self.children: List['Element'] = []
        self.text: Optional[str] = None
        self.tail: Optional[str] = None
        self.text_spans: Optional[List[Span]] = None
        self.tail_spans: Optional[List[Span]] = None

    # -- container protocol (element.py:54-123) --

    def __repr__(self) -> str:
        return 'Element(tag=%r, attrib=%r)' % (self.tag, self.attrib)

    def __iter__(self) -> Iterator['Element']:
        return iter(self.children)

    def __len__(self) -> int:
        return len(self.children)

    def __bool__(self):
        # ambiguous (truthiness vs emptiness); reference refuses too
        raise NotImplementedError

    def __getitem__(self, index: int) -> 'Element':
        return self.children[index]

    def __setitem__(self, index: int, element: 'Element'):
        self.children[index] = element

    @classmethod
    def makeelement(cls, tag, attrib) -> 'Element':
        return cls(tag, attrib)

    @classmethod
    def new(cls, tag, attrib=None, text=None, tail=None, children=None) -> 'Element':
        elem = cls(tag, attrib)
        elem.text = text
        elem.tail = tail
        elem.children = children or []
        return elem

    def insert(self, index: int, element: 'Element'):
        self.children.insert(index, element)

    def append(self, element: 'Element'):
        self.children.append(element)
        element.parent = self

    def extend(self, elements):
        elements = list(elements)
        self.children.extend(elements)
        for elem in elements:
            elem.parent = self

    def remove(self, element: 'Element'):
        self.children.remove(element)
        element.parent = None

    def clear(self):
        for elem in self.children:
            elem.parent = None
        self.children.clear()

    # -- attribute access --

    def get(self, key: str, default: Any = None):
        return self.attrib.get(key, default)

    def set(self, key: str, value: str):
        self.attrib[key] = value

    def keys(self):
        return self.attrib.keys()

    def values(self):
        return self.attrib.values()

    def items(self):
        return self.attrib.items()

    # -- traversal --

    def iter(self, tag=None) -> Iterator['Element']:
        """depth-first pre-order walk; self is yielded first (element.py:129-134)"""
        stack = [self]
        while stack:
            node = stack.pop()
            if tag is None or tag == node.tag:
                yield node
            stack.extend(reversed(node.children))

    def itertext(self) -> Iterator[str]:
        """document-order text (no tails), skipping comment/declaration/PI
        subtrees like the reference (element.py:136-141, 189-190); explicit
        stack so pathologically deep trees stay within the recursion limit"""
        stack = [self]
        while stack:
            node = stack.pop()
            if isinstance(node, _Marker):
                continue
            if node.text:
                yield node.text
            stack.extend(reversed(node.children))

    def prettify(self):
        prettify(self)

    # -- queries (element.py:143-168) --

    def find(self, path: str):
        from . import xq
        return xq.find(self, path)

    def must_find(self, path: str):
        match = self.find(path)
        if match is None:
            raise KeyError(f'No Such Element At Xpath: {path!r}')
        return match

    def findall(self, path: str) -> List[Any]:
        from . import xq
        return xq.findall(self, path)

    def finditer(self, path: str):
        from . import xq
        return xq.iterfind(self, path)

    def findtext(self, path: str, default=None):
        from . import xq
        return xq.findtext(self, path, default)

    def xpath(self, path: str) -> List['Element']:
        return self.findall(path)

    # -- lxml compatibility --

    def getparent(self) -> Optional['Element']:
        return self.parent

    def getchildren(self) -> List['Element']:
        return self.children


class _Marker(Element):
    """base for non-element nodes; the node's tag is its own class object,
    matching the reference convention (element.py:178-183) so tag filters
    never match these by string."""

    def __init__(self, text: str):
        super().__init__(self.__class__)
        self.text = text

    def __repr__(self) -> str:
        return f'{self.__class__.__name__}(text={self.text})'

    def itertext(self):
        yield from ()


class Comment(_Marker):
    pass


class Declaration(_Marker):
    pass


class ProcessingInstruction(_Marker):

    def __init__(self, target: str, value: str):
        super().__init__(f'{target} {value}')
        self.target = target
        self.value = value


def prettify(element: Element, indent: int = 2):
    """re-indent text/tail in a breadth-first pass (element.py:18-35)"""
    queue: List[Tuple[int, Element, bool]] = [(0, element, False)]
    while queue:
        level, elem, last = queue.pop(0)
        tail_level = level if not last else (level - 1)
        nxt = level + 1
        elem.text = (elem.text or '').strip()
        elem.tail = '\n' + ' ' * (tail_level * indent)
        if elem.children:
            elem.text = '\n' + ' ' * (nxt * indent) + elem.text
        for n, child in enumerate(elem.children, 1):
            queue.append((nxt, child, n == len(elem.children)))
