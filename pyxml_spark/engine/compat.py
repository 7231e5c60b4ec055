"""`xml.etree.ElementTree`-flavored aliases for code ported from the
reference.

Mirrors the export surface of the reference's compat layer
(/root/reference/pyxml/compat/ElementTree.py:26-43): ``XML``/``PI``/
``XMLParser`` aliases and ``SubElement``. The reference additionally
monkey-patches the stdlib ``xml.etree`` modules in place
(compat/__init__.py:11-28); that is deliberately NOT ported — mutating
``sys.modules`` inside Spark workers would leak the patch across unrelated
UDFs on a shared executor (SURVEY.md §2-E). Import from this module instead
of patching.
"""
from __future__ import annotations

from .compose import TreeComposer as TreeBuilder
from .doc import Comment, Element, ProcessingInstruction
from .parse import Parser, fromstring
from .render import ElementTree, tostring
# the ElementPath face (reference compat/ElementPath.py:4-12)
from .xq import find, findall, findtext, iterfind

__all__ = [
    'tostring', 'fromstring', 'Element', 'Comment', 'ProcessingInstruction',
    'ElementTree', 'TreeBuilder',
    'iterfind', 'find', 'findall', 'findtext',
    'XML', 'PI', 'XMLParser', 'SubElement', 'patched',
]

#: alias for fromstring (reference compat/ElementTree.py:27)
XML = fromstring

#: alias for ProcessingInstruction (reference compat/ElementTree.py:30)
PI = ProcessingInstruction

#: the feed parser under its stdlib name (reference compat/ElementTree.py:33)
XMLParser = Parser


def SubElement(parent: Element, tag: str, attrib=None, **extra) -> Element:
    """create a child of ``parent`` and append it (reference
    compat/ElementTree.py:38-43: extra kwargs overlay the attrib dict)"""
    attrib = {**(attrib or {}), **extra}
    element = parent.makeelement(tag, attrib)
    parent.append(element)
    return element


def patched():
    """scoped equivalent of the reference's permanent ``monkey_patch``:
    within the ``with`` block, ``import xml.etree.ElementTree`` resolves to
    this module; on exit the original stdlib module is restored exactly.

    Driver-side convenience for running reference-targeting code verbatim.
    Never use inside Spark UDFs — a worker process is shared across
    unrelated tasks, and even a scoped patch is process-global while held.
    """
    import contextlib
    import sys

    @contextlib.contextmanager
    def _patch():
        name = 'xml.etree.ElementTree'
        this = sys.modules[__name__]
        had = name in sys.modules
        saved = sys.modules.get(name)
        parent = None
        if had:
            import xml.etree
            parent = xml.etree
        sys.modules[name] = this
        if parent is not None:
            parent.ElementTree = this
        try:
            yield this
        finally:
            if had:
                sys.modules[name] = saved
                if parent is not None:
                    parent.ElementTree = saved
            else:
                sys.modules.pop(name, None)

    return _patch()
