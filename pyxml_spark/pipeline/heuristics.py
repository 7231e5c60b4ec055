"""Main-content heuristics over a parsed DOM.

Deterministic boilerplate scoring in the lineage of published main-content
extraction work (Boilerpipe, Kohlschuetter et al., WSDM 2010; jusText;
Readability): block segmentation + text/link-density + tag/class signals.
There is no reference counterpart (the reference stops at DOM + XPath); the
north_star requires "DOM heuristics (text-density, link-density, tag-class
boilerplate scoring ...) that emit cleaned main-content text and char-span
offsets per turn".

Everything here is a pure function of the DOM shape (tag/attrib/text/tail/
children) so it runs identically over our Element and the reference's Element
— that property is what the per-turn equality oracle tests rely on.
"""
from __future__ import annotations

import re
from typing import Any, List, NamedTuple, Optional, Tuple

__all__ = ['ExtractConfig', 'Extraction', 'score_blocks', 'extract_main']

Span = Tuple[int, int]

#: elements that start a new content block
BLOCK_TAGS = frozenset({
    'document', 'html', 'body', 'main', 'article', 'section', 'div', 'p',
    'li', 'ul', 'ol', 'dl', 'dt', 'dd', 'h1', 'h2', 'h3', 'h4', 'h5', 'h6',
    'td', 'th', 'tr', 'table', 'pre', 'blockquote', 'figure', 'figcaption',
    'header', 'footer', 'nav', 'aside', 'form', 'fieldset',
})

#: subtrees whose text is never content
SKIP_TAGS = frozenset({
    'script', 'style', 'head', 'noscript', 'template', 'title', 'meta',
    'link', 'svg', 'iframe', 'object', 'embed', 'option', 'select', 'button',
})

#: tags that are boilerplate containers by themselves
BOILER_TAGS = frozenset({'nav', 'aside', 'footer', 'header', 'form', 'fieldset'})

#: class/id substrings that mark a subtree as boilerplate
_BOILER_HINT_RX = re.compile(
    r'(?:^|[\s_-])(?:nav|navbar|menu|footer|header|sidebar|side-bar|banner|'
    r'breadcrumbs?|share|social|advert|ads?|sponsor|promo|cookie|consent|'
    r'copyright|pagination|pager|comment-form|subscribe|newsletter|related|'
    r'widget|toolbar|masthead)(?:$|[\s_-])')

_WS_RX = re.compile(r'[ \t\r\n\f\v]+')


class ExtractConfig(NamedTuple):
    """thresholds are fixed defaults; determinism requires they only change
    via explicit config, never environment"""
    min_block_chars: int = 10
    max_link_density: float = 0.4
    join_blocks_with: str = '\n'


class _Fragment(NamedTuple):
    block_id: int
    text: str
    spans: List[Span]
    is_link: bool


class _Block(NamedTuple):
    block_id: int
    text: str
    n_chars: int
    link_chars: int
    boiler: bool
    spans: List[Span]


class Extraction(NamedTuple):
    main_text: str
    spans: List[Span]
    n_nodes: int
    n_text_chars: int


def _norm(text: str) -> str:
    return _WS_RX.sub(' ', text).strip()


def _is_boiler_elem(tag: Any, attrib) -> bool:
    if tag in BOILER_TAGS:
        return True
    if not attrib:
        return False
    hint = attrib.get('class', '') + ' ' + attrib.get('id', '')
    return bool(_BOILER_HINT_RX.search(hint.lower()))


def _gather(root) -> Tuple[List[_Fragment], List[bool], int]:
    """document-order fragment collection (text before children, each child's
    tail after that child's subtree), tracking nearest block / link / skip /
    boiler state without recursion."""
    fragments: List[_Fragment] = []
    block_boiler: List[bool] = [False]
    n_nodes = 0

    def enter(elem, block_id, in_link, in_skip, boiler):
        nonlocal n_nodes
        n_nodes += 1
        tag = elem.tag
        if isinstance(tag, str):
            low = tag.lower()
            if low in SKIP_TAGS:
                in_skip = True
            if not boiler and _is_boiler_elem(low, elem.attrib):
                boiler = True
            if low == 'a':
                in_link = True
            if low in BLOCK_TAGS:
                block_id = len(block_boiler)
                block_boiler.append(boiler)
            elif boiler:
                block_boiler[block_id] = True
        else:
            low = None  # comment/declaration/PI: no text contribution
        if low is not None and elem.text and not in_skip:
            spans = getattr(elem, 'text_spans', None) or []
            fragments.append(_Fragment(block_id, elem.text, spans, in_link))
        return block_id, in_link, in_skip, boiler

    # iterative DFS with explicit tail emission after each subtree
    work = [('enter', root, 0, False, False, False)]
    while work:
        op = work.pop()
        if op[0] == 'tail':
            _, child, block_id, in_link, in_skip = op
            if child.tail and not in_skip:
                tspans = getattr(child, 'tail_spans', None) or []
                fragments.append(_Fragment(block_id, child.tail, tspans,
                                           in_link))
            continue
        _, elem, block_id, in_link, in_skip, boiler = op
        cblock, clink, cskip, cboiler = enter(
            elem, block_id, in_link, in_skip, boiler)
        # push children + their tails in reverse so they pop in order;
        # a tail belongs to the parent's context, not the child's
        for child in reversed(elem.children):
            work.append(('tail', child, cblock, clink, cskip))
            work.append(('enter', child, cblock, clink, cskip, cboiler))
    return fragments, block_boiler, n_nodes


def score_blocks(root, config: ExtractConfig = ExtractConfig()):
    """aggregate fragments into scored blocks (document order); returns
    (blocks, n_nodes) — the node count falls out of the same walk"""
    fragments, block_boiler, n_nodes = _gather(root)
    order: List[int] = []
    texts = {}
    links = {}
    spans = {}
    for frag in fragments:
        norm = _norm(frag.text)
        if not norm:
            continue
        if frag.block_id not in texts:
            order.append(frag.block_id)
            texts[frag.block_id] = []
            links[frag.block_id] = 0
            spans[frag.block_id] = []
        texts[frag.block_id].append(norm)
        if frag.is_link:
            links[frag.block_id] += len(norm)
        spans[frag.block_id].extend(frag.spans)
    blocks = []
    for bid in order:
        text = ' '.join(texts[bid])
        blocks.append(_Block(bid, text, len(text), links[bid],
                             block_boiler[bid] if bid < len(block_boiler)
                             else False, spans[bid]))
    return blocks, n_nodes


def extract_main(root, config: ExtractConfig = ExtractConfig(),
                 count_nodes: bool = True) -> Extraction:
    """main-content text + spans from a parsed DOM"""
    blocks, n_nodes = score_blocks(root, config)
    kept_texts: List[str] = []
    kept_spans: List[Span] = []
    total_chars = 0
    for blk in blocks:
        total_chars += blk.n_chars
        if blk.boiler:
            continue
        if blk.n_chars < config.min_block_chars:
            continue
        if blk.n_chars and blk.link_chars / blk.n_chars > config.max_link_density:
            continue
        kept_texts.append(blk.text)
        kept_spans.extend(blk.spans)
    return Extraction(config.join_blocks_with.join(kept_texts), kept_spans,
                      n_nodes if count_nodes else 0, total_chars)
