"""Exploded DOM node table: Spark-native analytics over parsed documents.

The engine's in-UDF tree is the parity path; this module is the *relational*
face promised in SURVEY.md §2/§2-C: each document explodes into rows
``(doc_id, node_id, parent_id, depth, pos, tag, attrib, text, tail)`` with
pre/post-order numbering, so XPath-style queries become joins/windows that
Catalyst optimizes:

* ``/`` (children)        -> ``child.parent_id = node.node_id``
* ``//`` (descendants+self) -> ``child.pre BETWEEN node.pre AND node.post``
* tag filter              -> ``tag = lit``
* ``[@attr]``             -> ``coalesce(attrib['attr'], '') <> ''``
* ``[N]`` (1-based index) -> ``pos = N``  (pos = 1-based child position)
* ``position()`` (0-based)-> ``pos - 1``

Marker nodes (comment/declaration/PI) carry a ``kind`` discriminator and a
NULL tag, matching the reference's class-object tags never equalling strings.
"""
from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql.types import (IntegerType, LongType, MapType, StringType,
                               StructField, StructType)

__all__ = ['NODE_SCHEMA', 'explode_documents', 'node_rows']

NODE_SCHEMA = StructType([
    StructField('doc_id', LongType(), False),
    StructField('node_id', IntegerType(), False),
    StructField('parent_id', IntegerType(), True),
    StructField('depth', IntegerType(), False),
    StructField('pos', IntegerType(), False),       # 1-based sibling index
    StructField('pre', IntegerType(), False),       # pre-order number
    StructField('post', IntegerType(), False),      # max pre in subtree
    StructField('kind', StringType(), False),       # element|comment|decl|pi
    StructField('tag', StringType(), True),
    StructField('attrib', MapType(StringType(), StringType()), True),
    StructField('text', StringType(), True),
    StructField('tail', StringType(), True),
])


def node_rows(doc_id: int, root) -> Iterator[tuple]:
    """flatten one DOM into node-table rows (iterative, pre/post numbered)"""
    counter = 0
    # stack of (elem, parent_id, depth, pos, state) where state carries the
    # assigned node_id for post computation on exit
    out = []
    stack = [(root, None, 0, 1, None)]
    # two-phase: assign pre on entry, post on exit
    entries = []
    while stack:
        elem, parent_id, depth, pos, marker = stack.pop()
        if marker is not None:
            # exit record: fix up post = last assigned pre
            entries[marker] = entries[marker][:6] + (counter,) \
                + entries[marker][7:]
            continue
        counter += 1
        node_id = counter
        tag = elem.tag
        if isinstance(tag, str):
            kind, tag_out = 'element', tag
        else:
            kind = {'Comment': 'comment', 'Declaration': 'decl',
                    'ProcessingInstruction': 'pi'}.get(
                        type(elem).__name__, 'other')
            tag_out = None
        idx = len(entries)
        entries.append((doc_id, node_id, parent_id, depth, pos, node_id,
                        node_id, kind, tag_out, dict(elem.attrib) or None,
                        elem.text, elem.tail))
        stack.append((None, None, 0, 0, idx))  # exit marker
        for child_pos in range(len(elem.children), 0, -1):
            stack.append((elem.children[child_pos - 1], node_id, depth + 1,
                          child_pos, None))
    out.extend(entries)
    return iter(out)


def explode_documents(df, payload_col: str = 'payload',
                      id_col: str = 'doc_id', mode: str = 'html',
                      partitions: Optional[int] = None):
    """(id, payload) DataFrame -> node table via an Arrow-batched kernel"""
    import pandas as pd

    from ..engine.parse import parse_document

    def kernel(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    root = parse_document(payload.encode(), mode=mode,
                                          fix_broken=True)
                except Exception:  # noqa: BLE001 - per-doc containment
                    continue
                rows.extend(node_rows(int(doc_id), root))
            yield pd.DataFrame(rows, columns=[f.name for f in NODE_SCHEMA])

    src = df.select(id_col, payload_col)
    if partitions:
        src = src.repartition(partitions, id_col)
    return src.mapInPandas(kernel, schema=NODE_SCHEMA)
