"""PDF / layout parsing: binary document payloads -> layout blocks -> main text.

The north_rule names "PDF/layout parse" alongside HTML boilerplate strip as a
main-content extraction capability. The Spark shape of that capability is:

1. documents ride as opaque ``binary`` payload columns;
2. an Arrow-batched kernel (``mapInArrow``) parses each payload into *layout
   blocks* — one output row per block: page, reading-order index, kind
   (header/body/heading/footer), bbox, font size, text — exploding rows
   per input document;
3. main-content selection over blocks is **relational** (filter boilerplate
   kinds, order by (page, block_idx), aggregate per doc) so Catalyst runs it
   and DuckDB can oracle-check it.

The sandbox has no PDF library, so the default parser in ``PDF_PARSERS``
reads a deterministic binary container (``FPDF``, written by
``synth_pdf_payload``) with real structure — magic, page table, per-block
bbox/font/utf-8 text records — making the parse a genuine decode step, not a
hash fake. A production deployment swaps in pdfminer/PyMuPDF behind the same
``(payload) -> pages`` signature; everything from the registry outward
(schema, explode kernel, per-row error containment, relational selection) is
the production code path.
"""
from __future__ import annotations

import struct
from typing import Callable, Dict, Iterator, List, Optional

from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, FloatType, IntegerType, LongType,
                               StringType, StructField, StructType)

__all__ = ['LAYOUT_BLOCKS_SCHEMA', 'PDF_PARSERS', 'synth_pdf_payload',
           'fake_pdf_parse', 'parse_layout_batches', 'parse_layout',
           'extract_pdf_main', 'CHUNK_CHARS', 'BLOCKS_PER_PAGE']

#: body characters per block / body blocks per page in the synthetic format
CHUNK_CHARS = 120
BLOCKS_PER_PAGE = 3

_MAGIC = b'FPDF'
_KINDS = ('header', 'body', 'footer', 'heading')

LAYOUT_BLOCKS_SCHEMA = StructType([
    StructField('doc_id', LongType(), False),
    StructField('page', IntegerType(), True),
    StructField('block_idx', IntegerType(), True),   # reading order in page
    StructField('kind', StringType(), True),
    StructField('x0', FloatType(), True),
    StructField('y0', FloatType(), True),
    StructField('x1', FloatType(), True),
    StructField('y1', FloatType(), True),
    StructField('font_size', FloatType(), True),
    StructField('text', StringType(), True),
    StructField('parse_error', StringType(), True),
])

LAYOUT_INPUT_SCHEMA = StructType([
    StructField('doc_id', LongType(), False),
    StructField('payload', BinaryType(), True),
])


def synth_pdf_payload(text: str, doc_id: int) -> bytes:
    """deterministic FPDF container for one document's text.

    Pages hold BLOCKS_PER_PAGE body chunks of CHUNK_CHARS characters each
    (verbatim substrings of ``text``), framed by a synthetic running header
    and page-number footer — the boilerplate the extractor must strip.
    """
    chunks = [text[i:i + CHUNK_CHARS]
              for i in range(0, len(text), CHUNK_CHARS)] or ['']
    pages = [chunks[i:i + BLOCKS_PER_PAGE]
             for i in range(0, len(chunks), BLOCKS_PER_PAGE)]
    out = [_MAGIC, struct.pack('>H', len(pages))]
    for pno, body in enumerate(pages):
        blocks = ([(0, 72.0, 730.0, 540.0, 752.0, 8.0,
                    f'doc {doc_id} — running header')]
                  + [(1, 72.0, 680.0 - 200.0 * k, 540.0, 860.0 - 200.0 * k,
                      11.0, chunk) for k, chunk in enumerate(body)]
                  + [(2, 72.0, 36.0, 540.0, 48.0, 8.0, str(pno + 1))])
        out.append(struct.pack('>H', len(blocks)))
        for kind, x0, y0, x1, y1, font, btext in blocks:
            raw = btext.encode('utf-8')
            out.append(struct.pack('>B5fH', kind, x0, y0, x1, y1, font,
                                   len(raw)))
            out.append(raw)
    return b''.join(out)


def fake_pdf_parse(payload: bytes) -> List[List[dict]]:
    """parse one FPDF container -> pages of block dicts; raises ValueError on
    malformed input exactly like a real PDF parser raises on corrupt files"""
    if not payload or payload[:4] != _MAGIC:
        raise ValueError('not a PDF payload (bad magic)')
    view = memoryview(payload)
    pos = 4
    (n_pages,) = struct.unpack_from('>H', view, pos)
    pos += 2
    pages: List[List[dict]] = []
    for _ in range(n_pages):
        (n_blocks,) = struct.unpack_from('>H', view, pos)
        pos += 2
        blocks: List[dict] = []
        for _ in range(n_blocks):
            kind, x0, y0, x1, y1, font, tlen = struct.unpack_from(
                '>B5fH', view, pos)
            pos += struct.calcsize('>B5fH')
            text = bytes(view[pos:pos + tlen]).decode('utf-8')
            pos += tlen
            if kind >= len(_KINDS):
                raise ValueError(f'unknown block kind {kind}')
            blocks.append(dict(kind=_KINDS[kind], x0=x0, y0=y0, x1=x1, y1=y1,
                               font_size=font, text=text))
        pages.append(blocks)
    if pos != len(payload):
        raise ValueError('trailing bytes after last page')
    return pages


#: payload -> pages; swap 'application/pdf' for a real parser in production
PDF_PARSERS: Dict[str, Callable[[bytes], List[List[dict]]]] = {
    'application/pdf': fake_pdf_parse,
}


def parse_layout_batches(batches, mime: str = 'application/pdf') -> Iterator:
    """mapInArrow kernel: (doc_id, payload) rows -> exploded block rows.
    One malformed payload yields a single error row, never a task failure."""
    import pyarrow as pa

    parser = PDF_PARSERS[mime]
    cols = [('doc_id', pa.int64()), ('page', pa.int32()),
            ('block_idx', pa.int32()), ('kind', pa.string()),
            ('x0', pa.float32()), ('y0', pa.float32()),
            ('x1', pa.float32()), ('y1', pa.float32()),
            ('font_size', pa.float32()), ('text', pa.string()),
            ('parse_error', pa.string())]
    for batch in batches:
        names = batch.schema.names
        ids = batch.column(names.index('doc_id')).to_pylist()
        payloads = batch.column(names.index('payload')).to_pylist()
        rows: List[list] = [[] for _ in cols]

        def emit(*vals):
            for slot, v in zip(rows, vals):
                slot.append(v)

        for doc_id, payload in zip(ids, payloads):
            try:
                pages = parser(payload)
            except Exception as exc:  # noqa: BLE001 - per-row containment
                emit(doc_id, None, None, 'error', None, None, None, None,
                     None, None, f'{type(exc).__name__}: {exc}')
                continue
            for pno, blocks in enumerate(pages):
                for bidx, b in enumerate(blocks):
                    emit(doc_id, pno, bidx, b['kind'], b['x0'], b['y0'],
                         b['x1'], b['y1'], b['font_size'], b['text'], None)
        yield pa.RecordBatch.from_arrays(
            [pa.array(vals, typ) for vals, (_, typ) in zip(rows, cols)],
            names=[n for n, _ in cols])


def parse_layout(df, mime: str = 'application/pdf',
                 partitions: Optional[int] = None):
    """(doc_id, payload) DataFrame -> layout blocks DataFrame"""
    if partitions:
        df = df.repartition(partitions, 'doc_id')
    return df.mapInArrow(lambda it: parse_layout_batches(it, mime),
                         schema=LAYOUT_BLOCKS_SCHEMA)


def synth_payload_batches(batches) -> Iterator:
    """mapInArrow kernel: (doc_id, text) rows -> (doc_id, payload) FPDF
    containers — used by tests and the driver contract to derive a
    deterministic binary-document table from the plain-text corpus"""
    import pyarrow as pa
    for batch in batches:
        names = batch.schema.names
        ids = batch.column(names.index('doc_id')).to_pylist()
        texts = batch.column(names.index('text')).to_pylist()
        payloads = [synth_pdf_payload(t or '', d)
                    for d, t in zip(ids, texts)]
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary())],
            names=['doc_id', 'payload'])


def extract_pdf_main(blocks, keep_kinds=('body', 'heading')):
    """layout blocks -> (doc_id, main_text, n_body_chars, parse_error):
    drop boilerplate kinds (running headers, page-number footers), restore
    reading order, join pages/blocks with newlines. Pure relational —
    Catalyst plans it, DuckDB can oracle it.

    Contract: a document whose payload failed to parse (single
    kind='error' row) surfaces with null main_text/n_body_chars and its
    parse_error set, so library callers joining only on this output see the
    loss instead of the doc silently disappearing. Documents with blocks
    but no kept kinds (all boilerplate) are absent, as before. Single
    aggregation, no join — the error row rides the same groupBy."""
    kept = F.col('kind').isin(*keep_kinds)
    sel = blocks.where(kept | F.col('parse_error').isNotNull())
    # collect_list drops nulls, so the when() keeps only content blocks
    ordered = F.array_sort(F.collect_list(
        F.when(kept, F.struct('page', 'block_idx', 'text'))))
    agg = sel.groupBy('doc_id').agg(
        F.array_join(F.transform(ordered, lambda s: s.text), '\n')
        .alias('joined'),
        F.sum(F.when(kept, F.length('text')).otherwise(0))
        .cast('long').alias('body_chars'),
        F.min('parse_error').alias('parse_error'))
    failed = F.col('parse_error').isNotNull()
    return agg.select(
        'doc_id',
        F.when(failed, F.lit(None)).otherwise(F.col('joined'))
        .alias('main_text'),
        F.when(failed, F.lit(None)).otherwise(F.col('body_chars'))
        .cast('long').alias('n_body_chars'),
        'parse_error')
