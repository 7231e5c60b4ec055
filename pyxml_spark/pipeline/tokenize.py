"""Subword tokenization behind a swappable registry.

The reference has no tokenizer (SURVEY.md §2-G); this is a training-data
pipeline operator. The production-shaped entry is a real byte-pair-encoding
tokenizer (greedy ranked-merge algorithm) with a deterministic merge table
shipped in-repo (``bpe_merges.json``, learned by scripts/train_bpe.py from
the deterministic sf0.001 corpus — no external data).

SQL-twinnability invariant: every BPE symbol is exactly ONE character
(learned merges are assigned fresh private-use chars U+E000+rank), so
applying the ranked merges to a word is provably equivalent to a chain of
``replace(word, left||right, rep)`` calls in rank order — merging two
symbols can only create new adjacencies *involving the new symbol*, never
an occurrence of an earlier-ranked pair, so rank-order passes are
exhaustive. The DuckDB oracle (__spark_entry__._bpe_sql) uses that replace
chain; tests/test_tokenize.py asserts the honest algorithm and the chain
agree on every corpus word.

Registry pattern mirrors multimodal.DECODERS: swap ``TOKENIZERS['bpe']``
for a production tokenizer (e.g. a tiktoken/sentencepiece adapter) with the
same ``(word) -> n_subwords`` contract. Execution is the repo's standard
Arrow-batched kernel (mapInArrow, one python crossing per batch, per-word
LRU cache — corpora repeat words heavily).

Contract: input words must not contain private-use chars U+E000..U+E0FF
(they are the merge alphabet); the corpus generator never emits them.
"""
from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Callable, Dict, Iterator, List, Optional, Tuple

__all__ = ['load_merges', 'bpe_apply', 'bpe_token_count', 'TOKENIZERS',
           'subword_counts']

_MERGES_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'bpe_merges.json')


def load_merges(path: Optional[str] = None) -> List[Tuple[str, str]]:
    """read a merge table; the committed default ships inside the package
    and is read zip-safely (``--py-files dist/pyxml_spark.zip`` executors
    have no real file at ``__file__``-relative paths — plain ``open()``
    raises inside every task)."""
    if path is not None:
        with open(path) as f:
            return [tuple(m) for m in json.load(f)]
    try:
        from importlib.resources import files
        data = (files('pyxml_spark.pipeline') / 'bpe_merges.json') \
            .read_text()
    except Exception:  # pragma: no cover - plain-checkout fallback
        with open(_MERGES_PATH) as f:
            data = f.read()
    return [tuple(m) for m in json.loads(data)]


@lru_cache(maxsize=1)
def _merges() -> List[Tuple[str, str]]:
    """the committed table, parsed once per process (bpe_apply's merge
    loop indexes it per step — an uncached read would re-open and
    re-parse the JSON once per merge per cache-missed word)"""
    return load_merges()


@lru_cache(maxsize=1)
def _ranks() -> Dict[Tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(_merges())}


@lru_cache(maxsize=1 << 16)
def bpe_apply(word: str) -> str:
    """greedy BPE: repeatedly merge the lowest-ranked adjacent pair present
    (leftmost-first within a pass) until no learned pair remains; returns
    the symbol string (one char per subword symbol)."""
    ranks = _ranks()
    syms = word
    while True:
        best_rank = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            return syms
        a, b = _merges()[best_rank]
        syms = syms.replace(a + b, chr(0xE000 + best_rank))


def bpe_token_count(word: str) -> int:
    return len(bpe_apply(word))


def whitespace_token_count(word: str) -> int:
    """degenerate tokenizer: every whitespace token is one token"""
    return 1 if word else 0


#: name -> (word -> n_subwords); swap entries for production tokenizers
TOKENIZERS: Dict[str, Callable[[str], int]] = {
    'bpe': bpe_token_count,
    'whitespace': whitespace_token_count,
}


def subword_counts(df, tokenizer: str = 'bpe',
                   words_col: str = 'words', id_col: str = 'doc_id'):
    """(id, words: array<string>) -> (doc_id, n_subwords): Arrow-batched
    subword counting. The word split happens JVM-side in the caller (the
    same ``split(trim(text), '\\s+')`` every other text operator uses), so
    the kernel only sees word arrays and the corpus has exactly one
    splitter definition across Spark, the kernel, and the oracle."""
    import pyarrow as pa

    count_word = TOKENIZERS[tokenizer]

    def kernel(batches) -> Iterator:
        for batch in batches:
            names = batch.schema.names
            ids = batch.column(names.index(id_col))
            words_lists = batch.column(names.index(words_col)).to_pylist()
            counts = []
            for words in words_lists:
                counts.append(sum(count_word(w) for w in (words or [])))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(counts, pa.int64())],
                names=['doc_id', 'n_subwords'])

    return df.mapInArrow(kernel, schema='doc_id long, n_subwords long')
