"""Train the committed BPE merge table (pyxml_spark/pipeline/bpe_merges.json).

Classic byte-pair-encoding merge learning (Sennrich et al. 2016,
public-domain algorithm) over the whitespace tokens of the deterministic
sf0.001 documents table, with one twist that keeps the tokenizer
SQL-twinnnable: every learned merge is assigned a fresh SINGLE private-use
character (U+E000+rank), so a symbol sequence is always a plain string and
applying the merges in rank order equals a chain of string replace() calls
— the closed form the DuckDB oracle uses (__spark_entry__._bpe_sql).

Deterministic: pair ties break lexicographically; corpus order is doc_id.
Re-running this script must reproduce the committed JSON byte-for-byte.

Usage: python3 scripts/train_bpe.py [--merges 64] [--input <parquet>]
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, 'pyxml_spark', 'pipeline', 'bpe_merges.json')


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument('--merges', type=int, default=64)
    ap.add_argument('--input',
                    default='/root/testdata/sf0.001/documents.parquet')
    ap.add_argument('--output', default=OUT)
    args = ap.parse_args(argv)

    import pyarrow.parquet as pq
    tbl = pq.read_table(args.input, columns=['doc_id', 'text'])
    df = tbl.to_pandas().sort_values('doc_id')

    word_freq: collections.Counter = collections.Counter()
    for text in df['text']:
        if text and text.strip():
            word_freq.update(re.split(r'\s+', text.strip()))

    merges: list[list[str]] = []
    # words as symbol strings; every symbol is exactly one char
    vocab = dict(word_freq)
    for rank in range(args.merges):
        pair_freq: collections.Counter = collections.Counter()
        for word, freq in vocab.items():
            for a, b in zip(word, word[1:]):
                pair_freq[(a, b)] += freq
        if not pair_freq:
            break
        best = max(pair_freq.items(), key=lambda kv: (kv[1], kv[0]))
        (a, b), freq = best
        if freq < 2:
            break
        rep = chr(0xE000 + rank)
        merges.append([a, b])
        new_vocab: collections.Counter = collections.Counter()
        for w, f in vocab.items():
            new_vocab[w.replace(a + b, rep)] += f
        vocab = dict(new_vocab)

    with open(args.output, 'w') as f:
        json.dump(merges, f, ensure_ascii=True, indent=0)
        f.write('\n')
    print(f'wrote {len(merges)} merges to {args.output}')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
