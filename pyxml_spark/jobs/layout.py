"""spark-submit entry point for the PDF/layout extraction job.

Cluster launch:
    spark-submit --py-files dist/pyxml_spark.zip pyxml_spark/jobs/layout.py \
        --input <parquet path with (doc_id, payload)> --output <path>

Sandbox smoke (derives deterministic FPDF payloads from synthetic text):
    python3 pyxml_spark/jobs/layout.py --rows 2000 --cpus 8
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main(argv=None) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    ap = argparse.ArgumentParser()
    ap.add_argument('--input', default=None,
                    help='parquet path with (doc_id, payload); omit to '
                         'synthesize FPDF containers from seeded text')
    ap.add_argument('--rows', type=int, default=2000)
    ap.add_argument('--seed', type=int, default=42)
    ap.add_argument('--output', default=None)
    ap.add_argument('--cpus', type=int, default=int(os.environ.get(
        'SPARK_GRAFT_CPUS', '8')))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from pyxml_spark.jobs.extract import build_session
    from pyxml_spark.pipeline.layout import (LAYOUT_INPUT_SCHEMA,
                                             extract_pdf_main, parse_layout,
                                             synth_payload_batches)

    spark = build_session(args.cpus, app='pyxml-spark-layout')
    spark.sparkContext.setLogLevel('ERROR')
    t0 = time.time()

    if args.input:
        payloads = spark.read.parquet(args.input)
    else:
        # deterministic sandbox input: seeded text -> FPDF binary containers
        from pyxml_spark.pipeline.transcripts import gen_transcripts_pdf
        pdf = gen_transcripts_pdf(args.rows, seed=args.seed)
        docs = spark.createDataFrame(
            pdf[['turn_idx', 'text']].assign(
                doc_id=range(len(pdf)))[['doc_id', 'text']])
        payloads = docs.mapInArrow(synth_payload_batches,
                                   schema=LAYOUT_INPUT_SCHEMA)

    blocks = parse_layout(payloads, partitions=args.cpus * 2)
    main = extract_pdf_main(blocks)

    out_dir = args.output or os.path.join(tempfile.gettempdir(),
                                          'pyxml_spark_layout_out')
    main.write.mode('overwrite').parquet(out_dir)

    written = spark.read.parquet(out_dir)
    stats = written.agg(
        F.count('*').alias('docs_out'),
        F.sum('n_body_chars').alias('body_chars'),
        F.sum(F.length('main_text')).alias('main_chars')).first()
    err_rows = blocks.where(F.col('parse_error').isNotNull()).count()
    print(json.dumps({
        'docs_out': stats['docs_out'],
        'body_chars': int(stats['body_chars'] or 0),
        'main_chars': int(stats['main_chars'] or 0),
        'parse_errors': err_rows,
        'output': out_dir,
        'wall_seconds': round(time.time() - t0, 3),
    }))
    spark.stop()
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
