"""Checkpointed per-partition resume with lineage + metrics.

Unit of work = a conversation bucket (``pmod(hash(conv_id), n_buckets)``), so
a bucket is self-contained and its output is idempotently rewritable. The
protocol (SURVEY.md §4 custom-physical-work #3):

1. read the manifest (if any) and derive the completed bucket set;
2. anti-join the input against completed buckets (a broadcast of at most
   ``n_buckets`` rows — never a shuffle of the big side);
3. process pending buckets; write output with dynamic partition overwrite on
   ``bucket`` so a re-run of a half-written bucket replaces, never duplicates;
4. only after the data commit, append manifest rows (bucket, counts, bytes,
   lineage, run_id) — the ordering is what makes a crash resumable: a bucket
   missing from the manifest is redone, and redo is idempotent.

``max_buckets`` limits work per invocation (used by the kill/resume test and
useful operationally for incremental backfills).
"""
from __future__ import annotations

import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .extract import extract_turns
from .heuristics import ExtractConfig
from .schema import MANIFEST_SCHEMA
from .skew import with_bucket

__all__ = ['completed_buckets', 'run_with_resume']


def completed_buckets(spark: SparkSession, manifest_path: str) -> DataFrame:
    """distinct completed buckets from the manifest (empty DF when absent)"""
    try:
        mf = spark.read.parquet(manifest_path)
    except Exception:  # noqa: BLE001 - first run: no manifest yet
        return spark.createDataFrame([], 'bucket int')
    return mf.where(F.col('status') == 'done').select('bucket').distinct()


def run_with_resume(spark: SparkSession,
                    input_ref: str,
                    output_path: str,
                    manifest_path: str,
                    n_buckets: int = 64,
                    max_buckets: Optional[int] = None,
                    config: ExtractConfig = ExtractConfig(),
                    salt: int = 16,
                    partitions: Optional[int] = None) -> dict:
    """one resumable pass; returns run metrics. Call repeatedly until
    ``remaining == 0``."""
    from .io import read_transcripts

    spark.conf.set('spark.sql.sources.partitionOverwriteMode', 'dynamic')
    run_id = uuid.uuid4().hex[:12]
    t0 = time.time()

    turns = with_bucket(read_transcripts(spark, input_ref), n_buckets)
    done = completed_buckets(spark, manifest_path)
    n_done = done.count()

    pending = turns.join(F.broadcast(done), on='bucket', how='left_anti')
    if max_buckets is not None:
        processed = [r.bucket for r in
                     pending.select('bucket').distinct()
                     .orderBy('bucket').limit(max_buckets).collect()]
        if not processed:
            return dict(run_id=run_id, buckets_done=n_done, buckets_run=0,
                        remaining=0, rows_out=0, wall_seconds=0.0)
        pending = pending.where(F.col('bucket').isin(processed))
    else:
        processed = [r.bucket for r in
                     pending.select('bucket').distinct().collect()]
        if not processed:
            return dict(run_id=run_id, buckets_done=n_done, buckets_run=0,
                        remaining=0, rows_out=0, wall_seconds=0.0)

    # keep the bucket column alongside the extraction output for the
    # partitioned write: extract on (conv_id, turn_idx, text), re-attach
    # bucket deterministically (function of conv_id only)
    out = extract_turns(pending, config=config, salt=salt,
                        partitions=partitions)
    out = with_bucket(out, n_buckets)

    out.write.mode('overwrite').partitionBy('bucket').parquet(output_path)

    # post-commit metrics per bucket -> manifest (lineage = input ref).
    # Restrict to the buckets THIS run actually processed: the output dir may
    # also hold half-written buckets from a crashed earlier run (present in
    # data, absent from the manifest); those must stay un-manifested so a
    # later run redoes them.
    written = spark.read.parquet(output_path)
    fresh = written.where(F.col('bucket').isin(processed))
    stats = (fresh.groupBy('bucket').agg(
        F.count('*').alias('rows_out'),
        F.sum(F.length('main_text')).alias('bytes_out'),
        F.sum(F.when(F.col('parse_error').isNotNull(), 1)
              .otherwise(0)).alias('parse_errors'))
        .collect())
    wall = time.time() - t0
    # one column-pruned pass over the input covers both the per-bucket
    # input lineage stats and the remaining-bucket count (at most n_buckets
    # rows reach the driver; the big table is never collected)
    in_stats = (turns.groupBy('bucket').agg(
        F.count('*').alias('rows_in'),
        F.sum(F.length('text')).alias('bytes_in')).collect())
    in_counts = {r.bucket: (r.rows_in, r.bytes_in) for r in in_stats}
    rows = [(int(s.bucket), 'done',
             int(in_counts.get(s.bucket, (0, 0))[0]),
             int(s.rows_out),
             int(in_counts.get(s.bucket, (0, 0))[1] or 0),
             int(s.bytes_out or 0), int(s.parse_errors),
             input_ref, run_id, f'{wall:.3f}') for s in stats]
    if rows:
        spark.createDataFrame(rows, MANIFEST_SCHEMA).coalesce(1).write.mode(
            'append').parquet(manifest_path)

    remaining = len(in_stats) - n_done - len(rows)
    return dict(run_id=run_id, buckets_done=n_done, buckets_run=len(rows),
                remaining=max(remaining, 0),
                rows_out=sum(r[3] for r in rows), wall_seconds=wall)
