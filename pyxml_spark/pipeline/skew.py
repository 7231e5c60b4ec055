"""Skew handling: explicit salted repartitioning on conv_id.

The transcripts table is heavy-tailed on conversation length (FIXTURES.md §1):
a handful of conversations carry 10^3-10^4 turns. A plain
``repartition('conv_id')`` pins each long conversation to one task; at 10^12
turns that is a straggler. Per-turn extraction is conversation-independent,
so we salt: partition by ``(conv_id, hash(conv_id, turn_idx) % salt)``, which
spreads a hot conversation over up to ``salt`` tasks with no re-merge needed
beyond the final local sort.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ['salted_repartition', 'with_bucket']


def salted_repartition(df: DataFrame, partitions: Optional[int] = None,
                       salt: int = 16) -> DataFrame:
    """repartition by (conv_id, per-turn salt); salt<=1 degrades to plain
    conv_id partitioning"""
    if salt and salt > 1:
        keys = [F.col('conv_id'),
                F.pmod(F.hash('conv_id', 'turn_idx'), F.lit(salt))]
    else:
        keys = [F.col('conv_id')]
    if partitions:
        return df.repartition(partitions, *keys)
    return df.repartition(*keys)


def with_bucket(df: DataFrame, n_buckets: int,
                col_name: str = 'bucket') -> DataFrame:
    """deterministic conversation bucket used by checkpoint/resume: all turns
    of a conversation land in one bucket, so a bucket is a self-contained
    unit of work"""
    return df.withColumn(
        col_name, F.pmod(F.hash('conv_id'), F.lit(n_buckets)).cast('int'))
