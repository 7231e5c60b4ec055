"""Distributed order-preserving prefix sums.

A running aggregate ``SUM(v) OVER (PARTITION BY part ORDER BY key ROWS
UNBOUNDED PRECEDING)`` makes Spark sort each ``part`` group inside ONE
window task — at 10^12-row scale a popular partition value becomes a
single-task straggler (the same shape as a degenerate dedup bucket).

:func:`running_sum_before` computes the identical result with the classic
two-phase scan: rows are chunked by order-preserving ranges of the ordering
key (``chunk_id = key // chunk_size`` — deterministic, no quantile
sampling), a window per (part, chunk) handles the bounded within-chunk
prefix, a second window over the per-chunk totals (one row per chunk, so
thousands of times smaller) produces chunk offsets, and a join adds them
back. No task ever sorts more than one chunk's rows; the offset table is
small enough for AQE to broadcast.

Exactness: chunking by ``key // chunk_size`` preserves the global
``ORDER BY key`` order across chunks, so
``within_chunk_prefix + offset == global_prefix`` row-for-row; callers'
oracles need no change.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ['running_sum_before', 'DEFAULT_CHUNK']

#: order-key units per chunk: at 10^12 dense keys this yields ~10^6 chunk
#: rows per partition value for the (cheap) offset window, while each
#: within-chunk sort stays ~10^6 rows
DEFAULT_CHUNK = 1 << 20


def running_sum_before(df: DataFrame, part_col: str, order_col: str,
                       val_col, out_col: str,
                       chunk_size: int = DEFAULT_CHUNK) -> DataFrame:
    """add ``out_col`` = sum of ``val_col`` over rows of the same
    ``part_col`` with strictly smaller ``order_col`` (ties impossible:
    ``order_col`` must be unique within a partition, e.g. doc_id).

    ``val_col`` may be a column name or a Column expression; it is
    materialized as a column so both windows aggregate the same values.
    """
    val = F.col(val_col) if isinstance(val_col, str) else val_col
    d = (df.withColumn('_psv', val)
         .withColumn('_chunk', F.floor(F.col(order_col) / chunk_size)))
    w_in = (Window.partitionBy(part_col, '_chunk').orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    within_before = F.sum('_psv').over(w_in) - F.col('_psv')
    d = d.withColumn('_before_in', within_before)
    totals = d.groupBy(part_col, '_chunk').agg(F.sum('_psv').alias('_tot'))
    w_ch = (Window.partitionBy(part_col).orderBy('_chunk')
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        part_col, '_chunk',
        F.coalesce(F.sum('_tot').over(w_ch), F.lit(0)).alias('_off'))
    return (d.join(offsets, [part_col, '_chunk'])
            .withColumn(out_col,
                        (F.col('_before_in') + F.col('_off')).cast('long'))
            .drop('_psv', '_chunk', '_before_in', '_off'))
