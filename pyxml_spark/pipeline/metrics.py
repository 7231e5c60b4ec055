"""Run metrics: deterministic aggregations over the extraction output plus
reporting aggregations (SURVEY.md §2-F).

Aggregations are Spark built-ins (whole-stage codegen, map-side partial
aggregation); nothing here crosses into Python.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ['output_metrics', 'per_conversation_report']


def output_metrics(out: DataFrame) -> dict:
    """global row/byte/error metrics for an extraction output"""
    row = out.agg(
        F.count('*').alias('rows_out'),
        F.sum(F.length('main_text')).alias('chars_out'),
        F.sum(F.when(F.col('parse_error').isNotNull(), 1).otherwise(0))
        .alias('parse_errors'),
        F.sum('n_nodes').alias('nodes'),
        F.sum('n_text_chars').alias('text_chars'),
    ).collect()[0]
    return dict(rows_out=row.rows_out, chars_out=int(row.chars_out or 0),
                parse_errors=int(row.parse_errors or 0),
                nodes=int(row.nodes or 0),
                text_chars=int(row.text_chars or 0))


def per_conversation_report(out: DataFrame) -> DataFrame:
    """per-conversation rollup: turn count, extracted chars, error count"""
    return (out.groupBy('conv_id').agg(
        F.count('*').alias('n_turns'),
        F.sum(F.length('main_text')).alias('main_chars'),
        F.sum(F.when(F.col('parse_error').isNotNull(), 1).otherwise(0))
        .alias('n_errors'))
        .orderBy('conv_id'))
