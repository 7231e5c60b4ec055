"""Source/sink helpers: Iceberg table when a catalog is configured, parquet
path fallback (the sandbox has no Iceberg catalog; schemas are identical).

At production scale the transcripts live in an Iceberg table partitioned by
a conv_id bucket transform; filters and column pruning push into the scan
either way because everything downstream selects only
(conv_id, turn_idx, text) before the UDF stage.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ['read_transcripts', 'write_output', 'is_table_ref']


def is_table_ref(ref: str) -> bool:
    """catalog table refs look like cat.db.table; paths contain / or end
    in .parquet"""
    return '/' not in ref and not ref.endswith('.parquet')


def read_transcripts(spark: SparkSession, ref: str) -> DataFrame:
    """load the transcripts input from an Iceberg table or a parquet path"""
    if is_table_ref(ref):
        return spark.read.format('iceberg').load(ref)
    return spark.read.parquet(ref)


def write_output(df: DataFrame, ref: str, mode: str = 'append',
                 partition_by=None):
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if is_table_ref(ref):
        writer.format('iceberg').saveAsTable(ref)
    else:
        writer.parquet(ref)
