"""Temporal operators over event tables: sessionization, as-of join,
bucketed range join.

These are the three event-time operators a transcript/event analytics
stack needs that Spark SQL has no first-class relational form for (the
reference's analytics face is row-iterative; here each op is re-expressed
as a declarative plan Catalyst can schedule):

- :func:`sessionize` — inactivity-gap session assignment. One shuffle on
  the entity key; the per-entity window is bounded by that entity's event
  count (same boundedness contract as SURVEY §2-F's stable-ordering rule
  — an entity with unbounded history would route through
  pipeline/prefix.py chunking instead).
- :func:`asof_last_before` — for each left-type event, the most recent
  right-type event at or before it. Implemented with NO join at all: both
  sides live in one table, so a single running ``last(..., ignorenulls)``
  window over (entity, ts) is the sort-merge as-of — one shuffle, one
  linear pass per entity, versus the inequality join Spark would
  otherwise plan as a per-entity nested loop.
- :func:`range_count_before` — per left-type event, aggregate right-type
  events inside a trailing time window. Implemented as the classic
  bucketed range join: timestamps quantize to ``window``-sized buckets,
  each left row probes its own and the previous bucket, and the
  inequality applies AFTER an equi-join on (entity, bucket) — linear in
  events at fixed temporal density, where the naive ``t BETWEEN a AND b``
  join is a BroadcastNestedLoop (quadratic per entity) at scale. The
  DuckDB oracle for the contract row runs the naive inequality join, so
  the bucketing optimization is checked by an independent implementation.

All timestamp math is integer microseconds via ``timestampdiff`` against
the epoch — exact and timezone-free on TIMESTAMP_NTZ columns (which is
what parquet timestamps read as; see CLAUDE.md streaming notes). Float
time never enters a comparison. Timestamps within an entity must be
unique (the driver testdata's (user_id, ts) is; equal-ts events would
make "most recent before" ambiguous) and non-null.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SESSION_GAP_S = 1800
RANGE_WINDOW_S = 600

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_us(ts_col):
    """Integer microseconds since epoch for a TIMESTAMP_NTZ column —
    exact (no float), timezone-independent, and bit-identical to DuckDB's
    ``epoch_us``. Accepts a column name or a Column expression; the
    expression is built with the Column-argument API (no SQL string
    splicing), so names needing quoting and derived expressions both
    work."""
    end = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.timestamp_diff('MICROSECOND', F.expr(_EPOCH), end)


def range_bucket(us_name: str, window_s: int):
    """THE bucket-key definition for the bucketed range join: integer
    ``div`` of an epoch-micros column into window-sized buckets. One
    shared definition across the operator, scripts/temporal_soak.py's
    intermediate-size model, and the probe side below (same rule as
    dedup's salt_expr) — if the bucketing ever changes, every consumer
    moves with it. Takes a column NAME (backtick-quoted, so reserved
    words and odd characters work), not a Column: Spark exposes exact
    integer division only as the SQL ``div`` operator, and float time
    must never enter a bucket key, so the expression is built in SQL
    rather than Column arithmetic."""
    w_us = int(window_s) * 1_000_000
    return F.expr(f'`{us_name}` div {w_us}')


def range_probe_buckets(us_name: str, window_s: int):
    """the matching 2-bucket probe side, COMPOSED from range_bucket so
    the build and probe sides cannot desync: a trailing window of width
    W can only span a row's own W-aligned bucket and the previous one."""
    b = range_bucket(us_name, window_s)
    return F.explode(F.array(b, b - 1))


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S,
               entity_col: str = 'user_id',
               ts_col: str = 'ts') -> DataFrame:
    """Assign 1-based session indexes per entity: a new session starts at
    the entity's first event and whenever the gap from the previous event
    is STRICTLY greater than ``gap_s`` (a gap of exactly ``gap_s``
    continues the session).

    Returns the input columns plus ``ts_us`` (exact epoch micros) and
    ``session_idx``. Plan shape: one Exchange on ``entity_col``; both
    windows (the lag and the running flag-sum) share that partitioning,
    so Catalyst plans them in a single sort pass.
    """
    w_ord = Window.partitionBy(entity_col).orderBy('ts_us')
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = int(gap_s) * 1_000_000
    d = events.withColumn('ts_us', epoch_us(ts_col))
    prev = F.lag('ts_us').over(w_ord)
    new_flag = F.when(
        prev.isNull() | ((F.col('ts_us') - prev) > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    # stage the flag in its own Project before the running sum — windows
    # over windows must not nest in one select
    d = d.withColumn('_new', new_flag)
    return (d.withColumn('session_idx',
                         F.sum('_new').over(w_run).cast('long'))
            .drop('_new'))


def asof_last_before(events: DataFrame, left_type: str, right_type: str,
                     entity_col: str = 'user_id', ts_col: str = 'ts',
                     type_col: str = 'event_type',
                     id_col: str = 'event_id') -> DataFrame:
    """As-of join within one event table: for each ``left_type`` event,
    the most recent ``right_type`` event of the same entity at-or-before
    it (``right.ts <= left.ts``; within-entity timestamps are unique by
    contract, so at-or-before == strictly-before here).

    Joinless merge shape: a running ``last(..., ignorenulls=True)`` over
    (entity, ts) carries the latest right-event id/timestamp forward, and
    the left-type filter projects the answer. One shuffle, no join
    operator in the plan (asserted in PLANS.md). Returns ``event_id``,
    ``entity``, ``ts_us``, nullable ``right_event_id`` / ``right_ts_us``
    / ``gap_us`` (NULL when the entity has no earlier right-type event).
    """
    w = (Window.partitionBy(entity_col).orderBy('ts_us')
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = events.select(entity_col, id_col, type_col,
                      epoch_us(ts_col).alias('ts_us'))
    is_right = F.col(type_col) == right_type
    d = (d.withColumn('right_event_id',
                      F.last(F.when(is_right, F.col(id_col)),
                             ignorenulls=True).over(w))
         .withColumn('right_ts_us',
                     F.last(F.when(is_right, F.col('ts_us')),
                            ignorenulls=True).over(w)))
    return (d.where(F.col(type_col) == left_type)
            .select(id_col, entity_col, 'ts_us', 'right_event_id',
                    'right_ts_us',
                    (F.col('ts_us') - F.col('right_ts_us'))
                    .cast('long').alias('gap_us')))


def range_count_before(events: DataFrame, left_type: str, right_type: str,
                       window_s: int = RANGE_WINDOW_S,
                       entity_col: str = 'user_id', ts_col: str = 'ts',
                       type_col: str = 'event_type',
                       id_col: str = 'event_id',
                       value_col: str = 'value') -> DataFrame:
    """Trailing-window range aggregate: for each ``left_type`` event,
    count and value-sum the ``right_type`` events of the same entity with
    ``left.ts - window_s < right.ts <= left.ts``.

    Bucketed range-join shape: right events key on
    ``(entity, ts_us div W)``; each left event probes its own bucket and
    the previous one (a trailing window of width W can only span two
    W-aligned buckets), the exact range predicate filters inside the
    equi-join, and a left join back fills zero-match lefts. A right event
    lives in exactly one bucket and the two probe buckets are distinct,
    so no match can double-count. Cost: one equi-join shuffle at 2x the
    left side + one regroup — never the per-entity nested loop of a
    naive inequality join. Value sums go through decimal(18,2) so the
    result is addition-order independent (repo oracle rule).
    """
    w_us = int(window_s) * 1_000_000
    lefts = (events.where(F.col(type_col) == left_type)
             .select(F.col(id_col).alias('event_id'), entity_col,
                     epoch_us(ts_col).alias('ts_us')))
    rights = (events.where(F.col(type_col) == right_type)
              .select(entity_col, epoch_us(ts_col).alias('r_ts_us'),
                      F.col(value_col).cast('decimal(18,2)').alias('r_val'))
              .withColumn('bucket', range_bucket('r_ts_us', window_s)))
    probes = lefts.withColumn(
        'bucket', range_probe_buckets('ts_us', window_s))
    hits = (probes.join(rights, [entity_col, 'bucket'])
            .where((F.col('r_ts_us') > F.col('ts_us') - w_us)
                   & (F.col('r_ts_us') <= F.col('ts_us')))
            .groupBy('event_id')
            .agg(F.count('*').alias('n_right'),
                 F.sum('r_val').alias('right_value')))
    return (lefts.join(hits, 'event_id', 'left')
            .select('event_id', entity_col, 'ts_us',
                    F.coalesce('n_right', F.lit(0)).cast('long')
                    .alias('n_right'),
                    F.coalesce(F.col('right_value').cast('double'),
                               F.lit(0.0)).alias('right_value')))
