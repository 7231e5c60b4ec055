"""Similarity search over embedding columns.

Two strategies:

* :func:`brute_force_topk` — exact cosine against a broadcast query vector;
  the correctness baseline (O(N) per query; fine fanned out over queries).
* :func:`lsh_topk` — the scale path: random-hyperplane LSH signatures
  (deterministic sign pattern per (plane, dim), no RNG state) bucket the
  corpus; a query probes its own bucket plus all Hamming-distance-1 buckets
  and reranks exactly within the candidate set. At 10^9+ vectors the bucket
  join replaces the full scan; signatures are computed JVM-side with
  higher-order functions (no python).

Both return (vec_id, cos_sim) DataFrames. Recall of the LSH path vs brute
force is asserted in tests/test_similarity.py.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ['as_double_vec', 'brute_force_topk', 'add_lsh_signature',
           'lsh_topk', 'build_ivf', 'ivf_topk', 'grid_assign',
           'grid_ivf_topk']


def as_double_vec(df: DataFrame, col: str = 'embedding',
                  out: str = 'v') -> DataFrame:
    return df.withColumn(out, F.transform(col, lambda x: x.cast('double')))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(vec_df: DataFrame, query_df: DataFrame,
                     k: int = 10) -> DataFrame:
    """exact cosine top-k; query_df has one row with column ``q``"""
    scored = (vec_df.crossJoin(F.broadcast(query_df))
              .select('vec_id', _cosine('v', 'q').alias('cos_sim')))
    return scored.orderBy(F.desc('cos_sim'), F.asc('vec_id')).limit(k)


def _sign_vector(plane: int, dim: int) -> List[float]:
    """deterministic ±1 hyperplane from md5 avalanche over (plane, dim) —
    a fixed random-sign projection family, no RNG state to ship"""
    import hashlib
    signs = []
    for d in range(dim):
        byte = hashlib.md5(f'lsh:{plane}:{d}'.encode()).digest()[0]
        signs.append(1.0 if byte & 1 else -1.0)
    return signs


def add_lsh_signature(vec_df: DataFrame, n_planes: int = 8,
                      col: str = 'v', out: str = 'sig',
                      dim: Optional[int] = None) -> DataFrame:
    """bit p of the signature = sign(dot(v, hyperplane_p)); hyperplanes are
    array literals, the dot products run JVM-side"""
    if dim is None:
        first = vec_df.select(col).first()
        dim = len(first[0])
    sig = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(s) for s in _sign_vector(p, dim)])
        proj = _dot(F.col(col), plane)
        sig = sig + F.when(proj >= 0, F.lit(1 << p)).otherwise(0)
    return vec_df.withColumn(out, sig.cast('int'))


def build_ivf(vec_df: DataFrame, n_lists: int = 16, seed: int = 42):
    """IVF index: KMeans coarse quantizer (Spark ML) + cluster assignment.

    Returns (assigned DataFrame with a ``list_id`` column, fitted model).
    At scale the assignment is a narrow map stage and the per-query probe
    touches only ``n_probe/n_lists`` of the corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vec_df.withColumn('features', array_to_vector('v'))
    model = KMeans(k=n_lists, seed=seed, featuresCol='features',
                   predictionCol='list_id').fit(feats)
    assigned = model.transform(feats).drop('features')
    return assigned, model


def ivf_topk(assigned: DataFrame, model, query_df: DataFrame, k: int = 10,
             n_probe: int = 4) -> DataFrame:
    """probe the n_probe nearest inverted lists, exact rerank within them"""
    import numpy as np

    q = query_df.first()['q']
    centers = model.clusterCenters()
    qv = np.asarray(q, dtype='float64')
    dists = [float(np.linalg.norm(qv - np.asarray(c, dtype='float64')))
             for c in centers]
    probe = sorted(range(len(centers)), key=lambda i: dists[i])[:n_probe]
    cands = assigned.where(F.col('list_id').isin(probe))
    scored = (cands.crossJoin(F.broadcast(query_df))
              .select('vec_id', _cosine('v', 'q').alias('cos_sim')))
    return scored.orderBy(F.desc('cos_sim'), F.asc('vec_id')).limit(k)


def grid_assign(vec_df: DataFrame, n_bits: int = 3, col: str = 'v',
                out: str = 'list_id') -> DataFrame:
    """deterministic IVF coarse quantizer: inverted list = orthant of the
    first ``n_bits`` dimensions (bit d set when v[d] >= 0).

    A KMeans-free quantizer with an exact DuckDB twin (the KMeans variant in
    :func:`build_ivf` stays available but has no SQL oracle); assignment is
    a narrow JVM-side map, no fitted model to ship.
    """
    lid = F.lit(0)
    for d in range(n_bits):
        lid = lid + F.when(F.element_at(F.col(col), d + 1) >= 0,
                           F.lit(1 << d)).otherwise(0)
    return vec_df.withColumn(out, lid.cast('int'))


def grid_ivf_topk(vec_df: DataFrame, query_df: DataFrame, k: int = 10,
                  n_bits: int = 3, probe_hamming: int = 1) -> DataFrame:
    """IVF probe over the grid quantizer: the query's own orthant plus all
    Hamming<=1 sign flips (n_bits+1 of the 2^n_bits lists), exact cosine
    rerank within the probed lists"""
    corpus = grid_assign(vec_df, n_bits)
    query = grid_assign(query_df.withColumnRenamed('q', 'v'), n_bits) \
        .withColumnRenamed('v', 'q').withColumnRenamed('list_id', 'qlist')
    probes = [F.col('qlist')]
    if probe_hamming >= 1:
        probes += [F.col('qlist').bitwiseXOR(F.lit(1 << d))
                   for d in range(n_bits)]
    query = query.withColumn('probe', F.explode(F.array(*probes)))
    cands = corpus.join(F.broadcast(query),
                        corpus['list_id'] == query['probe'], 'inner')
    scored = cands.select('vec_id', _cosine('v', 'q').alias('cos_sim')) \
        .dropDuplicates(['vec_id'])
    return scored.orderBy(F.desc('cos_sim'), F.asc('vec_id')).limit(k)


def lsh_topk(vec_df: DataFrame, query_df: DataFrame, k: int = 10,
             n_planes: int = 8,
             probe_hamming: int = 1,
             dim: Optional[int] = None) -> DataFrame:
    """bucketed ANN: candidates share the query's signature bucket (plus all
    buckets within the probe Hamming radius), then exact rerank. Pass
    ``dim`` when known to skip the one-row dimension probe."""
    corpus = add_lsh_signature(vec_df, n_planes, dim=dim)
    query = add_lsh_signature(query_df.withColumnRenamed('q', 'v'), n_planes,
                              dim=dim)\
        .withColumnRenamed('v', 'q').withColumnRenamed('sig', 'qsig')
    # probe bucket list: qsig plus single-bit flips (hamming<=1)
    probes = [F.col('qsig')]
    if probe_hamming >= 1:
        probes += [F.col('qsig').bitwiseXOR(F.lit(1 << p))
                   for p in range(n_planes)]
    query = query.withColumn('probe', F.explode(F.array(*probes)))
    cands = corpus.join(F.broadcast(query),
                        corpus['sig'] == query['probe'], 'inner')
    scored = cands.select('vec_id', _cosine('v', 'q').alias('cos_sim')) \
        .dropDuplicates(['vec_id'])
    return scored.orderBy(F.desc('cos_sim'), F.asc('vec_id')).limit(k)
