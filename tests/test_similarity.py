"""ANN (LSH-bucketed) vs brute-force cosine: recall + candidate reduction."""
import pytest

pyspark = pytest.importorskip('pyspark')


@pytest.fixture(scope='module')
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master('local[4]')
         .appName('pyxml-spark-sim-tests')
         .config('spark.sql.shuffle.partitions', '4')
         .config('spark.ui.enabled', 'false')
         .getOrCreate())
    yield s
    s.stop()


@pytest.fixture(scope='module')
def vectors(spark):
    from pyxml_spark.pipeline.similarity import as_double_vec
    emb = spark.read.parquet('/root/testdata/sf0.01/embeddings.parquet')
    return as_double_vec(emb).select('vec_id', 'v').cache()


def test_lsh_recall_vs_brute_force(spark, vectors):
    from pyspark.sql import functions as F
    from pyxml_spark.pipeline.similarity import brute_force_topk, lsh_topk

    hits = 0
    total = 0
    for qid in (0, 7, 42):
        q = vectors.where(F.col('vec_id') == qid).select(
            F.col('v').alias('q'))
        exact = {r.vec_id for r in
                 brute_force_topk(vectors, q, k=10).collect()}
        approx = {r.vec_id for r in
                  lsh_topk(vectors, q, k=10, n_planes=6).collect()}
        assert qid in approx, 'query vector must match itself'
        hits += len(exact & approx)
        total += len(exact)
    recall = hits / total
    # random gaussian embeddings are the hard case for LSH; the point is the
    # bucketing machinery + rerank, so the bar is modest but non-trivial
    assert recall >= 0.2, f'recall {recall:.2f}'


def test_lsh_candidate_reduction(spark, vectors):
    """the probe set must actually prune the corpus (scale path property)"""
    from pyspark.sql import functions as F
    from pyxml_spark.pipeline.similarity import add_lsh_signature

    n = vectors.count()
    sigs = add_lsh_signature(vectors, n_planes=6)
    counts = sigs.groupBy('sig').count().collect()
    largest = max(r['count'] for r in counts)
    # 7 probes (self + 6 single-bit flips) x largest bucket bounds candidates
    assert largest * 7 < n, (largest, n)


def test_signature_deterministic(spark, vectors):
    from pyxml_spark.pipeline.similarity import add_lsh_signature
    a = {r.vec_id: r.sig for r in
         add_lsh_signature(vectors, n_planes=8).collect()}
    b = {r.vec_id: r.sig for r in
         add_lsh_signature(vectors, n_planes=8).collect()}
    assert a == b


def test_ivf_recall_vs_brute_force(spark, vectors):
    from pyspark.sql import functions as F
    from pyxml_spark.pipeline.similarity import (brute_force_topk, build_ivf,
                                                 ivf_topk)
    assigned, model = build_ivf(vectors, n_lists=8, seed=42)
    assigned = assigned.cache()
    hits = total = 0
    for qid in (0, 7, 42):
        q = vectors.where(F.col('vec_id') == qid).select(
            F.col('v').alias('q'))
        exact = {r.vec_id for r in brute_force_topk(vectors, q, 10).collect()}
        approx = {r.vec_id for r in
                  ivf_topk(assigned, model, q, 10, n_probe=3).collect()}
        assert qid in approx
        hits += len(exact & approx)
        total += len(exact)
    # probing 3/8 lists; random gaussians are the worst case for IVF too
    assert hits / total >= 0.3, hits / total


def test_grid_ivf_recall_vs_brute_force(spark, vectors):
    """deterministic sign-bit grid quantizer (the SQL-oracled IVF variant)"""
    from pyspark.sql import functions as F
    from pyxml_spark.pipeline.similarity import (brute_force_topk,
                                                 grid_assign, grid_ivf_topk)
    # 2^3 orthant lists over dim-64 gaussians are roughly balanced
    sizes = [r['count'] for r in
             grid_assign(vectors, n_bits=3).groupBy('list_id')
             .count().collect()]
    n = vectors.count()
    assert len(sizes) == 8 and max(sizes) < n / 2
    hits = total = 0
    for qid in (0, 7, 42):
        q = vectors.where(F.col('vec_id') == qid).select(
            F.col('v').alias('q'))
        exact = {r.vec_id for r in brute_force_topk(vectors, q, 10).collect()}
        approx = {r.vec_id for r in
                  grid_ivf_topk(vectors, q, 10, n_bits=3).collect()}
        assert qid in approx, 'query vector must match itself'
        hits += len(exact & approx)
        total += len(exact)
    # probing 4/8 lists; random gaussians are the worst case
    assert hits / total >= 0.3, hits / total
