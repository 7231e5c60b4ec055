"""Spot semantics for the round-2 text-pipeline contract queries (the
hash-level check lives in scripts/check_contract.py; these pin the
operator semantics independently of the oracle)."""
import pytest

pyspark = pytest.importorskip('pyspark')

SF_DIR = '/root/testdata/sf0.001'


@pytest.fixture(scope='module')
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master('local[4]')
         .appName('pyxml-spark-textops-tests')
         .config('spark.sql.shuffle.partitions', '4')
         .config('spark.ui.enabled', 'false')
         .getOrCreate())
    yield s
    s.stop()


def test_pii_scrub_removes_all_pii(spark):
    import __spark_entry__ as entry
    rows = entry.q_pii_scrub(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        s = r.scrubbed
        assert '<EMAIL>' in s and '<IP>' in s and '<PHONE>' in s
        assert '@' not in s
        assert not any(ch.isdigit() for ch in s.split('<PHONE>')[-1])


def test_gopher_repetition_bounds_and_repeats(spark):
    import __spark_entry__ as entry
    rows = entry.q_gopher_repetition(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.rep_x10k <= 10000
        assert r.top_count <= r.n_bigrams
    # the synthetic corpus repeats words, so some doc must repeat a bigram
    assert any(r.top_count > 1 for r in rows)


def test_boilerplate_strip_is_subsequence(spark):
    """clean_text must be the original token sequence minus the stripped
    tokens — order preserved, nothing invented"""
    import __spark_entry__ as entry
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f'{SF_DIR}/documents.parquet')
            .select('doc_id', 'text').collect()}
    out = entry.q_source_boilerplate_strip(spark, SF_DIR).collect()
    assert len(out) == len(docs)
    stripped_any = False
    for r in out:
        orig = docs[r.doc_id].split()
        kept = r.clean_text.split() if r.clean_text else []
        assert len(kept) == r.n_kept
        # subsequence check
        it = iter(orig)
        assert all(tok in it for tok in kept), r.doc_id
        if len(kept) < len(orig):
            stripped_any = True
            removed = set(orig) - set(kept)
            # every removed token is absent everywhere in the clean text
            assert not (removed & set(kept))
    assert stripped_any, 'threshold should strip something on this corpus'
