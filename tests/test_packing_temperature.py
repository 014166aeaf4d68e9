"""packing_efficiency and temperature_sampling semantics: the report
frames recomputed independently (pandas over the manifest; numpy-free
fixed-point math over the domain tokens) must match, plus the
recipe-level invariants each operator exists to certify."""

import math

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import _PACK_SEQ_LEN, SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="pack-temp-tests", master="local[4]",
                         shuffle_partitions=4)


def test_packing_report_matches_manifest_recomputation(spark):
    manifest = SPARK_QUERIES["pack_training_sequences"](
        spark, SF_DIR).toPandas()
    report = {r.shard: r for r in SPARK_QUERIES["packing_efficiency"](
        spark, SF_DIR).collect()}
    assert set(report) == set(manifest["shard"].unique())
    for shard, g in manifest.groupby("shard"):
        r = report[shard]
        assert r.n_docs == g["doc_id"].nunique()
        spans = g.groupby("doc_id").size()
        assert r.n_fragmented_docs == int((spans > 1).sum())
        assert r.n_seqs == g["seq_id"].nunique()
        tokens = int((g["seq_end"] - g["seq_begin"]).sum())
        assert r.n_tokens == tokens
        assert r.tail_fill == tokens - (r.n_seqs - 1) * _PACK_SEQ_LEN
        assert 1 <= r.tail_fill <= _PACK_SEQ_LEN
        # tolerance, NOT == round(...): Spark/DuckDB round HALF_UP,
        # Python rounds half-even — exact dyadic ties (power-of-two
        # n_seqs) would diverge; exact rounding parity is the oracle
        # gate's job
        assert r.fill_frac == pytest.approx(
            tokens / (r.n_seqs * float(_PACK_SEQ_LEN)), abs=5.1e-7)


def test_packing_wastes_only_the_tail(spark):
    """Concatenation packing's contract: every sequence except the one
    per-shard tail is exactly full — total waste = sum of tail gaps."""
    rows = SPARK_QUERIES["packing_efficiency"](spark, SF_DIR).collect()
    for r in rows:
        capacity = r.n_seqs * _PACK_SEQ_LEN
        assert capacity - r.n_tokens == _PACK_SEQ_LEN - r.tail_fill
        # sf0.001 shards hold only ~6-8 sequences, so one partial tail
        # still costs up to ~1/7 of capacity; the invariant is the
        # bound, the report is what shows fill -> 1 as shards grow
        assert r.fill_frac > 1.0 - _PACK_SEQ_LEN / (r.n_seqs
                                                    * _PACK_SEQ_LEN)
        assert r.fill_frac <= 1.0


def test_temperature_sampling_math_and_invariants(spark):
    rows = SPARK_QUERIES["temperature_sampling"](spark, SF_DIR).collect()
    t = sum(r.n_tokens for r in rows)
    ts = sum(math.floor(math.sqrt(r.n_tokens) * 1e6) for r in rows)
    for r in rows:
        # tolerance, not Python round(): see fill_frac note above
        assert r.p_raw == pytest.approx(r.n_tokens / t, abs=5.1e-7)
        scaled = math.floor(math.sqrt(r.n_tokens) * 1e6)
        assert r.p_temp == pytest.approx(scaled / ts, abs=5.1e-7)
        assert r.boost == pytest.approx(
            (scaled / ts) / (r.n_tokens / t), abs=5.1e-7)
    # distributions sum to ~1 (rounding of 5 terms)
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-5
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-5
    # tempering compresses the distribution: the head domain is
    # down-weighted, the smallest up-weighted, order preserved
    by_mass = sorted(rows, key=lambda r: r.n_tokens)
    assert by_mass[0].boost > 1.0
    assert by_mass[-1].boost < 1.0
    temps = [r.p_temp for r in by_mass]
    assert temps == sorted(temps)
