"""Unit semantics for sft_example_manifest (SFT pair construction over
transcripts) and bpe_token_counts (BPE merge-table application). The
registered queries' oracle parity runs in tools/check_oracles.py; these
tests pin the hand-checkable semantics on tiny planted frames."""

import os

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import (
    bpe_token_counts,
    sft_example_manifest,
)

from tests.conftest import h60


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="sft-bpe-tests", master="local[4]",
                         shuffle_partitions=4)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


CONV = [
    ("c1", 0, "user", "hello"),
    ("c1", 1, "assistant", "hi there"),
    ("c1", 2, "user", "run the job"),
    ("c1", 3, "tool", "ok"),
    ("c1", 4, "tool", "done"),
    ("c1", 5, "user", "thanks"),
    ("c1", 6, "assistant", "anytime"),
]


def test_sft_one_example_per_assistant_turn(spark):
    out = sft_example_manifest(_turns(spark, CONV)).collect()
    assert sorted((r.conv_id, r.turn_idx) for r in out) == \
        [("c1", 1), ("c1", 6)]


def test_sft_first_assistant_turn_context_and_target(spark):
    out = {r.turn_idx: r for r in
           sft_example_manifest(_turns(spark, CONV)).collect()}
    r1 = out[1]
    assert r1.n_ctx_turns == 1
    assert r1.ctx_hash == h60("user: hello")
    assert r1.n_ctx_chars == len("user: hello")
    assert r1.n_target_chars == len("hi there")


def test_sft_context_caps_at_window_and_keeps_turn_order(spark):
    out = {r.turn_idx: r for r in
           sft_example_manifest(_turns(spark, CONV)).collect()}
    r6 = out[6]
    # turns 2..5 are the capped window; turns 0-1 fall off
    ctx = "user: run the job\ntool: ok\ntool: done\nuser: thanks"
    assert r6.n_ctx_turns == 4
    assert r6.ctx_hash == h60(ctx)
    assert r6.n_ctx_chars == len(ctx)


def test_sft_assistant_opening_turn_has_empty_context(spark):
    rows = [("c2", 0, "assistant", "opening"),
            ("c2", 1, "user", "reply")]
    out = sft_example_manifest(_turns(spark, rows)).collect()
    assert len(out) == 1 and out[0].turn_idx == 0
    assert out[0].n_ctx_turns == 0
    assert out[0].n_ctx_chars == 0
    assert out[0].ctx_hash == h60("")


def test_sft_conversations_do_not_leak_context(spark):
    rows = CONV + [("c3", 0, "user", "other conv"),
                   ("c3", 1, "assistant", "fresh")]
    out = {(r.conv_id, r.turn_idx): r for r in
           sft_example_manifest(_turns(spark, rows)).collect()}
    assert out[("c3", 1)].n_ctx_turns == 1
    assert out[("c3", 1)].ctx_hash == h60("user: other conv")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_apply_merges_greedily_in_table_order(spark):
    # 'ab' merges first, then 'ab'+'c' — so 'abc' is ONE token while
    # 'acb' stays three and 'ba' two.
    merges = [("a", "b"), ("ab", "c")]
    out = {r.doc_id: r for r in bpe_token_counts(
        _docs(spark, [(1, "abc ab ba acb")]), merges).collect()}
    assert out[1].n_words == 4
    assert out[1].n_bpe_tokens == 1 + 1 + 2 + 3


def test_bpe_apply_merges_runs_left_to_right(spark):
    # greedy non-overlapping: 'aaaa' under ('a','a') -> 'aa','aa' = 2;
    # 'aaa' -> 'aa','a' = 2
    out = {r.doc_id: r for r in bpe_token_counts(
        _docs(spark, [(1, "aaaa aaa")]), [("a", "a")]).collect()}
    assert out[1].n_bpe_tokens == 2 + 2


def test_bpe_symbol_boundaries_cannot_false_match(spark):
    # pair ('x','y') must not fire inside symbols 'ax','yb' even though
    # the flat string contains 'xy'
    merges = [("a", "x"), ("y", "b"), ("x", "y")]
    out = {r.doc_id: r for r in bpe_token_counts(
        _docs(spark, [(1, "axyb")]), merges).collect()}
    # 'axyb' -> ax | yb (two tokens); the ('x','y') merge finds no
    # adjacent x,y SYMBOLS left
    assert out[1].n_bpe_tokens == 2


def test_bpe_empty_and_separator_words_are_ignored(spark):
    out = {r.doc_id: r for r in bpe_token_counts(
        _docs(spark, [(1, "a  b"), (2, ""), (3, "a \x1fz b")]),
        []).collect()}
    assert (out[1].n_words, out[1].n_bpe_tokens) == (2, 2)
    assert (out[2].n_words, out[2].n_bpe_tokens) == (0, 0)
    # the US-containing word is excluded from BOTH counts
    assert (out[3].n_words, out[3].n_bpe_tokens) == (2, 2)


def test_bpe_no_merges_counts_characters(spark):
    out = {r.doc_id: r for r in bpe_token_counts(
        _docs(spark, [(1, "hello hi")]), []).collect()}
    assert out[1].n_bpe_tokens == 5 + 2


def test_bpe_apply_oracle_survives_merge_exhaustion(spark,
                                                    tmp_path_factory):
    """Regression: a corpus that exhausts its merges before round 8
    ('ab a ab' fully merges after ONE round) used to zero out the apply
    oracle — the empty t{r} CROSS JOIN annihilated the vocabulary. The
    LEFT JOIN pass-through must keep both engines at (3 words, 3
    tokens) AND keep the learn oracle emitting exactly one merge."""
    import duckdb

    from material_parsers_spark.queries import ORACLE_SQL, SPARK_QUERIES

    sf_dir = str(tmp_path_factory.mktemp("bpe-exhaust"))
    _docs(spark, [(1, "ab a ab")]).toPandas().to_parquet(
        os.path.join(sf_dir, "documents.parquet"), index=False)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet("
                f"'{sf_dir}/documents.parquet')")
    learned = SPARK_QUERIES["bpe_learn_merges"](spark, sf_dir).collect()
    assert [(r.left_sym, r.right_sym) for r in learned] == [("a", "b")]
    assert con.execute(ORACLE_SQL["bpe_learn_merges"]).fetchall() == \
        [(1, "a", "b", 2)]

    spark_rows = sorted(tuple(r) for r in
                        SPARK_QUERIES["bpe_encode_stats"](
                            spark, sf_dir).collect())
    oracle_rows = sorted(con.execute(
        ORACLE_SQL["bpe_encode_stats"]).fetchall())
    assert spark_rows == oracle_rows == [(1, 3, 3)]
