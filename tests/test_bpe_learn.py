"""Differential test for the iterative BPE trainer: the full learned
merge table must equal a straight-line Python reference implementation
of Sennrich-style BPE (frequency-weighted overlapping pair counts,
(count desc, pair asc) tie order, greedy left-to-right merge) on a
planted corpus — including merges that consume earlier merges'
symbols and run-merging ('a a a a' -> 'aa aa')."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import _US, SPARK_QUERIES

TEXT = ("low low low low low lower lower newest newest newest "
        "newest widest widest aaaa aaaa aaaa aaaa aaaa aaaa")


def ref_bpe(text: str, k: int):
    freqs = {}
    for w in text.split(" "):
        if w:
            freqs[tuple(w)] = freqs.get(tuple(w), 0) + 1
    merges = []
    for _ in range(k):
        stats = {}
        for syms, f in freqs.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                stats[pair] = stats.get(pair, 0) + f
        if not stats:
            break
        best = min(stats.items(),
                   key=lambda kv: (-kv[1], kv[0][0] + _US + kv[0][1]))
        (a, b), n = best
        merges.append((a, b, n))
        new = {}
        for syms, f in freqs.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        freqs = new
    return merges


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="bpe-tests", master="local[8]",
                         shuffle_partitions=8)


def test_learned_merges_match_reference_bpe(spark, tmp_path):
    docs = spark.createDataFrame([(1, TEXT)], "doc_id bigint, text string")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = SPARK_QUERIES["bpe_learn_merges"](spark, str(tmp_path)).collect()
    got = [(r.left_sym, r.right_sym, r.n_occurrences) for r in rows]
    expected = ref_bpe(TEXT, 8)
    assert got == expected
    # the fixture forces both hard cases: a run-word 'aaaa' (overlap
    # counting + greedy run-merge) and at least one merge whose side
    # is itself a merged multi-char symbol
    assert any(len(a) > 1 or len(b) > 1 for a, b, _ in expected)
    assert any("aa" in (a + b) for a, b, _ in expected)
