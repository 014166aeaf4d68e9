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


def ref_apply(text: str, merges) -> int:
    """Apply the learned merge table to every word occurrence the way
    tokenizers do (ordered greedy left-to-right per merge) and return
    the total token count."""
    total = 0
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w)
        for a, b, _n in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        total += len(syms)
    return total


def test_token_counts_match_reference_apply(spark, tmp_path):
    """Differential for the APPLY half: per-doc subword counts from
    bpe_encode_stats must equal the Python reference tokenizer applied
    with the reference-learned merges — on the same corpus whose learn
    differential already passes, plus a doc of unseen words (no merge
    fires: count = character count)."""
    unseen = "zq zq xv"
    docs = spark.createDataFrame(
        [(1, TEXT), (2, unseen)], "doc_id bigint, text string")
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    merges = ref_bpe(TEXT + " " + unseen, 8)
    out = {r.doc_id: r for r in SPARK_QUERIES["bpe_encode_stats"](
        spark, str(tmp_path)).collect()}
    assert out[1].n_bpe_tokens == ref_apply(TEXT, merges)
    assert out[2].n_bpe_tokens == ref_apply(unseen, merges)
    assert out[2].n_words == 3
