"""Focused equivalence test for the r6 doubling n-gram builder: the
O(log n) composed construction must produce byte-identical gram arrays
(order, duplicates, distinct semantics) to a plain Python sliding
window, for every n the suite uses and for edge-length documents."""

import pytest

from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.queries import _ngrams_df


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="ngram-build", master="local[4]",
                         shuffle_partitions=4)


def _py_ngrams(text: str, n: int, distinct: bool):
    w = text.split(" ")
    if len(w) < n:
        return None
    grams = [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]
    if distinct:
        seen, out = set(), []
        for g in grams:
            if g not in seen:
                seen.add(g)
                out.append(g)
        return out
    return grams


@pytest.mark.parametrize("n", [3, 5, 13, 25])
@pytest.mark.parametrize("distinct", [True, False])
def test_ngrams_match_python_reference(spark, n, distinct):
    texts = [
        "a b c d e f g h i j k l m",                       # exactly 13
        " ".join(f"w{i % 7}" for i in range(40)),          # repeats
        " ".join(f"t{i}" for i in range(100)),             # long
        "a b",                                             # < any n > 2
        " ".join("x" for _ in range(30)),                  # all-equal
        " ".join(f"w{i % 3}" for i in range(n)),           # exactly n
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: list(r.ngrams)
           for r in _ngrams_df(docs, n, distinct=distinct).collect()}
    for i, t in enumerate(texts):
        want = _py_ngrams(t, n, distinct)
        if want is None:
            assert i not in got, (n, distinct, i)
        else:
            assert got[i] == want, (n, distinct, i)
