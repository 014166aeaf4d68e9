"""A3/A4 evaluation kernel tests (semantics from
material_parsers_evaluation.py:18-56 and misc/evaluation/evaluation.py)."""

import pytest

from material_parsers_spark.kernel.evaluation import (
    evaluate_extraction,
    match_against_reference,
    match_rows,
    normalize_formula,
    report,
)


def test_exact_and_normalized_match_count_tp():
    tp, fp, tn, fn = evaluate_extraction(
        expected=["MgB2", "La Fe−O", "CsFe2As2", None, "X"],
        predicted=["MgB2", "LaFe-O", "wrong", None, None],
    )
    assert (tp, fp, tn, fn) == (2, 1, 1, 1)


def test_report_values():
    out = report(2, 1, 1, 1)
    assert out["precision"] == 2 / 3
    assert out["recall"] == 2 / 3
    assert out["f1"] == pytest.approx(2 / 3)
    assert out["total"] == 5


def test_length_mismatch_raises():
    with pytest.raises(ValueError):
        evaluate_extraction(["a"], ["a", "b"])


def test_normalize_formula():
    assert normalize_formula("La Fe −x") == "LaFe-x"


def test_strict_before_soft():
    reference = {"YBa2Cu3O7 single crystal": "92 K"}
    assert match_against_reference(
        "YBa2Cu3O7 single crystal", "92 K", reference) == "Strict Matching"
    # one-char difference on a long name: ratio > 0.95 -> soft
    assert match_against_reference(
        "YBa2Cu3O7 single crystal.", "92 K", reference) == "Soft Matching"
    assert match_against_reference("NbSe2", "92 K", reference) is None
    # soft match requires the tc to agree too
    assert match_against_reference(
        "YBa2Cu3O7 single crystal.", "7 K", reference) is None


def test_match_rows_by_path():
    reference_map = {"paper1": {"MgB2": "39 K"}}
    rows = [("MgB2", "39 K", "paper1"), ("MgB2", "39 K", "paper2")]
    out = match_rows(rows, reference_map)
    assert out[0][3] == "Strict Matching"
    assert out[1][3] is None
