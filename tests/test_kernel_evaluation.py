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


def test_compute_metrics_all_types_and_counters():
    from material_parsers_spark.kernel.linker import (
        MATERIAL_TC_TYPE, TC_PRESSURE_TYPE)
    from material_parsers_spark.kernel.metrics import (
        compute_counters_by_type, compute_metrics)

    predicted = [(1, 2, MATERIAL_TC_TYPE), (3, 4, MATERIAL_TC_TYPE),
                 (6, 7, MATERIAL_TC_TYPE)]
    expected = [(2, 1, MATERIAL_TC_TYPE), (3, 4, TC_PRESSURE_TYPE),
                (6, 7, MATERIAL_TC_TYPE)]

    out = compute_metrics(expected, predicted)
    # reference fixture values (tests/test_linking_evaluation.py)
    mt = out["labels"][MATERIAL_TC_TYPE]
    assert mt["precision"] == 0.6666666666666666
    assert mt["recall"] == 1.0
    assert mt["f1"] == 0.8
    assert set(out["labels"]) == {
        MATERIAL_TC_TYPE, TC_PRESSURE_TYPE, "<tcValue-me_method>"}

    counters = compute_counters_by_type(expected, predicted,
                                        MATERIAL_TC_TYPE)
    assert counters == {"num_correct": 2, "num_wrong": 1,
                        "num_expected": 2}


def test_aggregate_micro_macro_and_report():
    from material_parsers_spark.kernel.metrics import (
        aggregate_micro_macro, get_report)

    per_file_counters = [
        {"num_correct": 2, "num_wrong": 1, "num_expected": 2},
        {"num_correct": 0, "num_wrong": 0, "num_expected": 2},
    ]
    per_file_metrics = [
        {"precision": 2 / 3, "recall": 1.0, "f1": 0.8, "support": 2},
        {"precision": 0, "recall": 0, "f1": 0, "support": 2},
    ]
    agg = aggregate_micro_macro(per_file_counters, per_file_metrics)
    assert agg["avg_macro_precision"] == (2 / 3) / 2
    assert agg["avg_macro_recall"] == 0.5
    assert agg["avg_micro_precision"] == 2 / 3
    assert agg["avg_micro_recall"] == 0.5
    assert abs(agg["avg_micro_f1"] - 2 * (2/3) * 0.5 / ((2/3) + 0.5)) < 1e-12
    assert agg["avg_support"] == 4

    report = get_report(
        {"labels": {"<material-tcValue>":
                    {"precision": 2 / 3, "recall": 1.0, "f1": 0.8,
                     "support": 2}},
         "micro": {"precision": 2 / 3, "recall": 0.5, "f1": 0.57}},
        include_avgs=["micro"])
    assert "precision" in report and "<material-tcValue>" in report
    assert "all (micro avg.)" in report
    assert "0.67" in report and "0.80" in report


def test_spans_to_markup_builds_escaped_pseudo_xml():
    from material_parsers_spark.kernel.evaluation import spans_to_markup

    paragraph = {
        "text": "The <MgB 2> shows 39 K here.",
        "spans": [
            {"id": "a", "type": "<material>", "text": "<MgB 2>",
             "offset_start": 4, "offset_end": 11},
            # trailing-space span: the tag closes BEFORE the space
            {"id": "b", "type": "<tcValue>", "text": "39 K ",
             "offset_start": 18, "offset_end": 23},
        ],
    }
    out = spans_to_markup(paragraph)
    assert out == ("The <material id='a'>&lt;MgB 2&gt;</material> shows "
                   "<tcValue id='b'>39 K</tcValue> here.")


def test_load_reference_csv(tmp_path):
    from material_parsers_spark.kernel.evaluation import (
        load_reference_csv, match_rows)

    csv_path = tmp_path / "ref.csv"
    csv_path.write_text(
        "material,tc,extra,path\n"
        '"Ba0.6K0.4Fe2As2 single crystal",38 K,x,paper1\n'
        '"NbB 2",9 K,x,paper1\n'
        '"NbB 2",10 K,x,paper1\n'   # duplicate material: last wins
        '"CsFe2As2",12 K,x,paper2\n'
    )
    ref = load_reference_csv(str(csv_path))
    assert ref == {
        "paper1": {"Ba0.6K0.4Fe2As2 single crystal": "38 K",
                   "NbB 2": "10 K"},
        "paper2": {"CsFe2As2": "12 K"},
    }
    rows = [
        ("NbB 2", "10 K", "paper1"),                       # strict
        ("Ba0.6K0.4Fe2As2 single crystals", "38 K", "paper1"),  # soft
        ("NbB 2", "9 K", "paper1"),                        # tc mismatch
        ("X", "1 K", "paper3"),                            # unknown path
    ]
    out = match_rows(rows, ref)
    assert [k for *_ignored, k in out] == [
        "Strict Matching", "Soft Matching", None, None]
