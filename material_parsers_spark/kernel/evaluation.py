"""Extraction-accuracy evaluation kernels (A3-A4, SURVEY.md §2.10).

Re-expresses `material_parser/material_parsers_evaluation.py:18-56` (exact /
space-and-minus-normalized matching with TP/FP/TN/FN accounting) and
`misc/evaluation/evaluation.py:25-67` (strict, then SequenceMatcher > 0.95
soft matching against a reference map). The Spark layer lifts these to
column expressions / a join + in-UDF similarity.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from typing import Dict, List, Optional, Sequence, Tuple


def normalize_formula(value: str) -> str:
    """Space removal + U+2212 -> '-' — the reference's soft normalization."""
    return value.replace(" ", "").replace("−", "-")


def evaluate_extraction(expected: Sequence[Optional[str]],
                        predicted: Sequence[Optional[str]]) -> Tuple[int, int, int, int]:
    """(tp, fp, tn, fn) with normalized-equality fallback; blanks on the
    predicted side count tn/fn like the reference."""
    if len(expected) != len(predicted):
        raise ValueError("expected and predicted must have equal length")
    tp = fp = tn = fn = 0
    for expected_item, predicted_item in zip(expected, predicted):
        if predicted_item:
            if predicted_item == expected_item or (
                    expected_item is not None
                    and normalize_formula(predicted_item)
                    == normalize_formula(expected_item)):
                tp += 1
            else:
                fp += 1
        else:
            if expected_item:
                fn += 1
            else:
                tn += 1
    return tp, fp, tn, fn


def report(tp: int, fp: int, tn: int, fn: int) -> Dict[str, float]:
    precision = tp / (tp + fp) if tp + fp > 0 else 0
    recall = tp / (tp + fn) if tp + fn > 0 else 0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "total": tp + fp + tn + fn}


def match_against_reference(material: str, tc: str,
                            reference: Dict[str, str]) -> Optional[str]:
    """Strict match first, then SequenceMatcher ratio > 0.95 soft match;
    returns "Strict Matching" / "Soft Matching" / None."""
    for ref_material, ref_tc in reference.items():
        if material == ref_material and tc == ref_tc:
            return "Strict Matching"
    for ref_material, ref_tc in reference.items():
        if SequenceMatcher(None, ref_material, material).ratio() > 0.95 \
                and tc == ref_tc:
            return "Soft Matching"
    return None


def match_rows(rows: List[Tuple[str, str, str]],
               reference_map: Dict[str, Dict[str, str]]) -> List[Tuple[str, str, str, Optional[str]]]:
    """Batch form of the reference's process(): rows are
    (material, tc, path); returns rows tagged with the match kind."""
    out = []
    for material, tc, path in rows:
        kind = None
        if path in reference_map:
            kind = match_against_reference(material, tc, reference_map[path])
        out.append((material, tc, path, kind))
    return out


def spans_to_markup(paragraph: dict) -> str:
    """T9: HTML-escaped pseudo-XML markup for a paragraph's spans — the
    eval-request body builder (`linking_evaluation.py:205-222`),
    including its trailing-space hoist (a span ending in a space closes
    the tag BEFORE the space)."""
    from html import escape

    text = paragraph["text"]
    output = ""
    offset = 0
    for span in paragraph.get("spans", []):
        output += escape(text[offset:span["offset_start"]])
        offset = span["offset_start"]
        output += span["type"].replace(">", f" id='{span['id']}'>")
        if span["text"].endswith(" "):
            output += (escape(span["text"][:-1])
                       + span["type"].replace("<", "</") + " ")
        else:
            output += escape(span["text"]) + span["type"].replace("<", "</")
        offset += len(span["text"])
    output += escape(text[offset:])
    return output


def load_reference_csv(path: str) -> Dict[str, Dict[str, str]]:
    """S15: parse the eval-reference CSV into {path: {material: tc}} —
    `misc/evaluation/evaluation.py:8-22`, including header skip, column
    positions (material, tc, _, path), and last-wins on a duplicate
    material within the same path."""
    import csv

    reference_map: Dict[str, Dict[str, str]] = {}
    with open(path, newline="", encoding="utf-8") as handle:
        reader = csv.reader(handle, delimiter=",", quotechar='"')
        next(reader)
        for row in reader:
            material, tc, doc_path = row[0], row[1], row[3]
            reference_map.setdefault(doc_path, {})[material] = tc
    return reference_map
