"""Link-evaluation metrics kernel (A2, SURVEY.md §2.10).

Re-expresses `linking/linking_evaluation.py:139-153,304-331`: order-
insensitive link matching and per-type P/R/F1. The Spark layer lifts the
same computation to a DataFrame join + aggregation for corpus-level runs.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .tokenizer import tokenize


def tokenize_chunk(text: str, start_offset: int) -> Tuple[List[dict], int]:
    """Token dicts (space tokens kept) with running offsets."""
    tokens, _ = tokenize(text)
    output = []
    current = start_offset
    for token in tokens:
        output.append({
            "text": token,
            "formattedText": "",
            "font": "",
            "style": "",
            "offset": current,
            "fontSize": "",
            "linkable": False,
        })
        current += len(token)
    return output, current


def compute_metrics_by_type(expected_links: List[tuple],
                            predicted_links: List[tuple],
                            link_type: str) -> Dict[str, float]:
    """P/R/F1 for one link type; a predicted (a, b) matches expected (b, a)
    too (links are undirected)."""
    expected = [link for link in expected_links if link[2] == link_type]
    predicted = [link for link in predicted_links if link[2] == link_type]

    correct = 0
    wrong = 0
    for link in predicted:
        link_from, link_to = str(link[0]), str(link[1])
        matches = [
            e for e in expected
            if (str(e[0]) == link_from and str(e[1]) == link_to)
            or (str(e[1]) == link_from and str(e[0]) == link_to)
        ]
        if matches:
            correct += 1
        else:
            wrong += 1

    precision = correct / (correct + wrong) if correct + wrong > 0 else 0
    recall = correct / len(expected) if expected else 0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0)
    return {"precision": precision, "recall": recall, "f1": f1,
            "support": len(expected)}


def compute_metrics(expected_links: List[tuple],
                    predicted_links: List[tuple],
                    link_type: str = None) -> Dict[str, dict]:
    """A2 per-type metrics map (`linking_evaluation.py:292-301`): one
    labels entry per tc link type (or only ``link_type`` when given)."""
    from .linker import MATERIAL_TC_TYPE, TC_ME_METHOD_TYPE, TC_PRESSURE_TYPE

    output = {"labels": {}, "macro": {}, "micro": {}}
    types = ([link_type] if link_type else
             [MATERIAL_TC_TYPE, TC_PRESSURE_TYPE, TC_ME_METHOD_TYPE])
    for type_ in types:
        output["labels"][type_] = compute_metrics_by_type(
            expected_links, predicted_links, type_)
    return output


def compute_counters_by_type(expected_links: List[tuple],
                             predicted_links: List[tuple],
                             link_type: str) -> Dict[str, int]:
    """Raw TP/FP/expected counters for micro averaging
    (`linking_evaluation.py:334-357`)."""
    expected = [link for link in expected_links if link[2] == link_type]
    predicted = [link for link in predicted_links if link[2] == link_type]

    correct = 0
    wrong = 0
    for link in predicted:
        link_from, link_to = str(link[0]), str(link[1])
        matches = [
            e for e in expected
            if (str(e[0]) == link_from and str(e[1]) == link_to)
            or (str(e[1]) == link_from and str(e[0]) == link_to)
        ]
        if matches:
            correct += 1
        else:
            wrong += 1
    return {"num_correct": correct, "num_wrong": wrong,
            "num_expected": len(expected)}


def aggregate_micro_macro(per_file_counters: List[dict],
                          per_file_metrics: List[dict]) -> Dict[str, float]:
    """Corpus-level averages exactly as the reference evaluation loop
    computes them (`linking_evaluation.py:489-545`): macro = mean of
    per-file P/R/F1 over the file count; micro = P/R/F1 from summed
    TP/FP/expected counters; support = summed per-file support."""
    file_count = len(per_file_metrics)
    correct = sum(c["num_correct"] for c in per_file_counters)
    wrong = sum(c["num_wrong"] for c in per_file_counters)
    expected = sum(c["num_expected"] for c in per_file_counters)

    macro_p = (sum(m["precision"] for m in per_file_metrics) / file_count
               if file_count else 0)
    macro_r = (sum(m["recall"] for m in per_file_metrics) / file_count
               if file_count else 0)
    macro_f1 = (sum(m["f1"] for m in per_file_metrics) / file_count
                if file_count else 0)

    micro_p = correct / (correct + wrong) if correct + wrong > 0 else 0
    micro_r = correct / expected if expected > 0 else 0
    micro_f1 = (2 * micro_p * micro_r / (micro_p + micro_r)
                if micro_p + micro_r > 0 else 0)

    return {
        "avg_macro_precision": macro_p,
        "avg_macro_recall": macro_r,
        "avg_macro_f1": macro_f1,
        "avg_micro_precision": micro_p,
        "avg_micro_recall": micro_r,
        "avg_micro_f1": micro_f1,
        "avg_support": sum(m["support"] for m in per_file_metrics),
    }


def get_report(evaluation: dict, digits: int = 2,
               include_avgs: List[str] = ()) -> str:
    """Formatted metrics table (`linking_evaluation.py:361-408`; the
    reference credits delft's sequenceLabelling evaluation for the
    format)."""
    name_width = (max(len(e) for e in evaluation["labels"])
                  if evaluation.get("labels") else 0)
    last_line_heading = {
        "micro": "all (micro avg.)",
        "macro": "all (macro avg.)",
    }
    width = max(name_width, len(last_line_heading["micro"]), digits)

    headers = ["precision", "recall", "f1-score", "support"]
    head_fmt = "{:>{width}s} " + " {:>9}" * len(headers)
    report = head_fmt.format("", *headers, width=width)
    report += "\n\n"

    row_fmt = "{:>{width}s} " + " {:>9.{digits}f}" * 3 + " {:>9.{digits}f}\n"

    if "labels" in evaluation:
        block = evaluation["labels"]
        for label in sorted(block.keys()):
            entry = block[label]
            report += row_fmt.format(
                label, entry["precision"], entry["recall"], entry["f1"],
                entry["support"], width=width, digits=digits)

    report += "\n"
    for average in include_avgs:
        avg = evaluation[average]
        report += row_fmt.format(
            last_line_heading[average], avg["precision"], avg["recall"],
            avg["f1"], avg.get("support", 0), width=width, digits=digits)

    return report
