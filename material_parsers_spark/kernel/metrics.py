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
