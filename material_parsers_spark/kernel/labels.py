"""BIO sequence post-processing (operators L2-L3, SURVEY.md §2.4).

Groups BIO-labeled token sequences into labeled text clusters
(`material_parser/material_parser_ml.py:421-454`), the sessionization step
between the sequence tagger and the material-record state machine.

Items are ``(token_text, bio_label)`` pairs (extra positions tolerated, as in
the reference where tagger output rows carry scores).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def bio_repair(example: List[list]) -> List[list]:
    """Rewrite ``I-`` to ``B-`` when the previous token has a different label.

    Mirrors `material_parser_ml.py:58-65` — including its quirk that the
    sequence-initial ``I-`` is left unchanged (the reference calls
    ``str.replace`` without assignment at i == 0). Items are mutated in place
    and the list is returned for chaining.
    """
    for i, item in enumerate(example):
        if item[1].startswith("I"):
            if i > 0 and example[i - 1][1][2:] != example[i][1][2:]:
                item[1] = item[1].replace("I-", "B-")
    return example


def extract_label(item) -> str:
    """``'B-<formula>'`` -> ``'formula'``-style label extraction."""
    if not isinstance(item, str):
        item = item[1]
    if item == "O":
        return "O"
    return item.split("-<")[1][:-1]


def cluster_by_label(results: Sequence[Sequence[Tuple[str, str]]]) -> List[List[dict]]:
    """Group consecutive BIO tokens into labeled clusters.

    A new cluster starts at each ``B-`` label; ``O`` tokens are skipped but do
    not break a cluster (whitespace inside an entity is labeled ``I-``).
    Output per example: ``[{"text": joined+stripped, "class": label}]``.
    """

    def is_start_of_sequence(item) -> bool:
        return item[1].startswith("B-")

    groups: List[List[dict]] = []
    for result in results:
        sequences: List[list] = []
        current: List = []
        for item in result:
            if item[1] == "O":
                continue
            if is_start_of_sequence(item):
                if current:
                    sequences.append(current)
                    current = []
            current.append(item)

        if current:
            sequences.append(current)

        groups.append(
            [
                {
                    "text": str.strip("".join(tok[0] for tok in sequence)),
                    "class": extract_label(sequence[0]),
                }
                for sequence in sequences
            ]
        )

    return groups
