"""Critical-temperature linkability classifier (C1-C2, SURVEY.md §2.8).

Re-expresses `linking/linking_module.py:432-565` over the merged-token doc:
a cascade of token-window rules marking <tcValue> spans linkable. All rules
are token-index arithmetic and exact text-window compares; fixtures at
`tests/test_linking_module.py:57-297`.
"""

from __future__ import annotations

from typing import List

from .doc import ENTITY_CLASSES, MergedDoc, build_doc, convert_tokens, span_to_dict

TEMP_TYPES = ["temperature", "tcvalue", "tcValue",
              "<temperature>", "<tcvalue>", "<tcValue>"]
TC_TYPES = ["<tc>", "tc"]

# case sensitive (reference linking_module.py:447-449); entries with a
# trailing space can never match a slice text and are preserved as-is
NON_TC_EXPRESSIONS_BEFORE = [
    "T N", "TN", "t n", "tn", "Curie", "curie", "Neel", "neel", "at T ",
    "at T =", "at T=", "is suppressed at ", "ΔT c", "ΔTc", "Δ T c",
    "T =", "T=", "T = ", "T= ",
]

# case insensitive (reference linking_module.py:451-454)
TC_EXPRESSIONS_BEFORE = [
    "superconducts at", "superconductive at around", "superconducts around",
    "superconductivity at", "superconductivity around",
    "exibits superconductivity at", "T c =", "Tc =",
]

# case insensitive (reference linking_module.py:457)
NON_TC_EXPRESSIONS_AFTER = ["higher", "lower"]


def mark_linkable_temperatures(doc: MergedDoc) -> MergedDoc:
    """Rule cascade; sets ``linkable`` on qualifying temperature tokens."""
    temps = [t for t in doc if t.ent_type in TEMP_TYPES]
    if not temps:
        return doc

    tc_expressions = [t for t in doc if t.ent_type in TC_TYPES]

    marked_as_tc = []
    marked_as_non_tc = []

    if "respectively" in str(doc):
        # rule 1: with a tc expression present, every temp before the last
        # "respectively" is linkable
        if tc_expressions:
            respectively = [t for t in doc if str(t) == "respectively"]
            last = respectively[-1]
            marked_as_tc.extend(t for t in temps if last.i > t.i)
    else:
        for index_t, temp in enumerate(temps):
            if temp in marked_as_tc:
                continue

            # rule 2: Celsius (or anything not ending in K) rejected
            if not temp.text.rstrip().lower().endswith("k"):
                continue

            # rule 3: reject when followed by "higher"/"lower"
            for expr in NON_TC_EXPRESSIONS_AFTER:
                if temp.i + 1 < len(doc) and doc[temp.i + 1].text.lower() == expr:
                    marked_as_non_tc.append(temp)
                    break
            if temp in marked_as_non_tc:
                continue

            # rule 4: reject when preceded by a non-Tc expression
            for expr in NON_TC_EXPRESSIONS_BEFORE:
                width = len(expr.split(" "))
                if temp.i - width >= 0 and doc.slice_text(temp.i - width, temp.i) == expr:
                    marked_as_non_tc.append(temp)
                    break
            if temp in marked_as_non_tc:
                continue

            # rule 5: accept when preceded (with <=1 token slack) by a Tc
            # expression
            for expr in TC_EXPRESSIONS_BEFORE:
                width = len(expr.split(" "))
                if temp.i - width >= 0 and \
                        doc.slice_text(temp.i - width, temp.i).lower() == expr:
                    marked_as_tc.append(temp)
                    break
                if temp.i - width - 1 >= 0 and \
                        doc.slice_text(temp.i - width - 1, temp.i - 1).lower() == expr:
                    marked_as_tc.append(temp)
                    break
            if temp in marked_as_tc:
                continue

            # rule 6: accept when an extracted <tc> entity text occurs
            # between the previous temp and this temp (backward scan)
            for tc in tc_expressions:
                expression_length = 1
                start = temp.i
                previous_temp_index = temps[index_t - 1].i if index_t > 0 else 0
                index = start - expression_length
                matched = False
                while index >= max(0, previous_temp_index):
                    if doc.slice_text(index, start) == tc.text:
                        marked_as_tc.append(temp)
                        matched = True
                        break
                    start -= 1
                    index = start - expression_length
                if matched:
                    break

    for temp in marked_as_tc:
        temp.linkable = True
    return doc


def mark_temperatures(text: str, tokens: List[dict], spans: List[dict]) -> dict:
    """C2: convert -> build doc -> classify -> project spans
    (`linking_module.py:541-554`)."""
    words, spaces, spans_remapped = convert_tokens(tokens, spans)
    doc = build_doc(words, spaces, spans_remapped)
    doc = mark_linkable_temperatures(doc)

    converted = [span_to_dict(t) for t in doc if t.ent_type in ENTITY_CLASSES]
    return {"spans": converted, "text": text}


def mark_temperatures_paragraph(paragraph: dict) -> dict:
    import copy
    return mark_temperatures(
        copy.deepcopy(paragraph["text"]),
        copy.deepcopy(paragraph["tokens"]),
        copy.deepcopy(paragraph["spans"]),
    )
