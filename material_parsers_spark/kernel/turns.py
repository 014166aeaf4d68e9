"""Per-turn extraction kernel: text -> (tokens, spans, materials).

The single pure function the Spark layer lifts into an Arrow-batched pandas
UDF (SURVEY.md §3.1 re-expression). Tokenizes ONCE and reuses the token
array across tagging, clustering, extraction and linking (manual CSE — the
reference re-tokenizes per stage, `material_parser_ml.py:53` +
`linking_module.py:335`).
"""

from __future__ import annotations

from typing import List, Optional

from .doc import build_doc, compute_span_id, convert_tokens, span_to_dict
from .formulas import formula_to_composition, name_to_formula
from .gazetteer import TokenTrieMatcher
from .materials import extract_results
from .resolvers import simple_resolution, vicinity_resolution
from .tagger import tag_spans
from .tc_classifier import mark_linkable_temperatures
from .tokenizer import BLANKS, tokenize

# the five reference link-type configurations, exact orientation from
# service.py:18-31, with the span type forced linkable per configuration
# from the reference's label_link map (service.py:41-47) — always the
# non-tcValue side; tcValue linkability comes from the classifier.
# (source, destination, forced_linkable_types)
LINK_CONFIGS = [
    ("<tcValue>", "<material>", ("<material>",)),
    ("<pressure>", "<tcValue>", ("<pressure>",)),
    ("<tcValue>", "<me_method>", ("<me_method>",)),
    # for the structure configs the reference relies on upstream linkable
    # marks on the dictionary spans; our gazetteer spans are curated
    # dictionary hits, so both sides are linkable by construction
    ("<material>", "<crystal-structure>", ("<material>", "<crystal-structure>")),
    ("<material>", "<space-groups>", ("<material>", "<space-groups>")),
]

# span types whose surface text feeds the material state machine
MATERIAL_LABELS = {"<formula>", "<name>", "<doping>", "<shape>",
                   "<fabrication>", "<substrate>", "<variable>", "<value>"}


def extract_turn(text: Optional[str],
                 matcher: Optional[TokenTrieMatcher] = None,
                 include_tokens: bool = True) -> dict:
    """Full extraction for one turn; deterministic, no I/O.

    ``include_tokens=False`` skips materializing the token array in the
    output (the largest part of the Arrow payload) for consumers that only
    read spans/materials — the computation is identical either way."""
    if not text:
        return {"tokens": [], "spans": [], "materials": []}

    tokens, offsets = tokenize(text)

    # dictionary matches first — they are longest-match, curated entries and
    # take precedence over the heuristic tagger on overlap. The matcher
    # reuses this tokenization (filtered view) instead of re-splitting.
    spans: List[dict] = []
    if matcher is not None:
        filtered = [(t, o) for t, o in zip(tokens, offsets)
                    if t not in BLANKS]
        matched = matcher.match_filtered(
            [t for t, _ in filtered], [o for _, o in filtered], text)
        for ent in matched:
            token_ids = [i for i in range(len(tokens))
                         if offsets[i][0] >= ent["start"]
                         and offsets[i][1] <= ent["end"]]
            if not token_ids:
                continue
            spans.append({
                "text": ent["text"],
                "type": ent["label"],
                "offset_start": ent["start"],
                "offset_end": ent["end"],
                "token_start": token_ids[0],
                "token_end": token_ids[-1] + 1,
                "linkable": False,
            })

    occupied = [(s["offset_start"], s["offset_end"]) for s in spans]
    for span in tag_spans(tokens, offsets, text):
        if any(span["offset_start"] < e and s < span["offset_end"]
               for s, e in occupied):
            continue
        spans.append(span)

    spans.sort(key=lambda s: s["offset_start"])
    for span in spans:
        span["id"] = compute_span_id(
            span["text"], span["type"], span["offset_start"],
            span["offset_end"], span["token_start"], span["token_end"])
        span["links"] = []

    # ---- material records (SURVEY §3.1): clusters -> state machine
    clusters = [
        {"text": str.strip(s["text"]), "class": s["type"]}
        for s in spans if s["type"] in MATERIAL_LABELS
    ]
    materials = extract_results(
        [clusters],
        formula_to_composition=formula_to_composition,
        name_to_formula=name_to_formula,
    )[0]
    if isinstance(materials, dict):  # empty-example sentinel
        materials = []

    # ---- linking (SURVEY §3.2): classify tcValues, then link per config.
    # Tokens are converted, spans remapped, and ONE merged-token doc built;
    # the reference deep-copies and rebuilds its spaCy doc per stage.
    token_dicts = [
        {"text": tokens[i], "offset_start": offsets[i][0],
         "offset_end": offsets[i][1], "token_start": i, "token_end": i + 1}
        for i in range(len(tokens))
    ]

    words, spaces, remapped = convert_tokens(
        token_dicts, [{**s, "links": list(s["links"])} for s in spans])

    doc = build_doc(words, spaces, remapped)
    doc = mark_linkable_temperatures(doc)
    linkable_by_id = {t.id: t.linkable for t in doc if t.ent_type}

    spans_by_id = {}
    for span in spans:
        spans_by_id[str(span["id"])] = span
        if str(span["id"]) in linkable_by_id:
            span["linkable"] = bool(linkable_by_id[str(span["id"])])

    # one merged-token doc serves every link configuration: the token
    # boundaries never change between configs, only the entity type alias
    # (<formula>/<name> play <material>) and the linkable marks do — reset
    # those per config instead of rebuilding the doc (the reference rebuilds
    # the spaCy doc per linker; at Arrow-batch scale that dominates).
    entity_tokens = [t for t in doc if t.ent_type]
    original_types = [t.ent_type for t in entity_tokens]
    base_linkable = [t.linkable for t in entity_tokens]

    for source_type, destination_type, forced_types in LINK_CONFIGS:
        involves_material = "<material>" in (source_type, destination_type)
        for token, orig_type, orig_linkable in zip(
                entity_tokens, original_types, base_linkable):
            effective = orig_type
            if involves_material and orig_type in ("<formula>", "<name>"):
                effective = "<material>"
            token.ent_type = effective
            token.linkable = orig_linkable or effective in forced_types
            token.links = []

        destinations = [t for t in entity_tokens
                        if t.ent_type == destination_type and t.linkable]
        sources = [t for t in entity_tokens
                   if t.ent_type == source_type and t.linkable]
        if not destinations or not sources:
            continue

        relationships = simple_resolution(destinations, sources)
        if not relationships:
            vicinity_resolution(doc, destinations, sources)

        for token in entity_tokens:
            if not token.links:
                continue
            span = spans_by_id.get(str(token.id))
            if span is None:
                continue
            for link in token.links:
                if link not in span["links"]:
                    span["links"].append(link)

    out_tokens = [
        {"text": tokens[i], "start": offsets[i][0], "end": offsets[i][1]}
        for i in range(len(tokens))
    ] if include_tokens else []
    out_spans = [
        {
            "id": str(s["id"]),
            "text": s["text"],
            "type": s["type"],
            "offset_start": s["offset_start"],
            "offset_end": s["offset_end"],
            "token_start": s["token_start"],
            "token_end": s["token_end"],
            "linkable": bool(s.get("linkable", False)),
            "links": [
                {
                    "targetId": str(l.get("targetId")),
                    "targetText": l.get("targetText"),
                    "targetType": l.get("targetType"),
                    "type": l.get("type"),
                }
                for l in s["links"]
            ],
        }
        for s in spans
    ]
    out_materials = [_material_row(m) for m in materials]

    return {"tokens": out_tokens, "spans": out_spans,
            "materials": out_materials}


def _material_row(material: dict) -> dict:
    material = dict(material)
    formula = material.get("formula")
    formula_row = None
    if formula:
        formula_row = {
            "rawValue": formula.get("rawValue"),
            "formulaComposition": formula.get("formulaComposition"),
        }
    resolved = [
        {
            "rawValue": f.get("rawValue"),
            "formulaComposition": f.get("formulaComposition"),
        }
        for f in material.get("resolvedFormulas") or []
    ]
    variables = material.get("variables") or None
    return {
        "formula": formula_row,
        "name": material.get("name"),
        "doping": material.get("doping"),
        "shape": material.get("shape"),
        "fabrication": material.get("fabrication"),
        "substrate": material.get("substrate"),
        "variables": variables,
        "resolvedFormulas": resolved or None,
    }
