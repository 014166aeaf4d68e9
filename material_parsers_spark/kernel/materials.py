"""Material-record extraction state machine (operators L4-L5, SURVEY.md §2.4).

Folds labeled entity clusters into Material records
(`material_parser/material_parser_ml.py:78-255`): accumulates
doping/fabrication/shape/substrate lists, tracks the active variable, pairs
``<variable>`` -> ``<value>``, fans properties out over materials, resolves
and expands formulas, and enriches with compositions.

This is inherently an ordered fold *per turn* — rows are independent, so the
Spark layer runs it batch-vectorized inside Arrow UDFs.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Callable, List, Optional

from .normalize import (
    COMPARE_SIGNS,
    extract_and_filter_variable_values,
    post_process_variable,
    rewrite_comparison_symbol,
)
from .variables import (
    PATTERN_NAMES_TO_AVOID,
    expand_formula,
    resolve_variables,
)

_NAMES_TO_AVOID = re.compile(PATTERN_NAMES_TO_AVOID)


def process_property(materials: List[dict], property_name: str, values: List[str]) -> List[dict]:
    """Fan a repeated property out over materials.

    N values x 1 material -> N materials; N values x M materials -> one joined
    string on each; single value -> assigned to all.
    """
    if len(values) > 1:
        if len(materials) == 1:
            for value in values:
                new_material = defaultdict(lambda: None, materials[0])
                new_material[property_name] = value
                materials.append(new_material)
        else:
            joined = ", ".join(values)
            for mat in materials:
                mat[property_name] = joined
    elif len(values) == 1:
        if len(materials) == 1:
            materials[0][property_name] = values[0]
        elif len(materials) > 1:
            for mat in materials:
                mat[property_name] = values[0]
    return materials


def extract_results(
    examples: List[List[dict]],
    formula_to_composition: Optional[Callable[[str], dict]] = None,
    name_to_formula: Optional[Callable[[str], dict]] = None,
) -> List[list]:
    """Fold labeled clusters into Material records, one list per example.

    ``formula_to_composition(formula) -> {"composition": {...}}`` and
    ``name_to_formula(name) -> {"formula":..., "composition":...}`` are
    injectable so the kernel stays dependency-free (the reference wires in its
    text2chem wrapper the same way).
    """
    results = []
    for example in examples:
        shapes: List[str] = []
        dopings: List[str] = []
        fabrications: List[str] = []
        substrates: List[str] = []
        prefixed_values: List[str] = []

        materials: List[dict] = []
        material: dict = defaultdict(lambda: None, {})

        processing_variable = None
        other_properties = False

        for entity in example:
            label = entity["class"].replace(">", "").replace("<", "")
            text = entity["text"]

            if label == "doping":
                dopings.append(text)
                other_properties = True
            elif label == "fabrication":
                fabrications.append(text)
                other_properties = True
            elif label == "shape":
                shapes.append(text)
                other_properties = True
            elif label == "substrate":
                substrates.append(text)
                other_properties = True
            elif label == "variable":
                variable = post_process_variable(text)
                other_properties = True
                if processing_variable:
                    if variable != processing_variable and str.strip(variable) != "":
                        processing_variable = variable
                else:
                    processing_variable = variable
            elif label == "value":
                other_properties = True
                if processing_variable:
                    values = extract_and_filter_variable_values(text)
                    if "variables" in material and processing_variable in material["variables"]:
                        material["variables"][processing_variable].extend(values)
                    elif "variables" in material:
                        material["variables"][processing_variable] = values
                    else:
                        material["variables"] = {processing_variable: values}

                    if prefixed_values:
                        material["variables"][processing_variable].extend(prefixed_values)
                        prefixed_values = []
                else:
                    if any(sign in text for sign in COMPARE_SIGNS):
                        prefixed_values.append(rewrite_comparison_symbol(text))
                    elif "=" in text:
                        split = text.split("=")
                        processing_variable = split[0]
                        prefixed_values.append(split[1])
                    # else: value with no active variable — dropped (reference
                    # logs and drops too, material_parser_ml.py:143)
            elif label in material:
                materials.append(material)
                material = defaultdict(lambda: None, {label: text})
            else:
                material[label] = text

        if len(material.keys()) > 0:
            if fabrications:
                material["fabrication"] = " ".join(fabrications)
            materials.append(material)
        elif len(material.keys()) == 0 and not other_properties:
            results.append({})
            continue

        materials = process_property(materials, "doping", dopings)
        materials = process_property(materials, "substrate", substrates)
        materials = process_property(materials, "shape", shapes)

        for material in materials:
            if "formula" in material and material["formula"]:
                material["formula"] = {"rawValue": material["formula"]}

            resolved_formulas = resolve_variables(material)

            if not resolved_formulas and "formula" in material and material["formula"] and (
                material["formula"]["rawValue"] is not None
                and material["formula"]["rawValue"].strip()
            ):
                resolved_formulas.append(material["formula"]["rawValue"])

            if resolved_formulas:
                resolved_and_expanded = []
                for f in resolved_formulas:
                    for exp_f in expand_formula(f):
                        new_f = {"rawValue": exp_f}
                        if formula_to_composition:
                            try:
                                compo = formula_to_composition(exp_f)
                                if compo and "composition" in compo:
                                    new_f["formulaComposition"] = compo["composition"]
                            except (ValueError, IndexError):
                                pass
                        resolved_and_expanded.append(new_f)

                material["resolvedFormulas"] = resolved_and_expanded

            if name_to_formula:
                if (
                    material["formula"] is None
                    or (material["formula"] and not material["formula"]["rawValue"].strip())
                ) and material["name"] and not _NAMES_TO_AVOID.match(
                    material["name"].replace("  ", " ")
                ):
                    converted = {}
                    try:
                        converted = name_to_formula(material["name"])
                    except ValueError:
                        pass

                    formula = None
                    if "formula" in converted and converted["formula"]:
                        formula = {"rawValue": converted["formula"]}
                        material["formula"] = formula

                    if "composition" in converted and converted["composition"]:
                        if formula is None:
                            formula = {}
                        formula["formulaComposition"] = converted["composition"]
                        material["formula"] = formula

        results.append(materials)

    return results


def strip_empty(materials: List[dict]) -> List[dict]:
    """Drop None/empty-string values from each material record.

    Mirrors the projection at `material_parser_ml.py:69-74`.
    """
    return [
        {key: value for key, value in dict(material).items() if value is not None and value != ""}
        for material in materials
    ]
