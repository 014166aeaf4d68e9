"""Variable substitution and formula expansion (operators L6-L10, §2.4).

Pure string/arithmetic kernels whose outputs must match the reference
digit-for-digit (`material_parser/material_parser_ml.py:277-418`; fixtures in
`tests/test_ml_material_parser.py:56-218`). The float formatting contract is
``str(round(a - b, 2))`` — never numpy formatting.
"""

from __future__ import annotations

import re
from typing import Dict, List

ENGLISH_ALPHABET = "xyzabcdefghijklmnopqrstuvw"

# sample codes like "Bi-2212" that must not go through name->formula.
# DELIBERATE divergence from the reference: its pattern
# (`material_parser_ml.py`) spells the digit class as a literal
# backslash + repeated 'd' ("\\d" inside a raw-ish string context that
# never matches), so the reference actually sends Bi-2212-style names
# through name_to_formula; this port uses the working pattern, i.e. the
# behavior the reference's comment intends rather than its bug.
PATTERN_NAMES_TO_AVOID = r"[A-Z][a-z]{1,3}[- ]*\d{3,5}"

_NON_NUMERIC = re.compile(r"[^\-0-9.]+")


def replace_variable(formula: str, variable: str, value: str) -> str:
    """Arithmetic-aware substitution of ``variable`` by ``value``.

    ``"1-x"`` with x=0.1 becomes ``"0.9"`` (float subtract, round(.,2));
    a bare ``-x`` with a negative value sign-cancels; occurrences followed by
    a lowercase letter are part of an element name and skipped.
    """
    return_formula = formula
    start_searching = 0

    while formula.find(variable, start_searching) > -1:
        variable_index = formula.find(variable, start_searching)

        if variable_index > -1:
            if formula.startswith("-", variable_index - 1) or formula.startswith(
                "−", variable_index - 1
            ):
                end_search = variable_index - 1
                while end_search > 0 and formula[end_search - 1].isdigit():
                    end_search -= 1

                if end_search < variable_index - 1:
                    number = formula[end_search: variable_index - 1]
                    sub = float(number) - float(value)
                    sub = round(sub, 2)
                    return_formula = return_formula.replace(
                        number + formula[variable_index - 1] + variable, str(sub), 1
                    )
                else:
                    if value.startswith("-") or value.startswith("−"):
                        return_formula = return_formula.replace(
                            formula[variable_index - 1] + variable, value[1:], 1
                        )
                    else:
                        return_formula = return_formula.replace(variable, value, 1)
            else:
                if variable_index + len(variable) < len(formula) - 1:
                    if not formula[variable_index + len(variable)].islower():
                        return_formula = return_formula.replace(variable, value, 1)
                elif variable_index + len(variable) == len(formula):
                    return_formula = return_formula.replace(variable, value, 1)

        start_searching = variable_index + 1

    return return_formula


def generate_permutations(
    input_dict: Dict[str, List[str]],
    key_list: List[str],
    result: List[str],
    depth: tuple,
    formula: str,
) -> None:
    """Depth-first cartesian product over ``{var: [values]}``.

    Appends one substituted formula string per combination to ``result``
    (values of the last variable vary fastest).
    """
    variable_index, value_index = depth

    variable = key_list[variable_index]
    value = input_dict[variable][value_index]

    if value_index == len(input_dict[variable]) - 1 and variable_index == len(key_list) - 1:
        result.append(replace_variable(formula, variable, value))
        return

    if variable_index == len(key_list) - 1:
        result.append(replace_variable(formula, variable, value))
        generate_permutations(
            input_dict, key_list, result, (variable_index, value_index + 1), formula
        )
        return

    for i in range(len(input_dict[variable])):
        generate_permutations(
            input_dict,
            key_list,
            result,
            (variable_index + 1, 0),
            replace_variable(formula, variable, input_dict[variable][i]),
        )


def resolve_variables(material: dict) -> List[str]:
    """Substitute variable values into the material's raw formula.

    Only variables actually present in the formula are substituted; values
    that fail float conversion are retried after stripping non-numerics
    (handles interval values like ``"< 0.1"``).
    """
    if (
        not ("variables" in material and material["variables"])
        or not ("formula" in material and material["formula"])
        or not ("rawValue" in material["formula"] and material["formula"]["rawValue"])
    ):
        return []

    formula_raw_value = material["formula"]["rawValue"]

    if not any(variable in formula_raw_value for variable in material["variables"]):
        return []

    variables = set(material["variables"].keys())
    contained_variables = {var for var in variables if var in formula_raw_value}

    output_formulas: List[str] = []

    if not contained_variables:
        return output_formulas

    map_of_contained = {
        variable: material["variables"][variable] for variable in contained_variables
    }

    try:
        generate_permutations(
            map_of_contained, list(contained_variables), output_formulas, (0, 0),
            formula_raw_value,
        )
    except ValueError:
        cleaned_map = {
            variable: [_NON_NUMERIC.sub("", value) for value in values]
            for variable, values in map_of_contained.items()
        }
        try:
            generate_permutations(
                cleaned_map, list(contained_variables), output_formulas, (0, 0),
                formula_raw_value,
            )
        except ValueError:
            pass

    return output_formulas


_FORMULA_DOPANT_PATTERN = re.compile(r"^ ?\(([A-Za-z, ]+)\)(.*)")
_NAME_MATERIAL_PATTERN = re.compile(r"-[0-9]+")


def expand_formula(formula: str) -> List[str]:
    """Expand interchangeable-dopant prefixes.

    ``(Sr, Na)Fe2As2`` -> ``["Sr 1-x Na x Fe2As2"]``;
    ``(A,B,C)...`` -> ``["A 1-x-y B x C y ..."]``;
    ``(Sr,K)-2222`` -> ``["Sr-2222", "K-2222"]``;
    anything else passes through unchanged as a one-element list.
    """
    matcher = _FORMULA_DOPANT_PATTERN.match(formula)
    expanded: List[str] = []

    if matcher:
        dopants = str(matcher.group(1))
        formula_without_dopants = str.strip(matcher.group(2))
        splitted = [d.strip() for d in dopants.split(",") if d.strip()]

        if _NAME_MATERIAL_PATTERN.search(formula_without_dopants):
            for dopant in splitted:
                expanded.append(f"{dopant}{formula_without_dopants}")
        else:
            if len(splitted) == 1:
                expanded.append(formula)
            elif len(splitted) == 2:
                expanded.append(f"{splitted[0]} 1-x {splitted[1]} x {formula_without_dopants}")
            elif 2 < len(splitted) < len(ENGLISH_ALPHABET):
                alphabet = list(ENGLISH_ALPHABET)
                sb = [f"{splitted[0]} 1"]
                sb2 = []
                for i in range(len(splitted) - 1):
                    sb2.append(f"-{alphabet[i]}")
                sb2.append(" ")
                sb.append("".join(sb2))
                for i in range(1, len(splitted)):
                    sb.append(f"{splitted[i]} {alphabet[i - 1]} ")
                sb.append(str.strip(formula_without_dopants))
                expanded.append("".join(sb))
            else:
                raise RuntimeError(f"The formula {formula} cannot be expanded.")
    else:
        return [formula]

    return expanded
