"""Superconductor class/tag rule tables (operators F4-F7, SURVEY.md §2.5).

Re-expresses the reference's rule-table classification
(`material_parsers/material_parser/material2class.py:68-258`) without
pymatgen: formula decomposition is a validated element-symbol scan over the
118-symbol table (sufficient for every reference fixture, including the
pymatgen parse of "CO2" as C + O).

Reference data quirks preserved on purpose (they are part of the observable
behavior, `material2class.py:141,151,165-167`):
- Alloys' not_compounds contains ``" B"`` (leading space), so boron does NOT
  exclude the Alloys tag;
- T' rule contains the typo ``"Nd,"``;
- dict-valued entries like ``{"S": 2}`` are skipped by the ``type == str``
  filters, so BiCh2 effectively only requires Bi.
"""

from __future__ import annotations

import re
from typing import Dict, List

from .elements import ELEMENT_SET

_VARIABLE_SUFFIX = re.compile(r"[+-][ZXYzxy]")
_SYM_AMT = re.compile(r"([A-Z][a-z]*)\s*([-*.e\d]*)")
_PAREN_GROUP = re.compile(r"\(([^()]*)\)\s*([.e\d]*)")


def _sym_list(form: str) -> List[str]:
    """Symbols from one paren-free chunk, pymatgen get_sym_dict-style.

    Greedy ``[A-Z][a-z]*`` symbol tokens with numeric amounts; any leftover
    text (a lowercase variable, a dangling sign) invalidates the whole
    formula, exactly like pymatgen's parser — this failure mode is observable
    in the reference (README.md:55-62: "(Mo 0.96 Zr 0.04 ) 0.85 B x"
    classifies as ['Alloys'] because decomposition fails and yields no
    elements).
    """
    symbols: List[str] = []
    remainder = form
    for match in _SYM_AMT.finditer(form):
        symbol, amount = match.group(1), match.group(2)
        if amount.strip():
            float(amount)  # raises ValueError on "2-", "-", "2-x" tails
        if symbol not in symbols:
            symbols.append(symbol)
        remainder = remainder.replace(match.group(), "", 1)
    if remainder.strip():
        raise ValueError(f"{remainder!r} is an invalid formula part")
    return symbols


def _validate_symbol(symbol: str) -> None:
    """Real element, or a dummy symbol with no element prefix.

    Mirrors pymatgen's strict=False behavior: DummySpecies("T") is legal but
    DummySpecies("Bx") raises because "B" is a real element prefix.
    """
    if symbol in ELEMENT_SET:
        return
    if symbol[:1] in ELEMENT_SET or symbol[:2] in ELEMENT_SET:
        raise ValueError(f"dummy symbol {symbol!r} has an element prefix")


def _parse_symbols(formula: str) -> List[str]:
    """Paren-expanding symbol extraction; raises ValueError when invalid."""
    work = formula
    match = _PAREN_GROUP.search(work)
    while match:
        inner = _sym_list(match.group(1))
        if match.group(2).strip():
            float(match.group(2))
        expanded = "".join(f"{s}1" for s in inner)
        work = work.replace(match.group(), expanded, 1)
        match = _PAREN_GROUP.search(work)
    symbols = _sym_list(work)
    for symbol in symbols:
        _validate_symbol(symbol)
    return symbols


def decompose_formula(formula: str) -> List[str]:
    """Extract the distinct symbols in ``formula``; [] when unparseable.

    Mirrors `material2class.py:22-65`: strict parse first, then retry after
    stripping ``[+-][ZXYzxy]`` variable tails ("CaBr2-x" -> [Ca, Br]),
    then give up with [].
    """
    try:
        return _parse_symbols(formula)
    except ValueError:
        try:
            return _parse_symbols(_VARIABLE_SUFFIX.sub("", formula))
        except ValueError:
            return []


CLASS_RULES = [
    {"and_compounds": ["O", "Cu"], "name": "Cuprate"},
    {"and_compounds": ["Fe", "P"], "name": "Iron-pnictide"},
    {"and_compounds": ["Fe", "As"], "name": "Iron-pnictide"},
    {"and_compounds": ["Fe", "S"], "name": "Iron-chalcogenides"},
    {"and_compounds": ["Fe", "Se"], "name": "Iron-chalcogenides"},
    {"and_compounds": ["Fe", "Te"], "name": "Iron-chalcogenides"},
    {"and_compounds": ["H"], "name": "Hydrides"},
    {"and_compounds": ["C"], "name": "Carbides"},
    {"and_compounds": ["N"], "name": "Nitrides"},
    {"and_compounds": ["F"], "name": "Fluorides"},
    {"or_compounds": ["S", "Se", "Te"], "name": "Chalcogenides"},
    {"or_compounds": ["P", "As"], "name": "Pnictides"},
    {"and_compounds": ["B"], "name": "Borides"},
    {"and_compounds": ["O"], "name": "Other oxides"},
]

TAG_RULES_FIRST_LEVEL = [
    {"and_compounds": ["O", "Cu"], "name": "Cuprates"},
    {"and_compounds": ["Fe", "P"], "name": "Iron-pnictides"},
    {"and_compounds": ["Fe", "As"], "name": "Iron-pnictides"},
    {"and_compounds": ["Fe", "S"], "name": "Iron-chalcogenides"},
    {"and_compounds": ["Fe", "Se"], "name": "Iron-chalcogenides"},
    {"and_compounds": ["Fe", "Te"], "name": "Iron-chalcogenides"},
    {"and_compounds": ["H"], "name": "Hydrides"},
    {"and_compounds": ["C"], "name": "Carbides"},
    {"and_compounds": ["N"], "name": "Nitrides"},
    {"and_compounds": ["F"], "name": "Fluorides"},
    {"or_compounds": ["S", "Se", "Te"], "name": "Chalcogenides"},
    {"or_compounds": ["P", "As"], "name": "Pnictides"},
    {"and_compounds": ["B"], "name": "Borides"},
    {"and_compounds": ["O"], "name": "Oxides"},
    # " B" (leading space) is a preserved reference quirk: boron does not
    # exclude Alloys.
    {"not_compounds": ["O", " B", "C", "N", "F", "P", "S", "As", "Se", "Te"],
     "name": "Alloys"},
]

TAG_RULES_SECOND_LEVEL: Dict[str, list] = {
    "Cuprates": [
        {"and_compounds": ["Bi"], "name": "Bi-based"},
        {"and_compounds": ["Hg"], "name": "Hg-based"},
        {"and_compounds": ["Tl"], "name": "Tl-based"},
        {"and_compounds": ["La"], "name": "La-based"},
        {"and_compounds": ["Nd", "Cu", "O"], "name": "T'"},
        {"and_compounds": ["Nd,", "Ce", "Cu", "O"], "name": "T'"},  # ref typo
        {"and_compounds": ["Pr", "Ce", "Cu", "O"], "name": "T'"},
        {"and_compounds": ["Pr", "Ce", "La", "Cu", "O"], "name": "T'"},
    ],
    "Iron-pnictides": [],
    "Iron-chalcogenides": [],
    "Hydrides": [
        {"and_compounds": ["H", "S"], "name": "Sulfure Hydrate"},
    ],
    "Carbides": [
        {"and_compounds": ["B", "C"], "name": "Borocarbides"},
        {"and_compounds": ["O", "C"], "name": "Organics"},
    ],
    "Chalcogenides": [
        {"and_compounds": ["Bi", {"S": 2}], "name": "BiCh2"},
        {"and_compounds": ["Bi", {"Se": 2}], "name": "BiCh2"},
        {"and_compounds": ["Bi", {"Te": 2}], "name": "BiCh2"},
    ],
    "Oxides": [
        {"or_compounds": ["Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu",
                          "Zn", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd",
                          "Ag", "Cd", "La", "Hf", "Ta", "W", "Re", "Os", "Ir",
                          "Pt", "Au", "Hg"],
         "name": "Transition Metal-Oxides"},
    ],
    "Alloys": [
        {"or_compounds": ["Ce", "Pr", "Nd", "Sm", "Eu", "Gd", "Tb", "Dy",
                          "Ho", "Er", "Tm", "Yb", "U"],
         "name": "Possible Heavy-fermions"},
    ],
}


def get_class(formula: str) -> str:
    """First-match over the ordered rule table; default "Alloy"."""
    elements = decompose_formula(formula)
    for rule in CLASS_RULES:
        ands = rule.get("and_compounds", [])
        ors = rule.get("or_compounds", [])
        if ands:
            if all(e in elements for e in ands):
                return rule["name"]
        elif ors:
            if any(e in elements for e in ors):
                return rule["name"]
    return "Alloy"


def _assign_tags(elements: List[str], rules: list) -> set:
    tags = set()
    for rule in rules:
        ands = rule.get("and_compounds", [])
        ors = rule.get("or_compounds", [])
        nots = rule.get("not_compounds", [])
        name = rule["name"]
        if ands:
            if all(e in elements for e in ands if isinstance(e, str)):
                tags.add(name)
        elif ors:
            if any(e in elements for e in ors if isinstance(e, str)):
                tags.add(name)
        elif nots:
            if not any(e in elements for e in nots if isinstance(e, str)):
                tags.add(name)
    return tags


def get_classes(formula: str) -> Dict[str, List[str]]:
    """Multi-match two-level taxonomy (`material2class.py:247-258`)."""
    elements = decompose_formula(formula)
    first = _assign_tags(elements, TAG_RULES_FIRST_LEVEL)
    return {
        tag: sorted(_assign_tags(elements, TAG_RULES_SECOND_LEVEL.get(tag, [])))
        for tag in first
    }


def classify_formula(formula: str) -> List[str]:
    """`/classify/formula` endpoint projection (`service.py:282-291`)."""
    return list(get_classes(formula).keys())
