"""Formula -> composition and name -> formula (operators F1-F3, SURVEY.md §2.5).

Re-expresses the minimal slice of the text2chem grammar that the reference's
observable behavior depends on (`material_parser_formulas.py:37-116`,
README.md:25-94):

- element + amount-expression units ("CaBr2-x" -> {Ca: "1", Br: "2-x"});
- parenthesis groups with multiplier distribution
  ("(Mo 0.96 Zr 0.04 ) 0.85 B x" -> {Mo: "0.816", Zr: "0.034", B: "x"});
- amounts stay **strings** — "1-x" is legal, numbers are exact decimals;
- the error-retry ladder: parse as-is, then retry after U+2212 -> '-' and
  char-confusion normalization, then retry as a MULTI-PART expression:
  hydrates/adducts ("CuSO4·5H2O"), coefficient mixtures
  ("(1-x)BiFeO3-xBaTiO3", "0.9MgB2-0.1Ti") and phase prefixes
  ("α-Fe2O3", "h-BN"). Multi-part input returns the FIRST part's
  composition, mirroring the reference's `composition[0].elements`
  selection over text2chem's part list (`material_parser_formulas.py:72-73`
  — part elements are NOT multiplied by the part coefficient there
  either); unparseable input degrades to {} rather than raising (same as
  the reference's swallow-to-None).

Out of scope (documented divergence): the full chemical-name grammar
(text2chem's ChemicalNameProcessing dictionary); element names
(Hydrogen -> H) cover the name->formula fixtures.
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation
from typing import Dict, Optional, Tuple

from .elements import ELEMENT_NAMES, ELEMENT_SET
from .normalize import replace_with_closest

# one stoichiometry term: a number or a variable symbol
_TERM = r"(?:\d+(?:\.\d+)?|[xyzδ])"
# full amount expression: terms chained with +/- (ASCII or U+2212)
_AMOUNT = re.compile(rf"{_TERM}(?:[+\-−]{_TERM})*")
_ELEMENT = re.compile(r"[A-Z][a-z]?")
_NUMBER = re.compile(r"^\d+(?:\.\d+)?$")


def _format_decimal(value: Decimal) -> str:
    """Plain string, no exponent, no trailing zeros ("0.816", "2", "7")."""
    text = format(value, "f")
    if "." in text:
        text = text.rstrip("0").rstrip(".")
    return text or "0"


def _multiply(amount: str, multiplier: str) -> str:
    """Multiply an amount string by a numeric multiplier string."""
    if multiplier == "1":
        return amount
    if _NUMBER.match(amount):
        return _format_decimal(Decimal(amount) * Decimal(multiplier))
    # symbolic amount under a group multiplier: keep it symbolic
    if _NUMBER.match(multiplier):
        return f"({amount})*{multiplier}"
    return f"({amount})*({multiplier})"


def _add(left: str, right: str) -> str:
    if _NUMBER.match(left) and _NUMBER.match(right):
        return _format_decimal(Decimal(left) + Decimal(right))
    return f"{left}+{right}"


def _parse_units(text: str, pos: int, stop_at_paren: bool) -> Tuple[Dict[str, str], int]:
    """Parse element/group units from ``text[pos:]`` into {element: amount}."""
    composition: Dict[str, str] = {}

    def put(element: str, amount: str) -> None:
        if element in composition:
            composition[element] = _add(composition[element], amount)
        else:
            composition[element] = amount

    while pos < len(text):
        char = text[pos]
        if char == ")":
            if stop_at_paren:
                return composition, pos
            raise ValueError(f"unbalanced ')' at {pos} in {text!r}")
        if char == "(":
            inner, close = _parse_units(text, pos + 1, stop_at_paren=True)
            if close >= len(text) or text[close] != ")":
                raise ValueError(f"unbalanced '(' at {pos} in {text!r}")
            pos = close + 1
            m = _AMOUNT.match(text, pos)
            multiplier = m.group(0) if m else "1"
            if m:
                pos = m.end()
            if not _NUMBER.match(multiplier) and multiplier != "1":
                raise ValueError(f"non-numeric group multiplier {multiplier!r}")
            for element, amount in inner.items():
                put(element, _multiply(amount, multiplier))
            continue
        m = _ELEMENT.match(text, pos)
        if not m:
            raise ValueError(f"unparseable character {char!r} at {pos} in {text!r}")
        symbol = m.group(0)
        if symbol not in ELEMENT_SET:
            if symbol[0] in ELEMENT_SET:
                symbol = symbol[0]
            else:
                raise ValueError(f"unknown element {symbol!r} in {text!r}")
        pos += len(symbol)
        am = _AMOUNT.match(text, pos)
        amount = "1"
        if am:
            amount = am.group(0)
            pos = am.end()
        put(symbol, amount)

    return composition, pos


def parse_composition(formula: str) -> Dict[str, str]:
    """Parse a space-free formula into {element: amount_str}; raises ValueError."""
    if not formula or not formula.strip():
        raise ValueError("empty formula")
    composition, _ = _parse_units(formula, 0, stop_at_paren=False)
    if not composition:
        raise ValueError(f"no elements found in {formula!r}")
    return composition


# multi-part separators: hydrate/adduct dots and '*'; mixture hyphens and
# '+' split only when what follows looks like a component start (an
# optional coefficient — decimal, variable, or "(1-x)"-style expression —
# then an element or group), so amount expressions like "2-x" never split
_DOT_SEP = re.compile(r"[·⋅∙*]")
_COEF = r"(?:\d+(?:\.\d+)?|[xyz]|\(\d+(?:\.\d+)?[+\-−][xyz]\))"
# a component may start with an element OR a parenthesized group
# ("BiFeO3-(K0.5Na0.5)NbO3"), with or without a leading coefficient
_MIX_SEP = re.compile(rf"[+\-−](?={_COEF}?[A-Z(])")
_LEAD_COEF = re.compile(rf"^{_COEF}(?=[A-Z(])")
# single greek or lowercase latin phase letter glued by a hyphen
_PHASE_PREFIX = re.compile(r"^([α-ωΑ-Ω]|[a-z])[-−](?=[A-Z(])")


def _split_parts(text: str) -> list:
    """Candidate components of a multi-part expression, in order."""
    stripped = _PHASE_PREFIX.sub("", text)
    parts = []
    for dotted in _DOT_SEP.split(stripped):
        parts.extend(p for p in _MIX_SEP.split(dotted) if p)
    return parts


def _parse_multipart(text: str) -> Optional[Dict[str, str]]:
    """Third retry rung: hydrates, mixtures, phase prefixes. Returns the
    FIRST component that parses (the reference picks
    ``composition[0].elements`` from text2chem's part list and does not
    multiply by the part coefficient; we mirror both choices)."""
    parts = _split_parts(text)
    if len(parts) < 2 and parts == [text]:
        return None  # nothing was split or stripped; not multi-part
    for part in parts:
        for candidate in (part, _LEAD_COEF.sub("", part)):
            if not candidate:
                continue
            try:
                return parse_composition(candidate)
            except ValueError:
                continue
    return None


def formula_to_composition(formula: str) -> dict:
    """Retry-ladder wrapper mirroring `material_parser_formulas.py:37-75`,
    extended with a multi-part rung (hydrates / mixtures / phase
    prefixes — the text2chem preprocessing steps the reference pipeline
    registers at `material_parser_formulas.py:18-25`).

    Returns ``{"composition": {...}}`` or ``{}`` when parsing fails after
    retries (the reference swallows terminal failures the same way).
    """
    without_spaces = formula.replace(" ", "")
    composition: Optional[Dict[str, str]] = None
    try:
        composition = parse_composition(without_spaces)
    except ValueError:
        cleaned = without_spaces.replace("−", "-")
        cleaned = replace_with_closest(cleaned)
        try:
            composition = parse_composition(cleaned)
        except ValueError:
            composition = _parse_multipart(cleaned)
    if composition:
        return {"composition": composition}
    return {}


def name_to_formula(name: str) -> dict:
    """Element-name (or formula-shaped) input -> {name, formula, composition}.

    "Hydrogen" -> {"composition": {"H": "1"}, "name": "Hydrogen",
    "formula": "H"} (README.md:25-35). Non-name formula-shaped input falls
    through to the composition grammar; unresolvable input returns {}.
    """
    stripped = name.strip()
    key = stripped.lower()
    symbol = ELEMENT_NAMES.get(key)
    if symbol is None and key.endswith("s"):
        # crude lemmatization fallback (the reference uses a spaCy lemma
        # retry at service.py:227-241)
        symbol = ELEMENT_NAMES.get(key[:-1])
    if symbol is not None:
        return {
            "composition": {symbol: "1"},
            "name": stripped,
            "formula": symbol,
        }
    # compositional name grammar (text2chem's ChemicalNameProcessing
    # slice, kernel/chem_names.py): "lanthanum oxide", "iron(III)
    # oxide", "strontium titanate", "copper sulfate pentahydrate", ...
    # The trailing-"s" retry mirrors the reference's spaCy-lemma
    # fallback (service.py:227-241) for plural names.
    from .chem_names import parse_chemical_name

    parsed = parse_chemical_name(stripped)
    if parsed is None and key.endswith("s"):
        parsed = parse_chemical_name(stripped[:-1])
    if parsed is not None:
        return {
            "composition": parsed["composition"],
            "name": stripped,
            "formula": parsed["formula"],
        }
    out = formula_to_composition(stripped)
    if out:
        out["formula"] = stripped.replace(" ", "")
        return out
    return {}
