"""Compositional chemical-name grammar (operators F2/F3 breadth).

The reference delegates name parsing to text2chem's ChemicalNameProcessing
(`/root/reference/material_parsers/material_parser/material_parser_formulas.py:16-27`,
name entry at :77-116, spaCy-lemma retry at
`/root/reference/material_parsers/service.py:215-246`). text2chem is not a
dependency here; this module re-implements the PUBLIC nomenclature rules
that grammar covers for inorganic names — all standard IUPAC/descriptive
chemistry, no reference code involved:

- binary "-ide" names with charge balancing: "lanthanum oxide" -> La2O3
  (La3+ / O2- balanced at the gcd);
- Roman-numeral oxidation states: "iron(III) oxide" -> Fe2O3;
- classical -ic/-ous cation adjectives: "ferric oxide" -> Fe2O3;
- multiplicative prefixes overriding balance: "titanium dioxide" -> TiO2,
  "dinitrogen pentoxide" -> N2O5 (with the "pentoxide" vowel elision);
- polyatomic "-ate"/"-ite" anions: "barium carbonate" -> BaCO3,
  "copper sulfate" -> CuSO4, "sodium nitrite" -> NaNO2;
- ternary metal-oxide "-ate" names under the perovskite/orthoferrite
  convention (MO3 anion units): "strontium titanate" -> SrTiO3,
  "lanthanum ferrite" -> LaFeO3 (spinel-convention names like the
  MFe2O4 ferrites are OUTSIDE this grammar and return no parse);
- hydrate suffixes: "copper sulfate pentahydrate" -> CuSO4·5H2O with the
  composition mirroring the ANHYDROUS first part, exactly like the
  formula path's hydrate rule (reference ``composition[0].elements``);
- a curated common-name dictionary (alumina, silica, yttria, YBCO, ...);
- a curated multi-cation-oxide table (MULTI_CATION_OXIDES) for the
  common battery / functional oxides whose per-compound oxidation
  states no default table can supply: LiCoO2, LiMn2O4, BiVO4, the
  spinel ferrites, Y3Fe5O12, ... — names outside the table keep
  degrading to no-parse.

Unparseable names return ``None`` — the caller keeps the reference's
degrade-to-empty contract.
"""

from __future__ import annotations

from math import gcd
from typing import Dict, Optional, Tuple

from .elements import ELEMENT_NAMES

# default (most common materials-domain) oxidation state per cation element
CATION_CHARGES: Dict[str, int] = {
    "H": 1, "Li": 1, "Na": 1, "K": 1, "Rb": 1, "Cs": 1, "Ag": 1,
    "Be": 2, "Mg": 2, "Ca": 2, "Sr": 2, "Ba": 2, "Zn": 2, "Cd": 2,
    "Ni": 2, "Cu": 2, "Co": 2, "Fe": 2, "Mn": 2, "Pb": 2, "Sn": 2,
    "Hg": 2, "Pd": 2, "Pt": 2,
    "B": 3, "Al": 3, "Ga": 3, "In": 3, "Sc": 3, "Y": 3, "La": 3,
    "Ce": 3, "Pr": 3, "Nd": 3, "Sm": 3, "Eu": 3, "Gd": 3, "Tb": 3,
    "Dy": 3, "Ho": 3, "Er": 3, "Tm": 3, "Yb": 3, "Lu": 3, "Bi": 3,
    "Cr": 3, "As": 3, "Sb": 3,
    "C": 4, "Si": 4, "Ge": 4, "Ti": 4, "Zr": 4, "Hf": 4, "Th": 4,
    "N": 3, "P": 3,
    "V": 5, "Nb": 5, "Ta": 5,
    "Mo": 6, "W": 6, "U": 6,
}

# classical -ic (higher) / -ous (lower) cation adjectives
CLASSICAL_CATIONS: Dict[str, Tuple[str, int]] = {
    "ferric": ("Fe", 3), "ferrous": ("Fe", 2),
    "cupric": ("Cu", 2), "cuprous": ("Cu", 1),
    "stannic": ("Sn", 4), "stannous": ("Sn", 2),
    "plumbic": ("Pb", 4), "plumbous": ("Pb", 2),
    "mercuric": ("Hg", 2), "mercurous": ("Hg", 1),
    "cobaltic": ("Co", 3), "cobaltous": ("Co", 2),
    "chromic": ("Cr", 3), "chromous": ("Cr", 2),
    "manganic": ("Mn", 3), "manganous": ("Mn", 2),
}

# monatomic "-ide" anion names -> (element, charge)
ANIONS_IDE: Dict[str, Tuple[str, int]] = {
    "hydride": ("H", -1), "fluoride": ("F", -1), "chloride": ("Cl", -1),
    "bromide": ("Br", -1), "iodide": ("I", -1),
    "oxide": ("O", -2), "sulfide": ("S", -2), "sulphide": ("S", -2),
    "selenide": ("Se", -2), "telluride": ("Te", -2),
    "nitride": ("N", -3), "phosphide": ("P", -3), "arsenide": ("As", -3),
    "antimonide": ("Sb", -3), "boride": ("B", -3), "carbide": ("C", -4),
    "silicide": ("Si", -4),
}

# polyatomic anions -> (unit composition, charge); -ite = one O fewer
ANIONS_POLY: Dict[str, Tuple[Dict[str, int], int]] = {
    "hydroxide": ({"O": 1, "H": 1}, -1),
    "cyanide": ({"C": 1, "N": 1}, -1),
    "carbonate": ({"C": 1, "O": 3}, -2),
    "nitrate": ({"N": 1, "O": 3}, -1),
    "nitrite": ({"N": 1, "O": 2}, -1),
    "sulfate": ({"S": 1, "O": 4}, -2),
    "sulphate": ({"S": 1, "O": 4}, -2),
    "sulfite": ({"S": 1, "O": 3}, -2),
    "sulphite": ({"S": 1, "O": 3}, -2),
    "phosphate": ({"P": 1, "O": 4}, -3),
    "phosphite": ({"P": 1, "O": 3}, -3),
    "chromate": ({"Cr": 1, "O": 4}, -2),
    "dichromate": ({"Cr": 2, "O": 7}, -2),
    "permanganate": ({"Mn": 1, "O": 4}, -1),
    "chlorate": ({"Cl": 1, "O": 3}, -1),
    "perchlorate": ({"Cl": 1, "O": 4}, -1),
    "silicate": ({"Si": 1, "O": 3}, -2),      # metasilicate convention
    "borate": ({"B": 1, "O": 3}, -3),
    "acetate": ({"C": 2, "H": 3, "O": 2}, -1),
    "oxalate": ({"C": 2, "O": 4}, -2),
    "tungstate": ({"W": 1, "O": 4}, -2),      # scheelite-type WO4^2-
    "molybdate": ({"Mo": 1, "O": 4}, -2),
    # CONDENSED (pyro-) anions: a "di"/"pyro" prefix on a polyatomic
    # anion names a condensed unit, NOT a multiplicity ("sodium
    # diphosphate" is Na4P2O7, never Na(PO4)2), so these are exact
    # entries and the prefix-splitting path never sees polyatomics
    "diphosphate": ({"P": 2, "O": 7}, -4),
    "pyrophosphate": ({"P": 2, "O": 7}, -4),
    "disulfate": ({"S": 2, "O": 7}, -2),
    "disulphate": ({"S": 2, "O": 7}, -2),
    "pyrosulfate": ({"S": 2, "O": 7}, -2),
    "disilicate": ({"Si": 2, "O": 7}, -6),
}

# ternary metal-oxide "-ate" names, perovskite/orthoferrite MO3 units:
# charge = (charge of M in CATION_CHARGES via the named element) - 6
TERNARY_ATE: Dict[str, str] = {
    "titanate": "Ti", "zirconate": "Zr", "hafnate": "Hf",
    "stannate": "Sn", "manganite": "Mn", "ferrite": "Fe",
    "cobaltite": "Co", "niobate": "Nb", "tantalate": "Ta",
    "vanadate": "V",
    "cuprate": "Cu", "aluminate": "Al", "gallate": "Ga",
    "ruthenate": "Ru", "cerate": "Ce",
}
# oxidation state of the B-site metal inside the MO3 unit. W/Mo are
# NOT here: at B=+6 the ABO3 guard (A+B=+6) could never admit a real
# cation, so tungstate/molybdate live in ANIONS_POLY as MO4^2-.
TERNARY_B_CHARGE: Dict[str, int] = {
    "Ti": 4, "Zr": 4, "Hf": 4, "Sn": 4, "Mn": 3, "Fe": 3, "Co": 3,
    "Nb": 5, "Ta": 5, "V": 5, "Cu": 2, "Al": 3,
    "Ga": 3, "Ru": 4, "Ce": 4,
}

# maximum common covalent valence, used to sanity-check molecular
# prefix names: "iodine pentoxide" read as mono would put iodine at
# valence 10 (> 7), so the conventional dimeric reading I2O5 applies;
# "sulfur trioxide" at valence 6 is fine as SO3. Elements absent here
# keep the plain mono reading.
MAX_VALENCE: Dict[str, int] = {
    "H": 1, "F": 1, "B": 3, "C": 4, "Si": 4, "Ge": 4,
    "N": 5, "P": 5, "As": 5, "Sb": 5, "Bi": 5,
    "S": 6, "Se": 6, "Te": 6,
    "Cl": 7, "Br": 7, "I": 7,
    "Os": 8, "Ru": 8, "Xe": 8,
}

MULTIPLIER_PREFIXES = {
    "mono": 1, "mon": 1, "di": 2, "tri": 3, "tetra": 4, "tetr": 4,
    "penta": 5, "pent": 5, "hexa": 6, "hex": 6, "hepta": 7, "hept": 7,
    "octa": 8, "oct": 8, "nona": 9, "deca": 10,
}

HYDRATE_PREFIXES = {
    "mono": 1, "di": 2, "tri": 3, "tetra": 4, "penta": 5, "hexa": 6,
    "hepta": 7, "octa": 8, "nona": 9, "deca": 10, "": 1,
}

ROMAN = {"i": 1, "ii": 2, "iii": 3, "iv": 4, "v": 5, "vi": 6, "vii": 7,
         "viii": 8}

# curated common names; compositions are integer-exact
COMMON_NAMES: Dict[str, Tuple[str, Dict[str, int]]] = {
    "water": ("H2O", {"H": 2, "O": 1}),
    "ammonia": ("NH3", {"N": 1, "H": 3}),
    "alumina": ("Al2O3", {"Al": 2, "O": 3}),
    "silica": ("SiO2", {"Si": 1, "O": 2}),
    "titania": ("TiO2", {"Ti": 1, "O": 2}),
    "zirconia": ("ZrO2", {"Zr": 1, "O": 2}),
    "magnesia": ("MgO", {"Mg": 1, "O": 1}),
    "yttria": ("Y2O3", {"Y": 2, "O": 3}),
    "ceria": ("CeO2", {"Ce": 1, "O": 2}),
    "urania": ("UO2", {"U": 1, "O": 2}),
    "lime": ("CaO", {"Ca": 1, "O": 1}),
    "quicklime": ("CaO", {"Ca": 1, "O": 1}),
    "rust": ("Fe2O3", {"Fe": 2, "O": 3}),
    "graphite": ("C", {"C": 1}),
    "diamond": ("C", {"C": 1}),
    "ybco": ("YBa2Cu3O7", {"Y": 1, "Ba": 2, "Cu": 3, "O": 7}),
    "lsco": ("La2-xSrxCuO4", {"La": 2, "Sr": 0, "Cu": 1, "O": 4}),
    # covalent compounds whose conventional formula is NOT the ionic
    # charge balance — dictionary wins over the grammar
    "tungsten carbide": ("WC", {"W": 1, "C": 1}),
    # common names that ELIDE the cation's multiplicative prefix
    # (strictly "diphosphorus pentoxide" etc.) — the molecular-prefix
    # grammar reads the absent prefix as mono, so these must be pinned
    "phosphorus pentoxide": ("P2O5", {"P": 2, "O": 5}),
    "arsenic trioxide": ("As2O3", {"As": 2, "O": 3}),
    "nitric oxide": ("NO", {"N": 1, "O": 1}),
    "nitrous oxide": ("N2O", {"N": 2, "O": 1}),
}

# Multi-cation OXIDE names need per-compound oxidation states (Co(III)
# in LiCoO2, mixed Mn(III)/Mn(IV) in LiMn2O4, the spinel convention in
# the MFe2O4 ferrites) that no default-charge table can supply, so the
# balancing grammar refuses them (_parse_two_cation_name). This curated
# per-compound table closes the common battery / functional oxides;
# names outside it keep the degrade-to-no-parse contract. Reference
# anchor: the text2chem name path the reference wraps behind
# material_parser_formulas.py:77-116. Composition values are strings
# because intercalation oxides are legitimately fractional (NMC/NCA).
MULTI_CATION_OXIDES: Dict[str, Tuple[str, Dict[str, str]]] = {
    "lithium cobalt oxide": ("LiCoO2", {"Li": "1", "Co": "1", "O": "2"}),
    "lithium cobaltite": ("LiCoO2", {"Li": "1", "Co": "1", "O": "2"}),
    "lithium nickel oxide": ("LiNiO2", {"Li": "1", "Ni": "1", "O": "2"}),
    "lithium manganese oxide":
        ("LiMn2O4", {"Li": "1", "Mn": "2", "O": "4"}),
    "lithium manganate": ("LiMn2O4", {"Li": "1", "Mn": "2", "O": "4"}),
    "lithium titanate":
        ("Li4Ti5O12", {"Li": "4", "Ti": "5", "O": "12"}),
    "lithium nickel manganese cobalt oxide":
        ("LiNi1/3Mn1/3Co1/3O2",
         {"Li": "1", "Ni": "1/3", "Mn": "1/3", "Co": "1/3", "O": "2"}),
    "lithium nickel cobalt aluminum oxide":
        ("LiNi0.8Co0.15Al0.05O2",
         {"Li": "1", "Ni": "0.8", "Co": "0.15", "Al": "0.05", "O": "2"}),
    "sodium cobalt oxide": ("NaCoO2", {"Na": "1", "Co": "1", "O": "2"}),
    "bismuth vanadate": ("BiVO4", {"Bi": "1", "V": "1", "O": "4"}),
    "bismuth ferrite": ("BiFeO3", {"Bi": "1", "Fe": "1", "O": "3"}),
    "zinc ferrite": ("ZnFe2O4", {"Zn": "1", "Fe": "2", "O": "4"}),
    "cobalt ferrite": ("CoFe2O4", {"Co": "1", "Fe": "2", "O": "4"}),
    "nickel ferrite": ("NiFe2O4", {"Ni": "1", "Fe": "2", "O": "4"}),
    "manganese ferrite": ("MnFe2O4", {"Mn": "1", "Fe": "2", "O": "4"}),
    "magnesium aluminate":
        ("MgAl2O4", {"Mg": "1", "Al": "2", "O": "4"}),
    "barium hexaferrite":
        ("BaFe12O19", {"Ba": "1", "Fe": "12", "O": "19"}),
    "barium ferrite":
        ("BaFe12O19", {"Ba": "1", "Fe": "12", "O": "19"}),
    "yttrium iron garnet":
        ("Y3Fe5O12", {"Y": "3", "Fe": "5", "O": "12"}),
}


def _strip_hydrate(words: list) -> Tuple[list, int]:
    """['copper','sulfate','pentahydrate'] -> (['copper','sulfate'], 5)."""
    if not words:
        return words, 0
    last = words[-1]
    if last == "hydrate":
        return words[:-1], 1
    if last.endswith("hydrate"):
        n = HYDRATE_PREFIXES.get(last[:-len("hydrate")])
        if n:
            return words[:-1], n
    return words, 0


def _split_prefix(word: str, vocabulary: Dict) -> Tuple[int, str]:
    """'dioxide' -> (2, 'oxide'); 'pentoxide' -> (5, 'oxide') (elided
    vowel); no-prefix words pass through with count 0 (= balance)."""
    for prefix in sorted(MULTIPLIER_PREFIXES, key=len, reverse=True):
        if word.startswith(prefix):
            rest = word[len(prefix):]
            if rest in vocabulary:
                return MULTIPLIER_PREFIXES[prefix], rest
    return 0, word


def _parse_cation(word: str) -> Optional[Tuple[str, Optional[int], int]]:
    """Cation word -> (element, charge-or-None, explicit_count).

    Accepts element names ('lanthanum'), classical adjectives
    ('ferric'), multiplicative prefixes ('dinitrogen'), and trailing
    Roman-numeral states glued by the tokenizer ('iron(iii)'). A
    missing oxidation state is NOT an error here — molecular prefix
    names ('sulfur hexafluoride') never consult the charge; the
    charge-balance path rejects charge=None itself."""
    count = 0
    charge = None
    if "(" in word and word.endswith(")"):
        word, _, state = word[:-1].partition("(")
        charge = ROMAN.get(state.strip().lower())
        if charge is None:
            return None
    if word in CLASSICAL_CATIONS:
        element, cls_charge = CLASSICAL_CATIONS[word]
        return element, (charge or cls_charge), count
    if word not in ELEMENT_NAMES:
        count, word = _split_prefix(word, ELEMENT_NAMES)
        if word not in ELEMENT_NAMES:
            return None
    element = ELEMENT_NAMES[word]
    if charge is None:
        charge = CATION_CHARGES.get(element)
    return element, charge, count


def _format(element: str, count: int) -> str:
    return element if count == 1 else f"{element}{count}"


def _parse_two_cation_name(words: list) -> Optional[dict]:
    """Two element cations + one POLYATOMIC anion, balanced with the
    smallest integer counts: "lithium iron phosphate" -> LiFePO4
    (1·1 + 1·2 = 3). Restricted to polyatomic anions because their
    charge is fixed — multi-cation OXIDE names ("lithium cobalt
    oxide" = LiCoO2 with Co(III)) need per-compound oxidation states
    the default table cannot supply (the common ones are curated in
    MULTI_CATION_OXIDES), and a wrong balanced formula is worse than
    no parse. The minimal solution, compared on (anion count, total
    cation count), must be UNIQUE: same-charge cation pairs admit
    mirrored stoichiometries ("lithium sodium phosphate" balances as
    both LiNa2PO4 and Li2NaPO4) and degrade to no-parse."""
    w1, w2, anion_word = words
    if anion_word not in ANIONS_POLY:
        return None
    cations = []
    for w in (w1, w2):
        parsed = _parse_cation(w)
        if parsed is None or parsed[1] is None or parsed[2]:
            return None
        cations.append(parsed)
    (el1, q1, _), (el2, q2, _) = cations
    if el1 == el2:
        return None
    unit, an_charge = ANIONS_POLY[anion_word]

    best = None
    tied = False
    for c in range(1, 5):
        for a in range(1, 5):
            for b in range(1, 5):
                if a * q1 + b * q2 != c * (-an_charge):
                    continue
                cost = (c, a + b)
                if best is None or cost < best[0]:
                    best, tied = (cost, (a, b, c)), False
                elif cost == best[0] and (a, b, c) != best[1]:
                    tied = True
    if best is None or tied:
        return None
    a, b, c = best[1]

    composition: Dict[str, int] = {el1: a}
    composition[el2] = composition.get(el2, 0) + b
    for el, k in unit.items():
        composition[el] = composition.get(el, 0) + k * c
    formula = _format(el1, a) + _format(el2, b)
    if c == 1:
        formula += "".join(_format(el, k) for el, k in unit.items())
    else:
        formula += "(" + "".join(_format(el, k) for el, k in unit.items()) \
            + f"){c}"
    return {"formula": formula,
            "composition": {el: str(n) for el, n in composition.items()}}


def parse_chemical_name(name: str) -> Optional[dict]:
    """Full-name grammar entry. Returns {"formula": str,
    "composition": {element: str}} or None when outside the grammar."""
    cleaned = " ".join(name.strip().lower().replace("-", " ").split())
    if not cleaned:
        return None

    if cleaned in COMMON_NAMES:
        formula, comp = COMMON_NAMES[cleaned]
        return {"formula": formula,
                "composition": {el: str(n) for el, n in comp.items()}}
    if cleaned in MULTI_CATION_OXIDES:
        formula, comp = MULTI_CATION_OXIDES[cleaned]
        return {"formula": formula, "composition": dict(comp)}

    words = cleaned.split()
    words, hydrate_n = _strip_hydrate(words)
    if len(words) == 3:
        parsed = _parse_two_cation_name(words)
        if parsed is not None and hydrate_n:
            # same anhydrous-mirror rule as the 2-word path: the suffix
            # joins the formula, the composition stays the first part's
            parsed["formula"] += \
                f"·{hydrate_n}H2O" if hydrate_n > 1 else "·H2O"
        return parsed
    if len(words) != 2:
        return None
    cation_word, anion_word = words

    cation = _parse_cation(cation_word)
    if cation is None:
        return None
    element, charge, explicit_cat = cation

    # exact anion names win before prefix stripping ("dichromate" is the
    # Cr2O7 anion, not di+chromate). Prefix stripping is restricted to
    # the covalent-binary -ide anions: a prefixed POLYATOMIC anion names
    # a condensed anion (diphosphate = P2O7^4-, carried as exact
    # ANIONS_POLY entries), never a multiplicity — Na(PO4)2-style
    # balanced garbage must degrade to no-parse instead.
    if (anion_word in ANIONS_IDE or anion_word in ANIONS_POLY
            or anion_word in TERNARY_ATE):
        anion_count = 0
    else:
        anion_count, anion_word = _split_prefix(anion_word, ANIONS_IDE)

    if anion_word in ANIONS_IDE:
        an_el, an_charge = ANIONS_IDE[anion_word]
        unit = {an_el: 1}
    elif anion_word in ANIONS_POLY:
        unit, an_charge = ANIONS_POLY[anion_word]
    elif anion_word in TERNARY_ATE and anion_count == 0:
        b_metal = TERNARY_ATE[anion_word]
        if charge is None or charge + TERNARY_B_CHARGE[b_metal] != 6:
            # only true ABO3 combinations (A + B = +6) are in grammar;
            # spinel-convention names like "zinc ferrite" (ZnFe2O4)
            # must degrade to no-parse, not a wrong balanced formula
            return None
        an_charge = TERNARY_B_CHARGE[b_metal] - 6   # MO3 unit charge
        unit = {b_metal: 1, "O": 3}
    else:
        return None

    if explicit_cat or anion_count:
        # molecular nomenclature: explicit multiplicative prefixes give
        # the exact counts (absent cation prefix = mono) and the
        # oxidation state is never consulted — 'sulfur hexafluoride'
        # parses with no CATION_CHARGES entry for S
        n_cat = explicit_cat or 1
        n_an = anion_count or 1
        if (not explicit_cat and anion_count and anion_word in ANIONS_IDE
                and element in MAX_VALENCE):
            # elided-cation-prefix guard: the mono reading implies a
            # cation valence of n_an * |anion bonds|; if that exceeds
            # the element's maximum, the conventional name is the dimer
            # ('iodine pentoxide' -> I2O5, valence 5), and if even the
            # dimeric valence is impossible, degrade to no-parse
            implied = n_an * (-an_charge)
            if implied > MAX_VALENCE[element]:
                if implied % 2 == 0 and \
                        implied // 2 <= MAX_VALENCE[element]:
                    n_cat = 2
                else:
                    return None
    elif charge is None:
        # no prefixes and no known oxidation state: cannot balance —
        # degrade to no-parse rather than guess
        return None
    else:
        g = gcd(charge, -an_charge)
        n_cat, n_an = (-an_charge) // g, charge // g

    composition: Dict[str, int] = {element: n_cat}
    for el, k in unit.items():
        composition[el] = composition.get(el, 0) + k * n_an

    formula = _format(element, n_cat)
    if len(unit) == 1:
        el = next(iter(unit))
        formula += _format(el, unit[el] * n_an)
    elif n_an == 1:
        formula += "".join(_format(el, k) for el, k in unit.items())
    else:
        formula += "(" + "".join(_format(el, k) for el, k in unit.items()) \
            + f"){n_an}"

    if hydrate_n:
        # composition mirrors the anhydrous FIRST part, like the formula
        # path's hydrate rule (reference composition[0].elements)
        formula += f"·{hydrate_n}H2O" if hydrate_n > 1 else "·H2O"

    return {"formula": formula,
            "composition": {el: str(n) for el, n in composition.items()}}
