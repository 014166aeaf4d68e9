"""Differential parity tests against the reference SOURCE (not a port).

When the read-only reference snapshot is present, run its pure-Python
resolver module and its convert_to_spacy static method directly over OUR doc
model / token streams and assert identical outputs. This proves our kernel
re-expresses the reference algorithms exactly, independent of hand-ported
golden values.
"""

import ast
import copy
import importlib.util
import os

import pytest

from material_parsers_spark.kernel.doc import convert_tokens
from material_parsers_spark.kernel.resolvers import calculate_distances
from tests.fixture_utils import get_tokens_and_spans, prepare_doc

REFERENCE = "/root/reference/material_parsers"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference snapshot not available"
)

HAVINGA = (
    "Havinga et al systematically changed n from 3.00 to 4.00 by "
    "synthesizing LaTl 3 (n=3.00, T c =1.6 K), LaPb 3 (n=3.75, "
    "T c =4.1 K), and ThPb 3 with T c =5.6 K and the solid solutions "
    "La (Tl 1−x Pb x ) 3 and (La 1−x Th x )Pb 3 ."
)
HAVINGA_SPANS = [
    ("LaTl 3", "<material>"), ("T c", "<tc>"), ("1.6 K", "<tcValue>"),
    ("LaPb 3", "<material>"), ("T c", "<tc>"), ("4.1 K", "<tcValue>"),
    ("ThPb 3", "<material>"), ("T c", "<tc>"), ("5.6 K", "<tcValue>"),
    ("La (Tl 1−x Pb x ) 3", "<material>"), ("(La 1−x Th x )Pb 3", "<material>"),
]


class _Ext:
    def __init__(self, token):
        self._token = token

    @property
    def links(self):
        return self._token.links

    @property
    def id(self):
        return self._token.id

    def set(self, key, value):
        setattr(self._token, key, value)


class _TokenShim:
    """Presents a MergedToken with the spaCy Token surface the reference
    resolver expects (idx/i/text/ent_type_/_ /len/str)."""

    def __init__(self, token, doc_shim):
        self._t = token
        self._d = doc_shim

    idx = property(lambda self: self._t.idx)
    i = property(lambda self: self._t.i)
    text = property(lambda self: self._t.text)
    ent_type_ = property(lambda self: self._t.ent_type)

    @property
    def _(self):
        return _Ext(self._t)

    def __len__(self):
        return len(self._t.text)

    def __str__(self):
        return self._t.text

    def __hash__(self):
        return id(self._t)

    def __eq__(self, other):
        return self._t is other._t


class _SpanShim:
    def __init__(self, doc_shim, start, stop):
        self._d = doc_shim
        self.start = max(start or 0, 0)
        self.stop = len(doc_shim.shims) if stop is None else stop

    def __iter__(self):
        return iter(self._d.shims[self.start:self.stop])

    @property
    def text(self):
        return self._d.doc.slice_text(self.start, self.stop)

    def __str__(self):
        return self.text


class _DocShim:
    def __init__(self, doc):
        self.doc = doc
        self.shims = [_TokenShim(t, self) for t in doc.tokens]

    def __iter__(self):
        return iter(self.shims)

    def __len__(self):
        return len(self.shims)

    def __getitem__(self, key):
        if isinstance(key, slice):
            return _SpanShim(self, key.start, key.stop)
        return self.shims[key]

    def __str__(self):
        return self.doc.text


def _load_reference_resolver():
    spec = importlib.util.spec_from_file_location(
        "ref_resolver", f"{REFERENCE}/linking/relationships_resolver.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _load_reference_convert():
    src = open(f"{REFERENCE}/linking/linking_module.py").read()
    tree = ast.parse(src)
    fn = next(
        node for node in ast.walk(tree)
        if isinstance(node, ast.FunctionDef) and node.name == "convert_to_spacy"
    )
    namespace = {}
    module = ast.Module(body=[fn], type_ignores=[])
    exec(compile(ast.fix_missing_locations(module), "<reference>", "exec"),
         namespace)
    return namespace["convert_to_spacy"]


def test_distance_matrix_matches_reference_code():
    ref = _load_reference_resolver()
    doc = _DocShim(prepare_doc(HAVINGA, HAVINGA_SPANS))
    materials = [t for t in doc if t.ent_type_ == "<material>"]
    tcs = [t for t in doc if t.ent_type_ == "<tcValue>"]

    theirs = ref.VicinityResolutionResolver().calculate_distances(
        materials, tcs, doc)

    ours = calculate_distances(
        [t._t for t in materials], [t._t for t in tcs], doc.doc)

    for material in materials:
        for tc in tcs:
            assert theirs[material][tc] == ours[material._t][tc._t]


def test_vicinity_relationships_match_reference_code():
    ref = _load_reference_resolver()
    doc = _DocShim(prepare_doc(HAVINGA, HAVINGA_SPANS))
    materials = [t for t in doc if t.ent_type_ == "<material>"]
    tcs = [t for t in doc if t.ent_type_ == "<tcValue>"]

    rels = ref.VicinityResolutionResolver().find_relationships(
        doc, materials, tcs)
    pairs_ref = [(str(a), str(b)) for a, b in rels]

    from material_parsers_spark.kernel.resolvers import vicinity_resolution
    doc2 = prepare_doc(HAVINGA, HAVINGA_SPANS)
    mats2 = [t for t in doc2 if t.ent_type == "<material>"]
    tcs2 = [t for t in doc2 if t.ent_type == "<tcValue>"]
    pairs_ours = [(str(a), str(b))
                  for a, b in vicinity_resolution(doc2, mats2, tcs2)]

    assert pairs_ref == pairs_ours


def test_convert_tokens_matches_reference_code():
    ref_convert = _load_reference_convert()
    cases = [
        (HAVINGA, HAVINGA_SPANS),
        ("The Tc of the BaClE2 is 30K.",
         [("Tc", "<tc>"), ("BaClE2", "<material>"), ("30K", "<tcValue>")]),
        ("The material BaClE2 superconducts at 30K.",
         [("BaClE2", "<material>"), ("superconducts", "<tc>"),
          ("30K", "<tcValue>")]),
        ("  leading spaces and −unicode  ", []),
    ]
    for text, input_spans in cases:
        tokens, spans = get_tokens_and_spans(text, input_spans)
        theirs = ref_convert(copy.deepcopy(tokens), copy.deepcopy(spans))
        ours = convert_tokens(copy.deepcopy(tokens), copy.deepcopy(spans))
        assert theirs == ours


def _admissible_chunk_spans(doc):
    """Every contiguous token span of length >= 2 made only of non-entity
    tokens — a strict superset of anything spaCy's noun-chunker could merge
    (the reference skips chunks overlapping entities, and overlapping
    merges raise E102 there)."""
    n = len(doc.tokens)
    spans = []
    for start in range(n):
        if doc.tokens[start].ent_type:
            continue
        end = start + 2
        while end <= n and not any(
                t.ent_type for t in doc.tokens[start:end]):
            spans.append((start, end))
            end += 1
    return spans


def test_no_noun_chunking_can_produce_the_stale_goldens():
    """PROOF that the reference's pinned distances 7.5/7.5/18
    (`tests/test_relationship_resolver.py:446-448`) cannot be produced by
    the reference's own posted code on the posted input, under ANY
    noun-chunk selection.

    calculate_distances (`relationships_resolver.py:224-294`) reads only
    character offsets (token.idx, len(token)) and character slices between
    char-anchored parenthesis/entity tokens. A noun-chunk merge
    (`linking_module.py:99-117`) changes token INDICES but never character
    structure, so the distance matrix is merge-invariant. We verify this
    exhaustively: the reference resolver is executed over our doc model
    with EVERY admissible single chunk merge (superset of what a parser
    could emit) and over multi-merge samples; the three golden-pair
    distances are 5.5/5.5/16.5 every time — never 7.5/7.5/18. The
    reference constants are therefore stale (calibrated against an
    earlier code/tokenizer revision), and our pinned 5.5/5.5/16.5 is the
    output of the reference CODE. The companion distances fixture
    (`test_calculate_distances_2`: 27.0/23.5) IS reproduced exactly,
    confirming the arithmetic (centroids + separator penalty) is faithful.
    """
    from material_parsers_spark.kernel.doc import merge_phrase_spans

    ref = _load_reference_resolver()

    def golden_triple(merges):
        base = prepare_doc(HAVINGA, HAVINGA_SPANS)
        doc = _DocShim(merge_phrase_spans(base, merges) if merges else base)
        materials = [t for t in doc if t.ent_type_ == "<material>"]
        tcs = [t for t in doc if t.ent_type_ == "<tcValue>"]
        assert len(materials) == 5 and len(tcs) == 3
        distances = ref.VicinityResolutionResolver().calculate_distances(
            materials, tcs, doc)
        return (distances[materials[0]][tcs[0]],
                distances[materials[1]][tcs[1]],
                distances[materials[2]][tcs[2]])

    assert golden_triple([]) == (5.5, 5.5, 16.5)

    base = prepare_doc(HAVINGA, HAVINGA_SPANS)
    single_spans = _admissible_chunk_spans(base)
    assert len(single_spans) > 50  # the sweep is genuinely exhaustive

    def swallows_paren(span):
        return any(t.text in "([{)]}" for t in base.tokens[span[0]:span[1]])

    for span in single_spans:
        if swallows_paren(span):
            # a merge hiding a parenthesis token makes the reference code
            # CRASH (substring scan still sees the paren, token scan does
            # not -> [0]/[-1] IndexError) — it cannot yield other goldens
            with pytest.raises(IndexError):
                golden_triple([span])
        else:
            assert golden_triple([span]) == (5.5, 5.5, 16.5), span

    # non-overlapping multi-merge samples: greedy packings from different
    # phase offsets (deterministic, no RNG per repo test policy)
    for offset in range(4):
        packed, cursor = [], offset
        for span in single_spans:
            if span[0] >= cursor and not swallows_paren(span):
                packed.append(span)
                cursor = span[1] + 1
        if packed:
            assert golden_triple(packed) == (5.5, 5.5, 16.5), packed


def test_distances_2_fixture_matches_reference_constants():
    """The second reference distances fixture IS reproduced digit-for-digit
    (27.0 = 13.5 x2 separator penalty from the '.' in the chunk, 23.5
    plain), pinning that our substrate matches the reference arithmetic
    wherever the reference constants are self-consistent."""
    ref = _load_reference_resolver()
    text = ("Havinga et al systematically changed n from 3.00 to 4.00 by "
            "synthesizing LaTl 3. T c = 1.6 K is then found in LaPb 3.")
    spans = [("LaTl 3", "<material>"), ("T c", "<tc>"),
             ("1.6 K", "<tcValue>"), ("LaPb 3", "<material>")]
    doc = _DocShim(prepare_doc(text, spans))
    materials = [t for t in doc if t.ent_type_ == "<material>"]
    tcs = [t for t in doc if t.ent_type_ == "<tcValue>"]
    distances = ref.VicinityResolutionResolver().calculate_distances(
        materials, tcs, doc)
    assert len(distances) == 2
    assert distances[materials[0]][tcs[0]] == 27.0
    assert distances[materials[1]][tcs[0]] == 23.5


def test_full_gazetteer_matches_shipped_dictionaries():
    """Our D2/D3 generators over the shipped base lists reproduce the
    reference's deployed pattern files (`resources/data/*/patterns.jsonl`)
    as exact (pattern, label) sets. The shipped space-groups file contains
    duplicate lattice-type lines (the reference generator re-appends them
    per item without dedup) and labels them 'unit-cell-type'; the trie is
    a set, so unique-set equality is the behavioral contract."""
    import json as _json

    from material_parsers_spark.pipeline.extraction import load_full_patterns

    ours = load_full_patterns()
    ours_set = {(p["pattern"], p["label"]) for p in ours}

    ref_set = set()
    for name in ("space-groups", "crystal-structure"):
        path = f"/root/reference/resources/data/{name}/patterns.jsonl"
        for line in open(path):
            row = _json.loads(line)
            ref_set.add((row["pattern"], row["label"]))

    assert ours_set == ref_set
    assert len(ours_set) == 5925
