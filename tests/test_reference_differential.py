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
