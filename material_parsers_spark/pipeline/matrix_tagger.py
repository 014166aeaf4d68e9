"""Fixed-weight NumPy matrix tagger: a real NUMERIC payload for the
batched-inference seam (pipeline/inference.py).

The reference's production tagger is a batched BidLSTM_CRF
(`/root/reference/material_parsers/material_parser/material_parser_ml.py:44-56`
— `model.tag(texts)` over a token batch). The rule payload proves the
seam's plumbing with symbolic logic; THIS payload proves it with tensors:
the whole batch is padded into one dense (batch, time, features) array,
a window-stacked feature tensor is pushed through one fixed weight
matrix (`X @ W`), per-token logits are argmaxed into BIO labels under a
padding mask, and the BIO sequence is decoded back to character/token
spans. That is exactly the shape of a trained model's forward pass —
batch assembly, padding, masking, vectorized scoring, sequence decode —
with deterministic hand-fixed weights instead of learned ones, so the
output is golden-freezable.

Like the reference model (which tags grobid tokens with whitespace
filtered out — operator T2), the matrix model scores the FILTERED token
sequence and maps predictions back to unfiltered token indexes and char
offsets via an index map.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..kernel.tagger import _is_formula_token
from ..kernel.tokenizer import WHITESPACE_TOKENS

# label inventory: a deliberately small BIO space — enough to cover the
# two span families whose detection is expressible as a windowed linear
# model (formula heads + trailing stoichiometry digits, Tc values as
# number-followed-by-K)
LABELS = ("O", "B-<formula>", "I-<formula>", "B-<tcValue>", "I-<tcValue>")
_O, _BF, _IF, _BT, _IT = range(5)

N_FEATURES = 4
WINDOW = 2                      # ±2 filtered positions
_SLOTS = 2 * WINDOW + 1

_NUMBER_CHARS = set("0123456789.")


def featurize(tokens: Sequence[str]) -> np.ndarray:
    """Per-token indicator features, (n, N_FEATURES) float32.

    f0 bias, f1 formula-shaped, f2 number, f3 kelvin unit token. Pure
    per-token — all context enters through the window stacking in
    :func:`matrix_payload`. Every feature carries weight in
    :func:`weights`; anything the model cannot use stays out of the
    per-token hot loop."""
    out = np.zeros((len(tokens), N_FEATURES), dtype=np.float32)
    for i, tok in enumerate(tokens):
        out[i, 0] = 1.0
        if _is_formula_token(tok):
            out[i, 1] = 1.0
        if tok and not set(tok) - _NUMBER_CHARS and tok != ".":
            out[i, 2] = 1.0
        if tok == "K":
            out[i, 3] = 1.0
    return out


def weights() -> np.ndarray:
    """The fixed weight matrix, (_SLOTS * N_FEATURES, len(LABELS)).

    Linear thresholds implement the conjunctions: the O baseline is the
    center bias (6.0); a label wins only when enough windowed evidence
    stacks above it (e.g. I-<formula> needs number-at-center (+4) AND
    formula-at-prev1 (+4) = 8 > 6). Ties cannot occur: every reachable
    score is distinct from 6.0 by construction."""
    w = np.zeros((_SLOTS * N_FEATURES, len(LABELS)), dtype=np.float32)

    def at(slot: int, feat: int) -> int:
        return (slot + WINDOW) * N_FEATURES + feat

    w[at(0, 0), _O] = 6.0            # O baseline via center bias
    w[at(0, 1), _BF] = 10.0          # formula-shaped token -> B-<formula>
    w[at(0, 2), _IF] = 4.0           # trailing stoichiometry digits:
    w[at(-1, 1), _IF] = 4.0          #   number right after a formula
    w[at(0, 2), _BT] = 4.0           # Tc value: number followed by K
    w[at(1, 3), _BT] = 4.5           #   (4+4.5 beats I-<formula>'s 8)
    w[at(0, 3), _IT] = 4.0           # the K unit itself continues the
    w[at(-1, 2), _IT] = 4.5          #   value span after a number
    return w


_W = weights()


def _decode_bio(labels: np.ndarray, index_map: List[int],
                offsets: Sequence[Tuple[int, int]],
                text: str) -> List[dict]:
    """BIO label row -> span dicts in whole-sequence coordinates.

    ``labels`` indexes the FILTERED token sequence; ``index_map[i]`` is
    its position in the unfiltered stream. A span starts at B- (or an
    orphan I-, repaired like kernel.labels.bio_repair) and extends
    through consecutive same-type I- labels."""
    spans: List[dict] = []
    n = len(labels)
    i = 0
    while i < n:
        lab = int(labels[i])
        if lab == _O:
            i += 1
            continue
        type_ = LABELS[lab][2:]          # "<formula>" / "<tcValue>"
        j = i + 1
        while j < n and LABELS[int(labels[j])] == f"I-{type_}":
            j += 1
        tok_start = index_map[i]
        tok_end = index_map[j - 1] + 1
        start_char = offsets[tok_start][0]
        end_char = offsets[tok_end - 1][1]
        spans.append({
            "text": text[start_char:end_char],
            "type": type_,
            "offset_start": start_char,
            "offset_end": end_char,
            "token_start": tok_start,
            "token_end": tok_end,
        })
        i = j
    return spans


def matrix_payload(
    batch: Sequence[Tuple[List[str], List[Tuple[int, int]], str]],
) -> List[List[dict]]:
    """Tag a batch of sequences with ONE padded tensor forward pass.

    Mirrors a batched ``model.tag``: filter whitespace (as the reference
    does before its model — the WHITESPACE_TOKENS set shared with the
    rule tagger, so CRLF text filters identically across BOTH tagger
    payloads; the gazetteer/turns T2 path keeps the reference's narrower
    BLANKS for parity), featurize, pad to the
    batch's max length, stack the ±WINDOW context into (B, T, _SLOTS*F),
    score all tokens with a single ``X @ W`` matmul, argmax under the
    padding mask, then decode BIO per sequence back to unfiltered-token
    and char offsets."""
    filtered: List[Tuple[List[str], List[int]]] = []
    for tokens, _offsets, _text in batch:
        keep = [i for i, t in enumerate(tokens)
                if t not in WHITESPACE_TOKENS]
        filtered.append(([tokens[i] for i in keep], keep))

    if not filtered:
        return []
    max_len = max((len(toks) for toks, _ in filtered), default=0)
    if max_len == 0:
        return [[] for _ in batch]

    feats = np.zeros((len(batch), max_len, N_FEATURES), dtype=np.float32)
    for b, (toks, _) in enumerate(filtered):
        if toks:
            feats[b, :len(toks)] = featurize(toks)

    # window stacking: X[b, t] = concat(feats[b, t-2 .. t+2]), zero-padded
    # at the edges — the (B, T, _SLOTS*F) tensor a conv layer would see
    stacked = np.zeros((len(batch), max_len, _SLOTS * N_FEATURES),
                       dtype=np.float32)
    for s in range(-WINDOW, WINDOW + 1):
        dst = (s + WINDOW) * N_FEATURES
        if s < 0:
            stacked[:, -s:, dst:dst + N_FEATURES] = feats[:, :s]
        elif s > 0:
            stacked[:, :-s, dst:dst + N_FEATURES] = feats[:, s:]
        else:
            stacked[:, :, dst:dst + N_FEATURES] = feats

    logits = stacked @ _W                       # (B, T, L) — THE model call
    labels = np.argmax(logits, axis=2)          # (B, T)

    results: List[List[dict]] = []
    for b, ((tokens, offsets, text), (toks, keep)) in enumerate(
            zip(batch, filtered)):
        seq_labels = labels[b, :len(toks)]       # padding mask
        results.append(_decode_bio(seq_labels, keep, offsets, text))
    return results
