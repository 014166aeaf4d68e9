"""Batched-inference seam for the L1 tagging stage.

The reference's production tagger is a delft BidLSTM_CRF
(`material_parser_ml.py:44-56`; model config at
`resources/data/models/material-parsers-BidLSTM_CRF/config.json`,
max_sequence_length 3000). Exact model parity is out of scope — the
reference's own tests inject tagger output
(`tests/test_ml_material_parser.py:14`, model_path=None) — but a real user
swapping in a trained model needs the DISTRIBUTED PLUMBING: an
Arrow-batched stage that (a) tokenizes each turn once, (b) chunks token
sequences to the model's max_sequence_length, (c) feeds the model
fixed-size BATCHES of sequences (the knob that keeps a GPU/BLAS payload
fed), and (d) shifts the predicted spans back to whole-turn token and
character offsets. This module is that seam; the deterministic rule
tagger (kernel/tagger.py) is the default payload, so the stage is
exercised for real end to end and a trained model is a one-argument swap.

Scale shape: one ArrowEvalPython stage over the narrow (conv_id,
turn_idx, text) projection — per-turn rows are independent, so the stage
is shuffle-free and parallelizes like the extraction hot path. The
payload is constructed once per Python worker (closure caching), exactly
how a model's weights should be loaded: once per executor process, never
per row.
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one tagged span: same shape the rule tagger emits (kernel/tagger.py),
# token indexes into the UNFILTERED (delimiter-retaining) token array
TAGGED_SPANS_TYPE = (
    "array<struct<text:string, type:string, offset_start:int, "
    "offset_end:int, token_start:int, token_end:int>>"
)

# the reference model's sequence budget (config.json max_sequence_length)
MAX_SEQUENCE_LENGTH = 3000

# a payload tags a BATCH of token sequences in one call:
# (tokens, offsets, text) per sequence in, a span list per sequence out
TaggerPayload = Callable[
    [Sequence[Tuple[List[str], List[Tuple[int, int]], str]]],
    List[List[dict]],
]


def rule_payload(
    batch: Sequence[Tuple[List[str], List[Tuple[int, int]], str]],
) -> List[List[dict]]:
    """Default payload: the deterministic rule tagger, applied per
    sequence. A DL payload replaces this one function with a call into
    its batched predict (the whole batch crosses into the model runtime
    at once)."""
    from ..kernel.tagger import tag_spans

    return [tag_spans(tokens, offsets, text)
            for tokens, offsets, text in batch]


def chunk_sequence(n_tokens: int, max_sequence_length: int) -> List[Tuple[int, int]]:
    """Non-overlapping [start, end) token windows covering the sequence —
    the same truncation-free chunking delft applies ahead of the LSTM.
    Spans that straddle a chunk boundary are a documented boundary effect
    of ANY fixed-window tagger (the reference's 3000-token budget makes
    them vanishingly rare on paragraph-sized turns)."""
    if n_tokens == 0:
        return []
    return [(start, min(start + max_sequence_length, n_tokens))
            for start in range(0, n_tokens, max_sequence_length)]


def tag_turns(turns: DataFrame,
              payload: Optional[TaggerPayload] = None,
              max_sequence_length: int = MAX_SEQUENCE_LENGTH,
              batch_size: int = 32) -> DataFrame:
    """Append a ``tagged_spans`` column: the pluggable L1 stage.

    ``payload`` tags batches of (tokens, offsets, text) sequences —
    default is the rule tagger; pass a model-backed callable to swap in
    real inference. Sequences longer than ``max_sequence_length`` tokens
    are chunked, tagged per chunk, and re-offset to whole-turn
    coordinates. The payload always receives at most ``batch_size``
    sequences per call (chunks count individually), keeping model-side
    memory bounded and a GPU payload saturated.
    """
    tagger = payload if payload is not None else rule_payload

    @F.pandas_udf(TAGGED_SPANS_TYPE)
    def tag_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from ..kernel.tokenizer import tokenize

        for series in batches:
            # assemble (turn, chunk) work items for the whole Arrow batch
            items = []   # (row_idx, token_shift, char_shift, seq)
            texts = series.tolist()
            for row_idx, text in enumerate(texts):
                if not text:
                    continue
                tokens, offsets = tokenize(text)
                for start, end in chunk_sequence(len(tokens),
                                                 max_sequence_length):
                    char_shift = offsets[start][0]
                    chunk_offsets = [
                        (s - char_shift, e - char_shift)
                        for s, e in offsets[start:end]]
                    chunk_text = text[char_shift:offsets[end - 1][1]]
                    items.append((row_idx, start, char_shift,
                                  (tokens[start:end], chunk_offsets,
                                   chunk_text)))

            per_row: List[List[dict]] = [[] for _ in texts]
            for at in range(0, len(items), batch_size):
                window = items[at:at + batch_size]
                results = tagger([seq for _, _, _, seq in window])
                if len(results) != len(window):
                    # fail loudly: a payload returning a short/long list
                    # (e.g. a model runtime dropping empty sequences)
                    # would otherwise silently misalign spans onto the
                    # wrong turns for the rest of the batch
                    raise ValueError(
                        f"tagger payload returned {len(results)} results "
                        f"for a batch of {len(window)} sequences")
                for (row_idx, token_shift, char_shift, _), spans in zip(
                        window, results):
                    for span in spans:
                        per_row[row_idx].append({
                            "text": span["text"],
                            "type": span["type"],
                            "offset_start": span["offset_start"] + char_shift,
                            "offset_end": span["offset_end"] + char_shift,
                            "token_start": span["token_start"] + token_shift,
                            "token_end": span["token_end"] + token_shift,
                        })
            yield pd.Series(per_row)

    # deliberate, same as run_extraction: stops Catalyst duplicating the
    # Python stage under a downstream explode
    tag_udf = tag_udf.asNondeterministic()

    return (
        turns
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .withColumn("tagged_spans", tag_udf(F.col("text")))
    )
