"""Batched-inference seam (L1 plumbing): the pluggable tagging stage must
reproduce the rule tagger's output exactly with the default payload,
chunk long sequences to the model budget, respect the batch-size knob,
and accept a swapped-in payload (the reference's injected-label test
strategy, distributed)."""

import pytest

from material_parsers_spark.kernel.tagger import tag_spans
from material_parsers_spark.kernel.tokenizer import tokenize
from material_parsers_spark.pipeline.inference import (
    chunk_sequence,
    tag_turns,
)
from material_parsers_spark.pipeline.session import build_session
from material_parsers_spark.pipeline.transcripts import generate_turns


@pytest.fixture(scope="module")
def spark():
    return build_session(app_name="inference-tests", master="local[4]",
                         shuffle_partitions=8)


@pytest.fixture(scope="module")
def turns(spark):
    return generate_turns(spark, 200, partitions=4).cache()


def test_chunk_sequence_covers_without_overlap():
    assert chunk_sequence(0, 10) == []
    assert chunk_sequence(5, 10) == [(0, 5)]
    assert chunk_sequence(10, 10) == [(0, 10)]
    assert chunk_sequence(25, 10) == [(0, 10), (10, 20), (20, 25)]


def test_default_payload_matches_rule_tagger_exactly(spark, turns):
    """The seam with the rule payload must yield, turn for turn, the same
    spans as calling the kernel tagger directly on the whole text."""
    tagged = tag_turns(turns).select("conv_id", "turn_idx", "text",
                                     "tagged_spans").collect()
    assert len(tagged) == 200
    for row in tagged:
        tokens, offsets = tokenize(row.text)
        expected = [
            {k: s[k] for k in ("text", "type", "offset_start", "offset_end",
                               "token_start", "token_end")}
            for s in tag_spans(tokens, offsets, row.text)
        ]
        got = [s.asDict() for s in row.tagged_spans]
        assert got == expected, (row.conv_id, row.turn_idx)


def test_chunking_reoffsets_spans_to_whole_turn_coordinates(spark):
    """Sentence-aligned chunks: with max_sequence_length equal to one
    sentence's token count, every chunk is tagged independently and the
    re-offset spans must equal whole-text tagging (no span straddles a
    boundary by construction)."""
    sentence = "The material MgB 2 superconducts at 39K. "
    n_tokens = len(tokenize(sentence)[0])
    text = sentence * 6
    df = spark.createDataFrame(
        [("c", 0, text)], "conv_id string, turn_idx int, text string")

    tagged = tag_turns(df, max_sequence_length=n_tokens) \
        .select("tagged_spans").collect()[0].tagged_spans
    tokens, offsets = tokenize(text)
    expected = [
        {k: s[k] for k in ("text", "type", "offset_start", "offset_end",
                           "token_start", "token_end")}
        for s in tag_spans(tokens, offsets, text)
    ]
    assert [s.asDict() for s in tagged] == expected
    # sanity: the text genuinely spanned multiple chunks
    assert len(chunk_sequence(len(tokens), n_tokens)) == 6
    # and spans from later chunks carry whole-turn offsets
    assert any(s["offset_start"] >= len(sentence) for s in expected)


def test_batch_size_knob_bounds_payload_calls(spark):
    """The payload must never receive more than batch_size sequences per
    call. The probe payload reports its batch size through the span it
    returns, so the bound is asserted from the driver."""
    def probing_payload(batch):
        return [[{"text": "probe", "type": "<probe>", "offset_start": 0,
                  "offset_end": 1, "token_start": len(batch),
                  "token_end": len(batch)}]
                for _ in batch]

    df = generate_turns(build_session(app_name="inference-tests",
                                      master="local[4]",
                                      shuffle_partitions=8), 64, partitions=2)
    tagged = tag_turns(df, payload=probing_payload, batch_size=3) \
        .select("tagged_spans").collect()
    observed = {row.tagged_spans[0].token_start for row in tagged}
    assert max(observed) <= 3
    assert observed  # payload actually ran


def test_swapped_payload_flows_through_injected_labels(spark):
    """A model stand-in that injects fixed labels (the reference's own
    test strategy for the DL tagger) must flow through the seam
    untouched except for offset shifting."""
    def injected(batch):
        out = []
        for tokens, offsets, text in batch:
            out.append([{"text": tokens[0], "type": "<injected>",
                         "offset_start": offsets[0][0],
                         "offset_end": offsets[0][1],
                         "token_start": 0, "token_end": 1}])
        return out

    df = spark.createDataFrame(
        [("c", 0, "Alpha beta gamma")],
        "conv_id string, turn_idx int, text string")
    row = tag_turns(df, payload=injected).select("tagged_spans") \
        .collect()[0]
    assert [s.asDict() for s in row.tagged_spans] == [
        {"text": "Alpha", "type": "<injected>", "offset_start": 0,
         "offset_end": 5, "token_start": 0, "token_end": 1}]


def test_payload_length_mismatch_raises(spark):
    """A payload returning fewer results than sequences must fail loudly,
    never silently misalign spans onto the wrong turns."""
    def short_payload(batch):
        return [[] for _ in batch][:-1]

    df = spark.createDataFrame(
        [("c", 0, "Alpha beta"), ("c", 1, "Gamma delta")],
        "conv_id string, turn_idx int, text string")
    with pytest.raises(Exception, match="payload returned"):
        tag_turns(df, payload=short_payload).collect()


# ---------------------------------------------------------------------------
# numeric payload: the fixed-weight NumPy matrix model (round-4 ask —
# prove the seam with TENSORS, not rules: batch assembly, padding, masked
# argmax, BIO decode, chunk re-offsetting)
# ---------------------------------------------------------------------------

def _spans(payload, text, **kw):
    tokens, offsets = tokenize(text)
    return payload([(tokens, offsets, text)], **kw) if kw else \
        payload([(tokens, offsets, text)])


def test_matrix_payload_golden_sentences():
    """The forward pass (featurize -> pad -> window-stack -> X @ W ->
    masked argmax -> BIO decode) on hand-picked sentences."""
    from material_parsers_spark.pipeline.matrix_tagger import matrix_payload

    text = "The material MgB 2 superconducts at 39 K under pressure."
    [spans] = _spans(matrix_payload, text)
    assert [(s["text"], s["type"]) for s in spans] == [
        ("MgB 2", "<formula>"), ("39 K", "<tcValue>")]
    # char offsets index the original text exactly
    for s in spans:
        assert text[s["offset_start"]:s["offset_end"]] == s["text"]

    assert _spans(matrix_payload, "no entities here at all") == [[]]
    assert matrix_payload([]) == []


def test_matrix_payload_padding_is_inert():
    """Batching a short sequence next to a long one (forcing padding on
    the short one) must not change either result — the padding mask and
    zero feature rows are genuinely inert."""
    from material_parsers_spark.pipeline.matrix_tagger import matrix_payload

    short = "MgB 2 superconducts at 39 K."
    long = ("We measured LaFeAsO 0.89 F 0.11 with Tc = 26 K. " * 20).strip()

    def one(text):
        [spans] = _spans(matrix_payload, text)
        return spans

    batch = []
    for text in (short, long):
        tokens, offsets = tokenize(text)
        batch.append((tokens, offsets, text))
    together = matrix_payload(batch)
    assert together == [one(short), one(long)]


def test_matrix_payload_through_seam_with_chunking(spark):
    """The numeric payload driven through tag_turns with a small model
    budget: chunk assembly, padded batches, and span re-offsetting
    across chunk boundaries must reproduce whole-sequence tagging
    (sentence-aligned chunks, so no span straddles)."""
    from material_parsers_spark.pipeline.matrix_tagger import matrix_payload

    sentence = "The material MgB 2 superconducts at 39 K. "
    n_tokens = len(tokenize(sentence)[0])
    text = (sentence * 7).rstrip()
    df = spark.createDataFrame(
        [("c", 0, text)], "conv_id string, turn_idx int, text string")

    chunked = tag_turns(df, payload=matrix_payload,
                        max_sequence_length=n_tokens, batch_size=2) \
        .select("tagged_spans").collect()[0].tagged_spans
    tokens, offsets = tokenize(text)
    [whole] = matrix_payload([(tokens, offsets, text)])
    assert [s.asDict() for s in chunked] == whole
    # the text genuinely crossed chunk boundaries and later-chunk spans
    # carry whole-turn coordinates
    assert len(chunk_sequence(len(tokens), n_tokens)) == 7
    assert any(s["offset_start"] >= len(sentence) for s in whole)
    assert all(text[s["offset_start"]:s["offset_end"]] == s["text"]
               for s in whole)


def test_matrix_payload_batches_cross_turn_boundaries(spark):
    """Through the seam over many turns: batch_size=4 groups sequences
    from DIFFERENT turns into one padded tensor; results must equal the
    rule-free per-turn forward pass."""
    from material_parsers_spark.pipeline.matrix_tagger import matrix_payload

    rows = [("c", i,
             f"Sample {i}: MgB {i % 7} superconducts at {20 + i} K.")
            for i in range(16)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string")
    tagged = tag_turns(df, payload=matrix_payload, batch_size=4) \
        .select("turn_idx", "tagged_spans").collect()
    assert len(tagged) == 16
    for row in tagged:
        text = rows[row.turn_idx][2]
        tokens, offsets = tokenize(text)
        [expected] = matrix_payload([(tokens, offsets, text)])
        assert [s.asDict() for s in row.tagged_spans] == expected


def test_matrix_payload_filters_crlf_like_the_shared_whitespace_set():
    """CRLF text: '\\r' tokens must be filtered exactly like spaces (the
    shared WHITESPACE_TOKENS set), so '39\\r\\nK' still tags a tcValue."""
    from material_parsers_spark.pipeline.matrix_tagger import matrix_payload

    text = "MgB 2 superconducts at 39\r\nK in this batch."
    [spans] = _spans(matrix_payload, text)
    assert ("39\r\nK", "<tcValue>") in [(s["text"], s["type"])
                                        for s in spans]
