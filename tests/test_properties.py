"""Property-based invariants (hypothesis) for the pure scalar layer —
the reference only had example-based tests; properties catch the
budget-math edge cases examples miss."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from open_pulsar_spark.functions.chunking import chunk_text
from open_pulsar_spark.operators.pipeline import backoff_sec, classify_error_text

LABEL = re.compile(r"^\[\d+/\d+\] ")


@settings(max_examples=200, deadline=None)
@given(
    text=st.text(
        alphabet=st.sampled_from("ab .\n"),  # exercises para/sentence/hard paths
        min_size=0,
        max_size=20_000,
    ),
    # min limit 20: with ≤20k text, chunk count stays ≤ 10k and the
    # widest label "[10000/10000] " (14) + ≥1 char of content fits; below
    # that the label-fits invariant is unsatisfiable and chunk_text raises.
    limit=st.integers(min_value=20, max_value=5000),
)
def test_chunking_invariants(text, limit):
    chunks = chunk_text(text, limit)
    # every chunk within the limit
    assert all(len(c) <= limit for c in chunks)
    # single chunk is unlabeled and verbatim
    if len(text) <= limit:
        assert chunks == [text]
    # multi-chunk output is fully labeled with consistent i/N
    if len(chunks) > 1:
        n = len(chunks)
        for i, c in enumerate(chunks):
            assert c.startswith(f"[{i + 1}/{n}] ")
    # no alphabetic content lost (separators may be normalized at cuts)
    stripped = "".join(LABEL.sub("", c) for c in chunks)
    assert stripped.replace(" ", "").replace("\n", "") == text.replace(
        " ", ""
    ).replace("\n", "")


@settings(max_examples=200, deadline=None)
@given(attempt=st.integers(min_value=1, max_value=50), rl=st.booleans())
def test_backoff_bounds_and_monotonicity(attempt, rl):
    d = backoff_sec(attempt, rl)
    assert 2 <= d <= 60
    assert d >= backoff_sec(max(attempt - 1, 1), rl) or d == 60
    if d < 60:
        assert backoff_sec(attempt, True) >= backoff_sec(attempt, False)


@settings(max_examples=100, deadline=None)
@given(prefix=st.text(max_size=3500), cls=st.sampled_from(
    ["rate_limit", "context_overflow", "auth", "timeout", "network"]
))
def test_classifier_finds_marker_anywhere_in_tail(prefix, cls):
    marker = {
        "rate_limit": " 429 ",
        "context_overflow": " context_length ",
        "auth": " 401 ",
        "timeout": " timed out ",
        "network": " ECONNREFUSED ",
    }[cls]
    # marker at the very END is always inside the 3000-byte tail
    got = classify_error_text(prefix.replace("429", "") + marker)
    # earlier classes can shadow later ones if the random prefix
    # happens to contain their markers — first-match-wins is the spec
    order = ["rate_limit", "context_overflow", "auth", "timeout", "network"]
    assert got in order
    assert order.index(got) <= order.index(cls)


@settings(max_examples=300, deadline=None)
@given(h=st.integers(min_value=0, max_value=2**32 - 1))
def test_minhash_permutation_never_overflows_int64(h):
    # ANSI mode (Spark 4) makes int64 overflow a query-killing error,
    # so the universal-hash constants must keep a*h+b < 2^63 for every
    # 32-bit input hash — the a < 2^30 bound is the invariant.
    from open_pulsar_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    for a, b in zip(MINHASH_A, MINHASH_B):
        v = a * h + b
        assert 0 <= v < 2**62
        assert 0 <= v % MINHASH_P < MINHASH_P


@settings(max_examples=300, deadline=None)
@given(n=st.integers(min_value=1, max_value=100_000))
def test_frame_plan_indexes_valid_and_strictly_increasing(n):
    # pure replica of multimodal_frame_plan's arithmetic: k uniform
    # slots over n frames must be in-range, distinct, and ordered.
    from open_pulsar_spark.operators.multimodal import FRAME_SAMPLES

    k = min(FRAME_SAMPLES, n)
    idx = [(i * n) // k for i in range(k)]
    assert all(0 <= j < n for j in idx)
    assert idx == sorted(set(idx))
    assert idx[0] == 0
