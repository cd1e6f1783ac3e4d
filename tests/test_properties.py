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


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(
        st.floats(min_value=0.0, max_value=1.0, exclude_max=True, width=64),
        min_size=0,
        max_size=300,
        unique=True,
    ),
    n_parts=st.integers(min_value=1, max_value=8),
    k=st.integers(min_value=2, max_value=64),
)
def test_kmv_merge_equals_global_bottom_k(values, n_parts, k):
    """The KMV merge law (sketch.py): bottom-k of the union of
    per-partition bottom-k lists equals the global bottom-k, for ANY
    assignment of values to partitions — the property that makes the
    sketch mergeable / partitioning-invariant."""
    parts: list[list[float]] = [[] for _ in range(n_parts)]
    for i, v in enumerate(values):
        parts[i % n_parts].append(v)
    partials = [sorted(p)[:k] for p in parts]
    merged = sorted(x for p in partials for x in p)[:k]
    assert merged == sorted(values)[:k]


@settings(max_examples=200, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=200),
    budget=st.integers(min_value=100, max_value=2000),
)
def test_shard_packing_offsets_invariants(sizes, budget):
    """Offset-based shard assignment (curation.assign_shards math):
    shards are contiguous and non-decreasing in layout order, every
    shard's total stays under budget + one-doc overshoot, and appending
    documents never changes existing assignments (incremental
    recomputability)."""
    def assign(szs):
        out, off = [], 0
        for s in szs:
            out.append(off // budget)
            off += s
        return out

    shards = assign(sizes)
    # non-decreasing in layout order, starting at 0 (ids may SKIP when
    # a single doc spans multiple budgets — that's correct: the next
    # doc starts in the shard its offset lands in)
    assert shards[0] == 0
    assert all(b >= a for a, b in zip(shards, shards[1:]))
    # per-shard total ≤ budget + (last doc overshoot): the shard's
    # first doc starts below the boundary, so total < budget + max doc
    totals: dict[int, int] = {}
    for s, sz in zip(shards, sizes):
        totals[s] = totals.get(s, 0) + sz
    for s, tot in totals.items():
        docs_in = [sz for sh, sz in zip(shards, sizes) if sh == s]
        assert tot <= budget + max(docs_in)
    # append-stability: assignments of a prefix never change
    assert assign(sizes[: len(sizes) // 2]) == shards[: len(sizes) // 2]


def test_decode_binary_hook_gated_on_codec_libs():
    """The production decode hook: decodes a real PNG when Pillow is
    importable, raises the documented NotImplementedError otherwise —
    either way the seam is exercised, never silently skipped."""
    import pytest

    from open_pulsar_spark.operators.multimodal import decode_binary

    try:
        import io

        from PIL import Image
    except ImportError:
        with pytest.raises(NotImplementedError, match="codec"):
            decode_binary(b"\x89PNG....", "image")
    else:
        buf = io.BytesIO()
        Image.new("RGB", (12, 7)).save(buf, format="PNG")
        out = decode_binary(buf.getvalue(), "image")
        assert (out["width"], out["height"], out["n_frames"]) == (12, 7, 1)
    # audio/video always route to the codec-required error in this repo
    with pytest.raises(NotImplementedError):
        decode_binary(b"RIFF....", "audio")
