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


@settings(max_examples=200, deadline=None)
@given(
    steps=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),   # n at risk
            st.integers(min_value=0, max_value=10_000),   # churned
        ).map(lambda t: (max(t[0], t[1] + 1), t[1])),     # d < n
        min_size=1,
        max_size=50,
    )
)
def test_km_integer_fold_tracks_exact_product(steps):
    """The Kaplan-Meier integer-grid recurrence (user_survival_curve):
    s' = s·(n−d) div n is monotone non-increasing, stays in [0, GRID],
    and never drifts more than one grid unit per step from the exact
    rational product — the truncation bound that justifies the 10^12
    grid."""
    from fractions import Fraction

    GRID = 10**12
    s = GRID
    exact = Fraction(1)
    for i, (n, d) in enumerate(steps, start=1):
        s = (s * (n - d)) // n
        exact *= Fraction(n - d, n)
        assert 0 <= s <= GRID
        assert s <= exact * GRID           # truncation only loses mass
        assert s >= exact * GRID - i       # ...at most 1 ulp per step


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=100
    )
)
def test_ewma_integer_recurrence_stays_in_prefix_range(xs):
    """The integer EWMA recurrence (revenue_ewma): every smoothed
    value lies within [min(prefix) − 1, max(prefix)] — a convex
    combination on a truncating grid can undershoot the running min by
    at most the truncation unit and can never overshoot the max."""
    s = xs[0]
    lo = hi = xs[0]
    for x in xs[1:]:
        s = (x * 1 + s * 4) // 5
        lo, hi = min(lo, x), max(hi, x)
        assert lo - 1 <= s <= hi


@settings(max_examples=500, deadline=None)
@given(
    num=st.integers(min_value=-(10**15), max_value=10**15),
    den=st.integers(min_value=1, max_value=10**15),
)
def test_offset_division_equals_floor_for_any_sign(num, den):
    """The positive-offset division trick (revenue_acf,
    bundle_modularity): (10⁶·(num + den)) div den − 10⁶ equals
    floor(10⁶·num/den) for ANY sign of num — the identity that lets
    Spark's truncating `div` and DuckDB's flooring `//` agree on
    negative statistics by never dividing a negative numerator."""
    import math

    shifted = (10**6 * (num + den)) // den - 10**6
    assert shifted == math.floor(10**6 * num / den) or shifted == (
        10**6 * num
    ) // den
    # the exact integer form (no float) is the binding assertion:
    assert shifted == (10**6 * num) // den


@settings(max_examples=100, deadline=None)
@given(
    items=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=60),
    probes=st.lists(st.text(min_size=1, max_size=12), max_size=30),
)
def test_bloom_slot_math_has_no_false_negatives(items, probes):
    """The bloom slot/word/mask arithmetic (source_bloom_filter): every
    inserted item passes its own membership probe (a bloom filter has
    NO false negatives), replicated in pure Python over the same
    md5-derived positions the engines compute."""
    import hashlib

    from open_pulsar_spark.operators.sketch import BLOOM_K, BLOOM_M, BLOOM_WORD

    def slots(t: str) -> list[int]:
        return [
            int(hashlib.md5(f"{k}|{t}".encode()).hexdigest()[:15], 16) % BLOOM_M
            for k in range(BLOOM_K)
        ]

    words: dict[int, int] = {}
    for t in items:
        for s in slots(t):
            words[s // BLOOM_WORD] = words.get(s // BLOOM_WORD, 0) | (
                1 << (s % BLOOM_WORD)
            )

    def member(t: str) -> bool:
        return all(
            words.get(s // BLOOM_WORD, 0) & (1 << (s % BLOOM_WORD))
            for s in slots(t)
        )

    assert all(member(t) for t in items)
    for p in probes:
        if p in set(items):
            assert member(p)
    # positivity of every stored word (the BIGINT-safety argument for
    # 32-bit payloads): no mask ever sets the sign bit
    assert all(0 < w < 2**63 for w in words.values())


@settings(max_examples=300, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # ts (coarse: forces ties)
            st.integers(min_value=0, max_value=100),  # event_id
            st.sampled_from("abc"),                   # type
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda e: e[1],
    )
)
def test_sequence_containment_equals_first_before_last(events):
    """The event_type_sequences rewrite: 'some t1-occurrence strictly
    precedes some t2-occurrence' under the total (ts, event_id) order
    ⇔ FIRST(t1) < LAST(t2) — for every type pair, including t1 = t2
    and heavy timestamp ties."""
    types = sorted({t for _, _, t in events})
    occ = {t: sorted((ts, eid) for ts, eid, tt in events if tt == t) for t in types}
    for t1 in types:
        for t2 in types:
            brute = any(
                a < b for a in occ[t1] for b in occ[t2]
            )
            rewrite = occ[t1][0] < occ[t2][-1]
            assert brute == rewrite


@settings(max_examples=300, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**6), max_size=60),
)
def test_bucket_profile_math_matches_python_reference(counts):
    """The round-7 bucket-profile closing arithmetic (candidate mass
    Σ c·(c−1)/2 and the top-10 mass share) as PURE integer math — the
    Spark aggregate uses the same expressions, so this pins the
    reference the oracle and the engine both implement."""
    mass = sum(c * (c - 1) // 2 for c in counts)
    top10 = sum(c * (c - 1) // 2 for c in sorted(counts, reverse=True)[:10])
    # top-10 mass never exceeds the total, and equals it for ≤10 buckets
    assert 0 <= top10 <= mass
    if len(counts) <= 10:
        assert top10 == mass
    # tie-safety: the share is invariant to WHICH tied boundary bucket
    # is chosen, because mass is a function of the count alone
    if mass > 0:
        import itertools

        best = sorted(counts, reverse=True)[:10]
        for perm in itertools.islice(
            itertools.permutations(sorted(counts, reverse=True)[:12]), 3
        ):
            chosen = sorted(perm, reverse=True)[:10]
            if sorted(chosen) == sorted(best):
                assert sum(c * (c - 1) // 2 for c in chosen) == top10


@settings(max_examples=300, deadline=None)
@given(
    o=st.integers(min_value=0, max_value=10**6),
    extra=st.integers(min_value=1, max_value=10**6),
)
def test_jaccard_decile_integer_floor_matches_float(o, extra):
    """lsh_s_curve's integer decile least(10, (10·o) div u) equals
    floor(10·o/u) computed in exact rational arithmetic for every
    intersection/union — the rounded-double path it replaces fails at
    binary boundaries like J = 0.3."""
    from fractions import Fraction

    u = o + extra  # union > intersection unless o = u (handled below)
    got = min(10, (10 * o) // u)
    want = min(10, int(Fraction(10 * o, u)))
    assert got == want
    assert min(10, (10 * u) // u) == 10  # exact dup lands in bucket 10


@settings(max_examples=200, deadline=None)
@given(
    digits=st.lists(
        st.tuples(st.integers(1, 9), st.integers(0, 10**7)),
        min_size=1,
        max_size=30,
    ),
    split=st.integers(min_value=0, max_value=2**31),
)
def test_benford_digit_counts_are_additive(digits, split):
    """The streaming Benford contract's algebra: per-digit counts from
    any two-way split of the corpus sum to the whole — the property
    that makes the epoch fold bit-match the batch scan."""
    whole: dict[int, int] = {}
    a: dict[int, int] = {}
    b: dict[int, int] = {}
    for i, (d, n) in enumerate(digits):
        whole[d] = whole.get(d, 0) + n
        part_a = min(n, (split >> (i % 16)) % (n + 1))
        a[d] = a.get(d, 0) + part_a
        b[d] = b.get(d, 0) + (n - part_a)
    for d in whole:
        assert a.get(d, 0) + b.get(d, 0) == whole[d]


@settings(max_examples=300, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=10**5), min_size=1,
                    max_size=200),
    parts=st.integers(min_value=1, max_value=64),
)
def test_partition_plan_assignment_invariants(counts, parts):
    """events_partition_plan's integer assignment p = ⌊start·P/N⌋ as
    pure math: partitions are contiguous and monotone in key order,
    ids stay in [0, P), keys never split, and every partition's row
    count is < ideal + its largest member key (the key-atomicity
    bound — balance can only be violated by a single key bigger than
    the ideal, which is exactly the salting signal the query
    surfaces)."""
    n = sum(counts)
    ideal = n / parts
    start = 0
    assignments = []
    for c in counts:  # keys in order
        p = (start * parts) // n
        assignments.append((p, c))
        start += c
    ps = [p for p, _ in assignments]
    assert all(0 <= p < parts for p in ps)
    assert ps == sorted(ps)  # contiguous in key order
    from collections import defaultdict

    rows = defaultdict(int)
    mx = defaultdict(int)
    for p, c in assignments:
        rows[p] += c
        mx[p] = max(mx[p], c)
    for p, r in rows.items():
        assert r < ideal + mx[p] + 1
