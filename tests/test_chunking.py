"""Chunking invariants — ported from the reference's test contract
(tests/test-telegram-agent.py:165-179): every chunk within the limit,
[i/N] labels when split, no content loss."""

from __future__ import annotations

import re

from open_pulsar_spark.functions.chunking import CHUNK_LIMIT, chunk_text


def strip_label(chunk: str) -> str:
    return re.sub(r"^\[\d+/\d+\] ", "", chunk)


def test_short_text_single_unlabeled_chunk():
    assert chunk_text("hello world") == ["hello world"]


def test_exact_limit_not_split():
    text = "x" * CHUNK_LIMIT
    assert chunk_text(text) == [text]


def test_long_text_all_chunks_within_limit():
    text = "word " * 3000  # 15k chars, no paragraph breaks
    chunks = chunk_text(text)
    assert len(chunks) > 1
    assert all(len(c) <= CHUNK_LIMIT for c in chunks)


def test_labels_are_sequential_over_n():
    text = "a" * 10000
    chunks = chunk_text(text)
    n = len(chunks)
    for i, c in enumerate(chunks):
        assert c.startswith(f"[{i + 1}/{n}] ")


def test_no_content_loss_hard_cuts():
    text = "a" * 10000
    rejoined = "".join(strip_label(c) for c in chunk_text(text))
    assert rejoined == text


def test_paragraph_boundaries_preferred():
    paras = [f"paragraph {i} " + "y" * 1500 for i in range(6)]
    text = "\n\n".join(paras)
    chunks = chunk_text(text)
    assert all(len(c) <= CHUNK_LIMIT for c in chunks)
    # chunks start at paragraph starts (no mid-paragraph cut needed here)
    for c in chunks:
        assert strip_label(c).startswith("paragraph")


def test_sentence_boundaries_when_paragraph_too_big():
    sentences = " ".join(f"Sentence number {i} is here." for i in range(400))
    chunks = chunk_text(sentences)
    assert all(len(c) <= CHUNK_LIMIT for c in chunks)
    # every cut lands after a period (sentence boundary), so chunks
    # minus the final one end with '.'
    assert all(strip_label(c).rstrip().endswith(".") for c in chunks[:-1])


def test_custom_limit():
    chunks = chunk_text("z" * 1000, limit=100)
    assert all(len(c) <= 100 for c in chunks)
    assert "".join(strip_label(c) for c in chunks) == "z" * 1000


def test_over_100_chunks_labels_still_fit():
    # ADVICE r1: "[100/123] " is 10 chars, over the initial 8-char
    # reservation — the budget must widen with the chunk count.
    limit = 100
    text = "q" * 20_000
    chunks = chunk_text(text, limit=limit)
    assert len(chunks) >= 100
    assert all(len(c) <= limit for c in chunks)
    n = len(chunks)
    for i, c in enumerate(chunks):
        assert c.startswith(f"[{i + 1}/{n}] ")
    assert "".join(strip_label(c) for c in chunks) == text


def test_unsatisfiable_limit_raises():
    import pytest

    with pytest.raises(ValueError):
        chunk_text("w" * 5000, limit=9)


def test_separator_only_text_is_not_silently_dropped():
    """Over-limit text made only of paragraph separators must still
    chunk (hard cuts), never return zero chunks — zero chunks means the
    sink silently drops the message."""
    from open_pulsar_spark.functions.chunking import chunk_text

    text = "\n\n" * 3000
    chunks = chunk_text(text, limit=4096)
    assert chunks
    body = "".join(c.split("] ", 1)[1] if c.startswith("[") else c for c in chunks)
    assert body == text
    assert all(len(c) <= 4096 for c in chunks)
