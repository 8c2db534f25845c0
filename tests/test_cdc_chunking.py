"""Content-defined chunking dedup (storage-style chunk dedup).

The property that distinguishes content-defined boundaries from
fixed-size blocks: a local edit (insert/delete a token) only perturbs
the chunks in a bounded neighbourhood of the edit — every chunk that
does not straddle the edit's 2-token gear window survives byte-identical.
"""
from hashlib import md5

import pytest

from binlog_spark.operators.dedup import CDC_GEAR_MODULUS


def _chunks_py(tokens, modulus=CDC_GEAR_MODULUS):
    """Reference re-statement of the kernel's boundary rule."""
    chunks, cur, prev = [], [], 0
    for tok in tokens:
        h = int(md5(tok.encode()).hexdigest()[:7], 16)
        cur.append(tok)
        if (h + 31 * prev) % modulus == 0:
            chunks.append(tuple(cur))
            cur = []
        prev = h
    if cur:
        chunks.append(tuple(cur))
    return chunks


WORDS = [f"w{i % 97}x{i % 13}" for i in range(400)]


def test_insert_perturbs_only_local_chunks():
    base = _chunks_py(WORDS)
    edited = _chunks_py(WORDS[:200] + ["INSERTED"] + WORDS[200:])
    shared = set(base) & set(edited)
    # the overwhelming majority of chunk CONTENT survives the edit
    assert len(shared) >= len(base) - 3, (len(base), len(shared))


def test_fixed_size_blocks_do_not_survive_the_same_edit():
    """Contrast baseline: fixed 8-token blocks lose every block after
    the insertion point (the motivation for content-defined chunking)."""
    fixed = lambda t: {tuple(t[i:i + 8]) for i in range(0, len(t), 8)}
    base = fixed(WORDS)
    edited = fixed(WORDS[:200] + ["INSERTED"] + WORDS[200:])
    # blocks before the edit survive; essentially nothing after does
    assert len(base & edited) <= len(base) // 2 + 2


def test_chunks_partition_the_token_stream():
    chunks = _chunks_py(WORDS)
    flat = [tok for c in chunks for tok in c]
    assert flat == WORDS
    assert all(len(c) >= 1 for c in chunks)


def test_boundaries_are_stream_defined_not_chunk_defined():
    """The gear depends on (h_{i-1}, h_i) of the raw stream only: the
    chunking of a suffix that starts at a boundary of the full stream
    equals the corresponding suffix of the full chunking (given one
    token of left context, which fixes prev)."""
    chunks = _chunks_py(WORDS)
    # find a boundary in the middle
    pos = 0
    for c in chunks[:-1]:
        pos += len(c)
        if pos > 150:
            break
    # re-chunk from one token BEFORE the boundary to seed prev, drop the
    # seed token's (possibly degenerate) first chunk
    suffix = _chunks_py(WORDS[pos - 1:])
    tail_tokens = [tok for c in suffix for tok in c][1:]
    re_flat = WORDS[pos:]
    assert tail_tokens == re_flat
