"""Vocab-merge BPE (ops/bpe.py): trainer determinism, encode semantics
vs an independent reference implementation, and the chunker seam."""

from __future__ import annotations

import heapq

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from docling_spark.ops.bpe import (
    FROZEN_MERGES,
    FROZEN_RANKS,
    PRETOKEN_PATTERN,
    _pretokenize,
    bpe_encode,
    merges_sql_values,
    token_count,
    train_bpe,
)
from docling_spark.ops.chunker import BPE_LITE_PATTERN


def ref_encode(pretoken: str, ranks: dict) -> list[str]:
    """Independent reference: priority-queue BPE application (the HF
    `tokenizers` strategy) — structurally different from bpe_encode's
    rescan loop, same defined semantics: repeatedly merge the leftmost
    occurrence of the lowest-rank adjacent pair."""
    toks = list(pretoken)
    heap = [
        (ranks[(toks[i], toks[i + 1])], i)
        for i in range(len(toks) - 1)
        if (toks[i], toks[i + 1]) in ranks
    ]
    heapq.heapify(heap)
    alive = list(range(len(toks)))  # indices into toks still live
    while heap:
        rank, i = heapq.heappop(heap)
        # stale entry? (position merged away or pair changed)
        if i not in alive:
            continue
        pos = alive.index(i)
        if pos == len(alive) - 1:
            continue
        j = alive[pos + 1]
        if ranks.get((toks[i], toks[j])) != rank:
            continue
        toks[i] = toks[i] + toks[j]
        alive.pop(pos + 1)
        # re-push neighbors of the merged token
        if pos > 0:
            p = alive[pos - 1]
            r = ranks.get((toks[p], toks[i]))
            if r is not None:
                heapq.heappush(heap, (r, p))
        if pos < len(alive) - 1:
            n = alive[pos + 1]
            r = ranks.get((toks[i], toks[n]))
            if r is not None:
                heapq.heappush(heap, (r, i))
    return [toks[i] for i in alive]


def test_pretoken_pattern_in_sync_with_chunker():
    assert PRETOKEN_PATTERN == BPE_LITE_PATTERN


def test_trainer_deterministic_and_nonempty():
    assert len(FROZEN_MERGES) > 50
    again = train_bpe(
        "the quick brown fox jumps over the lazy dog while the query "
        "engine scans the table and sorts the rows by key value pairs "
    )
    assert train_bpe("abab abab abab")[:1] == [("a", "b")]
    assert isinstance(again, list)


def test_encode_matches_independent_reference():
    corpus = [
        "the table scans fast, it's #42!",
        "customer orders supercalifragilistic",
        " value value value",
        "don't skew the keys! 100 rows, 2048 pages",
        "",
        "a",
        "zzzzz éé",  # chars outside the trained vocab
    ]
    for text in corpus:
        for tok in _pretokenize(text):
            assert bpe_encode(tok) == ref_encode(tok, FROZEN_RANKS), tok


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
def test_encode_properties(text):
    for tok in _pretokenize(text):
        enc = bpe_encode(tok)
        assert "".join(enc) == tok  # lossless
        assert 1 <= len(enc) <= len(tok)
        assert bpe_encode(tok) == ref_encode(tok, FROZEN_RANKS)


def test_token_count_sums_pretokens():
    t = "the table, it's #7"
    assert token_count(t) == sum(
        len(bpe_encode(p)) for p in _pretokenize(t)
    )


def test_merges_sql_values_escapes_quotes():
    s = merges_sql_values([("a", "'")])
    assert "''" in s and s.startswith("('a'")
