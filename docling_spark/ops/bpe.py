"""Real vocab-merge BPE for token-budget packing (chunker tokenizer seam).

Reference parity: the reference's HybridChunker budgets chunks with real
HF tokenizers (/root/reference/docling/chunking/__init__.py:7-13 re-exports
docling-core's tokenizer-aware chunker). This module supplies the same
capability without network or model downloads: a deterministic BPE trained
in-repo on an embedded seed corpus, applied with the standard
merge-lowest-rank-pair loop (the HF `tokenizers` BPE semantics: repeatedly
merge the LEFTMOST occurrence of the LOWEST-RANK adjacent pair, one
occurrence per step, re-evaluating after each merge).

Determinism contract: `FROZEN_MERGES` is derived from `_SEED_CORPUS` by
`train_bpe` at import (pure function of the embedded text), so every
driver, executor and the DuckDB value oracle see the identical merges
table. The same semantics are re-implemented in SQL as a recursive CTE in
`__spark_entry__.oracle_sql()["chunk_pack_bpe_full"]` — an INDEPENDENT
evaluator that value-checks the Pandas-UDF path end-to-end.

Scale notes: counting is a vectorized Arrow-batched Pandas UDF with a
per-worker LRU over distinct pre-tokens (natural-language corpora follow
Zipf — the cache hit rate is extreme); the merges table is a few KB
shipped once per worker in the UDF closure (swap for an explicit
``sc.broadcast`` if a production vocab grows to MBs).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterable, Optional

# GPT-2-style pretokenizer shared with the bpe_lite counter (chunker.py);
# duplicated regex string NOT imported to avoid a circular import — the
# single source of truth is chunker.BPE_LITE_PATTERN (asserted equal in
# tests/test_bpe.py).
PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)
# Python's `re` lacks \p{..}: equivalent classes for the Python-side
# pretokenizer (ASCII + general unicode via str.isalpha-ish classes is
# overkill here — \w covers the corpus; keep letter/digit classes broad)
_PY_PRETOKEN = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+",
    re.UNICODE,
)

# Embedded seed corpus (public-domain-style filler prose written for this
# repo): the ONLY input to the frozen merges table. Mixes the letter
# statistics of english text with digits and punctuation so the learned
# merges cover the decorated chunk texts the packing queries produce.
_SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog while the query engine "
    "scans the table and sorts the rows by key value pairs in the hash "
    "join the window agg and the sort merge join stream rows in batches "
    "the fast scan reads the column store and the slow path spills to "
    "disk the customer orders the parts and the supplier ships the line "
    "items on time the spark job shuffles the data across the cluster "
    "and the small table broadcasts to every node the big table stays "
    "put, it's a plan: 100 rows, 2048 pages, 37 files and 42 partitions; "
    "don't skew the keys! the group by runs first, then the order by "
    "sorts it all. value value value key key table table row row scan "
    "agg part hash merge batch line sort window spark order data column "
    "join small customer query big the a fast slow stream group"
)

N_MERGES = 256


def _pretokenize(text: str) -> list[str]:
    return _PY_PRETOKEN.findall(text)


def train_bpe(corpus: str, n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    """Classic BPE training (Sennrich et al. 2016, public algorithm): count
    adjacent symbol pairs over the pre-token frequency dict, repeatedly
    merge the most frequent pair (ties broken lexicographically for
    determinism). Returns the ordered merges list."""
    freqs: dict[tuple[str, ...], int] = {}
    for tok in _pretokenize(corpus):
        key = tuple(tok)
        freqs[key] = freqs.get(key, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, n in freqs.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        # most frequent; ties -> lexicographically smallest pair
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, n in freqs.items():
            out = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_freqs[key] = new_freqs.get(key, 0) + n
        freqs = new_freqs
    return merges


# the frozen table: pure function of the embedded seed — identical on every
# driver/executor/oracle evaluation, no files, no network
FROZEN_MERGES: list[tuple[str, str]] = train_bpe(_SEED_CORPUS)
FROZEN_RANKS: dict[tuple[str, str], int] = {
    p: r for r, p in enumerate(FROZEN_MERGES)
}


def bpe_encode(
    pretoken: str, ranks: Optional[dict] = None
) -> list[str]:
    """Tokenize ONE pre-token: repeatedly merge the leftmost occurrence of
    the lowest-rank adjacent pair (HF `tokenizers` BPE application
    semantics), until no adjacent pair is in the ranks table. Characters
    outside the vocab simply stay single-char tokens (counting needs no
    <unk>)."""
    if ranks is None:
        ranks = FROZEN_RANKS
    toks = list(pretoken)
    while len(toks) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


@lru_cache(maxsize=65536)
def _count_pretoken(pretoken: str) -> int:
    return len(bpe_encode(pretoken))


def token_count(text: str) -> int:
    """Full-BPE token count of a text: pretokenize, encode each pre-token,
    sum. Cached per distinct pre-token (Zipf makes this ~O(new words))."""
    return sum(_count_pretoken(t) for t in _pretokenize(text))


def merges_sql_values(merges: Iterable[tuple[str, str]] = None) -> str:
    """The frozen merges table as a SQL VALUES literal ``(a, b, rank)`` —
    DATA for the independent recursive-CTE oracle evaluator, mirroring how
    the LSH oracle inlines its deterministic hyperplane signs."""
    if merges is None:
        merges = FROZEN_MERGES
    esc = lambda s: s.replace("'", "''")  # noqa: E731
    return ", ".join(
        f"('{esc(a)}', '{esc(b)}', {r})" for r, (a, b) in enumerate(merges)
    )
