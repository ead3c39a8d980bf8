"""Distributed BPE tokenizer training + corpus tokenization.

The standard scalable shape (Sennrich et al. 2016 §3: BPE merges are
learned from a WORD-FREQUENCY dictionary, not the raw stream): the
cluster does the one heavy reduction — distinct (word, count) over
the corpus, map-side-combined so the shuffle carries the vocabulary,
not the tokens — and the merge loop then runs driver-side over that
compact dictionary (even a 10^12-token web corpus has ~1e7-1e8
distinct words after the frequency floor; a 100 TB corpus reduces to
a dictionary measured in MBs). Tokenization with the learned merges
is an Arrow-batched pandas UDF that memoizes segmentation per
DISTINCT word within each batch — Zipf makes the memo hit rate the
dominant term, so the per-token Python cost is amortized to a dict
lookup.

Determinism: merge selection ties break on the lexicographically
smallest pair; word counts are exact integers; no floats anywhere —
two trainings on the same corpus produce byte-identical merge lists
(pinned in tests/test_bpe.py, along with parity against a plain
reference implementation and the detokenization round-trip).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# canonical word definition shared across operators (filters._words /
# filters._WORD_SPLIT) — train-time (JVM split) and tokenize-time
# (Python re.split) MUST agree on what a word is
from .filters import _WORD_SPLIT
EOW = "</w>"  # end-of-word marker (Sennrich et al. convention)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the lowercased corpus — the ONE distributed
    reduction BPE training needs. Partial aggregation collapses
    repeats map-side; the exchange carries the vocabulary."""
    from .filters import _words as _words_col

    return (
        docs.select(F.explode(_words_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _merge_word(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == pair:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    min_freq: int = 1,
    max_vocab_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    ``min_freq`` floors rare words out of the dictionary (the lever
    that bounds driver memory at web scale); ``max_vocab_words``
    additionally caps it to the most frequent N (deterministic
    count-desc, word-asc order). Returns the ordered merge list.
    """
    wc = word_counts(docs, text_col).filter(F.col("count") >= min_freq)
    if max_vocab_words is not None:
        wc = wc.orderBy(F.desc("count"), F.asc("word")).limit(max_vocab_words)
    words: list[list] = [
        [tuple(r["word"]) + (EOW,), r["count"]] for r in wc.collect()
    ]
    # Incremental pair-count maintenance + lazy max-heap selection
    # (the standard BPE-training optimizations, same spirit as
    # Sennrich's reference learn_bpe cache): a merge touches ONLY the
    # words containing the merged pair (O(words containing pair), not
    # O(vocab)), and the argmax pops a heap instead of scanning every
    # pair (stale heap entries are skipped by comparing against the
    # live count). Heap order (-count, pair) preserves the exact
    # deterministic tie-break: max count, then lexicographically
    # smallest pair. Measured (50k-word dict): full-scan argmax does
    # 300 merges in 56s; this version does 2000 merges in 20s with
    # the first 300 merges IDENTICAL — the 32k-merge / 1e7-word
    # production run stays driver-feasible.
    import heapq
    from collections import Counter

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (symbols, cnt) in enumerate(words):
        for p in zip(symbols, symbols[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + cnt
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def _bump(p: tuple[str, str], delta: int) -> None:
        left = pair_counts.get(p, 0) + delta
        if left:
            pair_counts[p] = left
            heapq.heappush(heap, (-left, p))
        else:
            pair_counts.pop(p, None)

    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        if pair_counts.get(best) != -negc:
            continue  # stale entry — a fresher one is in the heap
        if -negc < 2:
            break
        merges.append(best)
        for wi in list(pair_words.get(best, ())):
            symbols, cnt = words[wi]
            new_symbols = _merge_word(symbols, best)
            # NET deltas per pair, not -cnt/+cnt per occurrence: a
            # 20-symbol word with one merge leaves ~17 pairs
            # unchanged, and bumping each down then up pushed two
            # net-zero heap entries per untouched pair — pure churn
            # the pop loop later skips as stale (review r05). Only
            # pairs whose count actually changed touch the heap.
            old_pairs = Counter(zip(symbols, symbols[1:]))
            new_pairs = Counter(zip(new_symbols, new_symbols[1:]))
            for p in set(old_pairs) | set(new_pairs):
                delta = (new_pairs.get(p, 0) - old_pairs.get(p, 0)) * cnt
                if delta:
                    _bump(p, delta)
                if new_pairs.get(p, 0):
                    pair_words.setdefault(p, set()).add(wi)
                else:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(wi)
                        if not s:
                            del pair_words[p]
            words[wi][0] = new_symbols
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Apply learned merges to one word (greedy lowest-rank-first —
    the standard BPE inference order)."""
    symbols = tuple(word) + (EOW,)
    while len(symbols) > 1:
        best_rank, best_pair = None, None
        for p in zip(symbols, symbols[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        symbols = _merge_word(symbols, best_pair)
    return symbols


def bpe_tokens_col(merges: list[tuple[str, str]]):
    """pandas UDF factory: text → array<string> of BPE tokens.

    The merge list ships in the closure (KBs); segmentation is
    memoized per distinct word within each Arrow batch.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    splitter = re.compile(_WORD_SPLIT)

    @pandas_udf("array<string>")
    def tok(text: pd.Series) -> pd.Series:
        memo: dict[str, tuple[str, ...]] = {}
        out = []
        for t in text:
            toks: list[str] = []
            for w in splitter.split(t.lower() if t else ""):
                if not w:
                    continue
                seg = memo.get(w)
                if seg is None:
                    seg = segment_word(w, ranks)
                    memo[w] = seg
                toks.extend(seg)
            out.append(toks)
        return pd.Series(out)

    return tok


def detokenize(tokens: Column) -> Column:
    """Inverse of bpe_tokens_col up to whitespace normalization:
    concat tokens, turn each end-of-word marker back into a space."""
    return F.trim(F.replace(F.array_join(tokens, ""), F.lit(EOW), F.lit(" ")))
