"""Vocabulary-local BPE merge training — the in-task trainer behind
``text_bpe_train_vocab`` (workload/text.py).

The industrial BPE-trainer factorization (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"; the shape of every
production tokenizer trainer): the CORPUS is touched exactly once to build
a word-frequency table (distributed, map-side-combined, bounded by type
count), and every merge iteration runs on that vocabulary table — types x
average word length, millions of rows at web scale, never petabytes. The
r10 distributed merge loop (text_bpe_train_merges) proved the data side
but paid ~3 driver-coordinated Spark jobs PER MERGE — fine at k=8, a
driver bottleneck at a tokenizer's real k (30k-100k). This module is the
scale-safe merge phase: the vocabulary lands in ONE task (applyInPandas
over a constant group) and merges run in-process with INCREMENTAL
pair-count maintenance, so a merge costs O(affected words), not a Spark
job round trip.

Deliberately an INDEPENDENT implementation from the pure-Python golden
replay (workload/text.bpe_replay, the oracle): the replay recounts every
pair from scratch each round (O(corpus-vocab) per merge, obviously
correct); this trainer maintains pair counts and a pair->words inverted
index incrementally. Parity between the two is a real check, not a
tautology (tests/test_corpus.py).
"""

from __future__ import annotations


def bpe_train_incremental(
    word_counts: "dict[str, int]", k: int
) -> "list[tuple[int, str, str, int]]":
    """Learn the first ``k`` BPE merges from a word-frequency table.

    Returns [(rank, left, right, pair_count)] with the standard total
    order: highest weighted adjacent-pair count first, ties broken by
    (left ASC, right ASC). Stops early when no adjacent pairs remain
    (fully merged vocabulary). Matches bpe_replay exactly.

    Cost: build is O(sum of word lengths). Each merge is one scan of the
    live pair table (pairs are bounded by total symbol adjacencies, and
    shrink as merges consume them) plus O(occurrences) index updates for
    the words that actually contain the merged pair — no per-merge pass
    over the full vocabulary and, in the Spark composition, no per-merge
    job. A lazy-deletion heap selection was MEASURED AND REJECTED
    (BENCH_SF1.bpe_vocab_probe.heap_selection_rejected): its pushes ride
    the hot pair-update path (O(log H) per count change) while this
    min() is a tight single pass over the live table — at a 200k-type
    vocabulary the heap ran 1.2-3x SLOWER at k=256/1024 with identical
    output. Update volume dominates both shapes; the scan stands.
    """
    syms: list[list[str]] = []
    cnts: list[int] = []
    for w, c in word_counts.items():
        syms.append(list(w))
        cnts.append(c)

    return _train(syms, cnts, k)


def bpe_encode(word: str, merges: "list[tuple[str, str]]") -> "list[str]":
    """Tokenize one word with TRAINED merge rules, applied in rank order
    (the standard BPE encoder): each rule merges its leftmost
    non-overlapping occurrences, exactly as during training. For words
    seen in training this provably reproduces the trainer's final
    segmentation — the invariant the apply-side oracle checks."""
    s = list(word)
    for left, right in merges:
        if len(s) < 2:
            break
        ns: list[str] = []
        i = 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                ns.append(left + right)
                i += 2
            else:
                ns.append(s[i])
                i += 1
        s = ns
    return s


def _train(
    syms: "list[list[str]]", cnts: "list[int]", k: int
) -> "list[tuple[int, str, str, int]]":

    pair_n: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _index(wi: int, sign: int) -> None:
        s, c = syms[wi], cnts[wi] * sign
        for a, b in zip(s, s[1:]):
            p = (a, b)
            n = pair_n.get(p, 0) + c
            if n:
                pair_n[p] = n
            else:
                del pair_n[p]
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)
            else:
                # Keep the inverted index TIGHT: wi is being un-indexed
                # ahead of a re-segmentation, so drop it for every pair
                # it contributed — not only pairs whose global count hit
                # zero. A stale id makes a later merge of p re-index a
                # word that no longer contains it (a correct no-op, but
                # wasted work and memory proportional to staleness at
                # the k=30k+ vocabularies this trainer targets).
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]

    for wi in range(len(syms)):
        _index(wi, +1)

    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, k + 1):
        if not pair_n:
            break
        (left, right), n = min(
            pair_n.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, left, right, n))
        merged = left + right
        # Only words containing the pair change; re-index just those.
        # List() copy: _index mutates pair_words sets during iteration.
        for wi in list(pair_words.get((left, right), ())):
            _index(wi, -1)
            s = syms[wi]
            ns: list[str] = []
            i = 0
            while i < len(s):
                # leftmost-first, non-overlapping: the freshly appended
                # merged token never equals `left` (right is non-empty),
                # so a chain like "aaaa" folds to [aa, aa].
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[wi] = ns
            _index(wi, +1)
    return out
