"""Byte-pair-encoding merge training — the shared pure-Python core.

Same role as ``operators/similarity.kmeans_lite``: a deterministic
trainer both the Spark entry AND the DuckDB oracle builder run on their
own independently-derived inputs (Spark's distributed vocabulary count
vs DuckDB's SQL count of the same corpus), so any divergence in the
heavy distributed stage — pre-tokenization regex, counting, frequency
truncation — makes the merge tables diverge and the value hash fail.

Semantics (the standard reference algorithm):
- initial symbols are characters;
- each round counts adjacent symbol pairs over the vocabulary, weighted
  by word frequency, counting EVERY adjacent position (``"aaa"`` with
  weight c contributes 2c to ``("a","a")``);
- the winning pair maximizes (count, then lexicographically smallest
  (left, right)) — a deterministic total order;
- the merge is applied left-to-right, non-overlapping (``"aaaa"`` ->
  ``["aa", "aa"]``).
"""

from __future__ import annotations

from collections.abc import Sequence


def bpe_encode(word: str, merges: Sequence[tuple[int, str, str, str, int]]) -> list[str]:
    """Encode ``word`` by applying ``merges`` (as returned by
    :func:`bpe_train_merges`) in rank order, each left-to-right and
    non-overlapping — the standard property that sequential application of
    the learned rules to a fresh word reproduces the training-time state.
    The reference implementation the oracle builder runs; the Spark entry
    implements the same fold as a codegen'd SQL ``aggregate`` chain."""
    syms = list(word)
    for _rank, left, right, merged, _cnt in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_train_merges(
    vocab: Sequence[tuple[str, int]], k: int
) -> list[tuple[int, str, str, str, int]]:
    """Train the first ``k`` BPE merges on ``vocab`` = [(word, count)].

    Returns [(rank, left, right, merged, pair_count)] with rank 1-based;
    stops early if no pair remains."""
    words: list[tuple[list[str], int]] = [(list(w), c) for w, c in vocab]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, k + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        new_words: list[tuple[list[str], int]] = []
        for syms, c in words:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((out, c))
        words = new_words
    return merges
