"""BPE merge trainer (functions/bpe.py): reference-algorithm semantics."""

from kafka_cdc_hudi_spark.functions.bpe import bpe_train_merges


def test_overlapping_pairs_count_every_position_but_merge_nonoverlapping():
    # "aaaa" weight 1: ("a","a") counts 3 (every adjacent position);
    # the merge applies left-to-right non-overlapping -> ["aa", "aa"]
    merges = bpe_train_merges([("aaaa", 1)], 2)
    assert merges[0] == (1, "a", "a", "aa", 3)
    assert merges[1] == (2, "aa", "aa", "aaaa", 1)


def test_tie_break_is_lexicographic():
    merges = bpe_train_merges([("ba", 1), ("ab", 1)], 1)
    assert merges[0] == (1, "a", "b", "ab", 1)


def test_weights_scale_counts_and_pick_winner():
    merges = bpe_train_merges([("ab", 5), ("cd", 3)], 1)
    assert merges[0] == (1, "a", "b", "ab", 5)


def test_stops_when_no_pairs_remain():
    merges = bpe_train_merges([("ab", 1)], 5)
    assert [m[0] for m in merges] == [1, 2][: len(merges)] or len(merges) == 1
    assert merges[-1][3] == "ab"
    assert len(merges) == 1  # single-symbol words have no pairs left


def test_merged_symbol_participates_in_later_rounds():
    # "abc"x2: r1 merges ("a","b"); r2 must see ("ab","c")
    merges = bpe_train_merges([("abc", 2)], 2)
    assert merges[0][:4] == (1, "a", "b", "ab")
    assert merges[1] == (2, "ab", "c", "abc", 2)
