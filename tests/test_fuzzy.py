"""editdist_join (operators/fuzzy.py): the recall GUARANTEE is the whole
point of the segment-partition scheme, so it is tested on random strings
with random multi-edit corruptions — not just the catalog fixture's single
deterministic edits — plus precision against a brute-force oracle."""

import random

from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.operators.fuzzy import editdist_join

ALPHABET = "abcdefg #"


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _random_edits(rng, s: str, n: int) -> str:
    for _ in range(n):
        kind = rng.choice(["del", "sub", "ins"])
        if kind == "del" and len(s) > 4:
            i = rng.randrange(len(s))
            s = s[:i] + s[i + 1 :]
        elif kind == "sub" and len(s) > 0:
            i = rng.randrange(len(s))
            s = s[:i] + rng.choice(ALPHABET) + s[i + 1 :]
        else:
            i = rng.randrange(len(s) + 1)
            s = s[:i] + rng.choice(ALPHABET) + s[i:]
    return s


import pytest


@pytest.mark.parametrize("tau", [1, 2, 3])
def test_editdist_join_recall_and_precision_on_random_edits(spark, tau):
    # the recall guarantee must hold for ANY tau the operator accepts,
    # with up to tau random edits of every kind
    rng = random.Random(20260814 + tau)
    n_strings = 150 if tau == 3 else 300
    cleans = []
    for cid in range(n_strings):
        # include the short-string regime (len <= tau) so the exact
        # length-window band is exercised alongside the segment grid
        n = rng.randrange(0, 8) if cid % 5 == 0 else rng.randrange(tau + 4, 40)
        cleans.append((cid, "".join(rng.choice(ALPHABET) for _ in range(n))))
    dirties = [
        (did, _random_edits(rng, cleans[did % n_strings][1], rng.randrange(0, tau + 1)))
        for did in range(n_strings)
    ]
    clean_df = spark.createDataFrame(cleans, "clean_id long, ename string")
    dirty_df = spark.createDataFrame(dirties, "dirty_id long, dname string")
    got = {
        (r["dirty_id"], r["clean_id"]): r["lev_dist"]
        for r in editdist_join(dirty_df, clean_df, tau=tau).collect()
    }
    # brute-force oracle over all pairs
    expected = {}
    for did, d in dirties:
        for cid, c in cleans:
            lv = _lev(d, c)
            if lv <= tau:
                expected[(did, cid)] = lv
    assert got == expected  # exact: guaranteed recall AND exact precision


def test_editdist_join_empty_and_exact_matches(spark):
    clean_df = spark.createDataFrame(
        [(1, "hello world"), (2, "entirely different")], "clean_id long, ename string"
    )
    dirty_df = spark.createDataFrame(
        [(10, "hello world"), (11, "zzzzzzzzzz")], "dirty_id long, dname string"
    )
    got = {
        (r["dirty_id"], r["clean_id"]): r["lev_dist"]
        for r in editdist_join(dirty_df, clean_df, tau=2).collect()
    }
    assert got == {(10, 1): 0}


def test_editdist_join_short_strings_exact_at_tau2(spark):
    """VERDICT r7 item 8: strings shorter than tau+1 used to be a silent
    recall hole (tau edits can touch every non-empty segment). They must
    now be EXACT — recall 1 against brute force at tau=2 including
    length-0/1/2 strings on both sides."""
    tau = 2
    cleans = [
        (0, ""), (1, "a"), (2, "ab"), (3, "xy"), (4, "abc"),
        (5, "abcdef"), (6, "##"), (7, "a#"),
    ]
    dirties = [
        (10, ""), (11, "b"), (12, "ba"), (13, "abcd"), (14, "xyzz"),
        (15, "abcdef"), (16, "q"), (17, "####"), (18, "zzzzzz"),
    ]
    clean_df = spark.createDataFrame(cleans, "clean_id long, ename string")
    dirty_df = spark.createDataFrame(dirties, "dirty_id long, dname string")
    got = {
        (r["dirty_id"], r["clean_id"]): r["lev_dist"]
        for r in editdist_join(dirty_df, clean_df, tau=tau).collect()
    }
    expected = {
        (did, cid): _lev(d, c)
        for did, d in dirties
        for cid, c in cleans
        if _lev(d, c) <= tau
    }
    assert got == expected
    # the short regime must actually be present in the expectation
    assert any(len(c) <= tau for cid, c in cleans for (d_, c_) in [(0, cid)] if (d_, c_) in expected or True)
    assert {(10, 0), (10, 1), (10, 2)} <= set(expected)


def test_editdist_join_unicode_exact(spark):
    """Segmentation uses substr (code-point indexed) and verify uses
    levenshtein (code-point distance) — the two must agree on non-ASCII
    text or candidates misalign. Exact vs brute force on accented/CJK/
    emoji strings with multi-byte characters at segment boundaries."""
    cleans = [
        (0, "café au lait"),
        (1, "naïve approach"),
        (2, "日本語のテキスト処理"),
        (3, "smörgåsbord"),
        (4, "emoji 😀 test"),
        (5, "ω"),
    ]
    dirties = [
        (10, "cafe au lait"),      # é -> e (1 sub)
        (11, "naïve approach"),    # exact
        (12, "日本語のテキスト処理x"),  # 1 insert
        (13, "smørgåsbord"),       # ö -> ø (1 sub)
        (14, "emoji 😀 tost"),      # 1 sub
        (15, "Ω"),                 # case = 1 sub
        (16, "unrelated string"),
    ]
    clean_df = spark.createDataFrame(cleans, "clean_id long, ename string")
    dirty_df = spark.createDataFrame(dirties, "dirty_id long, dname string")
    got = {
        (r["dirty_id"], r["clean_id"]): r["lev_dist"]
        for r in editdist_join(dirty_df, clean_df, tau=2).collect()
    }
    expected = {
        (did, cid): _lev(d, c)
        for did, d in dirties
        for cid, c in cleans
        if _lev(d, c) <= 2
    }
    assert got == expected
    assert {(10, 0), (12, 2), (14, 4), (15, 5)} <= set(expected)
