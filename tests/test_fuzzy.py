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
        elif kind == "sub":
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
        n = rng.randrange(tau + 4, 40)
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
