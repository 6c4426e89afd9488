"""Distributed classifier training (naive Bayes) and corpus-weighting
entries: non-degeneracy and semantic invariants the value oracle alone
can't express (the oracle proves Spark == DuckDB; these prove the model
actually learned something)."""

from pyspark.sql import functions as F

from .conftest import SF_DIR


def test_nb_classifier_learns_above_majority(spark):
    """Training accuracy must clearly beat the majority-class rate — if the
    hashed features or the weight math degrade, accuracy collapses to the
    prior and this catches it even while Spark and DuckDB still agree."""
    from kafka_cdc_hudi_spark.plans.catalog_text import text_nb_classifier

    df = text_nb_classifier(spark, SF_DIR).cache()
    try:
        n = df.count()
        acc = df.agg(F.avg("correct")).collect()[0][0]
        majority = (
            df.groupBy("ypm").count().agg(F.max("count")).collect()[0][0] / n
        )
        assert acc >= majority + 0.15, f"acc {acc} vs majority {majority}"
        # both classes present (the label stays balanced enough to train on)
        assert df.select("ypm").distinct().count() == 2
        # prediction rule is internally consistent with the score
        bad = df.filter(
            ((F.col("score") > 0) & (F.col("pred") != 1))
            | ((F.col("score") <= 0) & (F.col("pred") != -1))
        ).count()
        assert bad == 0
    finally:
        df.unpersist()


def test_dsir_selection_enriches_target_domain(spark):
    """The importance-resampling selection must over-represent the target
    domain well beyond its base rate — the whole point of DSIR. Also pins
    the budget contract: exactly _DSIR_BUDGET selected unless boundary
    ties admit more."""
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _DSIR_BUDGET,
        dataset_dsir_weights,
    )

    df = dataset_dsir_weights(spark, SF_DIR).cache()
    try:
        n = df.count()
        n_sel = df.filter("selected = 1").count()
        assert n_sel >= _DSIR_BUDGET
        t_sel = df.filter("selected = 1").agg(F.sum("is_target")).collect()[0][0]
        t_all = df.agg(F.sum("is_target")).collect()[0][0]
        base_rate = t_all / n
        sel_rate = t_sel / n_sel
        assert sel_rate >= 2.5 * base_rate, f"{sel_rate} vs base {base_rate}"
    finally:
        df.unpersist()


def test_quality_funnel_is_monotone_and_nonvacuous(spark):
    """Cumulative gates can only shrink the survivor set, and the funnel
    must actually discriminate (the final stage keeps a strict, nonzero
    subset on the fixture)."""
    from kafka_cdc_hudi_spark.plans.catalog_text import pipeline_quality_funnel

    rows = sorted(
        pipeline_quality_funnel(spark, SF_DIR).collect(), key=lambda r: r.stage
    )
    assert [r.stage for r in rows] == [0, 1, 2, 3, 4]
    counts = [r.n_docs for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert 0 < counts[-1] < counts[0]


def test_cross_source_stats_nonvacuous(spark):
    """The source matrix must contain BOTH within-source and cross-source
    near-dup cells (otherwise the contamination readout reads nothing),
    and its pair mass must equal the LSH pair count exactly."""
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        dedup_cross_source_stats,
        dedup_minhash_lsh,
    )

    rows = dedup_cross_source_stats(spark, SF_DIR).collect()
    assert any(r.src_a == r.src_b for r in rows), "no within-source cell"
    assert any(r.src_a != r.src_b for r in rows), "no cross-source cell"
    assert all(0.5 <= r.mean_est <= 1.0 for r in rows)
    assert sum(r.n_pairs for r in rows) == dedup_minhash_lsh(spark, SF_DIR).count()


def test_epoch_order_is_permutation_and_decorrelated(spark):
    """Each epoch is a complete permutation (positions 1..n exactly once),
    and no two epochs share an order (nor does any epoch equal doc_id
    order) — a broken shuffle key would collapse them."""
    from kafka_cdc_hudi_spark.plans.catalog_text import _N_EPOCHS, dataset_epoch_order
    from kafka_cdc_hudi_spark.sources.tables import load_table

    rows = dataset_epoch_order(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "documents").count()
    orders = {}
    for r in rows:
        orders.setdefault(r.epoch, {})[r.position] = r.doc_id
    assert set(orders) == set(range(_N_EPOCHS))
    seqs = []
    for e in range(_N_EPOCHS):
        assert set(orders[e]) == set(range(1, n + 1)), f"epoch {e} not a permutation"
        seqs.append(tuple(orders[e][p] for p in range(1, n + 1)))
    assert len(set(seqs)) == _N_EPOCHS, "two epochs share an order"
    assert all(s != tuple(sorted(s)) for s in seqs), "an epoch is doc_id-ordered"


def test_containment_is_directed_and_asymmetric(spark):
    """Containment must find genuinely asymmetric cases (smaller doc
    mostly inside a bigger one, where only ONE direction clears tau) and
    stay consistent: containment >= the pair's Jaccard, both in [tau, 1]."""
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _CONTAINMENT_TAU,
        text_containment_pairs,
    )

    rows = text_containment_pairs(spark, SF_DIR).collect()
    assert rows, "containment entry vacuous"
    pairs = {(r.doc_sub, r.doc_sup): r for r in rows}
    assert all(_CONTAINMENT_TAU <= r.containment <= 1.0 for r in rows)
    one_way = [k for k in pairs if (k[1], k[0]) not in pairs]
    assert one_way, "every containment is mutual — no asymmetric case found"
    assert any(pairs[k].n_sub < pairs[k].n_sup for k in one_way), (
        "no strict snippet-in-document case"
    )


def test_cdc_corpus_refresh_precombine_and_gates(spark):
    """The refresh composition's merge half must discard the injected
    stale out-of-order updates (no 'STALE ' text survives; every stale-hit
    doc still carries a live row), and every funnel cell must be
    non-vacuous with per-source conservation n_live == n_short + n_dup +
    n_kept."""
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _REFRESH_STALE_MOD,
        _REFRESH_STALE_RES,
        _cdc_refreshed_snapshot,
        pipeline_cdc_corpus_refresh,
    )

    snap = _cdc_refreshed_snapshot(spark, SF_DIR)
    assert snap.filter(F.col("text").startswith("STALE ")).count() == 0
    stale_targets = snap.filter(
        (F.col("doc_id") % _REFRESH_STALE_MOD == _REFRESH_STALE_RES)
    ).count()
    assert stale_targets > 0, "no stale-update target survived — probe vacuous"

    rows = pipeline_cdc_corpus_refresh(spark, SF_DIR).collect()
    assert sum(r.n_short for r in rows) > 0
    assert sum(r.n_dup for r in rows) > 0
    assert sum(r.n_kept for r in rows) > 0
    for r in rows:
        assert r.n_live == r.n_short + r.n_dup + r.n_kept, r


def test_simhash_band_scaled_banding_is_lossless(spark):
    """The scaled entry's 8x16-bit banding must lose NOTHING within its
    pigeonhole guarantee: pairs from the banded plan == brute-force
    all-pairs 128-bit hamming <= 7, computed in DuckDB from the oracle's
    own signature chain (independent engine, no banding). Also pins the
    3-word packing: a packing bug would move bits between words and break
    the brute hamming equality."""
    import duckdb

    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _SIMHASH_SC_BITS,
        _SIMHASH_SC_HAMMING_MAX,
        _SIMHASH_SC_WORD,
        _DK_TOKS,
        _simhash_bit,
        dedup_simhash_band_scaled,
    )

    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup_simhash_band_scaled(spark, SF_DIR).collect()
    }
    sums = ", ".join(
        f"sum(CASE WHEN {_simhash_bit(j, 'duck')} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(_SIMHASH_SC_BITS)
    )
    words = []
    for w in range(3):
        bits = " + ".join(
            f"(CASE WHEN s{j} > 0 THEN CAST({2 ** (j % _SIMHASH_SC_WORD)} AS BIGINT) ELSE 0 END)"
            for j in range(w * _SIMHASH_SC_WORD, min((w + 1) * _SIMHASH_SC_WORD, _SIMHASH_SC_BITS))
        )
        words.append(f"{bits} AS w{w}")
    ham = " + ".join(f"bit_count(xor(x.w{w}, y.w{w}))" for w in range(3))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    brute = con.execute(f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, md5(unnest(toks)) AS h FROM tok),
votes AS (SELECT doc_id, {sums} FROM t GROUP BY doc_id),
sig AS (SELECT doc_id, {", ".join(words)} FROM votes)
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST({ham} AS INT) AS hamming
FROM sig x JOIN sig y ON x.doc_id < y.doc_id
WHERE {ham} <= {_SIMHASH_SC_HAMMING_MAX}
""").fetchall()
    want = {tuple(r) for r in brute}
    assert got == want
    assert len(want) > 0  # non-vacuous at the test SF
    assert any(h > 0 for (_, _, h) in want)  # not only exact-identical docs


def test_simhash_packed_lane_votes_match_reference(spark):
    """The r12 packed-lane vote algebra (`_simhash_sc_signature`: conv()
    nibble parse -> 16-long lookup -> 32 bigint lane sums -> 2*count >
    n_tokens majority) must equal a bit-by-bit Python reference of the
    original +-1 vote definition on adversarial docs: single-token docs,
    repeated tokens, EVEN token counts (exact vote ties, where the strict
    majority boundary lives), and unicode-bearing text that the tokenizer
    reduces."""
    import hashlib
    import random

    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _SIMHASH_SC_BITS,
        _SIMHASH_SC_WORD,
        _simhash_sc_signature,
    )

    rng = random.Random(20260816)
    vocab = [f"tok{i}" for i in range(40)] + ["alpha", "beta", "gamma", "x9y"]
    docs = []
    for did in range(64):
        if did == 0:
            toks = ["solo"]
        elif did == 1:
            toks = ["dup"] * 7
        elif did == 2:
            toks = ["a", "b"] * 3  # even count, guaranteed tied bits exist
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randrange(1, 30))]
        docs.append((did, " ".join(toks)))

    def ref_sig(text):
        # the tokenizer: lowercase, split on non-[a-z0-9]+, drop empties
        import re

        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        votes = [0] * _SIMHASH_SC_BITS
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(_SIMHASH_SC_BITS):
                nib = int(h[j // 4], 16)
                votes[j] += 1 if (nib >> (j % 4)) & 1 else -1
        words = [0, 0, 0]
        for j in range(_SIMHASH_SC_BITS):
            if votes[j] > 0:
                words[j // _SIMHASH_SC_WORD] |= 1 << (j % _SIMHASH_SC_WORD)
        return tuple(words)

    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    got = {
        r["doc_id"]: (r["w0"], r["w1"], r["w2"])
        for r in _simhash_sc_signature(df).collect()
    }
    want = {did: ref_sig(text) for did, text in docs}
    assert got == want


def test_simhash_packed_lane_overflow_guard_raises(spark):
    """A doc past _SC_LANE_SAFE_MAX tokens could overflow the packed lane
    sums (ANSI: hard ARITHMETIC_OVERFLOW mid-agg; non-ANSI: silent wrap) —
    the bound is set so no overflow is REACHABLE below it, and the word
    projection raise_error()s at the first doc above it."""
    import pytest as _pytest

    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _SC_LANE_SAFE_MAX,
        _simhash_sc_signature,
    )

    # the provable no-overflow bound: worst case (every token votes 1 in
    # every lane) stays under 2^63 exactly up to the guard threshold
    weights = sum(1 << (16 * k) for k in range(4))
    assert _SC_LANE_SAFE_MAX * weights < 2**63 - 1
    assert (_SC_LANE_SAFE_MAX + 1) * weights > 2**63 - 1

    big = " ".join(f"t{i % 50}" for i in range(_SC_LANE_SAFE_MAX + 1))
    df = spark.createDataFrame([(1, big)], "doc_id BIGINT, text STRING")
    with _pytest.raises(Exception, match="packed-lane overflow"):
        _simhash_sc_signature(df).collect()
    # at the bound itself: no raise, a valid signature comes back
    ok = " ".join(f"t{i % 50}" for i in range(_SC_LANE_SAFE_MAX))
    row = _simhash_sc_signature(
        spark.createDataFrame([(2, ok)], "doc_id BIGINT, text STRING")
    ).collect()[0]
    assert row["w0"] is not None


def test_simhash_narrow_packed_votes_match_reference(spark):
    """The r14 generic-width packed-vote forms (32-bit dedup_simhash,
    60-bit dedup_simhash_wide_pairs signature) must equal a bit-by-bit
    Python reference of the original +-1 conditional-sum definition on
    the same adversarial doc set the 128-bit pin uses: single-token,
    repeated-token, EVEN-count (exact vote ties — the strict-majority
    boundary), and random mixes. Pins that 2*lane > cnt == sign(+-1 sum)
    and that the conv() group parse (8 nibbles / 12+3 nibbles) extracts
    the same nibbles _simhash_bit addresses."""
    import hashlib
    import random

    from pyspark.sql import functions as F  # noqa: F811

    from kafka_cdc_hudi_spark.functions.textfns import tokens
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _SC_LANE_GUARD,
        _simhash_majority_word,
        _simhash_packed_votes,
    )

    rng = random.Random(20260817)
    vocab = [f"tok{i}" for i in range(40)] + ["alpha", "beta", "gamma", "x9y"]
    docs = []
    for did in range(64):
        if did == 0:
            toks = ["solo"]
        elif did == 1:
            toks = ["dup"] * 7
        elif did == 2:
            toks = ["a", "b"] * 3  # even count, guaranteed tied bits exist
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randrange(1, 30))]
        docs.append((did, " ".join(toks)))

    def ref_sig(text, n_bits):
        import re

        tks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        votes = [0] * n_bits
        for t in tks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(n_bits):
                nib = int(h[j // 4], 16)
                votes[j] += 1 if (nib >> (j % 4)) & 1 else -1
        return sum(1 << j for j in range(n_bits) if votes[j] > 0)

    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    tok = df.select("doc_id", F.explode(tokens("text")).alias("t")).withColumn(
        "h", F.md5(F.col("t"))
    )
    for n_bits in (32, 60):
        votes = _simhash_packed_votes(tok, "doc_id", n_bits)
        sim = _SC_LANE_GUARD.format(w=_simhash_majority_word(0, n_bits))
        got = {
            r["doc_id"]: r["simhash"]
            for r in votes.select("doc_id", F.expr(sim).alias("simhash")).collect()
        }
        want = {did: ref_sig(text, n_bits) for did, text in docs}
        assert got == want, f"width {n_bits}"
