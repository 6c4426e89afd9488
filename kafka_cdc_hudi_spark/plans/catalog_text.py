"""Oracle-checked text-analysis + deduplication + similarity queries — the
training-data-pipeline surface (BASELINE.json north-star extension).

Spark side: native higher-order functions only (split/filter/transform/
aggregate/explode) — no Python UDFs, everything codegen'd.
DuckDB side: SQL generated from the SAME constants (functions/textfns.py)
and the same md5-based hash primitives, so results are bit-identical.

Scale notes per operator are on the individual functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.functions.timefns import floordiv_long
from kafka_cdc_hudi_spark.functions.textfns import (
    HEX_DIGITS,
    MINHASH_BAND,
    MINHASH_K,
    SHINGLE_K,
    STOPWORDS,
    TOKEN_SPLIT_RE,
    fingerprint,
    shingles,
    stopword_count,
    tokens,
)
from kafka_cdc_hudi_spark.functions.vectors import cosine, dot, l2_norm
from kafka_cdc_hudi_spark.sources.tables import load_table

#: session-scoped cache of materialized index artifacts (minhash signatures,
#: shingle postings), keyed by (kind, sf_dir). Persisting inline per call
#: leaked a new cache entry on every invocation (bench runs each query
#: twice); one entry per artifact per dataset is the correct lifecycle —
#: a real pipeline stores these indexes, it doesn't rebuild them per query.
_INDEX_CACHE: dict = {}


def _cached_index(kind: str, sf_dir: str, build):
    df0 = build()
    # key includes the Spark application id: a cached frame from a stopped
    # session must not be handed to a new session in the same process
    key = (df0.sparkSession.sparkContext.applicationId, kind, sf_dir)
    if key not in _INDEX_CACHE:
        df = df0.persist()
        df.count()  # materialize eagerly so all downstream references share it
        _INDEX_CACHE[key] = df
    return _INDEX_CACHE[key]


# DuckDB fragments mirroring textfns -----------------------------------------

def _dk_toks_of(col: str) -> str:
    return f"list_filter(string_split_regex(lower({col}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"


_DK_TOKS = _dk_toks_of("text")

_DK_SHINGLES = (
    f"CASE WHEN len(toks) >= {SHINGLE_K} THEN "
    f"list_transform(range(1, len(toks) - {SHINGLE_K - 2}), "
    f"i -> array_to_string(list_slice(toks, i, i + {SHINGLE_K - 1}), ' ')) "
    f"ELSE [array_to_string(toks, ' ')] END"
)


def _dk_stop_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(toks, t -> t IN ({words})))"


# -- text analysis ------------------------------------------------------------


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace+punct split): the unit of quota/cost
    accounting in a training pipeline."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


TEXT_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len({_DK_TOKS}) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars_measured
FROM documents
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: token count, stopword ratio, alpha ratio,
    mean token length -> weighted score in [0,1]. Pure column math, scales
    as a single pass."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks).cast("long")
    n_stop = stopword_count(toks, "en").cast("long")
    tok_chars = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda a, x: a + x)
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        n_stop.cast("double") / n_tok
    )
    alpha_ratio = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("double") / F.length("text")
    )
    avg_tok_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        tok_chars.cast("double") / n_tok
    )
    quality = (
        F.lit(0.3) * F.least(n_tok.cast("double") / F.lit(200.0), F.lit(1.0))
        + F.lit(0.3) * stop_ratio
        + F.lit(0.2) * F.least(avg_tok_len / F.lit(8.0), F.lit(1.0))
        + F.lit(0.2) * alpha_ratio
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        avg_tok_len.alias("avg_token_len"),
        quality.alias("quality"),
    )


TEXT_QUALITY_SQL = f"""
WITH tok AS (SELECT doc_id, text, {_DK_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST({_dk_stop_count('en')} AS BIGINT) AS n_stop,
         list_sum(list_transform(toks, t -> length(t))) AS tok_chars,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM tok
)
SELECT doc_id, n_tokens,
       CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tokens END AS stop_ratio,
       CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_chars END AS alpha_ratio,
       CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(tok_chars AS DOUBLE) / n_tokens END AS avg_token_len,
       0.3 * least(CAST(n_tokens AS DOUBLE) / 200.0, 1.0)
       + 0.3 * (CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tokens END)
       + 0.2 * least(CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(tok_chars AS DOUBLE) / n_tokens END / 8.0, 1.0)
       + 0.2 * (CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_chars END) AS quality
FROM m
"""


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword-hit language ID with deterministic priority
    tie-break (en > de > es > fr)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scores = {lang: stopword_count(toks, lang).cast("long") for lang in STOPWORDS}
    s = {k: F.col(f"s_{k}") for k in scores}
    pred = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en")
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return (
        d.select("doc_id", *[scores[k].alias(f"s_{k}") for k in STOPWORDS])
        .withColumn("pred_lang", pred)
    )


_langs = list(STOPWORDS)
TEXT_LANGUAGE_ID_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
sc AS (
  SELECT doc_id,
         {", ".join(f"CAST({_dk_stop_count(k)} AS BIGINT) AS s_{k}" for k in _langs)}
  FROM tok
)
SELECT doc_id, {", ".join(f"s_{k}" for k in _langs)},
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM sc
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-md5 over word {SHINGLE_K}-shingles."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint("text").alias("fingerprint"))


TEXT_FINGERPRINT_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents)
SELECT doc_id, list_min(list_transform({_DK_SHINGLES}, s -> md5(s))) AS fingerprint
FROM tok
"""


# -- deduplication ------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text; canonical = min doc_id.
    At 100 TB this is THE cheap first pass: map-side partial agg on
    md5(text), shuffle ~unique keys only."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.col("text"))).alias("text_hash"))
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_docs"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(lower(text)) AS text_hash, min(doc_id) AS canonical_id, count(*) AS n_docs
FROM documents
GROUP BY 1
"""


def _shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-shingle inverted postings (doc_id, md5(shingle)) — feeds
    the exact Jaccard and containment entries' self-joins and size tables
    (4 references between them): materialize once via the session cache
    instead of re-running tokenize+shingle+md5+explode per reference."""
    d = load_table(spark, sf_dir, "documents")
    return _cached_index(
        "shingle_postings",
        sf_dir,
        lambda: d.select(
            "doc_id",
            F.explode(F.array_distinct(F.transform(shingles(tokens("text")), F.md5))).alias("s"),
        ),
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted shingle index —
    explode distinct shingle hashes, self-join on shingle, count
    intersections. The exact (quadratic-in-collisions) baseline that
    MinHash approximates."""
    sh = _shingle_postings(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")))
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform({_DK_SHINGLES}, s -> md5(s)))) AS s
  FROM tok
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (x.n + y.n - i) AS jaccard
FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.2
"""


#: directed-containment keep threshold: |sub ∩ sup| / |sub| >= 0.9 —
#: calibrated so the fixture exhibits one-way survivors (snippet-in-doc
#: cases where only the smaller side clears tau), keeping the directed
#: semantics non-vacuous at sf0.001 and sf0.01
_CONTAINMENT_TAU = 0.9


def text_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-subset detection: directed shingle containment
    |A∩B|/|A| >= _CONTAINMENT_TAU (0.9) — catches a snippet living inside a
    larger document (quotes, syndicated excerpts, boilerplate inclusion),
    which symmetric Jaccard structurally misses (a 100-shingle doc fully
    contained in a 10,000-shingle doc has Jaccard ~0.01). Candidates come
    from the same inverted-postings self-join as the exact-Jaccard
    baseline (undirected, computed once), then BOTH directions are scored
    from the one intersection count — no second join. Same scale
    contract as dedup_ngram_jaccard: exact, quadratic in per-shingle
    collisions, the documented verification path next to the MinHash
    approximations."""
    sh = _shingle_postings(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    both = inter.join(
        sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a"
    ).join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
    d1 = both.select(
        F.col("doc_a").alias("doc_sub"),
        F.col("doc_b").alias("doc_sup"),
        F.col("na").alias("n_sub"),
        F.col("nb").alias("n_sup"),
        (F.col("i").cast("double") / F.col("na")).alias("containment"),
    )
    d2 = both.select(
        F.col("doc_b").alias("doc_sub"),
        F.col("doc_a").alias("doc_sup"),
        F.col("nb").alias("n_sub"),
        F.col("na").alias("n_sup"),
        (F.col("i").cast("double") / F.col("nb")).alias("containment"),
    )
    return d1.unionByName(d2).filter(F.col("containment") >= _CONTAINMENT_TAU)


TEXT_CONTAINMENT_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform({_DK_SHINGLES}, s -> md5(s)))) AS s
  FROM tok
),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairsz AS (
  SELECT doc_a, doc_b, i, x.n AS na, y.n AS nb
  FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
),
directed AS (
  SELECT doc_a AS doc_sub, doc_b AS doc_sup, na AS n_sub, nb AS n_sup,
         CAST(i AS DOUBLE) / na AS containment
  FROM pairsz
  UNION ALL
  SELECT doc_b, doc_a, nb, na, CAST(i AS DOUBLE) / nb FROM pairsz
)
SELECT * FROM directed WHERE containment >= {_CONTAINMENT_TAU}
"""


# universal-hash family for minhash: h_i(x) = (A_i * x + B_i) mod P over a
# single md5-derived 60-bit integer per shingle — ONE md5 per shingle
# instead of MINHASH_K (the md5 was the hot loop: every doc explodes to
# ~n_tokens shingles and each previously paid K digests). A_i/B_i come from
# a fixed LCG so the Spark and DuckDB sides inline identical constants.
MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def _hash_family(k: int) -> list[tuple[int, int]]:
    state, out = 0x5DEECE66D, []
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**63
        a = state % (MINHASH_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**63
        b = state % MINHASH_P
        out.append((a, b))
    return out


MINHASH_FAMILY = _hash_family(MINHASH_K)


def minhash_signatures_for(docs: DataFrame) -> DataFrame:
    """K minhashes over an arbitrary ``(doc_id, text)`` frame — the
    signature builder the incremental/streaming ingest path calls per
    batch (the sf_dir entry below wraps it over the documents table).
    One md5 per shingle -> 60-bit int, then the universal-hash family
    min-aggregated per doc.

    Two shapes were measured: explode + K codegen'd min aggregates (this
    one) vs a shuffle-free ``array_min(transform(...))`` per h_i. The array
    version loses ~2x despite avoiding the shuffle: higher-order array
    functions are interpreted per element, while the exploded min
    aggregation is whole-stage-codegen'd with map-side partial agg (the
    shuffle carries only K ints per doc)."""
    sh = docs.select("doc_id", F.explode(shingles(tokens("text"))).alias("s"))
    # one digest per shingle; 15 hex chars = 60 bits, exact in a bigint
    x = (
        F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("bigint") % MINHASH_P
    ).alias("x")
    sx = sh.select("doc_id", x)
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % MINHASH_P).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_FAMILY)
    ]
    return sx.groupBy("doc_id").agg(*aggs)


def _minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # The fixture parquet is a single row group, so the scan yields ONE
    # input partition and the whole tokenize->shingle->md5 build would run
    # on one core (measured 6s of the 7s build at sf0.1). Fan the docs out
    # across the cluster first: the raw text is tiny relative to the
    # per-shingle hashing work below, so this round-robin shuffle buys full
    # parallelism for the expensive projection. On a real multi-file corpus
    # this is a near-no-op (already ~defaultParallelism input splits).
    d = d.repartition(spark.sparkContext.defaultParallelism)
    return minhash_signatures_for(d)


#: salt factor for the band self-join: a hot band (one template shared by
#: a visible fraction of the corpus) otherwise pins its full m^2 candidate
#: work on ONE task; 4 spreads it across 4 tasks for a 4x replication of
#: the tiny band frame (measured skew spread in tests/test_dedup_skew.py)
LSH_BAND_SALT = 4


def _lsh_bands(sig: DataFrame) -> DataFrame:
    """Banding projection over the signature index: one posexplode fans
    out to n_bands rows per doc in a single pass — a per-band union would
    recompute the shingle->minhash aggregation once per band per side."""
    n_bands = MINHASH_K // MINHASH_BAND
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"h{b * MINHASH_BAND + j}") for j in range(MINHASH_BAND)])
        )
        for b in range(n_bands)
    ]
    return sig.select("doc_id", F.posexplode(F.array(*band_cols)).alias("bi", "bv"))


def _est_jaccard_filter(sig: DataFrame, cand: DataFrame) -> DataFrame:
    """Signature-estimated Jaccard over candidate (doc_a, doc_b) pairs,
    kept at >= 0.5 — the verify stage shared by the full and incremental
    LSH entries."""
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(MINHASH_K)])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(MINHASH_K)])
    est = None
    for i in range(MINHASH_K):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        est = term if est is None else est + term
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", est.cast("double") / MINHASH_K)
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidates with signature-estimated
    Jaccard. The scale path: signature size is constant per doc, banding
    turns all-pairs into an equi-join on band keys — exactly the shape that
    survives 100 TB — and the band self-join is SALTED
    (operators/dedup.py:pairs_within_groups_salted) so a hot band spreads
    across ``LSH_BAND_SALT`` tasks instead of pinning one."""
    # signatures are the INDEX artifact (K ints per doc — tiny relative to
    # the corpus) and are referenced four times below (band join both sides
    # + exact-estimate join-back); materialize once via the session cache
    sig = _cached_index("minhash_sig", sf_dir, lambda: _minhash_signatures(spark, sf_dir))
    from kafka_cdc_hudi_spark.operators.dedup import pairs_within_groups_salted

    cand = pairs_within_groups_salted(
        _lsh_bands(sig), ["bi", "bv"], "doc_id", n_salt=LSH_BAND_SALT
    ).distinct()
    return _est_jaccard_filter(sig, cand)


def _minhash_ctes() -> tuple[str, str]:
    """(CTE chain, final SELECT) of the MinHash-LSH oracle — split so the
    cluster-assignment oracle can extend the same chain with a recursive
    connected-components CTE."""
    mins = ", ".join(
        f"min(({a} * x + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(MINHASH_FAMILY)
    )
    n_bands = MINHASH_K // MINHASH_BAND
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {bi} AS bi, md5({concat}) AS bv FROM sig".format(
            bi=bi,
            concat=" || '|' || ".join(
                f"CAST(h{bi * MINHASH_BAND + j} AS VARCHAR)" for j in range(MINHASH_BAND)
            ),
        )
        for bi in range(n_bands)
    )
    est = " + ".join(f"(CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END)" for i in range(MINHASH_K))
    ctes = f"""tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, unnest({_DK_SHINGLES}) AS s FROM tok),
shx AS (SELECT doc_id,
               CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) % {MINHASH_P} AS x
        FROM sh),
sig AS (SELECT doc_id, {mins} FROM shx GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)"""
    final = f"""
SELECT doc_a, doc_b, CAST({est} AS DOUBLE) / {MINHASH_K} AS est_jaccard
FROM cand JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id
WHERE CAST({est} AS DOUBLE) / {MINHASH_K} >= 0.5
"""
    return ctes, final


DEDUP_MINHASH_LSH_SQL = "WITH {0}{1}".format(*_minhash_ctes())


#: "newly ingested" slice for the incremental-dedup entry: doc_id % 10 == 0
#: (10% of the corpus — a realistic ingest batch relative to the base)
_INCR_DELTA_MOD = 10


def dedup_incremental_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup detection — the shape a 100-TB streaming
    corpus actually runs: when a delta batch of new documents arrives
    (here the doc_id % 10 == 0 slice standing in for a CDC ingest batch),
    candidates are generated by probing the delta's bands against the
    FULL band index (base + delta) — base x base pairs are structurally
    never formed, so per-batch cost is O(delta x collisions) instead of
    O(corpus^2) re-dedup. Same signature index, banding, and >= 0.5
    estimated-Jaccard verify as :func:`dedup_minhash_lsh`; output is
    exactly the subset of the full LSH pairs touching at least one new
    doc (pinned by the oracle, which filters the full chain). At scale
    the delta side broadcasts and the base index is the persisted
    artifact the streaming driver maintains."""
    sig = _cached_index("minhash_sig", sf_dir, lambda: _minhash_signatures(spark, sf_dir))
    bands = _lsh_bands(sig)
    delta = bands.filter(F.col("doc_id") % _INCR_DELTA_MOD == 0)
    j = delta.alias("a").join(
        bands.alias("b"),
        (F.col("a.bi") == F.col("b.bi"))
        & (F.col("a.bv") == F.col("b.bv"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    )
    cand = j.select(
        F.least("a.doc_id", "b.doc_id").alias("doc_a"),
        F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
    ).distinct()
    return _est_jaccard_filter(sig, cand)


def _incremental_lsh_sql() -> str:
    ctes, final = _minhash_ctes()
    # same chain, but candidates must touch the delta slice: replace the
    # self-join cand CTE with a delta-probe form (identical semantics to
    # the Spark plan's delta x all join + least/greatest normalization)
    old_cand = """cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)"""
    assert old_cand in ctes, "minhash oracle cand CTE moved; update _incremental_lsh_sql"
    ctes = ctes.replace(
        """cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)""",
        f"""cand AS (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
                  greatest(a.doc_id, b.doc_id) AS doc_b
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id <> b.doc_id
  WHERE a.doc_id % {_INCR_DELTA_MOD} = 0
)""",
    )
    return "WITH " + ctes + final


DEDUP_INCREMENTAL_CANDIDATES_SQL = _incremental_lsh_sql()


#: deterministic CDC script constants for the pair-IVM entry: docs with
#: doc_id % 11 == 4 are UPDATED to their successor's text (creating
#: exact-copy pairs and retracting their old ones); docs with
#: doc_id % 13 == 6 are DELETED (retract-only)
_IVM_UPD_MOD, _IVM_UPD_RES = 11, 4
_IVM_DEL_MOD, _IVM_DEL_RES = 13, 6

#: session-scoped state stores for the pair-IVM entry, keyed by
#: (application id, sf_dir) — the CDC script runs once; later calls fold
#: the persisted delta stream (the same lifecycle/lock rationale as
#: catalog_cdc._MOR_SCRATCH)
_PAIR_IVM_STATE: dict = {}
_PAIR_IVM_LOCK = __import__("threading").Lock()


def dedup_cdc_pair_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the near-dup PAIR SET under CDC
    (streaming/dedup_ivm.py): a deterministic 3-batch script — bulk insert
    two thirds of the corpus, then insert the rest plus updates
    (doc_id % 11 == 4 takes its successor's text), then deletes
    (doc_id % 13 == 6) — is fed through ``DedupPairMaintainer``, which
    per batch retracts the pairs of every changed doc's OLD signature and
    probes the NEW signatures against the maintained index, emitting a
    ±1 delta stream. The returned fold (cumulative delta = 1) must equal
    a full LSH recompute over the final live corpus — which is exactly
    what the oracle computes, so the driver value-checks the whole IVM
    algebra (insert/update/delete, retraction, exactly-once fold), not
    just a single-shot query. Per-batch cost is O(changed docs): batch
    signatures + two bounded band equi-joins + a latest-per-key index
    fold — the shape that holds when the corpus is 100 TB and the daily
    churn is 0.1% of it."""
    import tempfile

    from kafka_cdc_hudi_spark.streaming.dedup_ivm import DedupPairMaintainer

    key = (spark.sparkContext.applicationId, sf_dir)
    with _PAIR_IVM_LOCK:
        root = _PAIR_IVM_STATE.get(key)
        if root is None:
            root = tempfile.mkdtemp(prefix="pair_ivm_")
            m = DedupPairMaintainer(spark, f"{root}/sig_ops", f"{root}/pair_deltas")
            docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
            did = F.col("doc_id")

            def inserts(df):
                return df.select(
                    F.lit("i").alias("op"), "doc_id", "text", did.alias("seq")
                )

            nxt = docs.select((did - 1).alias("doc_id"), F.col("text").alias("next_text"))
            upd = (
                docs.filter(did % _IVM_UPD_MOD == _IVM_UPD_RES)
                .join(nxt, "doc_id", "left")
                .select(
                    F.lit("u").alias("op"),
                    "doc_id",
                    F.coalesce("next_text", "text").alias("text"),
                    (did + F.lit(10_000_000)).alias("seq"),
                )
            )
            b0 = inserts(docs.filter(did % 3 != 2))
            # %3==2 docs that are also update targets appear twice in this
            # batch — the higher update seq wins (precombine), as in the oracle
            b1 = inserts(docs.filter(did % 3 == 2)).unionByName(upd)
            b2 = docs.filter(did % _IVM_DEL_MOD == _IVM_DEL_RES).select(
                F.lit("d").alias("op"),
                "doc_id",
                F.lit(None).cast("string").alias("text"),
                (did + F.lit(20_000_000)).alias("seq"),
            )
            for bid, bdf in enumerate([b0, b1, b2]):
                m.process(bdf, bid)
            _PAIR_IVM_STATE[key] = root
    m = DedupPairMaintainer(spark, f"{root}/sig_ops", f"{root}/pair_deltas")
    return m.live_pairs_with_est()


def _pair_ivm_sql() -> str:
    """The oracle is a FULL RECOMPUTE: the MinHash-LSH chain over the
    corpus as it stands after the CDC script — updates applied, deletes
    gone. The maintainer must converge to this from deltas alone."""
    ctes, final = _minhash_ctes()
    assert ctes.count("FROM documents)") == 1, "minhash tok CTE moved; update _pair_ivm_sql"
    corpus = f"""corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {_IVM_UPD_MOD} = {_IVM_UPD_RES} AND n.text IS NOT NULL
              THEN n.text ELSE d.text END AS text
  FROM documents d LEFT JOIN documents n ON n.doc_id = d.doc_id + 1
  WHERE d.doc_id % {_IVM_DEL_MOD} <> {_IVM_DEL_RES}
),
"""
    return "WITH " + corpus + ctes.replace("FROM documents)", "FROM corpus)") + final


DEDUP_CDC_PAIR_IVM_SQL = _pair_ivm_sql()


def _simhash_shift(expr: str, r: int, dialect: str) -> str:
    if r == 0:
        return expr
    return f"shiftright({expr}, {r})" if dialect == "spark" else f"(({expr}) >> {r})"


def _simhash_bit(j: int, dialect: str) -> str:
    nib = f"(instr('{HEX_DIGITS}', substr(h, {j // 4 + 1}, 1)) - 1)"
    return f"({_simhash_shift(nib, j % 4, dialect)} & 1)"


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit) content signatures: per-token md5-derived bits,
    majority vote per bit position. Near-dup docs land on close/equal
    signatures; hamming-distance banding gives the candidate join at
    scale. One explode + one groupBy — votes via the packed-lane
    aggregation (``_simhash_packed_votes``: 1 conv + 8 lookups per token
    and 9 bigint sum buffers, replacing the 32 conditional +-1 sums whose
    partial+final agg re-ran 64 substr+instr per token — r14 opt; the
    majority test ``2*lane > cnt`` is the +-1 sign test, value-identical,
    pinned vs a bit-by-bit reference in tests/test_text_more.py)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("t")).withColumn(
        "h", F.md5(F.col("t"))
    )
    votes = _simhash_packed_votes(tok, "doc_id", 32)
    sim = _SC_LANE_GUARD.format(w=_simhash_majority_word(0, 32))
    return votes.select("doc_id", F.expr(sim).alias("simhash"))


def _simhash_sql() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN {_simhash_bit(j, 'duck')} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(32)
    )
    total = " + ".join(f"(CASE WHEN s{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)" for j in range(32))
    return f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, md5(unnest(toks)) AS h FROM tok),
votes AS (SELECT doc_id, {sums} FROM t GROUP BY doc_id)
SELECT doc_id, {total} AS simhash FROM votes
"""


DEDUP_SIMHASH_SQL = _simhash_sql()


#: hamming radius for simhash pairing: 4 byte-bands pigeonhole-guarantee
#: recall for distance <= 3 (any 3 flipped bits leave one byte intact)
_SIMHASH_HAMMING_MAX = 3

#: corpus-size guard for the fixed-width (DEMOTED) SimHash pairing entries
#: (VERDICT r11 item 1). The banding law: candidate volume stays linear only
#: while bits_per_band >= log2(N / target_bucket), i.e. N <= E[bucket]_max *
#: 2^bits_per_band. E[bucket]_max = 256 is the largest occupancy measured
#: safe on local[32] (the 8-bit entry at sf1: N/256 ~ 195, green r9); the
#: 10-bit wide entry OOM-killed the JVM at 500k docs (E[bucket] ~ 488,
#: ~7e8 candidate pairs — SCALE notes r11). Past the bound the guard raises
#: BEFORE the quadratic band join can materialize, naming the scale-safe
#: successor.
_SIMHASH_GUARD_MAX_EBUCKET = 256


def _banding_law_guard(n_docs: int, band_bits: int, entry: str) -> None:
    max_n = _SIMHASH_GUARD_MAX_EBUCKET << band_bits
    if n_docs > max_n:
        raise ValueError(
            f"{entry}: corpus of {n_docs} docs exceeds the {band_bits}-bit-band "
            f"safe bound of {max_n} (banding law: bits_per_band >= "
            f"log2(N/target_bucket); E[bucket] would be {n_docs >> band_bits}, "
            f"making the candidate join quadratic). Use "
            f"dedup_simhash_band_scaled (16-bit bands) instead."
        )


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the SimHash family: CANDIDATE PAIRS within hamming
    distance {H} via byte-banding — split the 32-bit signature into 4
    bytes; by pigeonhole any two signatures within {H} flipped bits share
    at least one verbatim byte, so candidates are a pure equi-join on
    (byte index, byte value) — the same bounded-blocking shape as the
    MinHash band join, and routed through the same salted pair operator
    so a hot byte band cannot pin a task. Exact ``bit_count(xor)`` verify
    on candidates only. All-integer end to end -> full value oracle.

    Scale note (measured sf0.1 -> sf1): pair OUTPUT grows ~19.6x at 10x
    docs — oracle-verified truth, two causes measured separately: 3259
    cross-copy CHANCE collisions (the ~2^-32 birthday term of a 32-bit
    signature at radius {H}; the wide variant measures exactly 0) and the
    scale fixture's consonant-rotated copies being denser corpora under a
    token-multiset metric (within-copy growth, no cross-talk). Compute
    stays sub-linear (6.3x at 10x). Production corpora should use
    :func:`dedup_simhash_wide_pairs` — same plan shape, chance term
    suppressed below one expected pair per 10^11 comparisons.

    DEMOTED r12 (covered by :func:`dedup_simhash_band_scaled`): guarded by
    the banding law — raises past the 8-bit-band safe bound rather than go
    quadratic."""
    # eager BY DESIGN: the guard must fail before the quadratic band join
    # is even built; the count is a zero-column parquet scan
    _banding_law_guard(
        load_table(spark, sf_dir, "documents").count(), 8, "dedup_simhash_pairs"
    )
    sim = dedup_simhash(spark, sf_dir)
    byte_cols = [
        F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(255))
        for i in range(4)
    ]
    bands = sim.select("doc_id", F.posexplode(F.array(*byte_cols)).alias("bi", "bv"))
    from kafka_cdc_hudi_spark.operators.dedup import pairs_within_groups_salted

    cand = pairs_within_groups_salted(
        bands, ["bi", "bv"], "doc_id", n_salt=LSH_BAND_SALT
    ).distinct()
    sa = sim.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    sb = sim.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", F.expr("CAST(bit_count(sa ^ sb) AS INT)"))
        .filter(F.col("hamming") <= _SIMHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


dedup_simhash_pairs.__doc__ = dedup_simhash_pairs.__doc__.format(H=_SIMHASH_HAMMING_MAX)


#: wide-signature production variant: 60 bits (md5 nibbles, bigint-safe),
#: 6 bands of 10 bits -> pigeonhole recall guarantee up to hamming 5;
#: chance cross-family collisions at radius 5 are ~C(60,5)/2^60 ~ 5e-12
#: per pair — the quadratic chance term of the 32-bit entry vanishes
_SIMHASH_WIDE_BITS = 60
_SIMHASH_WIDE_BANDS = 6
_SIMHASH_WIDE_HAMMING_MAX = 5


def dedup_simhash_wide_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-width SimHash pairing ({B}-bit signature): same
    vote/band/verify algebra as :func:`dedup_simhash_pairs` but with
    {B} bits and {NB} 10-bit bands (pigeonhole recall guarantee up to
    hamming {H}). The 32-bit entry's measured quadratic cross-family
    chance collisions (~2^-32 per pair) drop to ~2^-60 x C({B},{H}) here,
    so pair output scales with TRUE near-dups. All-integer -> full value
    oracle.

    Scale limit (measured r11): 10-bit bands have only 1024 values, so at
    ~500k docs (sf10 scale data) E[bucket] ~ 488 and the candidate join
    generates ~7e8 pairs before the hamming verify — OOM on local[32].
    Fine to ~50k docs per blocking domain; past that use
    :func:`dedup_simhash_band_scaled` (16-bit bands, same algebra).

    DEMOTED r12 (covered by :func:`dedup_simhash_band_scaled`): guarded by
    the banding law — raises past the 10-bit-band safe bound rather than
    OOM."""
    d = load_table(spark, sf_dir, "documents")
    _banding_law_guard(d.count(), 10, "dedup_simhash_wide_pairs")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("t")).withColumn(
        "h", F.md5(F.col("t"))
    )
    # packed-lane votes (r14 opt, same algebra as dedup_simhash): 15
    # nibble lookups + 16 sum buffers instead of 60 conditional +-1 sums
    votes = _simhash_packed_votes(tok, "doc_id", _SIMHASH_WIDE_BITS)
    sim = _SC_LANE_GUARD.format(w=_simhash_majority_word(0, _SIMHASH_WIDE_BITS))
    sig = votes.select("doc_id", F.expr(sim).alias("simhash"))
    width = _SIMHASH_WIDE_BITS // _SIMHASH_WIDE_BANDS
    mask = (1 << width) - 1
    band_cols = [
        F.shiftright(F.col("simhash"), width * b).bitwiseAND(F.lit(mask))
        for b in range(_SIMHASH_WIDE_BANDS)
    ]
    bands = sig.select("doc_id", F.posexplode(F.array(*band_cols)).alias("bi", "bv"))
    from kafka_cdc_hudi_spark.operators.dedup import pairs_within_groups_salted

    cand = pairs_within_groups_salted(
        bands, ["bi", "bv"], "doc_id", n_salt=LSH_BAND_SALT
    ).distinct()
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", F.expr("CAST(bit_count(sa ^ sb) AS INT)"))
        .filter(F.col("hamming") <= _SIMHASH_WIDE_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


dedup_simhash_wide_pairs.__doc__ = dedup_simhash_wide_pairs.__doc__.format(
    B=_SIMHASH_WIDE_BITS, NB=_SIMHASH_WIDE_BANDS, H=_SIMHASH_WIDE_HAMMING_MAX
)


def _simhash_wide_pairs_sql() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN {_simhash_bit(j, 'duck')} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(_SIMHASH_WIDE_BITS)
    )
    total = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)"
        for j in range(_SIMHASH_WIDE_BITS)
    )
    width = _SIMHASH_WIDE_BITS // _SIMHASH_WIDE_BANDS
    mask = (1 << width) - 1
    return f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, md5(unnest(toks)) AS h FROM tok),
votes AS (SELECT doc_id, {sums} FROM t GROUP BY doc_id),
sig AS (SELECT doc_id, {total} AS simhash FROM votes),
bands AS (
  SELECT doc_id, b.i AS bi, (simhash >> ({width} * b.i)) & {mask} AS bv
  FROM sig, LATERAL unnest(generate_series(0, {_SIMHASH_WIDE_BANDS - 1})) AS b(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM cand JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {_SIMHASH_WIDE_HAMMING_MAX}
"""


DEDUP_SIMHASH_WIDE_PAIRS_SQL = _simhash_wide_pairs_sql()


#: corpus-scalable banding (born r11). Measured this round: the wide
#: entry's 10-bit bands (1024 values) OOM-killed the local[32] JVM at
#: 500k docs — E[bucket] = N/1024 ~ 488 docs, so the band equi-join
#: generates ~6 * 1024 * C(488,2) ~ 7e8 candidate pairs before the
#: hamming verify can drop any (quadratic in N; SCALE notes in PLANS.md).
#: The law: bits_per_band >= log2(N / target_bucket) keeps E[bucket] O(1)
#: and candidate volume ~ N * bucket. 16-bit bands (65536 values) hold
#: E[bucket] <= ~8 to N ~ 5e5 per blocking domain and degrade gracefully
#: an order of magnitude past that; at 100-TB corpus sizes the same
#: algebra runs 24-32-bit bands off a proportionally wider signature.
_SIMHASH_SC_BITS = 128  # full md5 width, packed 48+48+32 bigint-safe
_SIMHASH_SC_WORD = 48
_SIMHASH_SC_BANDS = 8  # 16-bit bands
_SIMHASH_SC_WIDTH = _SIMHASH_SC_BITS // _SIMHASH_SC_BANDS
_SIMHASH_SC_HAMMING_MAX = _SIMHASH_SC_BANDS - 1  # pigeonhole guarantee


def _sc_word_of(j: int) -> int:
    return j // _SIMHASH_SC_WORD


#: packed-lane vote aggregation (r12, VERDICT r11 item 3): each md5 nibble
#: carries 4 bit-votes; each nibble value v in [0,16) maps through a
#: 16-long literal lookup to a bigint packing those 4 votes (as 0/1 bit
#: COUNTS, not +-1 sums) into four 16-bit lanes. The groupBy then runs 32
#: plain bigint sums + one count — a 33-field aggregation buffer instead
#: of the 128 conditional-sum buffer that was the measured sf10 GC-tail
#: source (warm 73-144s spread at 500k docs, SCALE_SIMHASH_SCALED_r11).
#: Majority vote per bit j recovers as 2*lane_count > n_tokens, exactly
#: the sign test the +-1 form computes. The projection raise_error()s
#: past _SC_LANE_SAFE_MAX tokens/doc rather than return corrupt votes
#: (100-TB corpora chunk longer docs upstream — text_chunk_overlap).
_SC_LANE_BITS = 16
_SC_LANE_MASK = (1 << _SC_LANE_BITS) - 1
#: hard token-count bound for the packed aggregation: below it the SUM of
#: packed bigints provably cannot overflow a signed 64-bit long even when
#: every token votes 1 in every lane (max sum = bound * (1 + 2^16 + 2^32 +
#: 2^48) < 2^63), so neither ANSI overflow errors nor silent non-ANSI
#: wraparound are reachable; at/above it the word projection raise_error()s
#: BEFORE any value is trusted. (2^63 - 1) // sum(lane weights) = 32767.
_SC_LANE_SAFE_MAX = (2**63 - 1) // sum(1 << (k * _SC_LANE_BITS) for k in range(4))
_SC_PACK = [
    ((v >> 0) & 1)
    | (((v >> 1) & 1) << _SC_LANE_BITS)
    | (((v >> 2) & 1) << (2 * _SC_LANE_BITS))
    | (((v >> 3) & 1) << (3 * _SC_LANE_BITS))
    for v in range(16)
]


#: word-projection guard shared by every packed-vote consumer (see the
#: _SC_LANE_SAFE_MAX note above)
_SC_LANE_GUARD = (
    f"IF(cnt > {_SC_LANE_SAFE_MAX}, CAST(raise_error('simhash packed-lane "
    f"overflow: doc with > {_SC_LANE_SAFE_MAX} tokens; chunk upstream "
    f"(text_chunk_overlap) or widen lanes') AS BIGINT), {{w}})"
)


def _simhash_packed_votes(tok: DataFrame, id_col: str, n_bits: int) -> DataFrame:
    """(id, h: md5 hex) -> per-id packed bit-vote counts S0..S{n/4-1} + cnt.

    The generic-width form of the r12 packed-lane vote algebra (see the
    _SC_PACK note): the first ``n_bits/4`` hex chars are parsed with one
    conv() per 12-char (48-bit) group, each nibble maps through the
    16-long literal lookup to four 16-bit 0/1-count lanes, and the
    aggregation is ``n_bits/4`` plain bigint sums + one count — instead
    of ``n_bits`` conditional +-1 sums each re-running substr+instr per
    token (the r14 opt: the 32-bit entry paid 64 instr calls per token
    across partial+final agg). Majority per bit j recovers as
    ``2*lane > cnt``, exactly the sign test of the +-1 sum; callers pack
    bits with :func:`_simhash_majority_word` under ``_SC_LANE_GUARD``."""
    n_nib = n_bits // 4
    sizes: list[int] = []
    rem = n_nib
    while rem > 0:
        sizes.append(min(12, rem))
        rem -= sizes[-1]
    gexprs = []
    pos = 1
    for gi, take in enumerate(sizes):
        gexprs.append(
            F.expr(f"CAST(conv(substr(h, {pos}, {take}), 16, 10) AS BIGINT)").alias(f"g{gi}")
        )
        pos += take

    def nib(i: int) -> str:
        g, off = divmod(i, 12)
        return f"(shiftright(g{g}, {4 * (sizes[g] - 1 - off)}) & 15)"

    gx = tok.select(id_col, *gexprs)
    pack_lit = "array(" + ", ".join(f"{p}L" for p in _SC_PACK) + ")"
    packed = gx.select(
        id_col,
        *[
            F.expr(f"element_at({pack_lit}, CAST({nib(i)} + 1 AS INT))").alias(f"p{i}")
            for i in range(n_nib)
        ],
    )
    return packed.groupBy(id_col).agg(
        *[F.sum(f"p{i}").alias(f"S{i}") for i in range(n_nib)],
        F.count(F.lit(1)).alias("cnt"),
    )


def _simhash_majority_word(lo: int, hi: int) -> str:
    """SQL expression packing the majority votes of bits lo..hi-1 (bit j
    at weight 2^(j-lo)) out of the S*/cnt columns of
    :func:`_simhash_packed_votes`."""
    terms = []
    for j in range(lo, hi):
        cj = f"(shiftright(S{j // 4}, {_SC_LANE_BITS * (j % 4)}) & {_SC_LANE_MASK})"
        terms.append(
            f"(CASE WHEN 2 * {cj} > cnt THEN CAST({2 ** (j - lo)} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def _simhash_sc_signature(d: DataFrame) -> DataFrame:
    """docs(doc_id, text) -> packed 128-bit signature (doc_id, w0, w1, w2).

    Factored out of :func:`dedup_simhash_band_scaled` so the packed-lane
    vote algebra is directly property-testable against a bit-by-bit
    reference (tests/test_text_more.py)."""
    tok = d.select("doc_id", F.explode(tokens("text")).alias("t")).withColumn(
        "h", F.md5(F.col("t"))
    )
    # parse the 32 md5 hex chars with THREE conv() calls (48+48+32 bits of
    # integer), then map each nibble through the 16-long _SC_PACK literal
    # lookup — 3 string ops per token instead of the 32 substr+instr the
    # r11 form ran (and 128 the _simhash_bit form would); the vote
    # aggregation is 32 packed bigint sums + a count (see _SC_PACK note).
    # r14: shared with the 32/60-bit entries via _simhash_packed_votes
    # (identical groups/weights for 128 bits — 12+12+8 nibble sizes).
    votes = _simhash_packed_votes(tok, "doc_id", _SIMHASH_SC_BITS)
    words = [
        F.expr(
            _SC_LANE_GUARD.format(
                w=_simhash_majority_word(
                    w * _SIMHASH_SC_WORD, min((w + 1) * _SIMHASH_SC_WORD, _SIMHASH_SC_BITS)
                )
            )
        ).alias(f"w{w}")
        for w in range(3)
    ]
    # sig feeds FOUR consumers (both sides of the band self-join + the two
    # verify joins); without truncation each re-runs the scan+tokenize+md5+
    # vote pipeline — the dominant stage (ADVICE r11). localCheckpoint
    # materializes the tiny 4-column signature table once (~32 B/doc).
    return votes.select("doc_id", *words).localCheckpoint(eager=False)


def dedup_simhash_band_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash pairing with CORPUS-SCALABLE banding: the full {B}-bit
    md5-vote signature (packed into three bigint words, 48+48+32), {NB}
    bands of {W} bits (band-value space 2^{W} = 65536, so expected bucket
    occupancy stays O(1) into the 10^5-10^6-doc range where the 10-bit
    wide entry's candidate join goes quadratic and OOMs — see the module
    constant note), pigeonhole recall guarantee up to hamming {H}, exact
    3-word ``bit_count(xor)`` verify on candidates only. Same salted
    band-join plan shape as the other SimHash entries; all-integer ->
    full value oracle."""
    # the signature aggregation is the dominant CPU stage; parquet inputs
    # with few row groups would otherwise cap its parallelism at the
    # input-split count (measured at sf10: 16 splits on 32 cores, cold
    # 85.6s -> 54.8s with the spread) — one cheap round-robin exchange of
    # the doc rows buys full-width map-side work
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sig = _simhash_sc_signature(d)
    mask = (1 << _SIMHASH_SC_WIDTH) - 1
    per_word = _SIMHASH_SC_WORD // _SIMHASH_SC_WIDTH  # 3 bands per 48-bit word
    band_cols = [
        F.shiftright(F.col(f"w{b // per_word}"), _SIMHASH_SC_WIDTH * (b % per_word)).bitwiseAND(
            F.lit(mask)
        )
        for b in range(_SIMHASH_SC_BANDS)
    ]
    bands = sig.select("doc_id", F.posexplode(F.array(*band_cols)).alias("bi", "bv"))
    from kafka_cdc_hudi_spark.operators.dedup import pairs_within_groups_salted

    cand = pairs_within_groups_salted(
        bands, ["bi", "bv"], "doc_id", n_salt=LSH_BAND_SALT
    ).distinct()
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"w{w}").alias(f"a{w}") for w in range(3)]
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"w{w}").alias(f"b{w}") for w in range(3)]
    )
    ham = " + ".join(f"bit_count(a{w} ^ b{w})" for w in range(3))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", F.expr(f"CAST({ham} AS INT)"))
        .filter(F.col("hamming") <= _SIMHASH_SC_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


dedup_simhash_band_scaled.__doc__ = dedup_simhash_band_scaled.__doc__.format(
    B=_SIMHASH_SC_BITS,
    NB=_SIMHASH_SC_BANDS,
    W=_SIMHASH_SC_WIDTH,
    H=_SIMHASH_SC_HAMMING_MAX,
)


def _simhash_band_scaled_sql() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN {_simhash_bit(j, 'duck')} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(_SIMHASH_SC_BITS)
    )
    word_exprs = []
    for w in range(3):
        bits = " + ".join(
            f"(CASE WHEN s{j} > 0 THEN CAST({2 ** (j % _SIMHASH_SC_WORD)} AS BIGINT) ELSE 0 END)"
            for j in range(
                w * _SIMHASH_SC_WORD, min((w + 1) * _SIMHASH_SC_WORD, _SIMHASH_SC_BITS)
            )
        )
        word_exprs.append(f"{bits} AS w{w}")
    mask = (1 << _SIMHASH_SC_WIDTH) - 1
    per_word = _SIMHASH_SC_WORD // _SIMHASH_SC_WIDTH
    ham = " + ".join(f"bit_count(xor(x.w{w}, y.w{w}))" for w in range(3))
    return f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, md5(unnest(toks)) AS h FROM tok),
votes AS (SELECT doc_id, {sums} FROM t GROUP BY doc_id),
sig AS (SELECT doc_id, {", ".join(word_exprs)} FROM votes),
bands AS (
  SELECT doc_id, b.i AS bi,
         (CASE WHEN b.i < {per_word} THEN w0
               WHEN b.i < {2 * per_word} THEN w1 ELSE w2 END
          >> ({_SIMHASH_SC_WIDTH} * (b.i % {per_word}))) & {mask} AS bv
  FROM sig, LATERAL unnest(generate_series(0, {_SIMHASH_SC_BANDS - 1})) AS b(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({ham} AS INT) AS hamming
FROM cand JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id
WHERE {ham} <= {_SIMHASH_SC_HAMMING_MAX}
"""


DEDUP_SIMHASH_BAND_SCALED_SQL = _simhash_band_scaled_sql()


def _simhash_pairs_sql() -> str:
    sums = ", ".join(
        f"sum(CASE WHEN {_simhash_bit(j, 'duck')} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(32)
    )
    total = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)" for j in range(32)
    )
    return f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, md5(unnest(toks)) AS h FROM tok),
votes AS (SELECT doc_id, {sums} FROM t GROUP BY doc_id),
sig AS (SELECT doc_id, {total} AS simhash FROM votes),
bands AS (
  SELECT doc_id, b.i AS bi, (simhash >> (8 * b.i)) & 255 AS bv
  FROM sig, LATERAL unnest(generate_series(0, 3)) AS b(i)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM cand JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {_SIMHASH_HAMMING_MAX}
"""


DEDUP_SIMHASH_PAIRS_SQL = _simhash_pairs_sql()


# -- embeddings / similarity --------------------------------------------------

_DK_DOT = (
    "(SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) "
    "FROM (SELECT unnest({A}) a, unnest({B}) b))"
)
_DK_NORM = "sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT unnest({A}) a)))"


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms: the sanity/pre-normalize pass before similarity search."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", l2_norm("embedding").alias("l2_norm"), "label")


EMBEDDING_NORMS_SQL = f"""
SELECT vec_id, {_DK_NORM.format(A="e.embedding")} AS l2_norm, label
FROM embeddings e
"""


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors (vec_id < 10): the exact
    baseline every ANN variant is measured against. Queries are broadcast;
    the candidate scan is embarrassingly parallel over partitions.

    r14 optimization: the single-row-group fixture parquet yields ONE scan
    partition, so the whole Q x N cosine pass (plus the map-side
    WindowGroupLimit) ran on one core. Spread the candidate side first —
    the standing fixture-parallelism rule (SKILL/_spread); a multi-split
    production corpus already arrives spread."""
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(spark.sparkContext.defaultParallelism)
    # r14: norms once per ROW (O(N+Q) folds), not once per PAIR — the old
    # cosine() evaluated dot + both norms per pair, 3x the interpreted
    # per-pair work in the dominant Q x N stage. Same doubles (the division
    # association is unchanged; measured EQUAL at sf0.1). An unrolled
    # codegen'd dot was also A/B'd: bit-equal but slower at fixture scale
    # (the 64-term span pays a per-run janino compile), so the fold stays.
    e = e.withColumn("_n", l2_norm("embedding"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("_n").alias("_qn"),
    )
    pairs = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).withColumn(
        "cosine", dot(F.col("qe"), F.col("embedding")) / (F.col("_qn") * F.col("_n"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", F.col("vec_id").alias("nid"), "cosine", "rank")
    )


ANN_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.qid, e.vec_id AS nid,
         {_DK_DOT.format(A="q.qe", B="e.embedding")}
         / ({_DK_NORM.format(A="q.qe")} * {_DK_NORM.format(A="e.embedding")}) AS cosine
  FROM embeddings e, q
  WHERE e.vec_id <> q.qid
)
SELECT qid, nid, cosine,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INT) AS rank
FROM pairs
QUALIFY rank <= 10
"""


#: duplicated-span accounting: n-gram width for the exact-substring pass
_DUPSPAN_N = 8


def text_duplicated_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication accounting (the measure behind
    'Deduplicating Training Data Makes Language Models Better', Lee et
    al. 2022 — public paper): per document, the fraction of token
    positions covered by at least one {N}-gram that also appears VERBATIM
    in another document. Unlike the shingle-set dedup entries this is
    positional — overlapping duplicated {N}-grams merge into spans, and
    the output is the span-covered fraction, the signal used to cut
    boilerplate at span (not document) granularity.

    Plan shape: one explode to positional {N}-grams; cross-doc duplicate
    {N}-grams found with a single agg on the n-gram (count of DISTINCT
    source docs > 1 — corpus-frequency-bounded, the same vocabulary trick
    the BPE pass uses); positions joined back on the n-gram; covered
    positions = explode of each duplicated window into its {N} token
    indexes + count distinct per doc. Every join is an equi-join on the
    n-gram string; nothing is all-pairs."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    base = d.select("doc_id", F.size("toks").alias("n_tokens"), "toks").filter(
        F.col("n_tokens") >= _DUPSPAN_N
    )
    grams = base.select(
        "doc_id",
        "n_tokens",
        F.posexplode(_ngrams_expr("toks", _DUPSPAN_N)).alias("pos", "ng"),
    )
    dup = (
        grams.groupBy("ng")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("ng")
    )
    covered = (
        grams.join(dup, "ng")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + _DUPSPAN_N - 1)
            ).alias("tokpos"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("tokpos").alias("n_dup_tokens"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            (
                F.coalesce("n_dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("dup_fraction"),
        )
    )


text_duplicated_span_fraction.__doc__ = text_duplicated_span_fraction.__doc__.format(
    N=_DUPSPAN_N
)

TEXT_DUPLICATED_SPAN_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
base AS (
  SELECT doc_id, len(toks) AS n_tokens, toks FROM tok WHERE len(toks) >= {_DUPSPAN_N}
),
grams AS (
  SELECT doc_id, n_tokens, g.i - 1 AS pos,
         array_to_string(toks[g.i:g.i+{_DUPSPAN_N - 1}], ' ') AS ng
  FROM base, LATERAL unnest(generate_series(1, len(toks)-{_DUPSPAN_N - 1})) AS g(i)
),
dup AS (
  SELECT ng FROM grams GROUP BY ng HAVING COUNT(DISTINCT doc_id) >= 2
),
covered AS (
  SELECT g.doc_id, COUNT(DISTINCT g.pos + t.j) AS n_dup_tokens
  FROM grams g JOIN dup USING (ng),
       LATERAL unnest(generate_series(0, {_DUPSPAN_N - 1})) AS t(j)
  GROUP BY g.doc_id
)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       CAST(COALESCE(c.n_dup_tokens, 0) AS DOUBLE) / b.n_tokens AS dup_fraction
FROM base b LEFT JOIN covered c ON b.doc_id = c.doc_id
"""


def dedup_spans_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTIONABLE form of :func:`text_duplicated_span_fraction` —
    span-level dedup that actually rewrites the corpus (Lee et al. 2022's
    remove-all-but-one policy): every token position covered by a
    cross-document verbatim {N}-gram is CUT unless this document is the
    n-gram's canonical keeper (its minimum doc_id), and the surviving
    tokens are reassembled in order into the deduplicated text. Exact and
    deterministic, so the rewritten strings themselves are value-oracled.

    Plan shape: the same positional n-gram chain as the fraction entry
    (one explode, one n-gram agg now also carrying min-doc keeper, one
    equi-join-back), plus a positional anti-join and one ordered
    per-doc reassembly agg — every join keyed on the n-gram string or
    (doc, position); nothing is all-pairs, and the n-gram agg volume is
    corpus-frequency-bounded exactly like the BPE vocabulary pass."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    base = d.select("doc_id", F.size("toks").alias("n_tokens"), "toks")
    toks_pos = base.select(
        "doc_id", F.posexplode("toks").alias("tokpos", "token")
    )
    grams = base.filter(F.col("n_tokens") >= _DUPSPAN_N).select(
        "doc_id",
        F.posexplode(_ngrams_expr("toks", _DUPSPAN_N)).alias("pos", "ng"),
    )
    dupk = (
        grams.groupBy("ng")
        .agg(F.countDistinct("doc_id").alias("nd"), F.min("doc_id").alias("keeper"))
        .filter(F.col("nd") >= 2)
        .select("ng", "keeper")
    )
    rem = (
        grams.join(dupk, "ng")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + _DUPSPAN_N - 1)
            ).alias("tokpos"),
        )
        .distinct()
    )
    kept = toks_pos.join(rem, ["doc_id", "tokpos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(tokpos, token))),"
            " s -> s.token), ' ')"
        ).alias("kept_text"),
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
    )


dedup_spans_remove.__doc__ = dedup_spans_remove.__doc__.format(N=_DUPSPAN_N)

DEDUP_SPANS_REMOVE_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM tok),
toks_pos AS (
  SELECT doc_id, g.i - 1 AS tokpos, toks[g.i] AS token
  FROM base, LATERAL unnest(generate_series(1, len(toks))) AS g(i)
),
grams AS (
  SELECT doc_id, g.i - 1 AS pos,
         array_to_string(toks[g.i:g.i+{_DUPSPAN_N - 1}], ' ') AS ng
  FROM base, LATERAL unnest(generate_series(1, len(toks)-{_DUPSPAN_N - 1})) AS g(i)
  WHERE n_tokens >= {_DUPSPAN_N}
),
dupk AS (
  SELECT ng, MIN(doc_id) AS keeper
  FROM grams GROUP BY ng HAVING COUNT(DISTINCT doc_id) >= 2
),
rem AS (
  SELECT DISTINCT g.doc_id, g.pos + t.j AS tokpos
  FROM grams g JOIN dupk d ON g.ng = d.ng AND g.doc_id <> d.keeper,
       LATERAL unnest(generate_series(0, {_DUPSPAN_N - 1})) AS t(j)
),
kept AS (
  SELECT tp.doc_id, tp.tokpos, tp.token
  FROM toks_pos tp LEFT JOIN rem r
    ON tp.doc_id = r.doc_id AND tp.tokpos = r.tokpos
  WHERE r.tokpos IS NULL
),
rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(token, ' ' ORDER BY tokpos) AS kept_text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(b.n_tokens - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.kept_text, '') AS kept_text
FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
"""


#: negative sampling: M hash candidates per query, keep the first K that
#: survive exclusion (self + true top-10 neighbors)
_NEG_M, _NEG_K, _NEG_SALT = 30, 5, "negs_v1"


def dataset_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative sampling: for each query vector, K
    deterministic pseudo-random negatives drawn by salted md5 over the id
    space, EXCLUDING the query itself and its true top-10 neighbors (so a
    'negative' is never an actual near-duplicate — the classic false-
    negative bug in contrastive data prep). Candidate generation is
    scan-free (M hash draws per query, no corpus join); the exclusion is
    an anti-join against the query-bounded positive set; dedup + rank are
    one per-query window. Hash-based, not RNG: reproducible across runs,
    engines, and retries, and composes with any ANN entry as the positive
    set for hard-negative mining (here the exact brute-force baseline)."""
    e = load_table(spark, sf_dir, "embeddings")
    ntot = e.agg(F.count(F.lit(1)).alias("n_vecs"))
    q = e.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("qid"))
    cands = (
        q.crossJoin(F.broadcast(ntot))  # 1-row scalar broadcast
        .select(
            "qid",
            "n_vecs",
            F.explode(F.sequence(F.lit(1), F.lit(_NEG_M))).alias("i"),
        )
        .withColumn(
            "cand",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("qid").cast("string"),
                            F.lit("|"),
                            F.col("i").cast("string"),
                            F.lit(f"|{_NEG_SALT}"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % F.col("n_vecs"),
        )
    )
    pos = ann_topk_bruteforce(spark, sf_dir).select("qid", F.col("nid").alias("cand"))
    kept = (
        cands.filter(F.col("cand") != F.col("qid"))
        .join(pos, ["qid", "cand"], "left_anti")
        .groupBy("qid", "cand")
        .agg(F.min("i").alias("i"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("i"), F.col("cand"))
    return (
        kept.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= _NEG_K)
        .select("qid", "neg_rank", F.col("cand").alias("neg_id"))
    )


_DK_NEG_HASH = (
    "CAST(('0x' || substring(md5(CAST(q.qid AS VARCHAR) || '|' || "
    f"CAST(g.i AS VARCHAR) || '|{_NEG_SALT}'), 1, 15)) AS BIGINT)"
)

DATASET_NEGATIVE_SAMPLE_SQL = f"""
WITH q0 AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q0.qid, e.vec_id AS nid,
         {{dot}}
         / ({{nq}} * {{ne}}) AS cosine
  FROM embeddings e, q0
  WHERE e.vec_id <> q0.qid
),
pos AS (
  SELECT qid, nid FROM (
    SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
    FROM pairs
  ) WHERE rank <= 10
),
n AS (SELECT COUNT(*) AS n_vecs FROM embeddings),
cands AS (
  SELECT q.qid, g.i, {_DK_NEG_HASH} % n.n_vecs AS cand
  FROM (SELECT qid FROM q0) q, n,
       LATERAL unnest(generate_series(1, {_NEG_M})) g(i)
),
kept AS (
  SELECT c.qid, c.cand, MIN(c.i) AS i
  FROM cands c
  WHERE c.cand <> c.qid
    AND NOT EXISTS (SELECT 1 FROM pos p WHERE p.qid = c.qid AND p.nid = c.cand)
  GROUP BY c.qid, c.cand
)
SELECT qid,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY i, cand) AS INT) AS neg_rank,
       cand AS neg_id
FROM kept
QUALIFY neg_rank <= {_NEG_K}
"""

DATASET_NEGATIVE_SAMPLE_SQL = DATASET_NEGATIVE_SAMPLE_SQL.format(
    dot=_DK_DOT.format(A="q0.qe", B="e.embedding"),
    nq=_DK_NORM.format(A="q0.qe"),
    ne=_DK_NORM.format(A="e.embedding"),
)


#: SRP blocking parameters for embedding near-dup detection. Few bits +
#: many tables = high recall at the calibrated threshold (p_collide ~= 0.7
#: at cosine 0.35, rising steeply with similarity) while capping candidate
#: generation to within-bucket pairs.
_EMB_DIM = 64
DEDUP_COS_BITS = 4
DEDUP_COS_TABLES = 8
DEDUP_COS_THRESHOLD = 0.35


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: SRP-LSH-blocked exact cosine above
    threshold. Candidates are pairs colliding in ANY of the 8 sign-random-
    projection hash tables (the same seeded-plane machinery as
    operators/similarity.srp_bucketize), so work is bounded by bucket
    sizes — at 100 TB this is the equi-join-on-bucket shape, never the
    unbounded all-pairs-within-label block the first version used (a label
    block has no size bound; a 4-bit SRP table splits any block ~16 ways
    and adding bits shrinks buckets geometrically). Deterministic planes ->
    full DuckDB oracle reproduces the exact same candidate set.

    Threshold 0.35 is calibrated to the synthetic fixture: its embeddings
    are near-orthogonal random vectors (max pairwise cosine ~0.47), so a
    real-world 0.9 near-dup cutoff matched nothing and the oracle passed
    vacuously on 0 rows. Candidate-bound + non-vacuous regression tests:
    tests/test_similarity.py, tests/test_oracle.py."""
    from kafka_cdc_hudi_spark.operators.similarity import srp_bucketize

    e = load_table(spark, sf_dir, "embeddings")
    # checkpointed index build (see srp_topk): the self-join would
    # otherwise carry the 32-plane signature projection on BOTH sides of
    # the optimizer's tree
    b = srp_bucketize(
        e.select("vec_id", "embedding"), _EMB_DIM, DEDUP_COS_BITS, DEDUP_COS_TABLES
    ).localCheckpoint(eager=False)
    left = b.select(
        "tbl", "sig", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    right = b.select(
        "tbl", "sig", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    return (
        left.join(right, ["tbl", "sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        # pair dedup on the two longs, not on rows carrying both arrays:
        # this candidate set is CORPUS-bounded (all-pairs within buckets),
        # so keeping two 64-float arrays out of the exchange key matters —
        # measured 20.7s -> ~12s at sf0.1. (srp_topk takes the opposite
        # trade: its candidate set is query-bounded and small, and the
        # wide-key distinct measures faster there.)
        .groupBy("vec_a", "vec_b")
        .agg(F.first("ea").alias("ea"), F.first("eb").alias("eb"))
        .withColumn("cosine", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= DEDUP_COS_THRESHOLD)
        .select("vec_a", "vec_b", "cosine")
    )


def _dedup_cos_sig_sql(col: str, table: int) -> str:
    """Re-emit the seeded SRP hyperplanes as SQL literals — the same
    unnest-sum dot product as the other vector oracles, so sign bits (and
    therefore buckets and candidate pairs) are bit-identical to Spark's."""
    from kafka_cdc_hudi_spark.operators.similarity import _srp_planes

    planes = _srp_planes(_EMB_DIM, DEDUP_COS_BITS, table)
    terms = []
    for b in range(DEDUP_COS_BITS):
        lit = "[" + ",".join(repr(float(v)) for v in planes[b]) + "]"
        terms.append(
            f"(CASE WHEN {_DK_DOT.format(A=col, B=lit)} > 0 THEN {2 ** b} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _dedup_embedding_cosine_sql() -> str:
    rows = ", ".join(
        f"({t}, {_dedup_cos_sig_sql('embedding', t)})" for t in range(DEDUP_COS_TABLES)
    )
    cos = (
        f"{_DK_DOT.format(A='ea', B='eb')} "
        f"/ ({_DK_NORM.format(A='ea')} * {_DK_NORM.format(A='eb')})"
    )
    return f"""
WITH b AS (
  SELECT vec_id, embedding, t.tbl, t.sig
  FROM embeddings, LATERAL (VALUES {rows}) t(tbl, sig)
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, x.embedding AS ea,
                  y.vec_id AS vec_b, y.embedding AS eb
  FROM b x JOIN b y ON x.tbl = y.tbl AND x.sig = y.sig AND x.vec_id < y.vec_id
)
SELECT vec_a, vec_b, {cos} AS cosine
FROM cand
WHERE {cos} >= {DEDUP_COS_THRESHOLD}
"""


DEDUP_EMBEDDING_COSINE_SQL = _dedup_embedding_cosine_sql()


def dedup_cross_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair composition BY SOURCE — the contamination readout a
    corpus curator reads before mixing sources: how many near-dup pairs
    live within each source vs across source boundaries (cross-source
    duplication means the mixture double-counts content that two providers
    both scraped). Pairs come from the shared LSH chain; each side is
    labeled by a doc_id-keyed join to the documents dim (at 100 TB the
    pair set is tiny relative to the corpus, so the label joins shuffle
    only pairs), then one small groupBy on the (source, source) matrix.
    ``mean_est`` is exact cross-engine: est values are dyadic multiples of
    1/16 (MINHASH_K), so their double sum is order-independent."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = dedup_minhash_lsh(spark, sf_dir)
    sa = d.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = d.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
            "est_jaccard",
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.sum("est_jaccard") / F.count(F.lit(1))).alias("mean_est"),
        )
    )


def _cross_source_sql() -> str:
    ctes, final = _minhash_ctes()
    return f"""
WITH {ctes},
pairs AS ({final}),
lab AS (
  SELECT least(da.source, db.source) AS src_a,
         greatest(da.source, db.source) AS src_b,
         p.est_jaccard
  FROM pairs p
  JOIN documents da ON p.doc_a = da.doc_id
  JOIN documents db ON p.doc_b = db.doc_id)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs,
       sum(est_jaccard) / count(*) AS mean_est
FROM lab GROUP BY src_a, src_b
"""


DEDUP_CROSS_SOURCE_SQL = _cross_source_sql()


#: epochs materialized by the training-order entry
_N_EPOCHS = 3


def dataset_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch training order: each epoch reshuffles the
    corpus differently via md5(epoch:doc_id), and `position` is the global
    per-epoch ordinal — the materialized read-order a trainer consumes.
    The per-epoch row_number is a range-partitioned global sort: that IS
    the job at any scale (training order is a total order by definition),
    and it parallelizes as a TotalOrderPartitioner-style sort, not a
    single-task window. Seeded differently per epoch, so no epoch's order
    correlates with another's or with doc_id."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    x = d.select("doc_id", F.explode(F.sequence(F.lit(0), F.lit(_N_EPOCHS - 1))).alias("e"))
    x = x.select(F.col("e").cast("bigint").alias("epoch"), "doc_id").withColumn(
        "shuffle_key", F.md5(F.concat_ws(":", F.col("epoch"), F.col("doc_id")))
    )
    w = Window.partitionBy("epoch").orderBy("shuffle_key", "doc_id")
    return x.withColumn("position", F.row_number().over(w)).select(
        "epoch", "doc_id", "position"
    )


DATASET_EPOCH_ORDER_SQL = f"""
WITH x AS (
  SELECT e.epoch, d.doc_id,
         md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS k
  FROM documents d, (SELECT unnest(generate_series(0, {_N_EPOCHS - 1})) AS epoch) e)
SELECT epoch, doc_id,
       CAST(row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS INT) AS position
FROM x
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup FAMILY assignment: MinHash-LSH pairs -> connected components
    -> every document labeled with its cluster's canonical (minimum) doc_id;
    docs in no pair are their own singleton cluster. This is the step that
    turns pairwise similarity into the actual keep/drop decision of a
    training-data dedup pass (keep cluster_id == doc_id, drop the rest).

    Iterative min-label propagation (operators/graph.py): one shuffle per
    round, rounds = family diameter (≤3 for banding-derived pairs)."""
    from kafka_cdc_hudi_spark.operators.graph import connected_components

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(pairs, "doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(cc, docs.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        F.col("component").isNotNull().alias("has_near_dup"),
    )


def _comp_ctes() -> str:
    """Shared recursive-CTE chain: MinHash signatures -> LSH candidate
    pairs -> undirected edges -> reachability -> min-labeled components.
    Used by the cluster-assignment oracle AND the final-corpus oracle."""
    ctes, _ = _minhash_ctes()
    est = " + ".join(
        f"(CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END)" for i in range(MINHASH_K)
    )
    return f"""{ctes},
pairs AS (
  SELECT doc_a, doc_b
  FROM cand JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id
  WHERE CAST({est} AS DOUBLE) / {MINHASH_K} >= 0.5
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)"""


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_comp_ctes()}
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS cluster_id,
       c.component IS NOT NULL AS has_near_dup
FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same cluster assignment as :func:`dedup_clusters`, executed through
    the alternating large-star/small-star variant (operators/graph.py:
    connected_components_star, Kiveris et al.) — O(log n) rounds on ANY
    graph shape, including chains where min-label propagation needs
    diameter rounds. Same recursive-CTE oracle: both variants must produce
    the identical min-labeled components."""
    from kafka_cdc_hudi_spark.operators.graph import connected_components_star

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components_star(pairs, "doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(cc, docs.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        F.col("component").isNotNull().alias("has_near_dup"),
    )


#: hashing-trick embedding geometry
_HASHEMB_DIM = 16


def hash_embedding_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding GENERATION via the signed hashing trick: every token maps
    to one of 16 buckets (salted md5) with a +/-1 sign from an independent
    hash, and the document vector is the per-bucket sign sum — the
    deterministic, vocabulary-free featurization that feeds the ANN/dedup
    stack when no learned embeddings exist. All-integer, so the dense
    array and its squared norm are exact. Plan: one explode + one
    (doc, bucket) shuffle with map-side partial sums, then a per-doc
    map->dense-array projection (order-independent: the array is built by
    bucket LOOKUP, not collect order).

    Returns the raw ``array<bigint>`` column — the shape internal
    consumers (ANN indexing, cosine dedup) want. The registry entry
    :func:`text_hash_embedding` wraps this with ``to_json`` because the
    correctness driver canonicalizes results via pandas ``sort_values``,
    which cannot factorize collection cells (the r7 red row)."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    return _hash_embed_df(d, ["doc_id"], "text")


def _hash_embed_df(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """Signed-hashing-trick embedding of arbitrary (ids, text) rows into
    the shared ``_HASHEMB_DIM`` space — same salts as the document
    entry, so documents, chunks, and queries are mutually comparable."""
    tok = df.select(*id_cols, F.explode(tokens(text_col)).alias("token"))
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.col("token"), F.lit("|emb_v1"))), 1, 15), 16, 10)
        .cast("bigint") % _HASHEMB_DIM
    )
    sign = 1 - 2 * (
        F.conv(F.substring(F.md5(F.concat(F.col("token"), F.lit("|sign_v1"))), 1, 15), 16, 10)
        .cast("bigint") % 2
    )
    # Two-step (ids, bucket) pre-agg + per-id map_from_entries rebuild.
    # An r14 "fusion" replaced this with ONE aggregation of 16 conditional
    # sign-sums (2 Exchange -> 1), but the isolated same-session A/B
    # (AB_HASH_EMBED_r14.json) measured the fused form ~2x SLOWER on the
    # chunk-embedding path (pipeline_rag_index: 2.14 vs 4.09 s min, old
    # faster in 4/4 paired rounds) and no better on the doc path: the
    # fusion pays 16 conditional agg-buffer updates per TOKEN to remove a
    # shuffle of only ids x 16 tiny rows, and tokens >> ids at every
    # scale — so the two-step form is also the 100-TB shape. Integer
    # sums either way; values identical.
    cells = (
        tok.select(*id_cols, bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(*id_cols, "bucket")
        .agg(F.sum("sign").alias("s"))
    )
    return (
        cells.groupBy(*id_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket"), F.col("s")))
            ).alias("m")
        )
        .select(
            *id_cols,
            F.expr(
                f"transform(sequence(0, {_HASHEMB_DIM - 1}),"
                " j -> coalesce(element_at(m, CAST(j AS BIGINT)), CAST(0 AS BIGINT)))"
            ).alias("embedding"),
        )
        .withColumn(
            "l2_sq",
            F.expr("aggregate(embedding, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"),
        )
    )


def text_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing presentation of :func:`hash_embedding_vectors`: the
    integer vector is serialized with ``to_json`` (compact ``[v0,v1,...]``
    in both Spark and DuckDB) so every output column is a scalar the
    driver's pandas canonicalization can sort and hash — no raw collection
    columns cross the driver boundary (CORRECTNESS_r07's only red row)."""
    return hash_embedding_vectors(spark, sf_dir).select(
        "doc_id",
        F.to_json(F.col("embedding")).alias("embedding_json"),
        "l2_sq",
    )


TEXT_HASH_EMBEDDING_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_DK_TOKS}) AS token FROM documents),
cells AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(token || '|emb_v1'), 1, 15)) AS BIGINT)
           % {_HASHEMB_DIM} AS bucket,
         CAST(SUM(1 - 2 * (CAST(('0x' || substring(md5(token || '|sign_v1'), 1, 15)) AS BIGINT) % 2))
              AS BIGINT) AS s
  FROM tok GROUP BY 1, 2),
dense AS (
  SELECT doc_id,
         list_transform(range(0, {_HASHEMB_DIM}),
                        j -> COALESCE(m[j][1], 0)) AS embedding
  FROM (SELECT doc_id,
               MAP(list(bucket ORDER BY bucket), list(s ORDER BY bucket)) AS m
        FROM cells GROUP BY doc_id))
SELECT doc_id, CAST(to_json(embedding) AS VARCHAR) AS embedding_json,
       CAST(list_sum(list_transform(embedding, x -> x * x)) AS BIGINT) AS l2_sq
FROM dense
"""


def graph_triangles_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation per document over the near-dup graph — the
    clustering-DENSITY signal the pair count can't give: a doc in many
    triangles sits inside a tight boilerplate clique (safe to collapse to
    one canonical survivor), one in zero triangles hangs off chains of
    marginal matches (review before deleting). Degree-ordered wedge
    counting (operators/graph.py:count_triangles) — exact, three
    shuffles, out-degrees bounded O(sqrt(m)) by the orientation so a hub
    doc cannot pin a task. Oracle: the identical orientation/wedge/close
    algebra in SQL over the shared MinHash-LSH pair chain."""
    from kafka_cdc_hudi_spark.operators.graph import count_triangles

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    tri = count_triangles(pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(tri, docs.doc_id == tri.node, "left").select(
        "doc_id",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )


def _triangles_sql() -> str:
    ctes, _ = _minhash_ctes()
    est = " + ".join(
        f"(CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END)" for i in range(MINHASH_K)
    )
    return f"""
WITH {ctes},
pairs AS (
  SELECT doc_a, doc_b
  FROM cand JOIN sig x ON doc_a = x.doc_id JOIN sig y ON doc_b = y.doc_id
  WHERE CAST({est} AS DOUBLE) / {MINHASH_K} >= 0.5
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
deg AS (SELECT a AS n, COUNT(*) AS deg FROM edges GROUP BY a),
-- orient each undirected edge low-(deg, id) -> high (same total order as
-- operators/graph.py:count_triangles)
o AS (
  SELECT CASE WHEN (da.deg, doc_a) < (db.deg, doc_b) THEN doc_a ELSE doc_b END AS s,
         CASE WHEN (da.deg, doc_a) < (db.deg, doc_b) THEN doc_b ELSE doc_a END AS t,
         CASE WHEN (da.deg, doc_a) < (db.deg, doc_b) THEN db.deg ELSE da.deg END AS tdeg
  FROM pairs JOIN deg da ON doc_a = da.n JOIN deg db ON doc_b = db.n
),
wedges AS (
  SELECT e1.s AS a, e1.t AS b, e2.t AS c
  FROM o e1 JOIN o e2 ON e1.s = e2.s
  WHERE (e1.tdeg, e1.t) < (e2.tdeg, e2.t)
),
tri AS (
  SELECT w.a, w.b, w.c FROM wedges w JOIN o e3 ON w.b = e3.s AND w.c = e3.t
),
cnt AS (
  SELECT node, COUNT(*) AS n_triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT d.doc_id, CAST(COALESCE(cnt.n_triangles, 0) AS BIGINT) AS n_triangles
FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.node
"""


GRAPH_TRIANGLES_SQL = _triangles_sql()


_PAGERANK_ITERS = 5


def graph_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-duplicate graph: which document
    is the HUB of each template family (the doc most near-dup pairs point
    at — a better canonical-survivor choice than min-id when families are
    star-shaped boilerplate). Integer fixed-point arithmetic end-to-end
    (operators/graph.py:pagerank_int), so the iterative algorithm is
    bit-exact in SQL — the oracle unrolls the 5 iterations as CTEs over
    the shared MinHash-LSH pair chain."""
    from kafka_cdc_hudi_spark.operators.graph import pagerank_int

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return pagerank_int(pairs, "doc_a", "doc_b", iters=_PAGERANK_ITERS)


def _pagerank_sql() -> str:
    comp = _comp_ctes()
    # reuse the chain up to `edges`; the recursive reach/comp CTEs are
    # unreferenced here and never evaluated
    iters = []
    prev = "r0"
    for i in range(1, _PAGERANK_ITERS + 1):
        iters.append(f"""
r{i} AS (
  SELECT d.node,
         (15 * (1000000000 // c.n)) // 100
           + (85 * COALESCE(s.m, 0)) // 100 AS rank
  FROM deg d CROSS JOIN consts c
  LEFT JOIN (
    SELECT e.b AS node, CAST(SUM(r.rank // dd.deg) AS BIGINT) AS m
    FROM edges e JOIN {prev} r ON e.a = r.node JOIN deg dd ON e.a = dd.node
    GROUP BY 1) s ON s.node = d.node)""")
        prev = f"r{i}"
    return f"""
WITH RECURSIVE {comp},
deg AS (SELECT a AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
consts AS (SELECT COUNT(*) AS n FROM deg),
r0 AS (SELECT node, 1000000000 // n AS rank FROM deg, consts),
{', '.join(iters)}
SELECT deg.node, deg.deg, {prev}.rank AS rank_ppb
FROM deg JOIN {prev} USING (node)
"""


GRAPH_PAGERANK_SQL = _pagerank_sql()


def dedup_corpus_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup loop CLOSED: apply the near-dup cluster assignment and
    emit the surviving corpus — one canonical document (the cluster's
    minimum doc_id) per cluster, singletons kept, each with its cluster
    size. This is the dataset a pretraining run actually reads after the
    candidate -> cluster -> keep/drop pipeline.

    Plan: cluster assignment (O(log n) star rounds), one shuffle for
    cluster sizes, then joins back to documents — the survivor set is
    cluster-count-sized, so AQE broadcasts it into the corpus join at
    dimension scale."""
    clusters = dedup_clusters_star(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("n_members"))
    kept = clusters.filter(F.col("doc_id") == F.col("cluster_id"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        kept.join(sizes, "cluster_id")
        .join(d, "doc_id")
        .select("doc_id", "n_members", "lang", "n_chars")
    )


DEDUP_CORPUS_FINAL_SQL = f"""
WITH RECURSIVE {_comp_ctes()},
clusters AS (
  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
sizes AS (SELECT cluster_id, COUNT(*) AS n_members FROM clusters GROUP BY cluster_id)
SELECT c.doc_id, s.n_members, d.lang, d.n_chars
FROM clusters c
JOIN sizes s USING (cluster_id)
JOIN documents d USING (doc_id)
WHERE c.doc_id = c.cluster_id
"""


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/serving
    compression step of an embedding pipeline (scale = max|x|/127,
    q = round(x/scale), dequant = q*scale). Output is scalar per vector:
    the scale, mean absolute dequantization error, and cosine between the
    original and dequantized vector (the fidelity metric that decides
    whether int8 serving is acceptable). Pure higher-order expressions,
    single pass, no shuffle."""
    from kafka_cdc_hudi_spark.functions.vectors import cosine as _cos

    e = load_table(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    ed = e.select("vec_id", x.alias("x"))
    scale = F.greatest(
        F.array_max(F.transform(F.col("x"), F.abs)) / F.lit(127.0), F.lit(1e-12)
    )
    ed = ed.withColumn("scale", scale)
    dq = F.transform(F.col("x"), lambda v: F.round(v / F.col("scale")) * F.col("scale"))
    ed = ed.withColumn("dq", dq)
    abs_err = F.aggregate(
        F.zip_with(F.col("x"), F.col("dq"), lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / F.size(F.col("x"))
    return ed.select(
        "vec_id",
        F.col("scale"),
        abs_err.alias("mean_abs_err"),
        _cos(F.col("x"), F.col("dq")).alias("cos_fidelity"),
    )


EMBEDDING_QUANTIZE_INT8_SQL = f"""
WITH x AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS e
  FROM embeddings
),
s AS (
  SELECT vec_id, e,
         greatest(list_max(list_transform(e, v -> abs(v))) / 127.0, 1e-12) AS scale
  FROM x
),
d AS (
  SELECT vec_id, e, scale,
         list_transform(e, v -> round(v / scale) * scale) AS dq
  FROM s
)
SELECT vec_id, scale,
       (SELECT sum(abs(a - b)) FROM (SELECT unnest(e) a, unnest(dq) b)) / len(e) AS mean_abs_err,
       {_DK_DOT.format(A="e", B="dq")} / ({_DK_NORM.format(A="e")} * {_DK_NORM.format(A="dq")}) AS cos_fidelity
FROM d
"""


def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-50 tokens by term frequency with document
    frequency — the vocab-build / stopword-discovery pass of a training
    pipeline. One explode + one shuffle on token (partial counts map-side;
    the distinct-doc count shuffles (token, doc_id) pairs once). Hot tokens
    are exactly the skew case partial aggregation exists for."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    tok = d.select("doc_id", F.explode(tokens("text")).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.col("term_freq").desc(), "token")
        .limit(50)
    )


TEXT_TOKEN_TOPK_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_DK_TOKS}) AS token FROM documents)
SELECT token, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
FROM tok
GROUP BY token
ORDER BY term_freq DESC, token
LIMIT 50
"""


def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) by salted md5 of
    the document key — the reproducible split step of a training pipeline.
    Hash-based (not random) so the split is stable across runs, engines,
    and re-partitioning; the salt versions the split. Pure projection, no
    shuffle, trivially parallel at any scale."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|split_v1"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.select("doc_id", bucket.alias("bucket"), split.alias("split"))


DATASET_SPLIT_SQL = """
SELECT doc_id,
       CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|split_v1'), 1, 15)) AS BIGINT) % 100 AS bucket,
       CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|split_v1'), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
            WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|split_v1'), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning pass: lowercase, strip non-alphanumerics to spaces,
    collapse whitespace, trim — with before/after length accounting. The
    canonicalization step ahead of exact dedup/tokenization; single
    codegen'd projection."""
    d = load_table(spark, sf_dir, "documents")
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9\\s]", " "),
            "\\s+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        cleaned.alias("clean_text"),
        F.length("text").alias("n_chars_raw"),
        F.length(cleaned).alias("n_chars_clean"),
    )


TEXT_NORMALIZE_SQL = """
WITH c AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS clean_text
  FROM documents
)
SELECT doc_id, clean_text,
       CAST(length(text) AS INT) AS n_chars_raw,
       CAST(length(clean_text) AS INT) AS n_chars_clean
FROM c
"""


# -- pipeline hygiene: repetition, PII, decontamination -----------------------


def _ngrams_expr(toks_col: str, n: int) -> F.Column:
    """Sliding n-token windows, space-joined — native expression (slice is
    1-based; the CASE guards short docs: sequence(1,0) would DESCEND)."""
    return F.expr(
        f"CASE WHEN size({toks_col}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({toks_col})-{n - 1}), "
        f"i -> concat_ws(' ', slice({toks_col}, i, {n}))) END"
    )


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality signals (the Gopher-style rules a
    training pipeline filters on): distinct-token ratio and the fraction of
    the document claimed by its single most-frequent bigram. One explode +
    one (doc, bigram) shuffle with map-side partial counts — per-doc work,
    embarrassingly parallel at any corpus size."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    d = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.explode(_ngrams_expr("toks", 2)).alias("bigram"),
    )
    counts = d.groupBy("doc_id", "n_tokens", "n_distinct", "bigram").agg(
        F.count("*").alias("c")
    )
    return (
        counts.groupBy("doc_id", "n_tokens", "n_distinct")
        .agg(
            F.max("c").alias("top"),
            F.sum("c").alias("total"),
            F.countDistinct("bigram").alias("n_distinct_bigrams"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")).alias(
                "distinct_token_ratio"
            ),
            (F.col("top").cast("double") / F.col("total").cast("double")).alias(
                "top_bigram_frac"
            ),
            "n_distinct_bigrams",
        )
    )


TEXT_REPETITION_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
         array_to_string(toks[g.i:g.i+1], ' ') AS bigram
  FROM tok, LATERAL unnest(generate_series(1, len(toks)-1)) AS g(i)
),
counts AS (
  SELECT doc_id, n_tokens, n_distinct, bigram, COUNT(*) AS c
  FROM bg GROUP BY 1, 2, 3, 4
)
SELECT doc_id, n_tokens,
       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_token_ratio,
       CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_bigram_frac,
       COUNT(DISTINCT bigram) AS n_distinct_bigrams
FROM counts
GROUP BY doc_id, n_tokens, n_distinct
"""


#: the synthetic corpus carries no real PII, so the scrubber is exercised on
#: a deterministic augmentation: every document gets one email and one phone
#: appended in-query (same expression in the SQL oracle) — redaction counts
#: are then provably exact (1 and 1), not vacuously zero
_PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE_RE = "\\+1-555-[0-9]{4}"


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails, phone numbers) with per-doc redaction
    accounting — the compliance step of a training pipeline. Pure codegen'd
    regexp projection, zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    d = d.select("doc_id", aug.alias("aug"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("aug"), _PII_EMAIL_RE, "<EMAIL>"),
        _PII_PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed_text"),
        F.size(F.regexp_extract_all("aug", F.lit(_PII_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("aug", F.lit(_PII_PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
    )


TEXT_PII_SCRUB_SQL = f"""
WITH a AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS aug
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(aug, '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PII_PHONE_RE}', '<PHONE>', 'g') AS scrubbed_text,
       CAST(len(regexp_extract_all(aug, '{_PII_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{_PII_PHONE_RE}')) AS INT) AS n_phones
FROM a
"""


#: decontamination parameters: 3-token shingles (short enough that the
#: word-salad fixture produces cross-doc collisions at every SF — a larger n
#: would make the check vacuous below sf0.01), flag at >=3 shared
_DECON_N = 3
_DECON_FLAG_MIN = 3


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: score every training document by how many
    distinct token 3-grams it shares with a held-out benchmark slice
    (``doc_id % 10 == 0``), flagging docs over the threshold — the
    train/eval-overlap check run before any training job. The benchmark
    shingle set is tiny and broadcast; the probe is an equi-join on the
    shingle — at 100 TB this is one broadcast-hash-join pass over the
    corpus, never a doc-by-doc scan of the benchmark."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    shingled = d.select("doc_id", F.explode(_ngrams_expr("toks", _DECON_N)).alias("ng"))
    bench = (
        shingled.filter(F.col("doc_id") % 10 == 0).select("ng").distinct()
    )
    train = shingled.filter(F.col("doc_id") % 10 != 0)
    shared = (
        train.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.countDistinct("ng").alias("n_shared"))
    )
    return (
        d.filter(F.col("doc_id") % 10 != 0)
        .select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).alias("n_shared_shingles"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) >= _DECON_FLAG_MIN).alias(
                "contaminated"
            ),
        )
    )


TEXT_DECONTAMINATE_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, array_to_string(toks[g.i:g.i+{_DECON_N - 1}], ' ') AS ng
  FROM tok, LATERAL unnest(generate_series(1, len(toks)-{_DECON_N - 1})) AS g(i)
),
bench AS (SELECT DISTINCT ng FROM sh WHERE doc_id % 10 = 0),
shared AS (
  SELECT s.doc_id, COUNT(DISTINCT s.ng) AS n_shared
  FROM sh s JOIN bench b ON s.ng = b.ng
  WHERE s.doc_id % 10 <> 0
  GROUP BY s.doc_id
),
train AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 <> 0)
SELECT t.doc_id,
       COALESCE(sh2.n_shared, 0) AS n_shared_shingles,
       COALESCE(sh2.n_shared, 0) >= {_DECON_FLAG_MIN} AS contaminated
FROM train t LEFT JOIN shared sh2 ON t.doc_id = sh2.doc_id
"""


#: Bloom-filter parameters for the sketch-based decontamination path:
#: m bits, k md5-derived hash slots per shingle. m is sized to the
#: benchmark (fixed in production: the held-out eval set doesn't grow with
#: the corpus), so the bitmap is a CONSTANT-size broadcast no matter how
#: large the training side gets. At the fixture scales this gives a lightly
#: loaded filter at sf0.01 and a visibly loaded one at sf0.1, so the
#: false-positive accounting below is exercised, not vacuous.
_BLOOM_M = 131072
_BLOOM_K = 3


def _bloom_pos(ng, i: int):
    """Hash slot i of shingle `ng` in [0, _BLOOM_M): bigint of the first 15
    md5 hex chars of the salted shingle — the same md5 idiom every other
    hash-family operator here uses, bit-identical in DuckDB."""
    salted = F.concat(ng if not isinstance(ng, str) else F.col(ng), F.lit(f"|bloom{i}"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint") % _BLOOM_M
    )


def text_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination via a Bloom-filter sketch of the benchmark shingle
    set — the 100-TB-scale path for :func:`text_decontaminate`.

    Why a sketch: the exact path broadcast-joins the full benchmark shingle
    SET against every training shingle. That is fine when the benchmark is
    small, but the broadcast grows with the benchmark's distinct-shingle
    count (strings). The Bloom bitmap is a fixed ``m``-bit object
    (here 16 KiB equivalent) regardless of benchmark string sizes, and the
    probe is pure hashing — so at 100 TB the corpus-side pass is a
    scan-local broadcast-hash probe, and exact string comparison only runs
    over the (tiny) bloom-flagged survivor set.

    Plan shape (all equi-joins, no cartesian work):

    1. bitmap build: benchmark shingles -> k md5 hash slots -> distinct
       set-bit positions (<= m rows of one int; auto-broadcast);
    2. probe: each distinct training (doc, shingle) hashes to its k slots
       and is bloom-flagged iff ALL k slots are set (count-distinct
       matched slots == k after the broadcast join);
    3. rescue join: ONLY bloom-flagged pairs are string-compared against
       the true benchmark set (no false negatives, so exact hits are a
       subset of flagged) — the output counts both, and their difference
       is the measured false-positive load of the sketch.

    Same shingle size / benchmark slice / threshold as
    :func:`text_decontaminate`, so the ``contaminated`` verdicts agree
    entry-to-entry while the plans differ."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    shingled = d.select("doc_id", F.explode(_ngrams_expr("toks", _DECON_N)).alias("ng"))
    bench = shingled.filter(F.col("doc_id") % 10 == 0).select("ng").distinct()
    bloom_bits = (
        bench.select(
            F.explode(
                F.array(*[_bloom_pos(F.col("ng"), i) for i in range(_BLOOM_K)])
            ).alias("pos")
        )
        .distinct()
    )
    train = (
        shingled.filter(F.col("doc_id") % 10 != 0).distinct()
    )
    probes = train.select(
        "doc_id",
        "ng",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("hi"), _bloom_pos(F.col("ng"), i).alias("pos")
                    )
                    for i in range(_BLOOM_K)
                ]
            )
        ).alias("h"),
    ).select("doc_id", "ng", F.col("h.hi").alias("hi"), F.col("h.pos").alias("pos"))
    flagged = (
        probes.join(F.broadcast(bloom_bits), "pos")
        .groupBy("doc_id", "ng")
        .agg(F.countDistinct("hi").alias("nh"))
        .filter(F.col("nh") == _BLOOM_K)
        .select("doc_id", "ng")
    )
    n_bloom = flagged.groupBy("doc_id").agg(F.count("*").alias("n_bloom"))
    n_exact = (
        flagged.join(F.broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_exact"))
    )
    return (
        d.filter(F.col("doc_id") % 10 != 0)
        .select("doc_id")
        .join(n_bloom, "doc_id", "left")
        .join(n_exact, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bloom", F.lit(0)).alias("n_bloom_hits"),
            F.coalesce("n_exact", F.lit(0)).alias("n_exact_hits"),
            (F.coalesce("n_bloom", F.lit(0)) - F.coalesce("n_exact", F.lit(0))).alias(
                "n_bloom_false_pos"
            ),
            (F.coalesce("n_exact", F.lit(0)) >= _DECON_FLAG_MIN).alias("contaminated"),
        )
    )


_DK_BLOOM_POS = (
    "CAST(('0x' || substring(md5({ng} || '|bloom' || CAST(h.i AS VARCHAR)), 1, 15)) "
    f"AS BIGINT) % {_BLOOM_M}"
)

TEXT_BLOOM_DECONTAMINATE_SQL = f"""
WITH tok AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id, array_to_string(toks[g.i:g.i+{_DECON_N - 1}], ' ') AS ng
  FROM tok, LATERAL unnest(generate_series(1, len(toks)-{_DECON_N - 1})) AS g(i)
),
bench AS (SELECT DISTINCT ng FROM sh WHERE doc_id % 10 = 0),
bloom_bits AS (
  SELECT DISTINCT {_DK_BLOOM_POS.format(ng='ng')} AS pos
  FROM bench, LATERAL unnest(generate_series(0, {_BLOOM_K - 1})) AS h(i)
),
train AS (SELECT DISTINCT doc_id, ng FROM sh WHERE doc_id % 10 <> 0),
probes AS (
  SELECT t.doc_id, t.ng, h.i AS hi, {_DK_BLOOM_POS.format(ng='t.ng')} AS pos
  FROM train t, LATERAL unnest(generate_series(0, {_BLOOM_K - 1})) AS h(i)
),
flagged AS (
  SELECT p.doc_id, p.ng
  FROM probes p JOIN bloom_bits b ON p.pos = b.pos
  GROUP BY p.doc_id, p.ng
  HAVING COUNT(DISTINCT p.hi) = {_BLOOM_K}
),
nb AS (SELECT doc_id, COUNT(*) AS n_bloom FROM flagged GROUP BY doc_id),
ne AS (
  SELECT f.doc_id, COUNT(*) AS n_exact
  FROM flagged f JOIN bench b ON f.ng = b.ng
  GROUP BY f.doc_id
),
docs AS (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0)
SELECT d.doc_id,
       COALESCE(nb.n_bloom, 0) AS n_bloom_hits,
       COALESCE(ne.n_exact, 0) AS n_exact_hits,
       COALESCE(nb.n_bloom, 0) - COALESCE(ne.n_exact, 0) AS n_bloom_false_pos,
       COALESCE(ne.n_exact, 0) >= {_DECON_FLAG_MIN} AS contaminated
FROM docs d
LEFT JOIN nb ON d.doc_id = nb.doc_id
LEFT JOIN ne ON d.doc_id = ne.doc_id
"""


#: edit-distance join parameters: threshold tau, and tau+1 segments per
#: string (pigeonhole: <= tau edits leave at least one segment intact)
_FUZZY_TAU = 2
_FUZZY_NSEG = _FUZZY_TAU + 1


def dedup_fuzzy_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit-distance similarity join — the fuzzy
    member of the dedup family (typo'd registry strings matched back to
    their canonical form, lev <= tau), using segment-partition candidate
    generation in the style of PassJoin (Li/Deng/Feng, VLDB 2012 — public
    algorithm): each clean entity of length L is split into tau+1 even
    segments; by pigeonhole, any string within tau edits contains at least
    one segment VERBATIM, at a position shifted by at most tau. So
    candidates come from a pure EQUI-join on (L, segment-index, segment
    text) between clean segments and dirty substrings enumerated over the
    bounded (candidate-L x segment x +-tau shift) grid — <= 75 constant
    probes per string at tau=2 — and only candidate pairs pay a
    levenshtein verify. At 100 TB: no cartesian work anywhere; candidate
    generation is a shuffle on short segment keys whose selectivity grows
    with entity diversity, and the verify is a projection on the
    (near-linear) candidate set. Guaranteed recall — the segment grid is
    a superset of every reachable alignment, and the verify is exact.

    Fixture: entities are variable-length document-text prefixes
    (20-28 chars, so the candidate-length enumeration is real); the dirty
    side applies one deterministic edit keyed by doc_id — delete /
    substitute-'#' / insert-'#' at a doc_id-derived interior position —
    so every dirty string has a distance-1 canonical match plus whatever
    near-prefix cross-matches genuinely exist. The join itself is the
    generic :func:`operators.fuzzy.editdist_join`; its recall guarantee
    is property-tested on random multi-edit strings in tests/test_fuzzy.py
    beyond this entry's single-edit fixture."""
    from kafka_cdc_hudi_spark.operators.fuzzy import editdist_join

    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 28)
        .select(
            "doc_id",
            (F.lit(20) + F.col("doc_id") % 9).cast("int").alias("elen"),
            F.col("text"),
        )
        .select(
            "doc_id", "elen", F.col("text").substr(F.lit(1), F.col("elen")).alias("ename")
        )
    )
    pos = (F.col("doc_id") % (F.col("elen") - 2) + 2).cast("int")
    opsel = F.col("doc_id") % 3
    head = F.col("ename").substr(F.lit(1), pos - 1)
    tail_after = F.col("ename").substr(pos + 1, F.lit(64))
    tail_from = F.col("ename").substr(pos, F.lit(64))
    dirty = base.select(
        F.col("doc_id").alias("dirty_id"),
        F.when(opsel == 0, F.concat(head, tail_after))
        .when(opsel == 1, F.concat(head, F.lit("#"), tail_after))
        .otherwise(F.concat(head, F.lit("#"), tail_from))
        .alias("dname"),
    )
    return editdist_join(
        dirty,
        base.select(F.col("doc_id").alias("clean_id"), "ename"),
        tau=_FUZZY_TAU,
    )


_DK_SEG_START = "(i.i * {L}) // {n} + 1".format(L="{L}", n=_FUZZY_NSEG)
_DK_SEG_LEN = "((i.i + 1) * {L}) // {n} - (i.i * {L}) // {n}".format(
    L="{L}", n=_FUZZY_NSEG
)

_FUZZY_CTES = f"""base AS (
  SELECT doc_id, CAST(20 + doc_id % 9 AS INT) AS elen,
         substr(text, 1, CAST(20 + doc_id % 9 AS INT)) AS ename
  FROM documents WHERE length(text) >= 28
),
pos_t AS (SELECT *, CAST(doc_id % (elen - 2) + 2 AS INT) AS pos FROM base),
dirty AS (
  SELECT doc_id AS dirty_id,
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN substr(ename, 1, pos - 1) || substr(ename, pos + 1)
           WHEN 1 THEN substr(ename, 1, pos - 1) || '#' || substr(ename, pos + 1)
           ELSE substr(ename, 1, pos - 1) || '#' || substr(ename, pos)
         END AS dname
  FROM pos_t
),
probe_keys AS (
  SELECT DISTINCT d.dirty_id, CAST(L.l AS INT) AS L, CAST(i.i AS INT) AS i,
         substr(d.dname, {_DK_SEG_START.format(L='L.l')} + s.s,
                {_DK_SEG_LEN.format(L='L.l')}) AS seg
  FROM dirty d,
       LATERAL unnest(generate_series(length(d.dname) - {_FUZZY_TAU},
                                      length(d.dname) + {_FUZZY_TAU})) AS L(l),
       LATERAL unnest(generate_series(0, {_FUZZY_NSEG - 1})) AS i(i),
       LATERAL unnest(generate_series(-{_FUZZY_TAU}, {_FUZZY_TAU})) AS s(s)
  WHERE {_DK_SEG_START.format(L='L.l')} + s.s >= 1
    AND {_DK_SEG_LEN.format(L='L.l')} >= 1
    AND {_DK_SEG_START.format(L='L.l')} + s.s + {_DK_SEG_LEN.format(L='L.l')} - 1
        <= length(d.dname)
),
clean_keys AS (
  SELECT b.doc_id AS clean_id, b.elen AS L, CAST(i.i AS INT) AS i,
         substr(b.ename, {_DK_SEG_START.format(L='b.elen')},
                {_DK_SEG_LEN.format(L='b.elen')}) AS seg
  FROM base b, LATERAL unnest(generate_series(0, {_FUZZY_NSEG - 1})) AS i(i)
),
cand AS (
  SELECT DISTINCT p.dirty_id, c.clean_id
  FROM probe_keys p
  JOIN clean_keys c ON p.L = c.L AND p.i = c.i AND p.seg = c.seg
)"""

DEDUP_FUZZY_EDITDIST_SQL = f"""
WITH {_FUZZY_CTES}
SELECT cand.dirty_id, cand.clean_id,
       CAST(levenshtein(d.dname, b.ename) AS INT) AS lev_dist
FROM cand
JOIN dirty d ON cand.dirty_id = d.dirty_id
JOIN base b ON cand.clean_id = b.doc_id
WHERE levenshtein(d.dname, b.ename) <= {_FUZZY_TAU}
"""


def dedup_fuzzy_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: fuzzy edit-distance match pairs ->
    connected components -> every record labeled with its entity's
    canonical (minimum) id — the composition that turns pairwise string
    matches into the actual merge/canonicalize decision of a registry
    cleanup (keep entity_id == doc_id, redirect the rest). Self-matches
    are dropped before clustering, so ``has_fuzzy_match`` means the
    record genuinely resolved to ANOTHER record. Same O(diameter)
    min-label propagation as the minhash cluster entries; the oracle
    unrolls the identical reachability as a recursive CTE over the
    shared fuzzy candidate chain."""
    from kafka_cdc_hudi_spark.operators.graph import connected_components

    pairs = (
        dedup_fuzzy_editdist(spark, sf_dir)
        .filter(F.col("dirty_id") != F.col("clean_id"))
        .select("dirty_id", "clean_id")
    )
    cc = connected_components(pairs, "dirty_id", "clean_id")
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") >= 28)
        .select("doc_id")
    )
    return docs.join(cc, docs.doc_id == cc.node, "left").select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("entity_id"),
        F.col("component").isNotNull().alias("has_fuzzy_match"),
    )


DEDUP_FUZZY_CANONICALIZE_SQL = f"""
WITH RECURSIVE {_FUZZY_CTES},
fpairs AS (
  SELECT cand.dirty_id, cand.clean_id
  FROM cand
  JOIN dirty d ON cand.dirty_id = d.dirty_id
  JOIN base b ON cand.clean_id = b.doc_id
  WHERE levenshtein(d.dname, b.ename) <= {_FUZZY_TAU}
    AND cand.dirty_id <> cand.clean_id
),
edges AS (
  SELECT dirty_id AS a, clean_id AS b FROM fpairs
  UNION
  SELECT clean_id, dirty_id FROM fpairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT b.doc_id,
       COALESCE(c.component, b.doc_id) AS entity_id,
       c.component IS NOT NULL AS has_fuzzy_match
FROM base b LEFT JOIN comp c ON b.doc_id = c.node
"""


#: per-language keep-rates for the stratified sample, in basis points of
#: 10000 — the data-MIXING shape: downsample the dominant language, keep
#: the tail. Hash-based (not random): reproducible across runs/engines.
STRATIFIED_RATES_BP = {"en": 2500, "zh": 5000}
STRATIFIED_DEFAULT_BP = 10000
STRATIFIED_SALT = "sample_v1"


def dataset_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling by language: each doc keeps iff its
    salted-md5 bucket (0-9999) falls under its stratum's rate. Pure
    projection + filter — no shuffle, no RNG state, stable under
    repartitioning; at 100 TB this is a scan-local filter that composes
    with any downstream (the split/pack operators use the same idiom)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"|{STRATIFIED_SALT}"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 10000
    )
    rate = F.lit(STRATIFIED_DEFAULT_BP)
    for lang, bp in STRATIFIED_RATES_BP.items():
        rate = F.when(F.col("lang") == lang, bp).otherwise(rate)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("rate_bp"))
        .filter(F.col("bucket") < F.col("rate_bp"))
    )


_DK_SAMPLE_RATE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {bp}" for lang, bp in STRATIFIED_RATES_BP.items()
) + f" ELSE {STRATIFIED_DEFAULT_BP} END"

DATASET_SAMPLE_STRATIFIED_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|{STRATIFIED_SALT}'), 1, 15)) AS BIGINT) % 10000 AS bucket,
         CAST({_DK_SAMPLE_RATE} AS BIGINT) AS rate_bp
  FROM documents
)
SELECT doc_id, lang, bucket, rate_bp FROM t WHERE bucket < rate_bp
"""


#: top-k terms per document for the tf-idf query
TFIDF_TOPK = 5


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tf-idf terms per document — the relevance/quality-scoring
    primitive. idf uses the BM25-style RATIONAL form
    ``(N - df + 0.5) / (df + 0.5)`` instead of a logarithm: same ranking
    monotonicity, but pure +-*/ on exact integer inputs, so Spark and
    DuckDB produce bit-identical doubles (ln() rounding is libm-dependent
    and would break the value hash).

    Plan: one explode pass -> (doc, term) counts (shuffle 1, map-side
    partials) -> term document-frequencies from those counts (shuffle 2,
    input already one row per (doc, term)) -> join back (AQE picks
    broadcast when the term dictionary is small) -> per-doc top-5 via
    row_number (WindowGroupLimit prunes before the final sort)."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.groupBy().agg(F.count("*").alias("n_docs"))
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = F.col("tf") * ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "rank", "term", "tf", "df", "score")
    )


TEXT_TFIDF_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_DK_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tf * ((n_docs - df + 0.5) / (df + 0.5)) DESC, term) AS INT) AS rank,
       term, tf, df,
       tf * ((n_docs - df + 0.5) / (df + 0.5)) AS score
FROM tf JOIN dfreq USING (term) CROSS JOIN n
QUALIFY rank <= {TFIDF_TOPK}
"""


def dataset_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pretraining sequence packing (concat-and-chunk): deterministic
    hash-sharding + per-shard token cumsum -> (seq_id, offset_in_seq) per
    document under 2048-token sequences. One shuffle; parallelism = shards
    (operators/packing.py has the 100 TB shape notes)."""
    from kafka_cdc_hudi_spark.operators.packing import pack_sequences

    return pack_sequences(
        load_table(spark, sf_dir, "documents"), seq_tokens=2048, n_shards=8
    )


DATASET_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|pack_v1'), 1, 15)) AS BIGINT) % 8 AS shard,
         CAST(len({_DK_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST(cum_before // 2048 AS BIGINT) AS seq_id,
       CAST(cum_before % 2048 AS BIGINT) AS offset_in_seq
FROM c
"""


#: packing constants shared by the assignment entry, the materializer,
#: and both oracles
_PACK_L, _PACK_SHARDS = 2048, 8


def dataset_pack_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing story COMPLETED: materialize the actual training
    sequences. ``dataset_pack_sequences`` assigns each doc a (shard,
    seq_id, offset); this entry splits straddling documents across their
    sequence boundaries and reassembles every sequence's token stream —
    emitting (shard, seq_id, n_docs, n_tokens, md5(sequence_text)). Every
    sequence except each shard's last is exactly L=2048 tokens (pinned in
    test_packing.py).

    Scale shape: the assignment's one shard shuffle, a doc_id join back to
    the token arrays, a bounded explode (a doc lands in
    ceil(n_tokens/L)+1 sequences at most), and one (shard, seq_id)
    reassembly shuffle. Token counts come from exact integer boundary
    arithmetic — never from re-tokenizing the assembled text."""
    from kafka_cdc_hudi_spark.operators.packing import pack_sequences

    L = _PACK_L
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", tokens("text").alias("toks"))
    asg = pack_sequences(docs, seq_tokens=L, n_shards=_PACK_SHARDS)
    j = asg.join(d, "doc_id").withColumn(
        "cum_before", F.col("seq_id") * L + F.col("offset_in_seq")
    )
    last_seq = floordiv_long(F.col("cum_before") + F.col("n_tokens") - 1, L)
    e = j.select(
        "shard",
        "cum_before",
        "n_tokens",
        "toks",
        F.explode(F.sequence(F.col("seq_id"), last_seq)).alias("seq"),
    )
    start_tok = F.greatest(
        F.lit(0).cast("long"), F.col("seq") * L - F.col("cum_before")
    )
    end_tok = F.least(F.col("n_tokens"), (F.col("seq") + 1) * L - F.col("cum_before"))
    pieces = e.select(
        "shard",
        F.col("seq").alias("seq_id"),
        "cum_before",
        (end_tok - start_tok).alias("piece_len"),
        F.array_join(
            F.slice("toks", (start_tok + 1).cast("int"), (end_tok - start_tok).cast("int")),
            " ",
        ).alias("piece"),
    )
    return pieces.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("piece_len").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("cum_before", "piece"))),
                    lambda x: x["piece"],
                ),
                " ",
            )
        ).alias("seq_hash"),
    )


DATASET_PACK_MATERIALIZE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|pack_v1'), 1, 15)) AS BIGINT) % {_PACK_SHARDS} AS shard,
         toks,
         CAST(len(toks) AS BIGINT) AS n_tokens
  FROM (SELECT doc_id, {_DK_TOKS} AS toks FROM documents)
),
c AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
),
e AS (
  SELECT shard, CAST(cum_before AS BIGINT) AS cum_before, n_tokens, toks,
         unnest(range(CAST(cum_before // {_PACK_L} AS BIGINT),
                      CAST((cum_before + n_tokens - 1) // {_PACK_L} + 1 AS BIGINT))) AS seq
  FROM c
),
p AS (
  SELECT shard, seq AS seq_id, cum_before,
         LEAST(n_tokens, (seq + 1) * {_PACK_L} - cum_before)
           - GREATEST(0, seq * {_PACK_L} - cum_before) AS piece_len,
         array_to_string(list_slice(toks,
             GREATEST(0, seq * {_PACK_L} - cum_before) + 1,
             LEAST(n_tokens, (seq + 1) * {_PACK_L} - cum_before)), ' ') AS piece
  FROM e
)
SELECT shard, seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(piece_len) AS BIGINT) AS n_tokens,
       md5(string_agg(piece, ' ' ORDER BY cum_before)) AS seq_hash
FROM p
GROUP BY shard, seq_id
"""


#: pipeline quality gate — ~25th percentile of the fixture's quality
#: distribution, so the filter drops a real slice at every SF without
#: emptying the corpus
PIPE_QUALITY_MIN = 0.35


def pipeline_pretraining_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP composition — a complete pretraining data pipeline in
    one lazy plan: quality-gate the corpus (heuristic score >=
    PIPE_QUALITY_MIN), drop near-duplicates (keep each MinHash-LSH
    cluster's canonical doc), then sequence-pack the survivors
    (concat-and-chunk, 2048-token sequences). Every stage is an
    independently-oracled operator; this entry proves they compose —
    the packing cumsum runs over exactly the filtered survivor set, so
    any drift in either upstream filter changes every downstream
    (seq_id, offset) and turns the hash red.

    Scale shape: the quality gate is a zero-shuffle projection fused into
    the scan; dedup survivors are cluster-count-sized (broadcast join);
    packing adds its one shard shuffle. Nothing here rescans the corpus
    more than the dedup family already does."""
    from kafka_cdc_hudi_spark.operators.graph import connected_components_star
    from kafka_cdc_hudi_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    quality_ids = text_quality_score(spark, sf_dir).filter(
        F.col("quality") >= PIPE_QUALITY_MIN
    ).select("doc_id")
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components_star(pairs, "doc_a", "doc_b")
    # survivors: docs that are their own cluster canonical (or unpaired)
    dropped = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = (
        d.join(quality_ids, "doc_id")
        .join(dropped, "doc_id", "left_anti")
        .select("doc_id", "text")
    )
    return pack_sequences(kept, seq_tokens=2048, n_shards=8)


PIPELINE_PRETRAINING_SQL = f"""
WITH RECURSIVE {_comp_ctes()},
q AS ({TEXT_QUALITY_SQL}),
dropped AS (SELECT node AS doc_id FROM comp WHERE node <> component),
kept AS (
  SELECT d.doc_id, d.text
  FROM documents d
  JOIN q USING (doc_id)
  WHERE q.quality >= {PIPE_QUALITY_MIN}
    AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
),
t AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|pack_v1'), 1, 15)) AS BIGINT) % 8 AS shard,
         CAST(len({_DK_TOKS}) AS BIGINT) AS n_tokens
  FROM kept
),
c AS (
  SELECT *,
         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT doc_id, shard, n_tokens,
       CAST(cum_before // 2048 AS BIGINT) AS seq_id,
       CAST(cum_before % 2048 AS BIGINT) AS offset_in_seq
FROM c
"""


# -- multimodal plumbing ------------------------------------------------------


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: treat text bytes as a stand-in blob,
    derive typed metadata (byte length, container format). The decode path
    itself is the Pandas-UDF stub in operators/multimodal.py."""
    from kafka_cdc_hudi_spark.operators.multimodal import documents_as_media

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        F.col("media_id").alias("doc_id"),
        F.md5(F.col("content")).alias("content_hash"),
        F.col("byte_len"),
        F.col("format"),
    )


MULTIMODAL_META_SQL = """
SELECT doc_id,
       md5(text) AS content_hash,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'png'
            WHEN octet_length(encode(text)) % 3 = 1 THEN 'jpeg'
            ELSE 'webp' END AS format
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many frame sampling through the real mapInPandas stage
    (Arrow-batched): one row per 256-byte window of each blob. The fake
    kernel's md5-per-window is SQL-expressible, so this Pandas-UDF path
    gets a FULL value oracle (the documents are ASCII, so VARCHAR substr
    == byte windows)."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_media,
        sample_frames,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, frame_bytes=256, fake=True)


MULTIMODAL_FRAME_SAMPLE_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, text,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT media_id,
       CAST(i AS INT) AS frame_idx,
       md5(substring(text, CAST(i * 256 + 1 AS BIGINT), 256)) AS frame_hash
FROM m, LATERAL unnest(generate_series(0, CAST(greatest(ceil(n / 256.0) - 1, 0) AS BIGINT))) AS t(i)
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage through mapInPandas (Arrow-batched binary in AND out).
    The fake kernel is a deterministic function of (bytes, target dims) —
    md5(content || "WxH") repeated to min(byte_len, W*H) bytes — which DuckDB
    reproduces exactly (unhex(md5(..)) repeated + substring), so even the
    opaque-binary payload column gets a FULL value oracle. The REAL
    decode->resample->re-encode path is oracled separately by the
    multimodal_resize_png_real entry (PNG round-trip; non-PNG inputs
    raise NotImplementedError there)."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_media,
        resize_images,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    resized = resize_images(media, 32, 32, fake=True)
    # expose the payload as lowercase hex: a bit-exact check of the binary
    # (hex is injective) in a type every value-hasher renders identically —
    # raw binary cells round-trip as bytearray/bytes/memoryview depending on
    # the collector, which is representation noise, not data difference
    return resized.select(
        "media_id", "width", "height", F.lower(F.hex("content")).alias("content_hex")
    )


MULTIMODAL_RESIZE_SQL = """
WITH m AS (
  -- documents are ASCII, so md5 over VARCHAR == md5 over the raw bytes
  -- (same equivalence MULTIMODAL_META_SQL relies on); the repeated md5 hex
  -- string IS the payload's lowercase hex (16-byte digest = 32 hex chars).
  -- coalesce mirrors the kernel's `c or b""` null handling: a NULL blob
  -- resizes to the empty payload, not NULL
  SELECT doc_id AS media_id, coalesce(text, '') AS text,
         least(octet_length(encode(coalesce(text, ''))), 32 * 32) AS n
  FROM documents
)
SELECT media_id,
       CAST(32 AS INT) AS width,
       CAST(32 AS INT) AS height,
       substring(repeat(md5(text || '32x32'), CAST(n // 16 + 1 AS BIGINT)), 1, CAST(2 * n AS BIGINT)) AS content_hex
FROM m
"""


def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end-to-end: synthesize genuine PNG blobs from
    document bytes (grayscale, doc-id-derived dims, scanline filters cycling
    0..4 incl. Paeth), then run the real-codec path of ``decode_images`` —
    the pure-stdlib PNG decoder (functions/png.py: CRC-checked chunk walk,
    zlib inflate, full unfilter). No ``fake=True`` anywhere in this entry.

    FULL value oracle: the fixture puts the first width*height text bytes in
    the pixels, so DuckDB predicts the decoder's output exactly —
    ``feature_hash`` is md5 of the substring (documents are ASCII, so
    VARCHAR substring == byte slice, same invariant the other multimodal
    oracles use). A decoder bug anywhere (CRC, inflate framing, any of the
    five filter reconstructions) changes the recovered pixels and turns the
    hash red.

    Scale shape: encode and decode are Arrow-batched mapInPandas stages over
    media_repartition-bounded partitions; per-row work is O(pixels)."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_images,
        documents_as_png,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_png(docs), avg_row_bytes=512)
    return decode_images(media)  # fake=False: the REAL codec


MULTIMODAL_DECODE_PNG_SQL = """
WITH m AS (
  -- dims mirror operators/multimodal.py::_png_fixture_dims; the >= 128
  -- filter guarantees the payload is exactly text[:w*h] (max w*h = 128)
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         3 + doc_id % 6 AS h,
         text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(1 AS INT) AS n_channels,
       md5(substring(text, 1, w * h)) AS feature_hash
FROM m
"""


def multimodal_decode_webp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WebP-lossless decode, end-to-end: synthesize genuine VP8L
    blobs from document bytes (gray samples = the first width*height text
    bytes; the encoder VARIANT cycles by doc_id across all nine
    bitstream shapes — flat prefix codes, LZ77 runs, color cache,
    subtract-green, predictor, color transform, palette incl. pixel
    bundling, neighbor distance codes, meta prefix code groups), then run the real-codec path of ``decode_images`` — the
    pure-stdlib VP8L decoder (functions/webp.py: LSB-first bitstream,
    canonical prefix codes in both simple and code-length-coded forms,
    backward references, color cache, inverse transforms). No
    ``fake=True`` anywhere in this entry.

    FULL value oracle: the decoded gray samples are exactly text[:w*h],
    so DuckDB predicts ``feature_hash`` as md5 of the substring — a
    decoder bug in ANY variant branch (bit order, canonical code
    construction, cache hashing, a transform inverse, palette deltas,
    bundling) changes the recovered pixels of some doc_id class and turns
    the hash red.

    Scale shape: encode and decode are Arrow-batched mapInPandas stages
    over media_repartition-bounded partitions; per-row work is O(pixels).
    (Born r12 — enters the driver rotation r13 per the standing
    born-after-freeze protocol.)"""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_images,
        documents_as_webp,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_webp(docs), avg_row_bytes=512)
    return decode_images(media)  # fake=False: the REAL codec


MULTIMODAL_DECODE_WEBP_SQL = """
WITH m AS (
  -- dims mirror operators/multimodal.py::_webp_fixture_dims; the >= 128
  -- filter guarantees the payload is exactly text[:w*h] (max w*h = 105)
  SELECT doc_id,
         5 + doc_id % 11 AS w,
         3 + doc_id % 5 AS h,
         text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(1 AS INT) AS n_channels,
       md5(substring(text, 1, w * h)) AS feature_hash
FROM m
"""


def multimodal_webp_anim_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-WebP decode, end-to-end: synthesize genuine VP8X +
    ANIM + ANMF containers whose frames are lossless VP8L bitstreams
    (gray samples = consecutive text-byte slices, per-frame variant
    cycling by doc_id), then walk the container and decode every frame —
    one row per frame with its pixel hash. This is the animated half of
    web-crawl WebP (the dominant animated format after GIF); the
    container layer (functions/webp.py::decode_webp_frames) is pinned at
    the byte level in tests/test_webp.py.

    FULL value oracle: frame f of doc d is exactly
    text[f*w*h : (f+1)*w*h], so DuckDB predicts every frame_hash as md5
    of the substring, plus the duration/dims formulas — a container-walk
    bug (offsets, 24-bit fields, subchunk alignment) or any VP8L decoder
    regression turns rows red.

    Scale shape: identical to the image/video kernels — Arrow-batched
    mapInPandas over media_repartition-bounded partitions; rows fan out
    n_frames per input."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_webp_anim_frames,
        documents_as_webp_anim,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_webp_anim(docs), avg_row_bytes=768)
    return decode_webp_anim_frames(media)


MULTIMODAL_WEBP_ANIM_FRAMES_SQL = """
WITH m AS (
  -- dims/frames mirror operators/multimodal.py::_webp_anim_fixture_dims;
  -- max n_frames*w*h = 120 <= the 128-byte filter
  SELECT doc_id,
         3 + doc_id % 4 AS w,
         3 + doc_id % 3 AS h,
         2 + doc_id % 3 AS nf,
         text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
),
f AS (
  SELECT doc_id, w, h, nf, text,
         CAST(unnest(range(0, nf)) AS INT) AS frame_idx
  FROM m
)
SELECT doc_id AS media_id,
       frame_idx,
       CAST(nf AS INT) AS n_frames,
       CAST(40 + 10 * frame_idx AS INT) AS duration_ms,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       md5(substring(text, 1 + frame_idx * w * h, w * h)) AS frame_hash
FROM f
"""


def corpus_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL web-crawl ingestion, end-to-end: synthesize genuine WARC/1.0
    containers (functions/warc.py — ISO 28500 record grammar, Common
    Crawl's one-gzip-member-per-record layout on even doc_ids, plain on
    odd, HTTP-response and raw-resource blocks alternating), then walk
    every container and emit one row per record with its headers and the
    md5 of the HTTP body. WARC is the dominant RAW INPUT of large-scale
    text-pipeline ingestion — this entry is the text-modality counterpart
    of the image/video decode stages.

    FULL value oracle: record r of doc d carries exactly
    text[r*32 : (r+1)*32] as its body, so DuckDB predicts every
    body_hash, URI, type, and content length (responses add the fixed
    45-byte HTTP wrapper) — a record-split bug, gzip-member bug, header
    parse bug, or HTTP-body offset bug turns rows red.

    Scale shape: Arrow-batched mapInPandas over media_repartition-bounded
    partitions; per-row work O(container bytes); rows fan out n_records
    per input."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_warc,
        extract_warc_records,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_warc(docs), avg_row_bytes=1024)
    return extract_warc_records(media)


CORPUS_WARC_EXTRACT_SQL = """
WITH m AS (
  -- record count/slices mirror operators/multimodal.py::documents_as_warc
  SELECT doc_id, 2 + doc_id % 3 AS nr, text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
),
r AS (
  SELECT doc_id, nr, text,
         CAST(unnest(range(0, nr)) AS INT) AS record_idx
  FROM m
)
SELECT doc_id AS media_id,
       record_idx,
       CAST(nr AS INT) AS n_records,
       CASE WHEN record_idx % 2 = 0 THEN 'response' ELSE 'resource' END AS warc_type,
       'http://corpus.example/' || doc_id || '/' || record_idx AS target_uri,
       CAST(32 + CASE WHEN record_idx % 2 = 0 THEN 45 ELSE 0 END AS INT)
         AS content_length,
       md5(substring(text, 1 + record_idx * 32, 32)) AS body_hash
FROM r
"""


def pipeline_warc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship crawl-to-corpus ingestion pipeline, composed end-to-end:
    WARC containers -> record walk + HTTP-body text extraction (the ONE
    Arrow stage) -> relational cleanup (whitespace normalize, lowercase)
    -> quality gate (non-empty after normalization) -> EXACT dedup on the
    normalized body (keep the first (media_id, record_idx) occurrence,
    count copies) -> per-survivor stats. This is the shape a 100-TB
    Common Crawl ingest takes: one decode pass, then pure codegen'd
    column work and a single hash-aggregate shuffle on the dedup key.

    FULL composed oracle: bodies are text-byte slices, so DuckDB rebuilds
    the identical corpus relationally and applies the same normalize +
    dedup algebra.

    100-TB shuffle shape (VERDICT r13 item 5): the dedup key on the wire
    is ``md5(norm)`` (16 bytes), NOT the normalized document text — one
    partial-aggregable hash aggregate (map-side combine halves the
    shuffle) carrying ``min(struct(media_id, record_idx))`` for the
    first-occurrence winner, instead of two windows partitioned by the
    full body string that would shuffle the corpus bytes as keys."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_warc,
        extract_warc_text,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_warc(docs), avg_row_bytes=1024)
    recs = extract_warc_text(media)
    norm = recs.select(
        "media_id",
        "record_idx",
        F.lower(F.trim(F.regexp_replace("body", r"\s+", " "))).alias("norm"),
    ).filter(F.length("norm") > 0)
    return (
        norm.select(
            F.md5("norm").alias("norm_hash"),
            F.length("norm").cast("long").alias("norm_len"),
            F.struct("media_id", "record_idx").alias("occ"),
        )
        .groupBy("norm_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("occ").alias("first_occ"),
            F.min("norm_len").alias("norm_len"),
        )
        .select(
            "norm_hash",
            "n_copies",
            F.col("first_occ.media_id").alias("first_media_id"),
            F.col("first_occ.record_idx").alias("first_record_idx"),
            "norm_len",
        )
    )


def corpus_warc_http_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-world HTTP wire framings through the WARC text extractor
    (born r14, VERDICT r13 item 3): record r of doc d carries the text
    slice as an HTTP response framed by (d+r)%4 — identity, chunked
    transfer coding (chunk extension + trailer), gzip content encoding,
    or a latin-1 charset body with a non-ASCII suffix. The extractor
    must de-chunk, decompress, and charset-decode back to the exact
    slice; the DuckDB oracle predicts every body hash from the framing
    formula, so a framing bug (chunk-size arithmetic, trailer handling,
    zlib wrapper choice, charset fallback) turns rows red.

    Scale shape: identical to corpus_warc_extract — one Arrow-batched
    mapInPandas stage over media_repartition-bounded partitions."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_warc_http,
        extract_warc_text,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_warc_http(docs), avg_row_bytes=1024)
    recs = extract_warc_text(media)
    return recs.select(
        "media_id",
        "record_idx",
        ((F.col("media_id") + F.col("record_idx")) % 4).cast("int").alias("framing"),
        F.md5(F.col("body").cast("binary")).alias("body_hash"),
        F.length("body").cast("long").alias("body_chars"),
    )


CORPUS_WARC_HTTP_DECODE_SQL = """
WITH m AS (
  SELECT doc_id, 2 + doc_id % 3 AS nr, text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
),
r AS (
  SELECT doc_id, text,
         CAST(unnest(range(0, nr)) AS INT) AS record_idx
  FROM m
),
b AS (
  SELECT doc_id, record_idx,
         (doc_id + record_idx) % 4 AS framing,
         substring(text, 1 + record_idx * 32, 32) AS slice
  FROM r
)
SELECT doc_id AS media_id,
       record_idx,
       CAST(framing AS INT) AS framing,
       md5(CASE WHEN framing = 3 THEN slice || chr(233) ELSE slice END)
         AS body_hash,
       CAST(length(slice) + CASE WHEN framing = 3 THEN 1 ELSE 0 END AS BIGINT)
         AS body_chars
FROM b
"""


def pipeline_warc_html_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship crawl pipeline v2 (born r14): WARC containers whose HTTP
    bodies are HTML PAGES behind real wire framings (identity/chunked/
    gzip cycling) -> one Arrow extraction stage -> codegen'd markup
    strip (head removal, tag strip, whitespace collapse) + title pull ->
    quality gate -> exact dedup keyed by md5 of the VISIBLE text, first
    occurrence carrying its title. This is the actual Common Crawl
    shape end-to-end: de-frame, de-markup, dedup — one decode pass, one
    16-byte-keyed hash shuffle.

    FULL composed oracle: pages are deterministic wrappers of text-byte
    slices, so DuckDB rebuilds the visible text relationally and applies
    the same strip + dedup algebra."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_warc_html,
        extract_warc_text,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_warc_html(docs), avg_row_bytes=1024)
    recs = extract_warc_text(media)
    stripped = recs.select(
        "media_id",
        "record_idx",
        F.regexp_extract("body", _HTML_TITLE_RE, 1).alias("title"),
        F.lower(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace("body", "<head>.*?</head>", " "),
                        _HTML_TAG_RE,
                        " ",
                    ),
                    _HTML_WS_RE,
                    " ",
                )
            )
        ).alias("norm"),
    ).filter(F.length("norm") > 0)
    return (
        stripped.select(
            F.md5("norm").alias("norm_hash"),
            F.length("norm").cast("long").alias("norm_len"),
            F.struct("media_id", "record_idx", "title").alias("occ"),
        )
        .groupBy("norm_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("occ").alias("first_occ"),
            F.min("norm_len").alias("norm_len"),
        )
        .select(
            "norm_hash",
            "n_copies",
            F.col("first_occ.media_id").alias("first_media_id"),
            F.col("first_occ.record_idx").alias("first_record_idx"),
            F.col("first_occ.title").alias("title"),
            "norm_len",
        )
    )


PIPELINE_WARC_HTML_CORPUS_SQL = r"""
WITH m AS (
  SELECT doc_id, 2 + doc_id % 3 AS nr, text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
),
r AS (
  SELECT doc_id AS media_id,
         CAST(unnest(range(0, nr)) AS INT) AS record_idx,
         text
  FROM m
),
vis AS (
  -- visible text after head-strip + tag-strip + collapse: the slice's
  -- own words followed by the link text 'l' (title lives in <head>)
  SELECT media_id, record_idx,
         'D ' || media_id || '/' || record_idx AS title,
         lower(trim(regexp_replace(
           ' ' || substring(text, 1 + record_idx * 32, 32) || ' l',
           '\s+', ' ', 'g'
         ))) AS norm
  FROM r
),
nonempty AS (SELECT * FROM vis WHERE length(norm) > 0),
ranked AS (
  SELECT media_id, record_idx, title, norm,
         row_number() OVER (
           PARTITION BY norm ORDER BY media_id, record_idx, title
         ) AS rn,
         count(*) OVER (PARTITION BY norm) AS n_copies
  FROM nonempty
)
SELECT md5(norm) AS norm_hash,
       CAST(n_copies AS BIGINT) AS n_copies,
       media_id AS first_media_id,
       record_idx AS first_record_idx,
       title,
       CAST(length(norm) AS BIGINT) AS norm_len
FROM ranked WHERE rn = 1
"""


def pipeline_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET output (born r14): extracted text written back as Common
    Crawl's WET format — one container per source WARC, a warcinfo
    record then conversion records with URI/refers-to headers — and
    re-read through the same WARC walker (WET IS WARC). The input side
    runs the full four-framing HTTP decode, so this entry drives
    extract -> de-frame -> WET encode -> container walk end-to-end.

    FULL value oracle: conversion bodies are the de-framed text slices
    and the warcinfo block is a fixed byte string, so DuckDB predicts
    every record's hash, type, URI, and length."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        corpus_to_wet,
        documents_as_warc_http,
        extract_warc_records,
        extract_warc_text,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_warc_http(docs), avg_row_bytes=1024)
    wet = corpus_to_wet(extract_warc_text(media))
    return extract_warc_records(wet).select(
        "media_id", "record_idx", "n_records", "warc_type",
        "target_uri", "content_length", "body_hash",
    )


PIPELINE_WET_ROUNDTRIP_SQL = r"""
WITH m AS (
  SELECT doc_id, 2 + doc_id % 3 AS nr, text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
),
conv AS (
  SELECT doc_id AS media_id,
         CAST(unnest(range(0, nr)) AS INT) AS record_idx,
         nr, text
  FROM m
),
bodies AS (
  SELECT media_id, record_idx, nr,
         substring(text, 1 + record_idx * 32, 32)
           || CASE WHEN (media_id + record_idx) % 4 = 3 THEN chr(233) ELSE '' END
           AS body
  FROM conv
)
SELECT media_id,
       CAST(record_idx + 1 AS INT) AS record_idx,
       CAST(nr + 1 AS INT) AS n_records,
       'conversion' AS warc_type,
       'http://corpus.example/' || media_id || '/' || record_idx AS target_uri,
       CAST(octet_length(encode(body)) AS INT) AS content_length,
       md5(body) AS body_hash
FROM bodies
UNION ALL
SELECT doc_id AS media_id,
       CAST(0 AS INT) AS record_idx,
       CAST(nr + 1 AS INT) AS n_records,
       'warcinfo' AS warc_type,
       CAST(NULL AS VARCHAR) AS target_uri,
       CAST(45 AS INT) AS content_length,
       md5('software: kafka-cdc-hudi-spark' || chr(13) || chr(10)
           || 'format: WET' || chr(13) || chr(10)) AS body_hash
FROM m
"""


def multimodal_webp_lossy_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossy-VP8 WebP metadata WITHOUT pixel decode (born r14, VERDICT
    r13 item 4): synthesize genuine RIFF/WEBP containers whose "VP8 "
    chunk carries the spec-exact RFC 6386 key-frame header, then recover
    codec/width/height/upscale/version/show_frame/partition-size from
    the 10 uncompressed header bytes. Real crawl WebP is dominated by
    lossy files; this converts them from a blind guard to typed
    metadata (the pixel decoder itself stays loudly guarded — see the
    webp.py scope note for exactly why).

    FULL value oracle: every header field is a doc_id formula."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_webp_lossy,
        extract_webp_meta,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_webp_lossy(docs), avg_row_bytes=256)
    return extract_webp_meta(media)


MULTIMODAL_WEBP_LOSSY_META_SQL = """
SELECT doc_id AS media_id,
       'vp8' AS codec,
       CAST(16 + doc_id % 33 AS INT) AS width,
       CAST(16 + doc_id % 17 AS INT) AS height,
       CAST(doc_id % 4 AS INT) AS width_scale,
       CAST((doc_id // 4) % 4 AS INT) AS height_scale,
       CAST(doc_id % 4 AS INT) AS version,
       CAST(1 AS INT) AS show_frame,
       CAST(24 + doc_id % 40 AS INT) AS first_partition_size
FROM documents
WHERE octet_length(encode(text)) >= 128
"""


PIPELINE_WARC_CORPUS_SQL = r"""
WITH m AS (
  SELECT doc_id, 2 + doc_id % 3 AS nr, text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
),
r AS (
  SELECT doc_id AS media_id,
         CAST(unnest(range(0, nr)) AS INT) AS record_idx,
         text
  FROM m
),
bodies AS (
  SELECT media_id, record_idx,
         lower(trim(regexp_replace(
           substring(text, 1 + record_idx * 32, 32), '\s+', ' ', 'g'
         ))) AS norm
  FROM r
),
nonempty AS (SELECT * FROM bodies WHERE length(norm) > 0),
ranked AS (
  SELECT media_id, record_idx, norm,
         row_number() OVER (PARTITION BY norm ORDER BY media_id, record_idx) AS rn,
         count(*) OVER (PARTITION BY norm) AS n_copies
  FROM nonempty
)
SELECT md5(norm) AS norm_hash,
       CAST(n_copies AS BIGINT) AS n_copies,
       media_id AS first_media_id,
       record_idx AS first_record_idx,
       CAST(length(norm) AS BIGINT) AS norm_len
FROM ranked WHERE rn = 1
"""


#: real-resize entry target dims (small on purpose: the oracle enumerates
#: the output grid in SQL)
_RESIZE_W, _RESIZE_H = 8, 6


def multimodal_resize_png_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize, end-to-end through the codec TWICE: synthesize genuine
    PNGs, resize through the real path (decode -> nearest-neighbor
    resample -> re-encode), then decode the RESIZED blobs and hash their
    pixels. No ``fake=True`` anywhere — a bug in either codec direction or
    in the resample turns the hash red.

    FULL value oracle: nearest-neighbor of the procedural fixture image is
    SQL-predictable — output pixel (yi, xi) is source byte
    ``((yi*h)//H)*w + (xi*w)//W``, so DuckDB rebuilds the resampled byte
    string and matches ``feature_hash`` exactly. Closes the last gap the
    round-5 audit flagged on the resize path (the fake-kernel entry
    remains as the other-formats plumbing check)."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_images,
        documents_as_png,
        media_repartition,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_png(docs), avg_row_bytes=512)
    resized = resize_images(media, _RESIZE_W, _RESIZE_H, fake=False)
    return decode_images(resized)


MULTIMODAL_RESIZE_PNG_REAL_SQL = f"""
WITH m AS (
  -- dims mirror operators/multimodal.py::_png_fixture_dims (same filter
  -- invariant as MULTIMODAL_DECODE_PNG_SQL: payload = text[:w*h])
  SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 6 AS h, text
  FROM documents WHERE octet_length(encode(text)) >= 128
),
g AS (
  SELECT doc_id, yi, xi,
         substring(text, ((yi * h) // {_RESIZE_H}) * w + ((xi * w) // {_RESIZE_W}) + 1, 1) AS c
  FROM m,
       LATERAL unnest(range(0, {_RESIZE_H})) ty(yi),
       LATERAL unnest(range(0, {_RESIZE_W})) tx(xi)
)
SELECT doc_id AS media_id,
       CAST({_RESIZE_W} AS INT) AS width,
       CAST({_RESIZE_H} AS INT) AS height,
       CAST(1 AS INT) AS n_channels,
       md5(string_agg(c, '' ORDER BY yi, xi)) AS feature_hash
FROM g
GROUP BY doc_id
"""


def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the second container format: synthesize
    genuine 8-bit palettized BMPs (bottom-up rows, 4-byte stride, grayscale
    palette) and decode through the pure-stdlib DIB codec
    (functions/bmp.py). Same oracle invariant as the PNG entry — pixels
    are the first width*height text bytes, so DuckDB predicts the decoded
    hash exactly; a bug in stride math, bottom-up flip, or palette resolve
    turns the row red. Dim formulas differ from PNG's so the two real
    codecs cannot mask each other."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_images,
        documents_as_bmp,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_bmp(docs), avg_row_bytes=1536)
    return decode_images(media)  # fake=False: the REAL codec


MULTIMODAL_DECODE_BMP_SQL = """
WITH m AS (
  -- dims mirror operators/multimodal.py::_bmp_fixture_dims
  SELECT doc_id,
         5 + doc_id % 11 AS w,
         2 + doc_id % 7 AS h,
         text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(1 AS INT) AS n_channels,
       md5(substring(text, 1, w * h)) AS feature_hash
FROM m
"""


def multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode with REAL entropy coding: synthesize genuine GIFs
    (grayscale global table, LZW image data) and decode through the full
    variable-width LZW decoder (functions/gif.py — 9..12-bit codes,
    LSB-first packing, clear/EOI, early-change width growth, cScSc). Same
    pixels-are-text-bytes oracle invariant as the PNG/BMP entries; a bug
    anywhere in the bit reader or dictionary reconstruction changes the
    recovered pixels and turns the hash red."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_images,
        documents_as_gif,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_gif(docs), avg_row_bytes=1024)
    return decode_images(media)  # fake=False: the REAL codec


MULTIMODAL_DECODE_GIF_SQL = """
WITH m AS (
  -- dims mirror operators/multimodal.py::_gif_fixture_dims
  SELECT doc_id,
         6 + doc_id % 9 AS w,
         2 + doc_id % 5 AS h,
         text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(1 AS INT) AS n_channels,
       md5(substring(text, 1, w * h)) AS feature_hash
FROM m
"""


def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the first TRANSFORM codec: synthesize
    genuine baseline JPEGs (8x8 DCT, Annex-K quantization, canonical
    Huffman entropy coding — functions/jpeg.py) and decode them back.
    Images are FLAT per-document values, which makes the lossy round-trip
    exactly predictable: only the DC coefficient survives, so the decoded
    value is an integer formula of the input (flat_decode_value) and the
    SQL oracle derives it independently, then maps it to the pixel-payload
    md5 through a static byte->digest lookup (DuckDB's md5 is
    VARCHAR-only, and bytes >= 0x80 don't round-trip through UTF-8).
    Gradient images (real AC coefficients, ZRL/EOB paths) are covered by
    round-trip bounds in tests/test_multimodal.py."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_images,
        documents_as_jpeg,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_jpeg(docs), avg_row_bytes=512)
    return decode_images(media)  # fake=False: the REAL codec


def _jpeg_oracle_sql() -> str:
    import hashlib

    from kafka_cdc_hudi_spark.operators.multimodal import (
        JPEG_FIXTURE_H,
        JPEG_FIXTURE_W,
    )

    n = JPEG_FIXTURE_W * JPEG_FIXTURE_H
    # static pure-function table: byte value -> md5 of that byte repeated
    # n times (no decode knowledge embedded; the decoded VALUE is derived
    # in SQL below)
    lut = ", ".join(
        f"({v}, '{hashlib.md5(bytes([v]) * n).hexdigest()}')" for v in range(256)
    )
    return f"""
WITH lut(px, digest) AS (VALUES {lut}),
m AS (
  -- flat value mirrors operators/multimodal.py::_jpeg_fixture_value
  SELECT doc_id, 96 + doc_id % 64 AS v FROM documents
),
dec AS (
  -- functions/jpeg.py::flat_decode_value: DC-only quantization round-trip
  SELECT doc_id,
         least(255, greatest(0, 128 + 2 * (
           CASE WHEN v >= 128 THEN (v - 128 + 1) // 2
                ELSE -((128 - v + 1) // 2) END))) AS out_px
  FROM m
)
SELECT doc_id AS media_id,
       CAST({JPEG_FIXTURE_W} AS INT) AS width,
       CAST({JPEG_FIXTURE_H} AS INT) AS height,
       CAST(1 AS INT) AS n_channels,
       digest AS feature_hash
FROM dec JOIN lut ON dec.out_px = lut.px
"""


MULTIMODAL_DECODE_JPEG_SQL = _jpeg_oracle_sql()


def multimodal_decode_jpeg_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 3-component COLOR JPEG decode (4:4:4 YCbCr, interleaved MCUs,
    dual quant tables — functions/jpeg.py). Flat per-document colors make
    the lossy pipeline exactly predictable per channel, and the entry
    returns per-channel min/max over the decoded samples: min == max
    proves every pixel survived the full color pipeline (RGB -> YCbCr ->
    DCT/quant/Huffman -> inverse -> RGB) identically, and the SQL oracle
    derives the expected triple independently — JFIF transform as
    bit-identical IEEE-double expressions, DC quantization as the
    flat_decode_value_q closed form. Gradient/AC color coverage:
    tests/test_multimodal.py + test_codec_fuzz.py."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_image_channel_stats,
        documents_as_jpeg_color,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_jpeg_color(docs), avg_row_bytes=768)
    return decode_image_channel_stats(media)


def _jpeg_color_oracle_sql() -> str:
    from kafka_cdc_hudi_spark.operators.multimodal import (
        JPEG_FIXTURE_H,
        JPEG_FIXTURE_W,
    )

    def flat_dec(v: str, q00: int) -> str:
        # functions/jpeg.py::flat_decode_value_q — exact integers
        return f"""least(255, greatest(0, (1024 + {q00} * (
          CASE WHEN {v} >= 128 THEN (16 * ({v} - 128) + {q00}) // {2 * q00}
               ELSE -((16 * (128 - {v}) + {q00}) // {2 * q00}) END) + 4) // 8))"""

    # all float constants cast to DOUBLE (DuckDB would otherwise parse
    # them as DECIMAL and do exact decimal arithmetic, diverging from the
    # codec's IEEE-double chain at half boundaries); parenthesization
    # mirrors Python's left-to-right evaluation in rgb_to_ycbcr /
    # ycbcr_to_rgb bit-for-bit
    return f"""
WITH rgb AS (
  -- mirrors operators/multimodal.py::_jpeg_color_fixture_rgb
  SELECT doc_id,
         (7 * doc_id) % 256 AS r,
         (13 * doc_id + 64) % 256 AS g,
         (29 * doc_id + 128) % 256 AS b
  FROM documents
),
ycc AS (
  -- functions/jpeg.py::rgb_to_ycbcr (floor(x + 0.5), clamped)
  SELECT doc_id,
    least(255, greatest(0, CAST(floor((((0.299::DOUBLE * r) + (0.587::DOUBLE * g)) + (0.114::DOUBLE * b)) + 0.5::DOUBLE) AS BIGINT))) AS y,
    least(255, greatest(0, CAST(floor((((128.0::DOUBLE - (0.168736::DOUBLE * r)) - (0.331264::DOUBLE * g)) + (0.5::DOUBLE * b)) + 0.5::DOUBLE) AS BIGINT))) AS cb,
    least(255, greatest(0, CAST(floor((((128.0::DOUBLE + (0.5::DOUBLE * r)) - (0.418688::DOUBLE * g)) - (0.081312::DOUBLE * b)) + 0.5::DOUBLE) AS BIGINT))) AS cr
  FROM rgb
),
dec AS (
  -- per-channel DC-only quantization round-trip (luma q00=16, chroma 17)
  SELECT doc_id,
         {flat_dec('y', 16)} AS yd,
         {flat_dec('cb', 17)} AS cbd,
         {flat_dec('cr', 17)} AS crd
  FROM ycc
),
out_rgb AS (
  -- functions/jpeg.py::ycbcr_to_rgb (floor(x + 0.5), clamped)
  SELECT doc_id,
    least(255, greatest(0, CAST(floor((yd + (1.402::DOUBLE * (crd - 128))) + 0.5::DOUBLE) AS BIGINT))) AS r_out,
    least(255, greatest(0, CAST(floor(((yd - (0.344136::DOUBLE * (cbd - 128))) - (0.714136::DOUBLE * (crd - 128))) + 0.5::DOUBLE) AS BIGINT))) AS g_out,
    least(255, greatest(0, CAST(floor((yd + (1.772::DOUBLE * (cbd - 128))) + 0.5::DOUBLE) AS BIGINT))) AS b_out
  FROM dec
)
SELECT doc_id AS media_id,
       CAST({JPEG_FIXTURE_W} AS INT) AS width,
       CAST({JPEG_FIXTURE_H} AS INT) AS height,
       CAST(3 AS INT) AS n_channels,
       CAST(r_out AS INT) AS c0_min, CAST(r_out AS INT) AS c0_max,
       CAST(g_out AS INT) AS c1_min, CAST(g_out AS INT) AS c1_max,
       CAST(b_out AS INT) AS c2_min, CAST(b_out AS INT) AS c2_max
FROM out_rgb
"""


MULTIMODAL_DECODE_JPEG_COLOR_SQL = _jpeg_color_oracle_sql()


def pipeline_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND flagship composition — image-text pair curation in one
    lazy plan: quality-gate the captions (text_quality_score >=
    PIPE_QUALITY_MIN), decode the paired images through the REAL PNG codec
    (dims + pixel hash), keep images that clear resolution/orientation
    gates (>= 24 px, landscape-or-square), and join to the training
    manifest a contrastive/caption model would consume. The token-per-
    pixel budget is exact BIGINT ppm. Any drift in the text gate, the
    codec, or the join turns the hash red — the stages are all
    independently oracled, this proves they compose.

    Scale shape: quality gate fuses into the scan; decode is the Arrow
    mapInPandas stage; ONE equi-join on doc_id."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_images,
        documents_as_png,
        media_repartition,
    )

    q = text_quality_score(spark, sf_dir).filter(
        F.col("quality") >= PIPE_QUALITY_MIN
    )
    docs = load_table(spark, sf_dir, "documents")
    feats = decode_images(media_repartition(documents_as_png(docs), avg_row_bytes=1536))
    good = feats.filter(
        (F.col("width") * F.col("height") >= 24) & (F.col("width") >= F.col("height"))
    )
    return (
        q.join(good, q.doc_id == good.media_id)
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            "width",
            "height",
            (F.col("width") * F.col("height")).alias("n_pixels"),
            F.expr("1000000 * n_tokens div (width * height)").alias(
                "tokens_per_pixel_ppm"
            ),
            "feature_hash",
        )
    )


PIPELINE_MULTIMODAL_SQL = f"""
WITH q AS ({TEXT_QUALITY_SQL}),
img AS (
  SELECT doc_id,
         CAST(4 + doc_id % 13 AS INT) AS width,
         CAST(3 + doc_id % 6 AS INT) AS height,
         md5(substring(text, 1, (4 + doc_id % 13) * (3 + doc_id % 6))) AS feature_hash
  FROM documents
  WHERE octet_length(encode(text)) >= 128
)
SELECT q.doc_id, q.n_tokens, q.quality, img.width, img.height,
       CAST(img.width * img.height AS INT) AS n_pixels,
       (1000000 * q.n_tokens) // (img.width * img.height) AS tokens_per_pixel_ppm,
       img.feature_hash
FROM q JOIN img USING (doc_id)
WHERE q.quality >= {PIPE_QUALITY_MIN}
  AND img.width * img.height >= 24 AND img.width >= img.height
"""


def multimodal_decode_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the offset-based IFD container:
    synthesize genuine single-strip grayscale TIFFs (functions/tiff.py)
    and decode them back. Same text-byte pixel invariant as PNG/BMP/GIF
    with a fourth distinct dim formula, so a bug in IFD tag walking or
    strip offset resolution turns the row red without any other codec
    masking it."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_images,
        documents_as_tiff,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_tiff(docs), avg_row_bytes=512)
    return decode_images(media)


MULTIMODAL_DECODE_TIFF_SQL = """
WITH m AS (
  -- dims mirror operators/multimodal.py::_tiff_fixture_dims
  SELECT doc_id,
         7 + doc_id % 7 AS w,
         3 + doc_id % 5 AS h,
         text
  FROM documents
  WHERE octet_length(encode(text)) >= 128
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(1 AS INT) AS n_channels,
       md5(substring(text, 1, w * h)) AS feature_hash
FROM m
"""


def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode: synthesize genuine MJPEG-in-AVI containers
    (functions/avi.py — RIFF chunk walk, single MJPG stream) whose frames
    are real baseline JPEGs, then extract + decode every frame to one row
    per frame. The per-(doc, frame) flat values make the lossy frame
    pipeline exactly SQL-predictable (same DC-only argument and byte->md5
    lookup as multimodal_decode_jpeg)."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_video_frames,
        documents_as_video,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_video(docs), avg_row_bytes=2048)
    return decode_video_frames(media)


def _video_oracle_sql() -> str:
    import hashlib

    from kafka_cdc_hudi_spark.operators.multimodal import (
        JPEG_FIXTURE_H,
        JPEG_FIXTURE_W,
    )

    n = JPEG_FIXTURE_W * JPEG_FIXTURE_H
    lut = ", ".join(
        f"({v}, '{hashlib.md5(bytes([v]) * n).hexdigest()}')" for v in range(256)
    )
    return f"""
WITH lut(px, digest) AS (VALUES {lut}),
m AS (
  -- frame count/value mirror operators/multimodal.py::_video_fixture_*
  SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS n_frames FROM documents
),
f AS (
  SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames)) AS INT) AS frame_idx
  FROM m
),
dec AS (
  SELECT doc_id, n_frames, frame_idx,
         96 + (doc_id + 17 * frame_idx) % 64 AS v
  FROM f
)
SELECT doc_id AS media_id, frame_idx, n_frames,
       CAST(10 AS INT) AS fps,
       CAST({JPEG_FIXTURE_W} AS INT) AS width,
       CAST({JPEG_FIXTURE_H} AS INT) AS height,
       digest AS frame_hash
FROM dec JOIN lut
  ON lut.px = least(255, greatest(0, 128 + 2 * (
       CASE WHEN v >= 128 THEN (v - 128 + 1) // 2
            ELSE -((128 - v + 1) // 2) END)))
"""


MULTIMODAL_VIDEO_FRAMES_SQL = _video_oracle_sql()


def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, end-to-end: synthesize genuine PCM16 RIFF/WAVE
    blobs from document bytes, then decode through the pure-stdlib WAV
    codec (functions/wav.py: chunk walk with unknown-chunk skip + padding,
    fmt validation, int16 unpack) and emit exact sample statistics. The
    integer stats (count/peak/sum-of-squares) are predicted by DuckDB from
    the fixture formulas; RMS = sqrt(sum_sq / n) matches bit-for-bit
    because int/int division and sqrt are IEEE correctly rounded in both
    engines. Audio counterpart of ``multimodal_decode_png`` — no fake
    kernel anywhere in this entry."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        decode_audio,
        documents_as_wav,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_wav(docs), avg_row_bytes=1024)
    return decode_audio(media)


MULTIMODAL_DECODE_WAV_SQL = """
WITH s AS (
  -- fixture formulas mirror operators/multimodal.py::documents_as_wav:
  -- sample i = (byte_i - 128) * 256 over the first 256 bytes (ASCII docs,
  -- so ascii(substring(..)) == the byte), rate = 8000 + doc_id%8 * 1000
  SELECT doc_id,
         CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
         (ascii(substring(text, CAST(i AS BIGINT), 1)) - 128) * 256 AS amp
  FROM documents,
       LATERAL unnest(generate_series(1, least(length(text), 256))) t(i)
)
SELECT doc_id AS media_id,
       sample_rate,
       CAST(1 AS INT) AS n_channels,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(MAX(abs(amp)) AS INT) AS peak_amp,
       CAST(SUM(amp * amp) AS BIGINT) AS sum_sq,
       sqrt(CAST(SUM(amp * amp) AS DOUBLE) / COUNT(*)) AS rms
FROM s
GROUP BY doc_id, sample_rate
"""


#: catalog-level silence threshold (mean-square amplitude), calibrated to
#: the synthetic fixture like DEDUP_COS_THRESHOLD: text-derived samples
#: centered at byte 100 have a LOUD floor (min window mean-square ~1.28e6,
#: median ~6e7 at sf0.001), so the operator's real-world default (1e6)
#: would never flag a window here — 5e7 flags the low-energy tail and
#: keeps the silent-branch algebra non-vacuous (pinned in
#: test_multimodal.py)
_AUD_SILENCE_MSQ = 50_000_000


def multimodal_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation over REAL PCM WAV decode: fixed 64-sample
    windows per clip with exact integer energy / peak / zero-crossing
    features and a silence flag — the silence-trimming and clip-splitting
    primitive of a speech-data pipeline. The fixture centers samples at
    byte value 100 so letter/space transitions actually cross zero (the
    default 128 centering keeps ASCII all-negative and would make the ZCR
    vacuous). One-to-many Arrow mapInPandas; every output column is exact
    integer arithmetic, so the DuckDB oracle reproduces the windows with
    a lag-window + group-by."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        audio_segment_features,
        documents_as_wav,
        media_repartition,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_wav(docs, center=100), avg_row_bytes=1024)
    return audio_segment_features(media, silence_msq=_AUD_SILENCE_MSQ)


MULTIMODAL_AUDIO_SEGMENTS_SQL = f"""
WITH s AS (
  -- fixture: operators/multimodal.py::documents_as_wav(center=100):
  -- sample i = (byte_i - 100) * 256 over the first 256 bytes
  SELECT doc_id,
         CAST(i AS BIGINT) AS i,
         (ascii(substring(text, CAST(i AS BIGINT), 1)) - 100) * 256 AS amp
  FROM documents,
       LATERAL unnest(generate_series(1, least(length(text), 256))) t(i)
),
p AS (
  SELECT doc_id, i, amp,
         (i - 1) // 64 AS seg,
         lag(amp) OVER (PARTITION BY doc_id ORDER BY i) AS prev_amp,
         ((i - 2) // 64 = (i - 1) // 64) AS same_seg
  FROM s
)
SELECT doc_id AS media_id,
       CAST(seg AS INT) AS seg_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(amp * amp) AS BIGINT) AS sum_sq,
       CAST(MAX(abs(amp)) AS INT) AS peak_amp,
       CAST(SUM(CASE WHEN same_seg AND prev_amp * amp < 0 THEN 1 ELSE 0 END) AS INT)
         AS zero_crossings,
       SUM(amp * amp) < COUNT(*) * {_AUD_SILENCE_MSQ} AS is_silence
FROM p
GROUP BY doc_id, seg
"""


def multimodal_video_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over REAL video decode: walk the MJPEG-AVI
    container, JPEG-decode every frame, and emit the exact sum of
    absolute pixel differences against the previous frame plus a cut flag
    — keyframe selection for a video training pipeline (one frame per
    scene beats a fixed stride). The flat per-(doc, frame) fixture values
    make every diff exactly predictable: the oracle derives each frame's
    decoded value with the DC-only closed form and lag-windows the
    differences."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_video,
        media_repartition,
        video_scene_cuts,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_video(docs), avg_row_bytes=2048)
    return video_scene_cuts(media)


MULTIMODAL_VIDEO_CUTS_SQL = """
WITH f AS (
  -- fixture: operators/multimodal.py::documents_as_video —
  -- n_frames = 2 + doc_id % 4, frame value = 96 + (doc_id + 17*i) % 64,
  -- flat 16x8 frames (128 px)
  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
         96 + (doc_id + 17 * i) % 64 AS v
  FROM documents,
       LATERAL unnest(generate_series(0, CAST(1 + doc_id % 4 AS BIGINT))) t(i)
),
dec AS (
  -- functions/jpeg.py::flat_decode_value (DC-only, q00 = 16)
  SELECT doc_id, frame_idx,
         least(255, greatest(0, 128 + 2 * (
           CASE WHEN v >= 128 THEN (v - 128 + 1) // 2
                ELSE -((128 - v + 1) // 2) END))) AS d
  FROM f
),
dd AS (
  SELECT doc_id, frame_idx, d,
         lag(d) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pd
  FROM dec
)
SELECT doc_id AS media_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(128 AS INT) AS n_pixels,
       CAST(CASE WHEN pd IS NULL THEN NULL
                 ELSE 128 * abs(d - pd) END AS BIGINT) AS sum_abs_diff,
       CASE WHEN pd IS NULL THEN NULL
            ELSE 128 * abs(d - pd) >= 128 * 8 END AS is_cut
FROM dd
"""


#: keyframe entry's cut threshold: the video fixture's per-pixel frame
#: diffs are ~16-18 (in-range +17 value step) or ~46-48 (mod-64 wrap), so
#: 30 selects ONLY wrap frames — both branches non-vacuous, unlike the
#: default 8 under which every fixture frame is a cut
KEYFRAME_CUT_MEAN_DIFF = 30


def multimodal_video_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe extraction END-TO-END in one plan (VERDICT r7 item 5):
    walk the MJPEG-AVI container, JPEG-decode frames, detect scene cuts,
    and materialize ONLY the selected frames' decoded-pixel hashes with a
    running scene ordinal — select + decode + hash in a single Arrow
    kernel (operators/multimodal.py:video_keyframes), so non-keyframe
    pixels never leave the stage. The flat fixture makes selection and
    hashes exactly SQL-predictable (DC-only decode + per-value md5 LUT)."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        documents_as_video,
        media_repartition,
        video_keyframes,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_repartition(documents_as_video(docs), avg_row_bytes=2048)
    return video_keyframes(media, cut_mean_diff=KEYFRAME_CUT_MEAN_DIFF)


def _video_keyframes_sql() -> str:
    import hashlib

    from kafka_cdc_hudi_spark.operators.multimodal import (
        JPEG_FIXTURE_H,
        JPEG_FIXTURE_W,
    )

    n = JPEG_FIXTURE_W * JPEG_FIXTURE_H
    lut = ", ".join(
        f"({v}, '{hashlib.md5(bytes([v]) * n).hexdigest()}')" for v in range(256)
    )
    return f"""
WITH lut(px, digest) AS (VALUES {lut}),
f AS (
  -- fixture: operators/multimodal.py::documents_as_video —
  -- n_frames = 2 + doc_id % 4, frame value = 96 + (doc_id + 17*i) % 64
  SELECT doc_id, CAST(2 + doc_id % 4 AS INT) AS n_frames,
         CAST(i AS BIGINT) AS frame_idx,
         96 + (doc_id + 17 * i) % 64 AS v
  FROM documents,
       LATERAL unnest(generate_series(0, CAST(1 + doc_id % 4 AS BIGINT))) t(i)
),
dec AS (
  -- functions/jpeg.py::flat_decode_value (DC-only, q00 = 16)
  SELECT doc_id, n_frames, frame_idx,
         least(255, greatest(0, 128 + 2 * (
           CASE WHEN v >= 128 THEN (v - 128 + 1) // 2
                ELSE -((128 - v + 1) // 2) END))) AS d
  FROM f
),
dd AS (
  SELECT doc_id, n_frames, frame_idx, d,
         lag(d) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pd
  FROM dec
),
kf AS (
  SELECT *, CAST({n} AS BIGINT) * abs(d - pd) AS sad
  FROM dd
  WHERE pd IS NULL OR {n} * abs(d - pd) >= {n} * {KEYFRAME_CUT_MEAN_DIFF}
)
SELECT doc_id AS media_id,
       CAST(frame_idx AS INT) AS frame_idx,
       n_frames,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) - 1
            AS INT) AS scene_idx,
       CAST(sad AS BIGINT) AS sum_abs_diff,
       digest AS frame_hash
FROM kf JOIN lut ON lut.px = d
"""


MULTIMODAL_VIDEO_KEYFRAMES_SQL = _video_keyframes_sql()


#: audio-pipeline voiced-fraction gate (ppm of samples in non-silent windows)
_AUD_VOICED_MIN_PPM = 250_000


def pipeline_audio_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The THIRD flagship composition — speech-corpus curation in one lazy
    plan: segment every clip through the REAL WAV decode
    (multimodal_audio_segments' stage), aggregate per-clip voiced/silent
    window stats, keep clips whose voiced fraction clears the gate, and
    join transcripts that clear the text-quality gate (the same
    PIPE_QUALITY_MIN the image manifest uses) into the training manifest
    an ASR/audio-LM pipeline would consume. All integer/exact algebra on
    top of independently-oracled stages — this entry proves they compose.

    Scale shape: quality gate fuses into the scan; segmentation is the
    Arrow mapInPandas stage; ONE groupBy(media_id) agg; ONE doc_id
    equi-join."""
    from kafka_cdc_hudi_spark.operators.multimodal import (
        audio_segment_features,
        documents_as_wav,
        media_repartition,
    )

    q = text_quality_score(spark, sf_dir).filter(
        F.col("quality") >= PIPE_QUALITY_MIN
    )
    docs = load_table(spark, sf_dir, "documents")
    segs = audio_segment_features(
        media_repartition(documents_as_wav(docs, center=100), avg_row_bytes=1024),
        silence_msq=_AUD_SILENCE_MSQ,
    )
    per_clip = segs.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum((~F.col("is_silence")).cast("long")).alias("n_voiced"),
        F.sum(
            F.when(~F.col("is_silence"), F.col("n_samples")).otherwise(F.lit(0))
        ).alias("voiced_samples"),
        F.sum("n_samples").alias("total_samples"),
        F.max("peak_amp").alias("peak_amp"),
    )
    kept = per_clip.withColumn(
        "voiced_ppm", F.expr("1000000 * voiced_samples div total_samples")
    ).filter(F.col("voiced_ppm") >= _AUD_VOICED_MIN_PPM)
    return q.join(kept, q.doc_id == kept.media_id).select(
        "doc_id",
        "n_tokens",
        "quality",
        "n_windows",
        "n_voiced",
        "voiced_samples",
        "voiced_ppm",
        "peak_amp",
    )


def _pipeline_audio_sql() -> str:
    # compose the independently-oracled fragments: quality CTE + the
    # segments derivation (MULTIMODAL_AUDIO_SEGMENTS_SQL) aggregated
    return f"""
WITH q AS ({TEXT_QUALITY_SQL}),
seg AS ({MULTIMODAL_AUDIO_SEGMENTS_SQL}),
clip AS (
  SELECT media_id,
         COUNT(*) AS n_windows,
         CAST(SUM(CASE WHEN is_silence THEN 0 ELSE 1 END) AS BIGINT) AS n_voiced,
         CAST(SUM(CASE WHEN is_silence THEN 0 ELSE n_samples END) AS BIGINT) AS voiced_samples,
         CAST(SUM(n_samples) AS BIGINT) AS total_samples,
         CAST(MAX(peak_amp) AS INT) AS peak_amp
  FROM seg GROUP BY media_id
)
SELECT q.doc_id, q.n_tokens, q.quality,
       CAST(clip.n_windows AS BIGINT) AS n_windows,
       clip.n_voiced, clip.voiced_samples,
       (1000000 * clip.voiced_samples) // clip.total_samples AS voiced_ppm,
       clip.peak_amp
FROM q JOIN clip ON q.doc_id = clip.media_id
WHERE q.quality >= {PIPE_QUALITY_MIN}
  AND (1000000 * clip.voiced_samples) // clip.total_samples >= {_AUD_VOICED_MIN_PPM}
"""


PIPELINE_AUDIO_SQL = _pipeline_audio_sql()


#: max docs kept per language by the quota sampler
QUOTA_PER_GROUP = 100
QUOTA_SALT = "quota_v1"


def dataset_quota_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-capped sampling: keep at most QUOTA_PER_GROUP docs per
    language, chosen by deterministic salted-md5 order (not arrival order,
    which is partition-layout-dependent). Complements the rate-based
    stratified sampler: rates bound the FRACTION, quotas bound the COUNT —
    the 'at most N examples per domain/source' rule of corpus mixing.

    Scale shape: one shuffle on the group key + row_number, and
    WindowGroupLimit prunes every input partition to its local top-N
    before the exchange — so a dominant group (80% of a web corpus in one
    language) moves at most N rows per upstream partition, not its whole
    slice."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f"|{QUOTA_SALT}")))
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", key.alias("pick_key"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= QUOTA_PER_GROUP)
        .select("doc_id", "lang", F.col("rank"))
    )


DATASET_QUOTA_SQL = f"""
SELECT doc_id, lang,
       CAST(row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|{QUOTA_SALT}'), doc_id
       ) AS INT) AS rank
FROM documents
QUALIFY rank <= {QUOTA_PER_GROUP}
"""


#: corpus document-frequency at or below which a term counts as "rare"
RARE_DF_MAX = 2


def text_rare_token_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-aware quality signal: the fraction of each document's tokens
    whose corpus document-frequency is <= RARE_DF_MAX — high fractions
    flag gibberish/OCR noise/boilerplate-free outliers (the cheap stand-in
    for LM-perplexity filtering, computable without a model). All counts
    are integers and the fraction is a single int/int division, so the
    doubles are bit-identical across engines (no log/exp).

    Plan: same two-agg + join-back family as tf-idf — (doc, term) counts
    with map-side partials, term document-frequencies from those counts,
    join back (AQE broadcasts the term dictionary when small), one final
    per-doc agg."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    rare_tf = F.when(F.col("df") <= RARE_DF_MAX, F.col("tf")).otherwise(F.lit(0))
    return (
        tf.join(dfreq, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(rare_tf).alias("n_rare_tokens"),
        )
        .withColumn(
            "rare_fraction",
            F.col("n_rare_tokens").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


TEXT_RARE_TOKEN_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_DK_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
SELECT doc_id,
       CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN df <= {RARE_DF_MAX} THEN tf ELSE 0 END) AS BIGINT) AS n_rare_tokens,
       CAST(SUM(CASE WHEN df <= {RARE_DF_MAX} THEN tf ELSE 0 END) AS DOUBLE)
         / CAST(SUM(tf) AS DOUBLE) AS rare_fraction
FROM tf JOIN dfreq USING (term)
GROUP BY doc_id
"""


# -- chunking / sub-document dedup / markup ingest ----------------------------

#: token-window chunking: CHUNK_SIZE tokens per chunk, starts CHUNK_STRIDE
#: apart -> CHUNK_SIZE - CHUNK_STRIDE tokens of overlap between neighbors
#: (the RAG/pretraining chunker; the windowed complement of
#: dataset_pack_sequences, which concatenates instead of splitting)
CHUNK_SIZE, CHUNK_STRIDE = 32, 24


def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token windows: chunk ``i``
    covers tokens ``[i*stride, i*stride + size)``; the last window is the
    first one that reaches the end of the document (short tail kept).

    Scale shape: tokenize + ``sequence``/``explode`` + ``slice`` — a pure
    codegen'd generate with ZERO shuffle; output rows ~= corpus_tokens /
    stride regardless of document skew, and chunking parallelism is scan
    parallelism. ``floordiv_long`` keeps the chunk-count math exact past
    2^53 (pathological but free to guard)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("long")
    extra = floordiv_long(
        n - CHUNK_SIZE + (CHUNK_STRIDE - 1), CHUNK_STRIDE
    )  # = ceil((n - size) / stride) for n > size
    n_chunks = F.when(n <= CHUNK_SIZE, F.lit(1).cast("long")).otherwise(1 + extra)
    base = d.select("doc_id", toks.alias("toks"), n_chunks.alias("n_chunks"))
    c = base.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)
        ).alias("chunk_id"),
        "toks",
    )
    chunk_toks = F.slice(
        F.col("toks"), (F.col("chunk_id") * CHUNK_STRIDE + 1).cast("int"), CHUNK_SIZE
    )
    return c.select(
        "doc_id",
        "chunk_id",
        F.array_join(chunk_toks, " ").alias("chunk_text"),
        F.size(chunk_toks).cast("long").alias("n_tokens"),
    )


TEXT_CHUNK_OVERLAP_SQL = f"""
WITH d AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, toks,
             CASE WHEN len(toks) <= {CHUNK_SIZE} THEN 1
                  ELSE 1 + (len(toks) - {CHUNK_SIZE} + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}
             END AS n_chunks
      FROM d),
c AS (SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, toks FROM t)
SELECT doc_id, chunk_id,
       array_to_string(list_slice(toks, chunk_id * {CHUNK_STRIDE} + 1,
                                  chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' ') AS chunk_text,
       CAST(len(list_slice(toks, chunk_id * {CHUNK_STRIDE} + 1,
                           chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE})) AS BIGINT) AS n_tokens
FROM c
"""


#: sub-document dedup granularity: LINE_TOKENS-token segments ("lines" of
#: the newline-free fixture). 4 tokens over the small fixture vocabulary
#: collides across documents at every SF (same calibration argument as
#: _DECON_N); real corpora would segment on '\n'
LINE_TOKENS = 4


def dedup_lines_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style sub-document deduplication: segment every document into
    LINE_TOKENS-token lines, keep only the corpus-wide FIRST occurrence of
    each distinct line (ordered by doc_id, line position), then reconstruct
    each document from its surviving lines in original order. Documents
    whose lines all lost vanish entirely — exactly C4's semantics.

    Scale shape: one shuffle on line content for first-occurrence-wins
    (``row_number`` rank-1 filter -> WindowGroupLimit prunes each input
    partition to one candidate per line before the exchange, so a
    boilerplate line repeated a billion times moves once per upstream
    partition, not a billion rows), then one shuffle on doc_id to
    reassemble. No join-back: the winner filter and the reassembly read the
    same exploded stream."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks).cast("long")
    n_lines = floordiv_long(n + (LINE_TOKENS - 1), LINE_TOKENS)  # ceil(n / LINE)
    base = d.select("doc_id", toks.alias("toks"), n_lines.alias("n_lines"))
    lines = base.select(
        "doc_id",
        "n_lines",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_lines") - 1)
        ).alias("line_no"),
        "toks",
    ).select(
        "doc_id",
        "n_lines",
        "line_no",
        F.array_join(
            F.slice(
                F.col("toks"),
                (F.col("line_no") * LINE_TOKENS + 1).cast("int"),
                LINE_TOKENS,
            ),
            " ",
        ).alias("line_text"),
    )
    w = Window.partitionBy("line_text").orderBy("doc_id", "line_no")
    kept = lines.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("kept_lines"),
        F.first("n_lines").alias("total_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line_text"))),
                lambda x: x["line_text"],
            ),
            " ",
        ).alias("text_dedup"),
    )


DEDUP_LINES_SQL = f"""
WITH d AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
t AS (SELECT doc_id, toks, (len(toks) + {LINE_TOKENS - 1}) // {LINE_TOKENS} AS n_lines FROM d),
l AS (SELECT doc_id, n_lines, unnest(range(0, n_lines)) AS line_no, toks FROM t),
lines AS (SELECT doc_id, n_lines, line_no,
                 array_to_string(list_slice(toks, line_no * {LINE_TOKENS} + 1,
                                            line_no * {LINE_TOKENS} + {LINE_TOKENS}), ' ') AS line_text
          FROM l),
kept AS (SELECT * FROM lines
         QUALIFY row_number() OVER (PARTITION BY line_text ORDER BY doc_id, line_no) = 1)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS kept_lines,
       any_value(n_lines) AS total_lines,
       string_agg(line_text, ' ' ORDER BY line_no) AS text_dedup
FROM kept
GROUP BY doc_id
"""


_HTML_TAG_RE = "<[^>]+>"
_HTML_WS_RE = r"\s+"
_HTML_HREF_RE = 'href="[^"]*"'
_HTML_TITLE_RE = "<title>([^<]*)</title>"


def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markup-ingest pass: strip HTML tags to plain text, pull the
    ``<title>``, and count tags/links — the web-crawl -> training-text
    extraction step. The fixture corpus is plain text, so deterministic
    markup is injected first (same pattern as ``text_pii_scrub``'s PII
    injection): the wrapper varies per doc_id (title, per-doc href, an
    extra link on even ids) so every output column is value-bearing.

    Pure codegen'd regexp projection, zero shuffle — scan parallelism is
    the only knob at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    aug = F.concat(
        F.lit("<html><head><title>Doc "),
        sid,
        F.lit("</title></head><body><p>"),
        F.col("text"),
        F.lit('</p><a href="https://example.com/d/'),
        sid,
        F.lit('">ref</a>'),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit('<a href="https://example.com/even">even</a>'),
        ).otherwise(F.lit("")),
        F.lit('<br/><div class="footer">end</div></body></html>'),
    )
    d = d.select("doc_id", aug.alias("aug"))
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), _HTML_TAG_RE, " "), _HTML_WS_RE, " "
        )
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_extract("aug", _HTML_TITLE_RE, 1).alias("title"),
        F.size(F.regexp_extract_all("aug", F.lit(_HTML_TAG_RE), F.lit(0))).alias(
            "n_tags"
        ),
        F.size(F.regexp_extract_all("aug", F.lit(_HTML_HREF_RE), F.lit(0))).alias(
            "n_links"
        ),
    )


TEXT_HTML_STRIP_SQL = f"""
WITH a AS (
  SELECT doc_id,
         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || '</title></head><body><p>' || text
         || '</p><a href="https://example.com/d/' || CAST(doc_id AS VARCHAR) || '">ref</a>'
         || CASE WHEN doc_id % 2 = 0
                 THEN '<a href="https://example.com/even">even</a>' ELSE '' END
         || '<br/><div class="footer">end</div></body></html>' AS aug
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(regexp_replace(aug, '{_HTML_TAG_RE}', ' ', 'g'),
                           '{_HTML_WS_RE}', ' ', 'g')) AS clean_text,
       regexp_extract(aug, '{_HTML_TITLE_RE}', 1) AS title,
       CAST(len(regexp_extract_all(aug, '{_HTML_TAG_RE}')) AS INT) AS n_tags,
       CAST(len(regexp_extract_all(aug, '{_HTML_HREF_RE}')) AS INT) AS n_links
FROM a
"""


# -- corpus-statistics passes (cross-doc n-gram novelty, bigram LM scoring,
#    batch assembly, mixture reweighting). Determinism contract: every
#    probability/ratio lives in exact BIGINT ppm arithmetic (`a * 1000000
#    div b` — Spark `div` and DuckDB `//` agree bit-for-bit on positive
#    longs); at most ONE final double division per row. ----------------------

_NOVELTY_N = 3


def text_trigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document n-gram novelty: per document, the fraction of its
    DISTINCT trigrams whose first corpus occurrence (min doc_id) is this
    document — the incremental-crawl content-overlap signal (score a new
    snapshot against everything already ingested). Plan: distinct
    (trigram, doc) pairs shuffle once on trigram for the min-doc agg; the
    join back reuses that key; the per-doc rollup is integer-exact with
    one final double division."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    toks = d.select("doc_id", tokens("text").alias("toks"))
    tri = toks.select(
        "doc_id", F.explode(_ngrams_expr("toks", _NOVELTY_N)).alias("tri")
    ).distinct()
    first = tri.groupBy("tri").agg(F.min("doc_id").alias("first_doc"))
    return (
        tri.join(first, "tri")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_trigrams").cast("double"),
        )
    )


TEXT_TRIGRAM_NOVELTY_SQL = f"""
WITH toks AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
tri AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) >= {_NOVELTY_N} THEN
      list_transform(range(1, len(toks) - {_NOVELTY_N - 2}),
                     i -> array_to_string(list_slice(toks, i, i + {_NOVELTY_N - 1}), ' '))
    ELSE [] END) AS tri
  FROM toks),
first AS (SELECT tri, MIN(doc_id) AS first_doc FROM tri GROUP BY 1)
SELECT doc_id, COUNT(*) AS n_trigrams,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS novelty
FROM tri JOIN first USING (tri)
GROUP BY doc_id
"""


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model scoring: each document's mean
    conditional bigram probability p(w2|w1) under the corpus MLE — the
    classic cheap fluency/perplexity proxy used to filter machine-generated
    or boilerplate text. Probabilities are exact BIGINT ppm
    (1e6*count(w1 w2) div count(w1 ·)), so the whole query is integer
    arithmetic and hash-stable. Plan: per-doc bigram multiplicities first
    (shrinks everything downstream to distinct bigram types), then the
    type-level count join; two count aggs + two equi-joins, no window."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    toks = d.select("doc_id", tokens("text").alias("toks"))
    big = toks.select("doc_id", F.explode(_ngrams_expr("toks", 2)).alias("bg"))
    doc_bg = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("n_occ"))
    bg_counts = doc_bg.groupBy("bg").agg(F.sum("n_occ").alias("bc"))
    pc = (
        bg_counts.select(F.substring_index("bg", " ", 1).alias("w1"), "bc")
        .groupBy("w1")
        .agg(F.sum("bc").alias("pc_n"))
    )
    typ = (
        bg_counts.withColumn("w1", F.substring_index("bg", " ", 1))
        .join(pc, "w1")
        .select("bg", F.expr("1000000 * bc div pc_n").alias("p_ppm"))
    )
    return (
        doc_bg.join(typ, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").alias("n_bigrams"),
            F.expr("sum(n_occ * p_ppm) div sum(n_occ)").alias("lm_score_ppm"),
        )
    )


TEXT_LM_SCORE_SQL = f"""
WITH toks AS (SELECT doc_id, {_DK_TOKS} AS toks FROM documents),
big AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 2 THEN
      list_transform(range(1, len(toks)),
                     i -> array_to_string(list_slice(toks, i, i + 1), ' '))
    ELSE [] END) AS bg
  FROM toks),
doc_bg AS (SELECT doc_id, bg, COUNT(*) AS n_occ FROM big GROUP BY 1, 2),
bg_counts AS (SELECT bg, CAST(SUM(n_occ) AS BIGINT) AS bc FROM doc_bg GROUP BY 1),
pc AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(bc) AS BIGINT) AS pc_n
       FROM bg_counts GROUP BY 1),
typ AS (
  SELECT bg, (1000000 * bc) // pc_n AS p_ppm
  FROM bg_counts JOIN pc ON split_part(bg, ' ', 1) = pc.w1)
SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS n_bigrams,
       CAST(SUM(n_occ * p_ppm) AS BIGINT) // CAST(SUM(n_occ) AS BIGINT) AS lm_score_ppm
FROM doc_bg JOIN typ USING (bg)
GROUP BY doc_id
"""

#: length-bucket granularity (tokens) and per-batch token budget
_LB_BUCKET_TOKENS = 64
_LB_BATCH_TOKENS = 4096


def dataset_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch assembly: group documents into similar-length
    buckets, then pack each bucket into fixed token-budget batches by
    running offset — the padding-minimizing batching strategy for
    variable-length training. Deterministic (ordered by doc_id within
    bucket), all-integer. Plan: one projection for the counts, one shuffle
    on len_bucket, one window cumsum per bucket; batch ids derive from the
    running start offset so a batch never splits mid-document."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens("text")).cast("long")
    base = d.select("doc_id", n_tokens.alias("n_tokens")).withColumn(
        "len_bucket", F.expr(f"n_tokens div {_LB_BUCKET_TOKENS}")
    )
    w = Window.partitionBy("len_bucket").orderBy("doc_id")
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        "doc_id",
        "n_tokens",
        "len_bucket",
        start.alias("start_offset"),
        F.expr(
            f"(sum(n_tokens) OVER (PARTITION BY len_bucket ORDER BY doc_id)"
            f" - n_tokens) div {_LB_BATCH_TOKENS}"
        ).alias("batch_id"),
    )


DATASET_LENGTH_BUCKETS_SQL = f"""
WITH base AS (
  SELECT doc_id, CAST(len({_DK_TOKS}) AS BIGINT) AS n_tokens,
         CAST(len({_DK_TOKS}) AS BIGINT) // {_LB_BUCKET_TOKENS} AS len_bucket
  FROM documents)
SELECT doc_id, n_tokens, len_bucket,
       CAST(SUM(n_tokens) OVER (PARTITION BY len_bucket ORDER BY doc_id)
            - n_tokens AS BIGINT) AS start_offset,
       CAST((SUM(n_tokens) OVER (PARTITION BY len_bucket ORDER BY doc_id)
            - n_tokens) // {_LB_BATCH_TOKENS} AS BIGINT) AS batch_id
FROM base
"""


def dataset_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture reweighting: per (source, lang) group, the token share
    of the corpus and the sampling multiplier that would equalize shares
    (uniform target) — the knob a pretraining pipeline turns to up/down-
    weight sources. Exact BIGINT ppm arithmetic throughout. Plan: one
    group agg; the corpus totals are a 1-row aggregate broadcast back."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(tokens("text")).cast("long")
    per_group = (
        d.select("source", "lang", n_tokens.alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("group_tokens"),
        )
    )
    totals = per_group.agg(
        F.sum("group_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    return (
        per_group.join(F.broadcast(totals))
        .select(
            "source",
            "lang",
            "n_docs",
            "group_tokens",
            F.expr("1000000 * group_tokens div total_tokens").alias("share_ppm"),
            # share_ppm is 0 for any group below 1 ppm of corpus tokens on a
            # skewed corpus; Spark `div` would yield NULL while DuckDB `//`
            # raises — clamp the divisor to 1 ppm in BOTH dialects (caps the
            # upweight multiplier at 1e6/n_groups, the sane ceiling anyway)
            F.expr(
                "(1000000 div n_groups) * 1000000 div "
                "greatest(1L, 1000000 * group_tokens div total_tokens)"
            ).alias("weight_ppm"),
        )
    )


DATASET_MIXTURE_WEIGHTS_SQL = f"""
WITH per_group AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(len({_DK_TOKS})) AS BIGINT) AS group_tokens
  FROM documents GROUP BY 1, 2),
totals AS (SELECT CAST(SUM(group_tokens) AS BIGINT) AS total_tokens,
                  COUNT(*) AS n_groups FROM per_group)
SELECT source, lang, n_docs, group_tokens,
       (1000000 * group_tokens) // total_tokens AS share_ppm,
       ((1000000 // n_groups) * 1000000)
         // GREATEST(1, (1000000 * group_tokens) // total_tokens) AS weight_ppm
FROM per_group, totals
"""


#: GPT-2-style pre-tokenizer: contraction suffixes, space-prefixed letter
#: runs, space-prefixed digit runs, space-prefixed punctuation runs,
#: whitespace runs. ASCII-only so Java regex (Spark) and RE2 (DuckDB)
#: agree token-for-token.
_BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"


def text_bpe_pretokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE pre-tokenization accounting: token counts under the GPT-2-style
    pre-tokenizer split (the unit an LLM's BPE merges actually operate on,
    vs the whitespace tokenizer the quota/cost passes use). Zero-shuffle
    codegen'd regexp projection; exact integers + one final division."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PRETOKEN_RE), 0)
    n = F.size(toks).cast("long")
    n_words = F.size(F.filter(toks, lambda t: F.trim(t) != "")).cast("long")
    return d.select(
        "doc_id",
        n.alias("n_pretokens"),
        n_words.alias("n_word_pretokens"),
        (F.length("text").cast("double") / n.cast("double")).alias("chars_per_pretoken"),
    )


TEXT_BPE_PRETOKENIZE_SQL = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_PRETOKEN_RE.replace("'", "''")}')) AS BIGINT)
         AS n_pretokens,
       CAST(len(list_filter(regexp_extract_all(text, '{_BPE_PRETOKEN_RE.replace("'", "''")}'),
                            t -> trim(t) <> '')) AS BIGINT) AS n_word_pretokens,
       CAST(length(text) AS DOUBLE)
         / len(regexp_extract_all(text, '{_BPE_PRETOKEN_RE.replace("'", "''")}'))
         AS chars_per_pretoken
FROM documents
"""

#: BPE pair-count top-K (the merge-candidate shortlist size)
_BPE_PAIR_TOPK = 50


def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer TRAINING primitive: the first BPE merge step — corpus
    counts of adjacent symbol pairs (initial symbols = characters) inside
    GPT-2-style pre-tokens, ranked to the top-{K} merge candidates.

    Scale shape is the standard BPE-training trick: pre-tokens are first
    collapsed to a DISTINCT vocabulary with corpus frequencies (one
    explode + one agg whose cardinality is vocabulary-bounded, not
    corpus-bounded), and the quadratic-ish bigram explode runs over that
    small vocabulary only, weighted by frequency. At 100 TB the heavy
    stage is the vocabulary count — a plain token-stats agg — while pair
    counting stays proportional to |vocab| * avg_len. Deterministic total
    order (count DESC, pair ASC) makes the top-K exactly oracle-able."""
    d = load_table(spark, sf_dir, "documents")
    pt = d.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_PRETOKEN_RE), 0)
        ).alias("pt")
    ).filter(F.trim("pt") != "")
    vocab = pt.groupBy("pt").agg(F.count(F.lit(1)).alias("w"))
    pairs = vocab.filter(F.length("pt") >= 2).select(
        "w",
        F.explode(
            F.expr("transform(sequence(1, length(pt) - 1), i -> substring(pt, i, 2))")
        ).alias("pair"),
    )
    counted = pairs.groupBy("pair").agg(F.sum("w").alias("pair_count"))
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair").asc())
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BPE_PAIR_TOPK)
        .select("rank", "pair", "pair_count")
    )


text_bpe_pair_counts.__doc__ = text_bpe_pair_counts.__doc__.format(K=_BPE_PAIR_TOPK)

TEXT_BPE_PAIR_COUNTS_SQL = f"""
WITH pt AS (
  SELECT t.pt FROM documents,
       LATERAL unnest(regexp_extract_all(text, '{_BPE_PRETOKEN_RE.replace("'", "''")}')) t(pt)
  WHERE trim(t.pt) <> ''
),
vocab AS (SELECT pt, COUNT(*) AS w FROM pt GROUP BY pt),
pairs AS (
  SELECT substring(pt, CAST(i AS BIGINT), 2) AS pair, w
  FROM vocab, LATERAL unnest(generate_series(1, length(pt) - 1)) g(i)
  WHERE length(pt) >= 2
),
counted AS (SELECT pair, CAST(SUM(w) AS BIGINT) AS pair_count FROM pairs GROUP BY pair)
SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair ASC) AS INT) AS rank,
       pair, pair_count
FROM counted
ORDER BY rank
LIMIT {_BPE_PAIR_TOPK}
"""


#: BPE training bounds: frequency-truncated vocabulary (the standard
#: practice — the merge loop runs on the word-count table, never the raw
#: corpus) and number of merge rules learned
_BPE_TRAIN_VOCAB, _BPE_TRAIN_MERGES = 4096, 8


#: session cache of the trained BPE artifact per dataset: (app_id, sf_dir)
#: -> (vocab rows [(pt, w)], merge rules). Both the train and encode
#: entries consume it; the distributed vocabulary count runs once.
_BPE_CACHE: dict = {}


def _bpe_vocab_and_merges(spark: SparkSession, sf_dir: str):
    """Distributed part of BPE training — pre-tokenize, count, truncate to
    the top-4096 pre-tokens by (count DESC, token ASC) — then the
    deterministic merge loop (functions/bpe.py) driver-side on that
    bounded table, exactly like the trained-IVF entry's kmeans. The
    collect is hard-bounded at _BPE_TRAIN_VOCAB rows."""
    from kafka_cdc_hudi_spark.functions.bpe import bpe_train_merges

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BPE_CACHE:
        d = load_table(spark, sf_dir, "documents")
        pt = d.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(_BPE_PRETOKEN_RE), 0)
            ).alias("pt")
        ).filter(F.trim("pt") != "")
        vocab = [
            (r["pt"], r["w"])
            for r in pt.groupBy("pt")
            .agg(F.count(F.lit(1)).alias("w"))
            .orderBy(F.col("w").desc(), F.col("pt").asc())
            .limit(_BPE_TRAIN_VOCAB)
            .collect()
        ]
        _BPE_CACHE[key] = (vocab, bpe_train_merges(vocab, _BPE_TRAIN_MERGES))
    return _BPE_CACHE[key]


def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training, end-to-end: learn the first 8 BPE merge rules
    on the corpus (distributed vocabulary count + driver-side bounded
    merge loop, :func:`_bpe_vocab_and_merges`). The oracle builder reruns
    the SAME trainer on a vocabulary derived independently via DuckDB SQL,
    so the regex/count/truncation stages are cross-engine-checked through
    the merge table: any divergence flips a rule and the hash fails.

    Scale shape: the only corpus-bounded work is the pre-token count (one
    explode + one agg); the collect is hard-bounded at 4096 rows."""
    _vocab, merges = _bpe_vocab_and_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, merged string, pair_count long"
    )


def _sql_q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


#: per-sf_dir cache of the ORACLE-side trained artifact (DuckDB-derived
#: vocab + merges): both the merges and encode builders consume it, and
#: without the cache every import / per-SF sweep rebuild scanned
#: documents.parquet and re-ran the trainer once per builder
_BPE_ORACLE_CACHE: dict = {}


def _bpe_oracle_vocab_and_merges(sf_dir: str):
    """Vocabulary + merge rules derived INDEPENDENTLY of Spark (DuckDB SQL
    count + the shared trainer) — the cross-engine check both BPE oracle
    builders rest on. Returns None (uncached, so a later call can retry)
    when the testdata is absent."""
    if sf_dir in _BPE_ORACLE_CACHE:
        return _BPE_ORACLE_CACHE[sf_dir]
    import duckdb

    from kafka_cdc_hudi_spark.functions.bpe import bpe_train_merges

    re_lit = _BPE_PRETOKEN_RE.replace("'", "''")
    try:
        rows = duckdb.sql(
            f"""
            WITH pt AS (
              SELECT t.pt FROM read_parquet('{sf_dir}/documents.parquet'),
                   LATERAL unnest(regexp_extract_all(text, '{re_lit}')) t(pt)
              WHERE trim(t.pt) <> ''
            )
            SELECT pt, COUNT(*) AS w FROM pt GROUP BY pt
            ORDER BY w DESC, pt ASC LIMIT {_BPE_TRAIN_VOCAB}
            """
        ).fetchall()
    except Exception:
        return None
    vocab = [(p, int(w)) for p, w in rows]
    merges = bpe_train_merges(vocab, _BPE_TRAIN_MERGES)
    _BPE_ORACLE_CACHE[sf_dir] = (vocab, merges)
    return _BPE_ORACLE_CACHE[sf_dir]


def bpe_merges_sql_for(sf_dir: str) -> str | None:
    """Build the BPE-merges oracle FOR A GIVEN SCALE FACTOR: the shared
    independently-derived artifact's rules emitted as literals. Registry
    bakes the driver's sf0.01; the local suite and sweep rebuild for
    their own SF via catalog.sf_dependent_sql_builders(). Returns None if
    the testdata is absent so importing never fails data-less."""
    art = _bpe_oracle_vocab_and_merges(sf_dir)
    if art is None:
        return None
    _vocab, merges = art
    values = ", ".join(
        f"({r}, {_sql_q(l)}, {_sql_q(rr)}, {_sql_q(m)}, {c})"
        for r, l, rr, m, c in merges
    )
    return f"""
SELECT CAST(rank AS INT) AS rank, lhs, rhs, merged,
       CAST(pair_count AS BIGINT) AS pair_count
FROM (VALUES {values}) t(rank, lhs, rhs, merged, pair_count)
"""


TEXT_BPE_TRAIN_MERGES_SQL = bpe_merges_sql_for("/root/testdata/sf0.01")


#: encode-time vocabulary cap: pre-tokens outside the top-32 by frequency
#: fall back to character-level tokens (the byte-fallback shape), so BOTH
#: encode paths are exercised at every fixture SF (61 distinct pre-tokens)
_BPE_ENCODE_VOCAB = 32


def _sql_str_lit(s: str) -> str:
    """Spark-SQL single-quoted string literal (backslash escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _bpe_merge_round_expr(inner: str, left: str, right: str, merged: str) -> str:
    """One BPE merge rule as a SQL ``aggregate`` fold over a symbol array:
    left-to-right, non-overlapping, via a (accumulated, pending-symbol)
    struct state — ``pending`` holds the previous symbol so the fold can
    match the (left, right) bigram without lookahead."""
    l, r, m = _sql_str_lit(left), _sql_str_lit(right), _sql_str_lit(merged)
    return (
        f"aggregate({inner}, "
        "named_struct('acc', CAST(array() AS ARRAY<STRING>), 'prev', CAST(NULL AS STRING)), "
        f"(s, x) -> CASE WHEN s.prev = {l} AND x = {r} THEN "
        f"named_struct('acc', array_append(s.acc, {m}), 'prev', CAST(NULL AS STRING)) "
        "WHEN s.prev IS NULL THEN named_struct('acc', s.acc, 'prev', x) "
        "ELSE named_struct('acc', array_append(s.acc, s.prev), 'prev', x) END, "
        "s -> CASE WHEN s.prev IS NULL THEN s.acc ELSE array_append(s.acc, s.prev) END)"
    )


def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION — the third stage of the BPE loop (pair
    counts -> trained merges -> encode the corpus): per-document token
    accounting under the trained tokenizer, with out-of-vocabulary
    pre-tokens falling back to character-level tokens.

    Scale shape (the standard vocabulary-bounded encode): the per-string
    merge fold — 8 chained SQL ``aggregate`` rounds over the character
    array, one per trained rule — runs ONLY over the bounded vocabulary
    frame (<= {V} rows), never the corpus; the corpus-bounded work is one
    pre-token explode + a broadcast join against the encoded vocabulary +
    one aggregation. At 100 TB the fold cost is a constant, and the
    per-document pass is scan-local until the final per-doc agg shuffle.

    Oracle: trained-artifact mechanics like the IVF/merges entries — the
    builder re-derives the vocabulary via DuckDB SQL, reruns the shared
    trainer AND the shared reference encoder (functions/bpe.py:bpe_encode),
    and emits the (pre-token, token-count) table as literals; any
    divergence in Spark's distributed fold flips a per-doc count and the
    value hash fails."""
    vocab, merges = _bpe_vocab_and_merges(spark, sf_dir)
    enc_vocab = spark.createDataFrame(
        vocab[:_BPE_ENCODE_VOCAB], "pt string, w long"
    )
    fold = "split(pt, '')"
    for _rank, left, right, merged, _cnt in merges:
        fold = _bpe_merge_round_expr(fold, left, right, merged)
    encoded = enc_vocab.select(
        "pt", F.expr(f"size({fold})").cast("long").alias("n_tok")
    )
    d = load_table(spark, sf_dir, "documents")
    pts = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_PRETOKEN_RE), 0)
        ).alias("pt"),
    ).filter(F.trim("pt") != "")
    return (
        pts.join(F.broadcast(encoded), "pt", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pretokens"),
            F.sum(
                F.coalesce(F.col("n_tok"), F.length("pt").cast("long"))
            ).alias("n_bpe_tokens"),
            F.sum(F.when(F.col("n_tok").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov_pretokens"),
        )
    )


text_bpe_encode.__doc__ = text_bpe_encode.__doc__.format(V=_BPE_ENCODE_VOCAB)


def bpe_encode_sql_for(sf_dir: str) -> str | None:
    """Build the BPE-encode oracle FOR A GIVEN SCALE FACTOR: run the
    shared reference encoder over the independently-derived vocabulary +
    merges (cached, :func:`_bpe_oracle_vocab_and_merges`) and emit
    (pre-token, n_tokens) as a literal table the per-doc SQL aggregates
    against. Returns None if the testdata is absent so importing never
    fails data-less."""
    from kafka_cdc_hudi_spark.functions.bpe import bpe_encode

    art = _bpe_oracle_vocab_and_merges(sf_dir)
    if art is None:
        return None
    vocab, merges = art
    re_lit = _BPE_PRETOKEN_RE.replace("'", "''")
    values = ", ".join(
        f"({_sql_q(p)}, {len(bpe_encode(p, merges))})"
        for p, _w in vocab[:_BPE_ENCODE_VOCAB]
    )
    return f"""
WITH venc(pt, n_tok) AS (VALUES {values}),
pts AS (
  SELECT doc_id, t.pt FROM documents,
       LATERAL unnest(regexp_extract_all(text, '{re_lit}')) t(pt)
  WHERE trim(t.pt) <> ''
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_pretokens,
       CAST(SUM(COALESCE(v.n_tok, length(p.pt))) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(CASE WHEN v.n_tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov_pretokens
FROM pts p LEFT JOIN venc v ON p.pt = v.pt
GROUP BY p.doc_id
"""


TEXT_BPE_ENCODE_SQL = bpe_encode_sql_for("/root/testdata/sf0.01")


#: interleave resolution: keys are exact integers on a 1e9 grid
_ILV_SCALE = 1_000_000_000


def dataset_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved training order: document i of a
    source with n docs gets key (2i-1)/(2n) on [0,1) — the stride
    interleave that spreads every source evenly through the epoch (the
    materialized form of mixture sampling without RNG state). Exact BIGINT
    keys on a 1e9 grid. Plan: one source-partitioned window for positions,
    source sizes as a broadcast agg; consumers range-sort by
    (interleave_key, source, pos) — a distributed total-order sort, which
    is why the entry emits the KEY rather than a global row_number (that
    would force a single-partition window)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    pos = F.row_number().over(w).cast("long")
    sized = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    return (
        d.select("doc_id", "source")
        .withColumn("pos", pos)
        .join(F.broadcast(sized), "source")
        .select(
            "doc_id",
            "source",
            "pos",
            "n_src",
            F.expr(f"((2 * pos - 1) * CAST({_ILV_SCALE} AS BIGINT)) div (2 * n_src)").alias(
                "interleave_key"
            ),
        )
    )


DATASET_INTERLEAVE_SQL = f"""
WITH p AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS pos
  FROM documents),
s AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY 1)
SELECT doc_id, source, pos, n_src,
       ((2 * pos - 1) * CAST({_ILV_SCALE} AS BIGINT)) // (2 * n_src) AS interleave_key
FROM p JOIN s USING (source)
"""

#: MRL prefix length (Matryoshka truncation point)
_MRL_DIM = 16


def embedding_mrl_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: per vector, how much L2 energy the
    16-dim prefix retains vs the full 64 dims — the fidelity check before
    swapping an index to truncated (cheaper) embeddings. Zero-shuffle
    projection; both norms use the identical fold, retained = one division
    of two identically-computed doubles."""
    e = load_table(spark, sf_dir, "embeddings")
    full = l2_norm("embedding")
    trunc = l2_norm(F.slice("embedding", 1, _MRL_DIM))
    return e.select(
        "vec_id",
        "label",
        full.alias("full_norm"),
        trunc.alias("trunc_norm"),
        ((trunc * trunc) / (full * full)).alias("energy_retained"),
    )


EMBEDDING_MRL_SQL = f"""
SELECT vec_id, label,
       {_DK_NORM.format(A='embedding')} AS full_norm,
       {_DK_NORM.format(A=f'list_slice(embedding, 1, {_MRL_DIM})')} AS trunc_norm,
       ({_DK_NORM.format(A=f'list_slice(embedding, 1, {_MRL_DIM})')}
        * {_DK_NORM.format(A=f'list_slice(embedding, 1, {_MRL_DIM})')})
       / ({_DK_NORM.format(A='embedding')} * {_DK_NORM.format(A='embedding')})
         AS energy_retained
FROM embeddings
"""


# -- distributed classifier training: multinomial naive Bayes ----------------
#
# The canonical train-a-cheap-classifier-on-the-whole-corpus capability of a
# pretraining pipeline (fastText-style quality/domain filters): sufficient
# statistics are INTEGER count aggregations (one shuffle, deterministic in
# any row order — the property float gradient sums lack, which is why this
# is the scalable exact-training choice over SGD), the model is a bounded
# driver artifact (2*K+2 integers -> K+1 log-weights), and scoring is a
# broadcast-literal projection pass. ln is bitwise-identical across Python,
# the JVM, and DuckDB on this platform (verified by the text_lm_score
# oracle since r5), so training + scoring carry a FULL value oracle.

_NB_K = 32
_NB_SALT = "|nb_v1"
#: weak label for the demonstration: "doc uses 'batch' more than 'window'"
#: — a deterministic, roughly class-balanced stand-in for the upstream
#: heuristic label a real pipeline would bootstrap from (wiki-vs-crawl,
#: language-ID, quality rules)
_NB_POS_TOKEN, _NB_NEG_TOKEN = "batch", "window"


def text_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial naive-Bayes classifier on hashed token-count
    features over the FULL corpus, then score every document with it — in
    one entry, so the driver verifies training and inference end-to-end.

    Scale shape: the training pass is one integer groupBy (class, bucket)
    — exact in any partition order, map-side combinable, one shuffle; the
    collect is hard-bounded at 2*``_NB_K``+2 rows regardless of corpus
    size (the index-artifact pattern); scoring embeds the K+1 log-weights
    as broadcast literals and runs as a projection over the per-doc dense
    count vector (same map-lookup build as hash_embedding_vectors). The
    per-row score folds f_j * w_j in array order from 0.0 then adds the
    prior — exactly the oracle's positional unnest-sum, so the float
    scores hash-match. Train accuracy ~0.95 vs 0.59 majority at sf0.01
    (non-degeneracy pinned in tests/test_text_more.py)."""
    import math

    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    toks = tokens("text")
    lab = d.select(
        "doc_id",
        F.when(
            F.size(F.filter(toks, lambda t: t == _NB_POS_TOKEN))
            > F.size(F.filter(toks, lambda t: t == _NB_NEG_TOKEN)),
            1,
        )
        .otherwise(-1)
        .alias("ypm"),
        toks.alias("tk"),
    ).localCheckpoint(eager=False)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("token"), F.lit(_NB_SALT))), 1, 15), 16, 10
        ).cast("bigint")
        % _NB_K
    )
    cells = (
        lab.select("doc_id", "ypm", F.explode("tk").alias("token"))
        .select("doc_id", "ypm", bucket.alias("bucket"))
        .groupBy("doc_id", "ypm", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # -- train: bounded collects of integer sufficient statistics --
    cpos, cneg = [0] * _NB_K, [0] * _NB_K
    for r in cells.groupBy("ypm", "bucket").agg(F.sum("c").alias("c")).collect():
        (cpos if r.ypm == 1 else cneg)[r.bucket] += r.c
    n_by_class = {r.ypm: r.n for r in lab.groupBy("ypm").agg(F.count(F.lit(1)).alias("n")).collect()}
    tpos, tneg = sum(cpos), sum(cneg)
    w = [
        math.log((cpos[j] + 1) / (tpos + float(_NB_K)))
        - math.log((cneg[j] + 1) / (tneg + float(_NB_K)))
        for j in range(_NB_K)
    ]
    prior = math.log(n_by_class.get(1, 0) / n_by_class.get(-1, 1))
    # -- score every document with the broadcast-literal model --
    m = cells.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "c"))).alias("m")
    )
    feat = lab.select("doc_id", "ypm").join(m, "doc_id", "left")
    farr = F.expr(
        f"transform(sequence(0, {_NB_K - 1}),"
        " j -> coalesce(element_at(m, CAST(j AS BIGINT)), CAST(0 AS BIGINT)))"
    )
    warr = F.array(*[F.lit(float(v)) for v in w])
    score = F.lit(prior) + F.aggregate(
        F.zip_with(farr, warr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pred = F.when(score > 0, 1).otherwise(-1)
    return feat.select(
        "doc_id",
        "ypm",
        score.alias("score"),
        pred.alias("pred"),
        F.when(pred == F.col("ypm"), 1).otherwise(0).alias("correct"),
    )


TEXT_NB_CLASSIFIER_SQL = f"""
WITH tok0 AS (SELECT doc_id, {_DK_TOKS} AS tk FROM documents),
lab AS (SELECT doc_id,
        CASE WHEN len(list_filter(tk, t -> t = '{_NB_POS_TOKEN}'))
              > len(list_filter(tk, t -> t = '{_NB_NEG_TOKEN}')) THEN 1 ELSE -1 END AS ypm,
        tk FROM tok0),
tok AS (SELECT doc_id, ypm, unnest(tk) AS token FROM lab),
cells AS (SELECT doc_id, ypm,
          CAST(('0x' || substring(md5(token || '{_NB_SALT}'), 1, 15)) AS BIGINT) % {_NB_K} AS bucket,
          CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2, 3),
cnts AS (SELECT bucket,
         CAST(SUM(CASE WHEN ypm = 1 THEN c ELSE 0 END) AS BIGINT) AS cp,
         CAST(SUM(CASE WHEN ypm = -1 THEN c ELSE 0 END) AS BIGINT) AS cn
         FROM cells GROUP BY bucket),
allb AS (SELECT r.j AS bucket, COALESCE(cp, 0) AS cp, COALESCE(cn, 0) AS cn
         FROM range(0, {_NB_K}) r(j) LEFT JOIN cnts ON r.j = cnts.bucket),
tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS tp, CAST(SUM(cn) AS BIGINT) AS tn FROM allb),
warr AS (SELECT list(ln((cp + 1) / (tp + {_NB_K}.0)) - ln((cn + 1) / (tn + {_NB_K}.0))
                     ORDER BY bucket) AS w
         FROM allb CROSS JOIN tot),
prior AS (SELECT ln(CAST(SUM(CASE WHEN ypm = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                    / SUM(CASE WHEN ypm = -1 THEN 1 ELSE 0 END)) AS b FROM lab),
m AS (SELECT doc_id, MAP(list(bucket ORDER BY bucket), list(c ORDER BY bucket)) AS m
      FROM cells GROUP BY doc_id),
feat AS (SELECT l.doc_id, l.ypm,
         list_transform(range(0, {_NB_K}), j -> COALESCE(m.m[j][1], 0)) AS farr
         FROM lab l LEFT JOIN m USING (doc_id)),
scored AS (SELECT doc_id, ypm,
           prior.b + {_DK_DOT.format(A='farr', B='warr.w')} AS score
           FROM feat CROSS JOIN warr CROSS JOIN prior)
SELECT doc_id, ypm, score,
       CAST(CASE WHEN score > 0 THEN 1 ELSE -1 END AS INT) AS pred,
       CAST(CASE WHEN (CASE WHEN score > 0 THEN 1 ELSE -1 END) = ypm THEN 1 ELSE 0 END AS INT)
         AS correct
FROM scored
"""


# -- DSIR-style importance weighting for targeted data selection -------------
#
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw document by the log-likelihood ratio of
# its hashed n-gram features under a TARGET domain model vs the SOURCE
# (full-corpus) model, then select the top-budget documents. The
# deterministic complement to the NB classifier above: same
# integer-statistics / literal-broadcast machinery, but a two-corpus ratio
# over hashed BIGRAMS and a selection quota instead of a class prediction.

_DSIR_K = 64
_DSIR_SALT = "|dsir_v1"
_DSIR_TARGET_TOKEN = "dup"  # the fixture's 5% minority — a distinctive domain
_DSIR_BUDGET = 100


def dataset_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bigram importance weights + top-budget selection, DSIR-style.

    The target domain is the deterministic subset of docs containing the
    ``_DSIR_TARGET_TOKEN`` minority token; both the target and source
    bigram distributions are INTEGER count aggregations (one shuffle,
    map-side combinable, order-independent), the K log-ratio weights are a
    bounded driver artifact broadcast as literals, and each doc's score is
    the positional fold of its dense bigram-count vector against them —
    the proven _DK_DOT congruence, so the float scores (and therefore the
    selection set) carry a FULL value oracle. The selection threshold is
    the min score of the top-``_DSIR_BUDGET`` rows by (score desc, doc_id)
    — TakeOrderedAndProject in Spark (per-partition top-B, no global
    sort), a 1-row scalar broadcast join back. Ties at the boundary admit
    every tying doc (deterministic in both dialects). Measured: 19 of the
    25 target docs land in the top-100 at sf0.01 (~4x the 5% base rate;
    non-degeneracy pinned in tests/test_text_more.py)."""
    import math

    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism)
    base = d.select(
        "doc_id",
        tokens("text").alias("tk"),
    ).select(
        "doc_id",
        F.array_contains("tk", _DSIR_TARGET_TOKEN).alias("is_target"),
        F.expr(
            "CASE WHEN size(tk) >= 2 THEN zip_with(slice(tk, 1, size(tk) - 1),"
            " slice(tk, 2, size(tk) - 1), (a, b) -> concat(a, ' ', b))"
            " ELSE CAST(array() AS array<string>) END"
        ).alias("bg"),
    ).localCheckpoint(eager=False)
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("gram"), F.lit(_DSIR_SALT))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % _DSIR_K
    )
    cells = (
        base.select("doc_id", "is_target", F.explode("bg").alias("gram"))
        .select("doc_id", "is_target", bucket.alias("bucket"))
        .groupBy("doc_id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # -- train the two hashed-bigram models: bounded K-row collect --
    tj, sj = [0] * _DSIR_K, [0] * _DSIR_K
    for r in (
        cells.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_target"), F.col("c")).otherwise(0)).alias("t"),
            F.sum("c").alias("s"),
        )
        .collect()
    ):
        tj[r.bucket], sj[r.bucket] = r.t, r.s
    tt, ss = sum(tj), sum(sj)
    w = [
        math.log((tj[j] + 1) / (tt + float(_DSIR_K)))
        - math.log((sj[j] + 1) / (ss + float(_DSIR_K)))
        for j in range(_DSIR_K)
    ]
    # -- score every doc against the broadcast-literal ratio model --
    m = cells.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "c"))).alias("m")
    )
    farr = F.expr(
        f"transform(sequence(0, {_DSIR_K - 1}),"
        " j -> coalesce(element_at(m, CAST(j AS BIGINT)), CAST(0 AS BIGINT)))"
    )
    warr = F.array(*[F.lit(float(v)) for v in w])
    score = F.aggregate(
        F.zip_with(farr, warr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        base.select("doc_id", "is_target")
        .join(m, "doc_id", "left")
        .select("doc_id", "is_target", score.alias("score"))
        .localCheckpoint(eager=False)
    )
    thr = (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(_DSIR_BUDGET)
        .agg(F.min("score").alias("thr"))
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        F.when(F.col("is_target"), 1).otherwise(0).alias("is_target"),
        "score",
        F.when(F.col("score") >= F.col("thr"), 1).otherwise(0).alias("selected"),
    )


DATASET_DSIR_WEIGHTS_SQL = f"""
WITH tok0 AS (SELECT doc_id, {_DK_TOKS} AS tk FROM documents),
base AS (SELECT doc_id, list_contains(tk, '{_DSIR_TARGET_TOKEN}') AS is_target,
         CASE WHEN len(tk) >= 2
              THEN list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS bg
         FROM tok0),
cells AS (SELECT doc_id, is_target,
          CAST(('0x' || substring(md5(gram || '{_DSIR_SALT}'), 1, 15)) AS BIGINT) % {_DSIR_K} AS bucket,
          CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id, is_target, unnest(bg) AS gram FROM base)
          GROUP BY 1, 2, 3),
cnts AS (SELECT bucket,
         CAST(SUM(CASE WHEN is_target THEN c ELSE 0 END) AS BIGINT) AS t,
         CAST(SUM(c) AS BIGINT) AS s
         FROM cells GROUP BY bucket),
allb AS (SELECT r.j AS bucket, COALESCE(t, 0) AS t, COALESCE(s, 0) AS s
         FROM range(0, {_DSIR_K}) r(j) LEFT JOIN cnts ON r.j = cnts.bucket),
tot AS (SELECT CAST(SUM(t) AS BIGINT) AS tt, CAST(SUM(s) AS BIGINT) AS ss FROM allb),
warr AS (SELECT list(ln((t + 1) / (tt + {_DSIR_K}.0)) - ln((s + 1) / (ss + {_DSIR_K}.0))
                     ORDER BY bucket) AS w
         FROM allb CROSS JOIN tot),
m AS (SELECT doc_id, MAP(list(bucket ORDER BY bucket), list(c ORDER BY bucket)) AS m
      FROM cells GROUP BY doc_id),
feat AS (SELECT b.doc_id, b.is_target,
         list_transform(range(0, {_DSIR_K}), j -> COALESCE(m.m[j][1], 0)) AS farr
         FROM base b LEFT JOIN m USING (doc_id)),
scored AS (SELECT doc_id, is_target,
           {_DK_DOT.format(A='farr', B='warr.w')} AS score
           FROM feat CROSS JOIN warr),
thr AS (SELECT min(score) AS thr FROM
        (SELECT score FROM scored ORDER BY score DESC, doc_id LIMIT {_DSIR_BUDGET}))
SELECT doc_id,
       CAST(CASE WHEN is_target THEN 1 ELSE 0 END AS INT) AS is_target,
       score,
       CAST(CASE WHEN score >= thr.thr THEN 1 ELSE 0 END AS INT) AS selected
FROM scored CROSS JOIN thr
"""


# -- RAG indexing pipeline: chunk -> embed -> retrieve ------------------------

_RAG_K, _RAG_NQ = 5, 5


def pipeline_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval-index build in ONE lazy plan: every document is
    split into overlapping token windows (text_chunk_overlap's zero-shuffle
    generate), every chunk is hash-embedded into the shared
    ``_HASHEMB_DIM`` space (same salts as the document embeddings, so
    queries and chunks are comparable), and the first ``_RAG_NQ`` documents
    retrieve their top-``_RAG_K`` chunks by exact cosine — EXCLUDING their
    own chunks (the self-hit a real RAG eval always masks).

    Scale shape: chunking and embedding are scan-parallel (one (id, bucket)
    shuffle each); the query side is pruned at the scan (doc_id predicate
    pushed down) and broadcast — retrieval is a query-bounded broadcast
    nested-loop over the chunk index, the documented exhaustive baseline
    (ann_topk_bruteforce's contract); swapping in the IVF/SRP entries'
    bucketed candidate generation is the large-query-set path. Top-k is a
    per-query WindowGroupLimit, never a global sort. The chunk index is
    localCheckpointed: it feeds the join AND its lineage contains the
    chunk explode chain."""
    chunks = text_chunk_overlap(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    ce = (
        _hash_embed_df(chunks.repartition(par), ["doc_id", "chunk_id"], "chunk_text")
        .filter(F.col("l2_sq") > 0)
        .localCheckpoint(eager=False)
    )
    q = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < _RAG_NQ)
    qe = (
        _hash_embed_df(q, ["doc_id"], "text")
        .filter(F.col("l2_sq") > 0)
        .select(F.col("doc_id").alias("qid"), F.col("embedding").alias("qemb"))
    )
    from kafka_cdc_hudi_spark.functions.vectors import cosine

    scored = ce.join(F.broadcast(qe), F.col("qid") != F.col("doc_id")).withColumn(
        "cosine", cosine(F.col("qemb"), F.col("embedding"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "doc_id", "chunk_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RAG_K)
        .select("qid", "doc_id", "chunk_id", "cosine", "rank")
    )


_DK_EMB_BUCKET = (
    "CAST(('0x' || substring(md5(token || '|emb_v1'), 1, 15)) AS BIGINT)"
    f" % {_HASHEMB_DIM}"
)
_DK_EMB_SIGN = (
    "1 - 2 * (CAST(('0x' || substring(md5(token || '|sign_v1'), 1, 15)) AS BIGINT) % 2)"
)


def _dk_hash_embed_ctes(prefix: str, src: str, ids: str, toks_expr: str) -> str:
    """The map->dense hash-embedding chain as CTE text, keyed by ``ids``
    (comma-separated id columns of ``src``)."""
    return f"""
{prefix}tok AS (SELECT {ids}, unnest({toks_expr}) AS token FROM {src}),
{prefix}cells AS (SELECT {ids}, {_DK_EMB_BUCKET} AS bucket,
                  CAST(SUM({_DK_EMB_SIGN}) AS BIGINT) AS s
                  FROM {prefix}tok GROUP BY ALL),
{prefix}emb AS (SELECT {ids},
                list_transform(range(0, {_HASHEMB_DIM}), j -> COALESCE(m[j][1], 0)) AS emb
                FROM (SELECT {ids},
                      MAP(list(bucket ORDER BY bucket), list(s ORDER BY bucket)) AS m
                      FROM {prefix}cells GROUP BY {ids})),
{prefix}nz AS (SELECT * FROM {prefix}emb
               WHERE list_sum(list_transform(emb, x -> x * x)) > 0)"""


_RAG_SQL_TEMPLATE = f"""
WITH chunks AS (SELECT * FROM (__CHUNK_SQL__) _c),
{_dk_hash_embed_ctes("c", "chunks", "doc_id, chunk_id", _dk_toks_of("chunk_text"))},
qdocs AS (SELECT doc_id, text FROM documents WHERE doc_id < {_RAG_NQ}),
{_dk_hash_embed_ctes("q", "qdocs", "doc_id", _DK_TOKS)},
scored AS (
  SELECT q.doc_id AS qid, c.doc_id, c.chunk_id,
         {_DK_DOT.format(A='q.emb', B='c.emb')}
         / ({_DK_NORM.format(A='q.emb')} * {_DK_NORM.format(A='c.emb')}) AS cosine
  FROM qnz q JOIN cnz c ON q.doc_id <> c.doc_id)
SELECT qid, doc_id, chunk_id, cosine,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, doc_id, chunk_id) AS INT) AS rank
FROM scored QUALIFY rank <= {_RAG_K}
"""

PIPELINE_RAG_INDEX_SQL = _RAG_SQL_TEMPLATE.replace("__CHUNK_SQL__", TEXT_CHUNK_OVERLAP_SQL)


# -- corpus-filter funnel: staged gates with per-stage attrition --------------

_FUNNEL_QUALITY_TAU = 0.38


#: corpus-refresh quality gate: live docs shorter than this are dropped
_REFRESH_MIN_TOKENS = 30

#: stale-arrival slice for the refresh entry: these docs get a LATE,
#: lower-seq update that precombine must discard
_REFRESH_STALE_MOD, _REFRESH_STALE_RES = 19, 7


def _cdc_refreshed_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LIVE documents snapshot after a two-batch CDC merge — the
    composition's first half. Batch 0 inserts even doc_ids; batch 1
    inserts the odd ones, applies updates (doc_id % 11 == 4 takes its
    successor's text, high seq), injects STALE out-of-order updates
    (doc_id % 19 == 7, seq=-1 — precombine must discard them; pinned in
    tests/test_text_more.py), and deletes doc_id % 13 == 6. Returns
    (doc_id, text, source, n_tok)."""
    from kafka_cdc_hudi_spark.operators.merge import merge_upsert

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")

    def inserts(df):
        return df.select(
            "doc_id", "text", "source", F.lit(False).alias("_deleted"), did.alias("seq")
        )

    nxt = d.select((did - 1).alias("doc_id"), F.col("text").alias("next_text"))
    upd = (
        d.filter(did % _IVM_UPD_MOD == _IVM_UPD_RES)
        .join(nxt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("next_text", "text").alias("text"),
            "source",
            F.lit(False).alias("_deleted"),
            (did + F.lit(10_000_000)).alias("seq"),
        )
    )
    stale = d.filter(did % _REFRESH_STALE_MOD == _REFRESH_STALE_RES).select(
        "doc_id",
        F.concat(F.lit("STALE "), F.col("text")).alias("text"),
        "source",
        F.lit(False).alias("_deleted"),
        F.lit(-1).cast("bigint").alias("seq"),
    )
    dels = d.filter(did % _IVM_DEL_MOD == _IVM_DEL_RES).select(
        "doc_id",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("source"),
        F.lit(True).alias("_deleted"),
        (did + F.lit(20_000_000)).alias("seq"),
    )
    s1 = merge_upsert(None, inserts(d.filter(did % 2 == 0)), ["doc_id"], order_col="seq")
    batch1 = (
        inserts(d.filter(did % 2 == 1))
        .unionByName(upd)
        .unionByName(stale)
        .unionByName(dels)
    )
    s2 = merge_upsert(s1, batch1, ["doc_id"], order_col="seq")
    return s2.select(
        "doc_id", "text", "source", F.size(tokens("text")).cast("long").alias("n_tok")
    )


def pipeline_cdc_corpus_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE repo's two halves in one plan — maintain a training corpus
    under CDC: a two-batch document merge through the real upsert operator
    (precombine discards an injected stale out-of-order update, deletes
    tombstone), then the refresh pipeline over the LIVE snapshot — token
    gate (>= 30) and exact dedup (min-doc_id keeper per identical text;
    the successor-text updates create exact copies, so the CDC step itself
    feeds the dedup step) — read out per source. The oracle is a statement
    about the FINAL corpus only (QUALIFY-free closed form over documents):
    the merge must converge to it from batches, which is what makes this a
    value-check of the whole composition rather than of one query.
    Reference parity: the Glue job's merge loop (glue/cdc_hudi.py:183-216)
    feeds dashboards; this feeds a corpus build — same sink contract."""
    live = _cdc_refreshed_snapshot(spark, sf_dir)
    w = Window.partitionBy("text")
    passed = live.filter(F.col("n_tok") >= _REFRESH_MIN_TOKENS).withColumn(
        "keeper", F.min("doc_id").over(w)
    )
    lab = live.join(passed.select("doc_id", "keeper"), "doc_id", "left")
    one = F.lit(1)
    return lab.groupBy("source").agg(
        F.count(one).alias("n_live"),
        F.sum(F.when(F.col("n_tok") < _REFRESH_MIN_TOKENS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_short"),
        F.sum(
            F.when(F.col("keeper").isNotNull() & (F.col("doc_id") != F.col("keeper")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_dup"),
        F.sum(F.when(F.col("keeper") == F.col("doc_id"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )


PIPELINE_CDC_CORPUS_REFRESH_SQL = f"""
WITH corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {_IVM_UPD_MOD} = {_IVM_UPD_RES} AND n.text IS NOT NULL
              THEN n.text ELSE d.text END AS text,
         d.source
  FROM documents d LEFT JOIN documents n ON n.doc_id = d.doc_id + 1
  WHERE d.doc_id % {_IVM_DEL_MOD} <> {_IVM_DEL_RES}),
t AS (SELECT doc_id, source, text, len({_DK_TOKS}) AS n_tok FROM corpus),
p AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS keeper
      FROM t WHERE n_tok >= {_REFRESH_MIN_TOKENS}),
lab AS (SELECT t.*, p.keeper FROM t LEFT JOIN p USING (doc_id))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_live,
       CAST(count(*) FILTER (n_tok < {_REFRESH_MIN_TOKENS}) AS BIGINT) AS n_short,
       CAST(count(*) FILTER (keeper IS NOT NULL AND doc_id <> keeper) AS BIGINT) AS n_dup,
       CAST(count(*) FILTER (keeper = doc_id) AS BIGINT) AS n_kept
FROM lab GROUP BY source
"""


def pipeline_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the corpus-filtering pipeline: run the standard
    gate sequence — language-ID, quality threshold, benchmark
    decontamination, exact-dedup keeper — CUMULATIVELY and report how many
    documents survive each stage. This is the attrition readout every
    pretraining-data run is judged by ("we started with X docs and kept
    Y"), composed from the already-oracled component entries so the funnel
    numbers are consistent with each individual report by construction.

    Scale shape: each component is its own optimized plan (single-pass
    column math, broadcast shingle probe, hash-group dedup); the funnel
    joins them on doc_id and folds to ONE aggregation row unpivoted to 5
    stage rows — output is O(stages), never O(docs). Benchmark-slice docs
    (absent from the decontaminate report) count as dropped at the
    decontamination stage: they ARE the eval set."""
    q = text_quality_score(spark, sf_dir).select("doc_id", "quality")
    lang = text_language_id(spark, sf_dir).select("doc_id", "pred_lang")
    dc = text_decontaminate(spark, sf_dir).select("doc_id", "contaminated")
    d = load_table(spark, sf_dir, "documents")
    keep = (
        d.select("doc_id", F.md5(F.lower(F.col("text"))).alias("text_hash"))
        .withColumn(
            "is_canonical",
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("text_hash")),
        )
        .select("doc_id", "is_canonical")
    )
    flags = (
        d.select("doc_id")
        .join(lang, "doc_id")
        .join(q, "doc_id")
        .join(dc, "doc_id", "left")
        .join(keep, "doc_id")
    )
    g1 = F.col("pred_lang") == "en"
    g2 = g1 & (F.col("quality") >= _FUNNEL_QUALITY_TAU)
    g3 = g2 & F.col("contaminated").isNotNull() & ~F.col("contaminated")
    g4 = g3 & F.col("is_canonical")
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(g1.cast("long")).alias("n1"),
        F.sum(g2.cast("long")).alias("n2"),
        F.sum(g3.cast("long")).alias("n3"),
        F.sum(g4.cast("long")).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 0, 'all', n0, 1, 'lang_en', n1, 2, 'quality', n2,"
            " 3, 'decontaminated', n3, 4, 'dedup_keep', n4) AS (stage, gate, n_docs)"
        )
    )


PIPELINE_QUALITY_FUNNEL_SQL = f"""
WITH q AS (SELECT doc_id, quality FROM ({{q}}) _q),
l AS (SELECT doc_id, pred_lang FROM ({{l}}) _l),
dc AS (SELECT doc_id, contaminated FROM ({{d}}) _dc),
k AS (SELECT doc_id,
      doc_id = MIN(doc_id) OVER (PARTITION BY md5(lower(text))) AS is_canonical
      FROM documents),
f AS (SELECT d.doc_id,
      (pred_lang = 'en') AS g1,
      (pred_lang = 'en' AND quality >= CAST('{_FUNNEL_QUALITY_TAU}' AS DOUBLE)) AS g2,
      (pred_lang = 'en' AND quality >= CAST('{_FUNNEL_QUALITY_TAU}' AS DOUBLE)
       AND contaminated IS NOT NULL AND NOT contaminated) AS g3,
      (pred_lang = 'en' AND quality >= CAST('{_FUNNEL_QUALITY_TAU}' AS DOUBLE)
       AND contaminated IS NOT NULL AND NOT contaminated AND is_canonical) AS g4
      FROM documents d JOIN l USING (doc_id) JOIN q USING (doc_id)
      LEFT JOIN dc USING (doc_id) JOIN k USING (doc_id)),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0,
      CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      CAST(SUM(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      CAST(SUM(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
      CAST(SUM(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM f)
SELECT CAST(0 AS INT) AS stage, 'all' AS gate, n0 AS n_docs FROM g
UNION ALL SELECT 1, 'lang_en', n1 FROM g
UNION ALL SELECT 2, 'quality', n2 FROM g
UNION ALL SELECT 3, 'decontaminated', n3 FROM g
UNION ALL SELECT 4, 'dedup_keep', n4 FROM g
""".replace("{q}", TEXT_QUALITY_SQL).replace("{l}", TEXT_LANGUAGE_ID_SQL).replace(
    "{d}", TEXT_DECONTAMINATE_SQL
)




# -- BM25 lexical retrieval (static build + CDC-maintained index) -----------

#: BM25 top-k per query; queries are the first 5 documents' texts
BM25_K = 10
#: deterministic CDC script constants for the maintained-BM25 entry:
#: docs with doc_id % 9 == 4 are REWRITTEN to their successor's text
#: (their postings must be retracted and re-inserted); docs with
#: doc_id % 12 == 7 are DELETED (must vanish from results). doc_id = 31
#: mod 36 hits BOTH: the delete's higher seq wins (update-then-delete).
_BM25_UPD_MOD, _BM25_UPD_RES = 9, 4
_BM25_DEL_MOD, _BM25_DEL_RES = 12, 7

_BM25_STATE: dict = {}
_BM25_LOCK = __import__("threading").Lock()


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BM25 top-10 over a statically-built inverted index
    (streaming/bm25_ivm.py:bm25_topk): one tokenize pass builds postings
    (term, doc_id, tf) and doc lengths; per-term document frequencies and
    N/avgdl come from the index; idf is the BM25 RATIONAL form
    (N - df + 0.5)/(df + 0.5) (same cross-engine determinism contract as
    text_tfidf_topk), and per-doc scores sum by an ORDERED fold (sorted
    by term) — the construction the vector entries' dot products already
    hash-match with. Plan: broadcast query-term set into the postings
    equi-join (only queried terms' lists are touched), 1-row stats
    broadcast, WindowGroupLimit top-k."""
    from kafka_cdc_hudi_spark.streaming.bm25_ivm import bm25_topk, query_pruned_postings

    d = load_table(spark, sf_dir, "documents")
    q = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    # one-shot build: postings prune to the query-term set BELOW the
    # (term, doc_id) aggregation — the corpus-wide shuffle only carries
    # queried terms (r11 scale fix; scores identical, see
    # query_pruned_postings)
    posts = query_pruned_postings(d, q)
    dl = d.select("doc_id", F.size(tokens("text")).cast("long").alias("dl"))
    return bm25_topk(q, posts, dl, k=BM25_K)


def _bm25_sql(corpus_rel: str, extra_ctes: str = "", k: int | None = None, query_max: int = 5) -> str:
    """The full BM25 chain in DuckDB over ``corpus_rel``; queries are
    always the ORIGINAL documents' first 5 texts (external query strings
    — stable under corpus churn). Constant forms mirror the Spark
    expression tree op-for-op (same IEEE operands and order)."""
    K1 = "CAST('1.2' AS DOUBLE)"
    B = "CAST('0.75' AS DOUBLE)"
    ONE = "CAST('1.0' AS DOUBLE)"
    osum = "(SELECT sum(a) FROM (SELECT unnest(l) a))"
    return f"""
WITH {extra_ctes}tok AS (SELECT doc_id, unnest({_DK_TOKS}) AS term FROM {corpus_rel}),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(len({_DK_TOKS}) AS BIGINT) AS dl FROM {corpus_rel}),
stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl FROM dl),
q AS (SELECT doc_id AS query_id, text FROM documents WHERE doc_id < {query_max}),
qt AS (SELECT DISTINCT query_id, unnest({_DK_TOKS}) AS term FROM q),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT qt.query_id, tf.doc_id, qt.term,
         ((n_docs - df + 0.5) / (df + 0.5))
         * (tf * ({K1} + {ONE}))
         / (tf + {K1} * ({ONE} - {B} + {B} * dl.dl / avgdl)) AS score
  FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
),
agg AS (
  SELECT query_id, doc_id, list(score ORDER BY term) AS l,
         CAST(COUNT(*) AS INT) AS n_terms_matched
  FROM scored GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, {osum} AS score, n_terms_matched,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY {osum} DESC, doc_id) AS INT) AS rank
FROM agg
QUALIFY rank <= {k if k is not None else BM25_K}
"""


TEXT_BM25_TOPK_SQL = _bm25_sql("documents")


def text_bm25_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 over a CDC-MAINTAINED inverted index
    (streaming/bm25_ivm.py:Bm25IndexMaintainer): a deterministic 3-batch
    script — bulk insert the corpus, then rewrite doc_id % 9 == 4 to its
    successor's text (postings retract + re-insert, tf/df/avgdl all
    move), then delete doc_id % 12 == 7 (tombstones; update-then-delete
    on the mod overlap) — folded through the maintainer (per-batch cost =
    changed docs' terms: one tombstone+insert delta commit per table,
    never a corpus re-tokenize). Queries are the ORIGINAL first-5
    document texts, so the returned top-k must equal a full BM25
    recompute over the live corpus — exactly what the oracle computes:
    the driver value-checks the whole maintenance algebra (posting
    retraction, precombine tombstone ordering, df/avgdl statistics over
    the live corpus), not a single-shot query. At 100 TB the postings
    table is the persisted index artifact; queries touch only their
    terms' posting lists."""
    m = bm25_maintainer_for(spark, sf_dir)
    did = F.col("doc_id")
    q = load_table(spark, sf_dir, "documents").filter(did < 5).select(
        did.alias("query_id"), "text"
    )
    return m.topk(spark, q, k=BM25_K)


def bm25_maintainer_for(spark: SparkSession, sf_dir: str):
    """Session-cached maintained BM25 index after the deterministic CDC
    script (shared by text_bm25_maintained and the maintained hybrid
    entry — the script runs once per session/SF)."""
    import tempfile

    from kafka_cdc_hudi_spark.streaming.bm25_ivm import Bm25IndexMaintainer

    did = F.col("doc_id")
    key = (spark.sparkContext.applicationId, sf_dir)
    with _BM25_LOCK:
        root = _BM25_STATE.get(key)
        if root is None:
            root = tempfile.mkdtemp(prefix="bm25_ivm_")
            m = Bm25IndexMaintainer(root=f"{root}/index")
            docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
            b0 = docs.select(F.lit("i").alias("op"), "doc_id", "text", did.alias("seq"))
            nxt = docs.select((did - 1).alias("doc_id"), F.col("text").alias("next_text"))
            b1 = (
                docs.filter(did % _BM25_UPD_MOD == _BM25_UPD_RES)
                .join(nxt, "doc_id", "left")
                .select(
                    F.lit("u").alias("op"),
                    "doc_id",
                    F.coalesce("next_text", "text").alias("text"),
                    (did + F.lit(10_000_000)).alias("seq"),
                )
            )
            b2 = docs.filter(did % _BM25_DEL_MOD == _BM25_DEL_RES).select(
                F.lit("d").alias("op"),
                "doc_id",
                F.lit(None).cast("string").alias("text"),
                (did + F.lit(20_000_000)).alias("seq"),
            )
            for bid, bdf in enumerate([b0, b1, b2]):
                m.process(spark, bdf, bid)
            _BM25_STATE[key] = root
    return Bm25IndexMaintainer(root=f"{root}/index")


_BM25_CORPUS_CTE = f"""corpus AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {_BM25_UPD_MOD} = {_BM25_UPD_RES}
                   AND n.text IS NOT NULL
              THEN n.text ELSE d.text END AS text
  FROM documents d LEFT JOIN documents n ON n.doc_id = d.doc_id + 1
  WHERE d.doc_id % {_BM25_DEL_MOD} <> {_BM25_DEL_RES}
),
"""

TEXT_BM25_MAINTAINED_SQL = _bm25_sql("corpus", extra_ctes=_BM25_CORPUS_CTE)


TEXT_QUERIES: dict[str, tuple] = {
    "text_bm25_topk": (text_bm25_topk, TEXT_BM25_TOPK_SQL),
    "text_bm25_maintained": (text_bm25_maintained, TEXT_BM25_MAINTAINED_SQL),
    "text_bpe_pretokenize": (text_bpe_pretokenize, TEXT_BPE_PRETOKENIZE_SQL),
    "text_bpe_pair_counts": (text_bpe_pair_counts, TEXT_BPE_PAIR_COUNTS_SQL),
    "text_bpe_train_merges": (text_bpe_train_merges, TEXT_BPE_TRAIN_MERGES_SQL),
    "text_bpe_encode": (text_bpe_encode, TEXT_BPE_ENCODE_SQL),
    "dataset_interleave_order": (dataset_interleave_order, DATASET_INTERLEAVE_SQL),
    "embedding_mrl_energy": (embedding_mrl_energy, EMBEDDING_MRL_SQL),
    "text_trigram_novelty": (text_trigram_novelty, TEXT_TRIGRAM_NOVELTY_SQL),
    "text_lm_score": (text_lm_score, TEXT_LM_SCORE_SQL),
    "dataset_length_buckets": (dataset_length_buckets, DATASET_LENGTH_BUCKETS_SQL),
    "dataset_mixture_weights": (dataset_mixture_weights, DATASET_MIXTURE_WEIGHTS_SQL),
    "text_token_count": (text_token_count, TEXT_TOKEN_COUNT_SQL),
    "text_quality_score": (text_quality_score, TEXT_QUALITY_SQL),
    "text_language_id": (text_language_id, TEXT_LANGUAGE_ID_SQL),
    "text_fingerprint": (text_fingerprint, TEXT_FINGERPRINT_SQL),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL),
    "text_containment_pairs": (text_containment_pairs, TEXT_CONTAINMENT_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_LSH_SQL),
    "dedup_incremental_candidates": (dedup_incremental_candidates, DEDUP_INCREMENTAL_CANDIDATES_SQL),
    "dedup_cdc_pair_ivm": (dedup_cdc_pair_ivm, DEDUP_CDC_PAIR_IVM_SQL),
    "dedup_cross_source_stats": (dedup_cross_source_stats, DEDUP_CROSS_SOURCE_SQL),
    "dataset_epoch_order": (dataset_epoch_order, DATASET_EPOCH_ORDER_SQL),
    "dedup_simhash": (dedup_simhash, DEDUP_SIMHASH_SQL),
    "dedup_clusters": (dedup_clusters, DEDUP_CLUSTERS_SQL),
    "dedup_clusters_star": (dedup_clusters_star, DEDUP_CLUSTERS_SQL),
    "graph_pagerank_neardup": (graph_pagerank_neardup, GRAPH_PAGERANK_SQL),
    "graph_triangles_neardup": (graph_triangles_neardup, GRAPH_TRIANGLES_SQL),
    "dedup_spans_remove": (dedup_spans_remove, DEDUP_SPANS_REMOVE_SQL),
    "dedup_simhash_pairs": (dedup_simhash_pairs, DEDUP_SIMHASH_PAIRS_SQL),
    "dedup_simhash_wide_pairs": (dedup_simhash_wide_pairs, DEDUP_SIMHASH_WIDE_PAIRS_SQL),
    "dedup_simhash_band_scaled": (dedup_simhash_band_scaled, DEDUP_SIMHASH_BAND_SCALED_SQL),
    "text_hash_embedding": (text_hash_embedding, TEXT_HASH_EMBEDDING_SQL),
    "text_nb_classifier": (text_nb_classifier, TEXT_NB_CLASSIFIER_SQL),
    "dataset_dsir_weights": (dataset_dsir_weights, DATASET_DSIR_WEIGHTS_SQL),
    "pipeline_rag_index": (pipeline_rag_index, PIPELINE_RAG_INDEX_SQL),
    "pipeline_quality_funnel": (pipeline_quality_funnel, PIPELINE_QUALITY_FUNNEL_SQL),
    "pipeline_cdc_corpus_refresh": (
        pipeline_cdc_corpus_refresh,
        PIPELINE_CDC_CORPUS_REFRESH_SQL,
    ),
    "embedding_norms": (embedding_norms, EMBEDDING_NORMS_SQL),
    "embedding_quantize_int8": (embedding_quantize_int8, EMBEDDING_QUANTIZE_INT8_SQL),
    "text_token_topk": (text_token_topk, TEXT_TOKEN_TOPK_SQL),
    "dataset_split_assign": (dataset_split_assign, DATASET_SPLIT_SQL),
    "dataset_pack_sequences": (dataset_pack_sequences, DATASET_PACK_SQL),
    "dataset_sample_stratified": (dataset_sample_stratified, DATASET_SAMPLE_STRATIFIED_SQL),
    "text_tfidf_topk": (text_tfidf_topk, TEXT_TFIDF_SQL),
    "text_normalize": (text_normalize, TEXT_NORMALIZE_SQL),
    "text_repetition_stats": (text_repetition_stats, TEXT_REPETITION_SQL),
    "text_pii_scrub": (text_pii_scrub, TEXT_PII_SCRUB_SQL),
    "text_decontaminate": (text_decontaminate, TEXT_DECONTAMINATE_SQL),
    "text_bloom_decontaminate": (
        text_bloom_decontaminate,
        TEXT_BLOOM_DECONTAMINATE_SQL,
    ),
    "dedup_fuzzy_editdist": (dedup_fuzzy_editdist, DEDUP_FUZZY_EDITDIST_SQL),
    "dedup_fuzzy_canonicalize": (
        dedup_fuzzy_canonicalize,
        DEDUP_FUZZY_CANONICALIZE_SQL,
    ),
    "text_duplicated_span_fraction": (
        text_duplicated_span_fraction,
        TEXT_DUPLICATED_SPAN_SQL,
    ),
    "ann_topk_bruteforce": (ann_topk_bruteforce, ANN_TOPK_SQL),
    "dataset_negative_sample": (dataset_negative_sample, DATASET_NEGATIVE_SAMPLE_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_SQL),
    "multimodal_meta": (multimodal_meta, MULTIMODAL_META_SQL),
    "multimodal_frame_sample": (multimodal_frame_sample, MULTIMODAL_FRAME_SAMPLE_SQL),
    "multimodal_resize": (multimodal_resize, MULTIMODAL_RESIZE_SQL),
    "multimodal_decode_png": (multimodal_decode_png, MULTIMODAL_DECODE_PNG_SQL),
    "multimodal_decode_webp": (multimodal_decode_webp, MULTIMODAL_DECODE_WEBP_SQL),
    "multimodal_webp_anim_frames": (multimodal_webp_anim_frames, MULTIMODAL_WEBP_ANIM_FRAMES_SQL),
    "corpus_warc_extract": (corpus_warc_extract, CORPUS_WARC_EXTRACT_SQL),
    "pipeline_warc_corpus": (pipeline_warc_corpus, PIPELINE_WARC_CORPUS_SQL),
    "corpus_warc_http_decode": (corpus_warc_http_decode, CORPUS_WARC_HTTP_DECODE_SQL),
    "pipeline_warc_html_corpus": (
        pipeline_warc_html_corpus,
        PIPELINE_WARC_HTML_CORPUS_SQL,
    ),
    "pipeline_wet_roundtrip": (pipeline_wet_roundtrip, PIPELINE_WET_ROUNDTRIP_SQL),
    "multimodal_webp_lossy_meta": (
        multimodal_webp_lossy_meta,
        MULTIMODAL_WEBP_LOSSY_META_SQL,
    ),
    "multimodal_decode_wav": (multimodal_decode_wav, MULTIMODAL_DECODE_WAV_SQL),
    "multimodal_audio_segments": (
        multimodal_audio_segments,
        MULTIMODAL_AUDIO_SEGMENTS_SQL,
    ),
    "multimodal_video_cuts": (multimodal_video_cuts, MULTIMODAL_VIDEO_CUTS_SQL),
    "multimodal_video_keyframes": (multimodal_video_keyframes, MULTIMODAL_VIDEO_KEYFRAMES_SQL),
    "pipeline_audio_manifest": (pipeline_audio_manifest, PIPELINE_AUDIO_SQL),
    "multimodal_resize_png_real": (multimodal_resize_png_real, MULTIMODAL_RESIZE_PNG_REAL_SQL),
    "multimodal_decode_bmp": (multimodal_decode_bmp, MULTIMODAL_DECODE_BMP_SQL),
    "multimodal_decode_gif": (multimodal_decode_gif, MULTIMODAL_DECODE_GIF_SQL),
    "multimodal_decode_jpeg": (multimodal_decode_jpeg, MULTIMODAL_DECODE_JPEG_SQL),
    "multimodal_decode_jpeg_color": (
        multimodal_decode_jpeg_color,
        MULTIMODAL_DECODE_JPEG_COLOR_SQL,
    ),
    "multimodal_video_frames": (multimodal_video_frames, MULTIMODAL_VIDEO_FRAMES_SQL),
    "multimodal_decode_tiff": (multimodal_decode_tiff, MULTIMODAL_DECODE_TIFF_SQL),
    "pipeline_multimodal_manifest": (pipeline_multimodal_manifest, PIPELINE_MULTIMODAL_SQL),
    "dataset_quota_per_group": (dataset_quota_per_group, DATASET_QUOTA_SQL),
    "text_rare_token_fraction": (text_rare_token_fraction, TEXT_RARE_TOKEN_SQL),
    "text_chunk_overlap": (text_chunk_overlap, TEXT_CHUNK_OVERLAP_SQL),
    "dedup_corpus_final": (dedup_corpus_final, DEDUP_CORPUS_FINAL_SQL),
    "pipeline_pretraining_corpus": (pipeline_pretraining_corpus, PIPELINE_PRETRAINING_SQL),
    "dataset_pack_materialize": (dataset_pack_materialize, DATASET_PACK_MATERIALIZE_SQL),
    "dedup_lines_reconstruct": (dedup_lines_reconstruct, DEDUP_LINES_SQL),
    "text_html_strip": (text_html_strip, TEXT_HTML_STRIP_SQL),
}
