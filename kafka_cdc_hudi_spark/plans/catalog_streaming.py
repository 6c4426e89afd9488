"""Oracle-checked entries for the event-time streaming operators and the
ANN scale paths.

The window builders in ``streaming.windows`` run identically on batch frames
(watermark applies only when ``df.isStreaming``), so each gets a DuckDB
oracle on the batch path — the streaming path of the same builders is
covered by tests/test_streaming_windows.py with real file-source streams.

The reference has none of these (SURVEY §2 "not implemented" list); they are
the M6 north-star extension.

Oracle notes:
- Spark ``window()``/``session_window()`` align to the Unix epoch; the SQL
  mirrors that with epoch-second arithmetic (hour/30-min buckets are
  midnight-aligned in both engines).
- Spark session windows are half-open: an event exactly ``gap`` after the
  previous one starts a NEW session, hence ``>= gap`` in the island break.
- ANN scale paths: both are deterministic end-to-end and carry full DuckDB
  oracles — SRP-LSH via seeded hyperplanes, IVF via the static seeded
  codebook (the query-time artifact; data-adapted kmeans training is the
  offline build path, recall-bounded in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.operators.similarity import (
    ivf_assign,
    ivf_static_codebook,
    ivf_topk,
    ivf_train_sql_sample,
    ivfpq_topk,
    pq_adc_topk,
    pq_codebooks,
    pq_encode_arrow,
    ivf_assign_arrow,
    pq_sub_dot,
    srp_topk,
)
from kafka_cdc_hudi_spark.functions.numeric import DEC
from kafka_cdc_hudi_spark.functions.timefns import epoch_micros
from kafka_cdc_hudi_spark.sources.tables import load_table
from kafka_cdc_hudi_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)

EMBEDDING_DIM = 64


def events_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type (streaming-capable builder,
    batch path). One shuffle on (window, key); partial agg map-side."""
    return tumbling_counts(load_table(spark, sf_dir, "events"), window="1 hour")


EVENTS_TUMBLING_SQL = f"""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""


def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour/30-min windows: each event lands in exactly 2 windows."""
    return sliding_counts(
        load_table(spark, sf_dir, "events"), window="1 hour", slide="30 minutes"
    )


EVENTS_SLIDING_SQL = """
WITH starts AS (
  -- DuckDB's to_timestamp returns TIMESTAMP WITH TIME ZONE; cast to plain
  -- TIMESTAMP so the schema matches Spark's tz-naive window bounds.
  SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT))
              AS TIMESTAMP) AS ws,
         event_type
  FROM events
  UNION ALL
  SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT))
              AS TIMESTAMP),
         event_type
  FROM events
)
SELECT ws AS window_start,
       ws + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events
FROM starts
GROUP BY 1, 2, 3
"""


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-min inactivity gap). State-merging
    ``session_window`` on streams; plain agg on batch."""
    return session_windows(load_table(spark, sf_dir, "events"), gap="30 minutes")


EVENTS_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
FROM sess
GROUP BY user_id, sid
"""


def user_running_stats_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the applyInPandasWithState running-stats operator:
    per-user totals + last event by (ts, event_id). Single shuffle on
    user_id; the 'last' is a max(struct) — no second window pass."""
    e = load_table(spark, sf_dir, "events")
    last = F.max(F.struct("ts", "event_id", "event_type")).alias("last")
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            last,
        )
        .select(
            "user_id",
            "n_events",
            "sum_value",
            F.col("last.ts").alias("last_ts"),
            F.col("last.event_type").alias("last_event_type"),
        )
    )


USER_RUNNING_STATS_SQL = f"""
WITH last AS (
  SELECT user_id, ts AS last_ts, event_type AS last_event_type
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) = 1
)
SELECT e.user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS {DEC})) AS DOUBLE) AS sum_value,
       l.last_ts,
       l.last_event_type
FROM events e JOIN last l USING (user_id)
GROUP BY e.user_id, l.last_ts, l.last_event_type
"""


def events_user_rate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing event-time aggregates: for EVERY event, the count
    and value-sum of the same user's events in the preceding hour — the
    rate-limiting / velocity-check / fraud-window primitive. This is a
    RANGE-frame window (frame bounds in event-time VALUES, not row
    positions), a distinct physical shape from the rows-frame and bucketed
    windows elsewhere in the catalog: one shuffle on user_id, one sort, and
    the running frame never materializes per-row candidate sets (contrast a
    self-join on ts BETWEEN, which explodes quadratically on hot users).
    Tie semantics are value-based (all equal-ts rows share a frame), so the
    result is deterministic without a tiebreaker column."""
    e = load_table(spark, sf_dir, "events")
    us = epoch_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, -1)  # (ts - 1h, ts) exclusive of self
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_prev_1h"),
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("sum_value_prev_1h"),
    )


EVENTS_USER_RATE_SQL = f"""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_prev_1h,
       CAST(SUM(CAST(value AS {DEC})) OVER w AS DOUBLE) AS sum_value_prev_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND 1 PRECEDING)
"""


#: session-scoped date-partitioned copy of events (one write per app+sf)
_PART_SCRATCH: dict = {}
_PART_LOCK = __import__("threading").Lock()


def _events_partitioned(spark: SparkSession, sf_dir: str) -> tuple[str, object]:
    """Materialize events as a Hive-layout DATE-PARTITIONED table once per
    (application, sf_dir) — the storage layout every 100-TB event store
    uses — and return (path, min event_date). Idempotent per session."""
    import datetime
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    with _PART_LOCK:
        if key not in _PART_SCRATCH:
            out = tempfile.mkdtemp(prefix="events_part_")
            e = load_table(spark, sf_dir, "events").withColumn(
                "event_date", F.to_date("ts")
            )
            e.write.mode("overwrite").partitionBy("event_date").parquet(out)
            min_date = (
                spark.read.parquet(out)
                .agg(F.min("event_date"))
                .collect()[0][0]
            )
            assert isinstance(min_date, datetime.date)
            _PART_SCRATCH[key] = (out, min_date)
        return _PART_SCRATCH[key]


def events_partitioned_day_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION PRUNING, the query-side 100-TB primitive the file-stats
    index covers on the sink side: events are materialized date-partitioned
    (Hive layout — the standard event-store shape), and a one-day slice
    query filters on the PARTITION column with a literal, so the scan
    plans with ``PartitionFilters`` and reads ONLY that day's files —
    verified by an inputFiles() subset pin in test_plan_invariants. At
    100 TB this is the difference between scanning one day and scanning
    three years. The day literal is the corpus's minimum event date
    (one bounded 1-row driver action per session, same pattern as the
    index-artifact collects)."""
    path, min_date = _events_partitioned(spark, sf_dir)
    sliced = spark.read.parquet(path).filter(F.col("event_date") == F.lit(min_date))
    return sliced.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


EVENTS_PARTITIONED_DAY_SQL = f"""
WITH md AS (SELECT MIN(CAST(ts AS DATE)) AS d FROM events)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events, md
WHERE CAST(ts AS DATE) = md.d
GROUP BY event_type
"""


#: EWMA filter depth and decay: alpha = 0.5 makes every weight 2^-j — an
#: EXACT dyadic double, so the weighted sums are bit-identical cross-engine
_EWMA_LAGS = 16


def events_ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA one-step forecast + residual — the lag-window linear
    filter none of the other window entries exercise (smoothing /
    anomaly-scoring primitive for metric streams). forecast_t is the
    exponentially-weighted mean of the previous 16 values (truncated EWMA,
    weights 2^-j renormalized over the lags that exist); resid_t = value_t
    - forecast_t is the surprise signal a threshold alert consumes. One
    shuffle on user_id + one sort; the 16-lag filter is a single window
    pass (each lag reuses the same sorted frame), all codegen'd."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(epoch_micros("ts"), "event_id")
    num, den = F.lit(0.0), F.lit(0.0)
    for j in range(1, _EWMA_LAGS + 1):
        x = F.lag("value", j).over(w)
        wt = F.lit(2.0 ** -(j - 1))
        num = num + F.when(x.isNotNull(), x * wt).otherwise(F.lit(0.0))
        den = den + F.when(x.isNotNull(), wt).otherwise(F.lit(0.0))
    forecast = F.when(den > 0, num / den)
    return e.select(
        "event_id",
        "user_id",
        "value",
        forecast.alias("forecast"),
        (F.col("value") - forecast).alias("resid"),
    )


def _ewma_sql() -> str:
    num_terms, den_terms = [], []
    for j in range(1, _EWMA_LAGS + 1):
        x = f"lag(value, {j}) OVER w"
        wt = repr(2.0 ** -(j - 1))
        num_terms.append(f"CASE WHEN {x} IS NOT NULL THEN {x} * {wt} ELSE 0.0 END")
        den_terms.append(f"CASE WHEN {x} IS NOT NULL THEN {wt} ELSE 0.0 END")
    num = "(0.0 + " + " + ".join(num_terms) + ")"
    den = "(0.0 + " + " + ".join(den_terms) + ")"
    return f"""
WITH f AS (
  SELECT event_id, user_id, value,
         CASE WHEN {den} > 0 THEN {num} / {den} END AS forecast
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_id, user_id, value, forecast, value - forecast AS resid FROM f
"""


EVENTS_EWMA_FORECAST_SQL = _ewma_sql()


def events_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap statistics per user via ``lag`` — the
    inactivity/heartbeat/session-boundary primitive (and the one ordered-
    window access function the catalog didn't yet exercise). One shuffle
    on user_id + one sort; gaps are exact integer micros (lag on
    epoch_micros LONGs), so the per-user aggregates are engine-exact and
    the avg is one long/long double division."""
    e = load_table(spark, sf_dir, "events")
    us = epoch_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    gap = us - F.lag(us).over(w)
    per_event = e.select("user_id", gap.alias("gap_us"))
    return per_event.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        (
            F.sum("gap_us").cast("double") / F.count("gap_us")
        ).alias("avg_gap_us"),
    )


EVENTS_USER_GAPS_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(gap_us) AS n_gaps,
       MIN(gap_us) AS min_gap_us,
       MAX(gap_us) AS max_gap_us,
       CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) AS avg_gap_us
FROM g
GROUP BY user_id
"""


# -- ANN scale paths ----------------------------------------------------------
#
# Both paths carry REAL DuckDB value oracles:
#
# - SRP: seeded md5 hyperplanes re-emitted as SQL literals; the same
#   unnest-sum dot product reproduces Spark's fold bit-for-bit.
# - IVF (static codebook): the deterministic seeded codebook re-emitted as
#   SQL literals — assignment, probe order, cosines, ranks all reproduce
#   exactly. Retrieval QUALITY is pinned separately by
#   tests/test_similarity.py::test_ivf_static_codebook_recall (recall@10
#   floor vs brute-force truth) and an in-test cell-occupancy balance check;
#   the oracle proves the computation, the test pins that the computation is
#   worth doing.
# - IVF (trained): ann_topk_ivf_trained trains kmeans-lite on a
#   deterministic, SQL-expressible sample (vec_id % 4 == 0 AND vec_id <
#   8192) and the oracle-SQL builder reruns the IDENTICAL numpy trainer on
#   the same rows read via DuckDB, then emits the trained centroids as
#   literals — training + assignment + probe are end-to-end hash-verified.

#: IVF catalog-entry hyperparameters (shared by the Spark query and the
#: SQL-literal oracle below)
_IVF_CELLS, _IVF_PROBE, _IVF_K = 8, 3, 10


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 with a STATIC seeded codebook: every vector is assigned to
    its argmax-dot cell, each query probes the 3 best cells only, exact
    cosine within them. At scale the corpus is scanned once for assignment
    and each query batch touches probed cells only.

    The codebook is deterministic (``ivf_static_codebook`` — the query-time
    contract of IVF: a fixed build artifact, never retrained per query), so
    the entry is exactly reproducible in SQL: ANN_TOPK_IVF_SQL re-emits the
    centroids as literals and DuckDB reproduces assignment, probe order,
    cosines, and ranks bit-for-bit. Data-ADAPTED training
    (``ivf_train_centroids``, kmeans-lite on a bounded sample) remains the
    offline index-build path, recall-floor-covered in
    tests/test_similarity.py."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)
    assigned = ivf_assign_arrow(e, cents)
    q = e.filter(F.col("vec_id") < 10)
    return ivf_topk(q, assigned, cents, k=_IVF_K, n_probe=_IVF_PROBE)


def ann_topk_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH top-10: signed-random-projection signatures (seeded, so
    deterministic across runs), exact cosine only on bucket collisions.
    Deterministic end-to-end -> full DuckDB oracle (ANN_TOPK_SRP_SQL)."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return srp_topk(q, e, EMBEDDING_DIM, k=10, n_bits=4, n_tables=8)


# SRP oracle: regenerate the seeded hyperplanes as SQL literals. The dot
# product uses the same positional unnest-sum the other vector oracles use
# (bit-identical to Spark's F.aggregate fold, proven by ann_topk_bruteforce
# hash-matching), so the sign bits — and therefore the buckets, candidate
# sets, cosines, and ranks — are exactly equal.
_SRP_BITS, _SRP_TABLES, _SRP_K = 4, 8, 10

_DOT = "(SELECT sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) FROM (SELECT unnest({A}) a, unnest({B}) b))"
_NORM = "sqrt((SELECT sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) FROM (SELECT unnest({A}) a)))"


def _srp_sig_sql(col: str, table: int) -> str:
    from kafka_cdc_hudi_spark.operators.similarity import _srp_planes

    planes = _srp_planes(EMBEDDING_DIM, _SRP_BITS, table)
    terms = []
    for b in range(_SRP_BITS):
        lit = "[" + ",".join(repr(float(v)) for v in planes[b]) + "]"
        terms.append(f"(CASE WHEN {_DOT.format(A=col, B=lit)} > 0 THEN {2 ** b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _srp_bucket_sql(rel: str, idc: str, ec: str) -> str:
    rows = ", ".join(f"({t}, {_srp_sig_sql(ec, t)})" for t in range(_SRP_TABLES))
    return f"SELECT {idc} AS id, {ec} AS e, t.tbl, t.sig FROM {rel}, LATERAL (VALUES {rows}) t(tbl, sig)"


ANN_TOPK_SRP_SQL = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
qb AS ({_srp_bucket_sql('q', 'vec_id', 'embedding')}),
cb AS ({_srp_bucket_sql('embeddings', 'vec_id', 'embedding')}),
cand AS (
  SELECT DISTINCT qb.id AS qid, qb.e AS qe, cb.id AS nid, cb.e AS ne
  FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.sig = cb.sig AND qb.id <> cb.id
),
scored AS (
  SELECT qid, nid,
         {_DOT.format(A='qe', B='ne')} / ({_NORM.format(A='qe')} * {_NORM.format(A='ne')}) AS cosine
  FROM cand
)
SELECT qid, nid, cosine,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INT) AS rank
FROM scored QUALIFY rank <= {_SRP_K}
"""


# IVF oracle: the static codebook re-emitted as SQL literals; assignment
# (first-wins argmax dot), probe order (top n_probe by dot desc, cell asc),
# cosine, and rank all reproduce Spark bit-for-bit because both engines run
# the identical positional-sum dot product on the identical literals.


def _cents_values(cents) -> str:
    return ", ".join(
        "({i}, [{vals}]::DOUBLE[])".format(
            i=i, vals=",".join(repr(float(v)) for v in c)
        )
        for i, c in enumerate(cents)
    )


def _ivf_sql(cents_values: str, rel: str = "embeddings", extra_ctes: str = "", k: int | None = None, probe: int | None = None, query_max: int = 10) -> str:
    return f"""
WITH {extra_ctes}cents(cell, c) AS (VALUES {cents_values}),
asg_d AS (
  SELECT e.vec_id, e.embedding, cents.cell,
         {_DOT.format(A='e.embedding', B='cents.c')} AS d
  FROM {rel} e CROSS JOIN cents
),
asg AS (
  SELECT vec_id, embedding, cell FROM asg_d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) = 1
),
probe AS (
  SELECT vec_id AS qid, embedding AS qe, cell FROM asg_d
  WHERE vec_id < {query_max}
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) <= {probe if probe is not None else _IVF_PROBE}
),
cand AS (
  SELECT p.qid, p.qe, a.vec_id AS nid, a.embedding AS ne
  FROM probe p JOIN asg a USING (cell)
  WHERE p.qid <> a.vec_id
),
scored AS (
  SELECT qid, nid,
         {_DOT.format(A='qe', B='ne')} / ({_NORM.format(A='qe')} * {_NORM.format(A='ne')}) AS cosine
  FROM cand
)
SELECT qid, nid, cosine,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INT) AS rank
FROM scored QUALIFY rank <= {k if k is not None else _IVF_K}
"""


ANN_TOPK_IVF_SQL = _ivf_sql(_cents_values(ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)))


#: deterministic CDC script constants for the maintained-ANN entry:
#: vectors with vec_id % 7 == 3 are RE-EMBEDDED to their successor's
#: embedding (the vector moves, usually across cells); vectors with
#: vec_id % 13 == 5 are DELETED (must stop appearing in results — some
#: were former top-k neighbors). vec_id ≡ 31 (mod 91) hits BOTH: the
#: delete's higher seq wins, the update-then-delete edge.
_ANN_IVM_UPD_MOD, _ANN_IVM_UPD_RES = 7, 3
_ANN_IVM_DEL_MOD, _ANN_IVM_DEL_RES = 13, 5

#: session-scoped state roots, keyed by (application id, sf_dir): the CDC
#: script runs once per session/SF; later calls query the maintained table
#: (same lifecycle/lock rationale as catalog_text._PAIR_IVM_STATE)
_ANN_IVM_STATE: dict = {}
_ANN_IVM_LOCK = __import__("threading").Lock()


def ann_topk_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 over a CDC-MAINTAINED index (streaming/ann_ivm.py,
    VERDICT r9 item 2): a deterministic 3-batch script — bulk insert the
    corpus, then re-embed vec_id % 7 == 3 to its successor's vector
    (moving it across cells), then delete vec_id % 13 == 5 (evicting
    former top-k neighbors; ids hit by both mods exercise
    update-then-delete) — is folded through ``AnnIndexMaintainer``
    (per-batch ``ivf_assign`` on the BATCH only + one MOR delta append,
    O(churn) per batch, never a corpus re-scan). Queries are the live
    corpus vectors with vec_id < 10 probed through the maintained table
    via ``ivf_topk`` — so the returned top-k must equal a static IVF
    rebuild over the final live corpus, which is exactly what the oracle
    computes (same centroids as literals): the driver value-checks the
    whole maintenance algebra (upsert, cell move, tombstone, precombine),
    not a single-shot query. At 100 TB the maintained table is the
    persisted index artifact; per-batch cost tracks churn and the query
    path is the standing broadcast-probe + cell equi-join shape."""
    m = ann_maintainer_for(spark, sf_dir)
    vid = F.col("vec_id")
    q = m.index(spark).filter(vid < 10).select("vec_id", "embedding")
    return m.topk(spark, q, k=_IVF_K, n_probe=_IVF_PROBE)


def ann_maintainer_for(spark: SparkSession, sf_dir: str):
    """Session-cached maintained ANN index after the deterministic CDC
    script (shared by ann_topk_maintained and the maintained hybrid
    entry — the script runs once per session/SF)."""
    import tempfile

    from kafka_cdc_hudi_spark.streaming.ann_ivm import AnnIndexMaintainer

    cents = ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)
    vid = F.col("vec_id")
    key = (spark.sparkContext.applicationId, sf_dir)
    with _ANN_IVM_LOCK:
        root = _ANN_IVM_STATE.get(key)
        if root is None:
            root = tempfile.mkdtemp(prefix="ann_ivm_")
            m = AnnIndexMaintainer(root=f"{root}/index", cents=cents)
            e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
            b0 = e.select(F.lit("i").alias("op"), "vec_id", "embedding", vid.alias("seq"))
            nxt = e.select(
                (vid - 1).alias("vec_id"), F.col("embedding").alias("next_emb")
            )
            b1 = (
                e.filter(vid % _ANN_IVM_UPD_MOD == _ANN_IVM_UPD_RES)
                .join(nxt, "vec_id", "left")
                .select(
                    F.lit("u").alias("op"),
                    "vec_id",
                    F.coalesce("next_emb", "embedding").alias("embedding"),
                    (vid + F.lit(10_000_000)).alias("seq"),
                )
            )
            b2 = e.filter(vid % _ANN_IVM_DEL_MOD == _ANN_IVM_DEL_RES).select(
                F.lit("d").alias("op"),
                "vec_id",
                F.lit(None).cast(e.schema["embedding"].dataType).alias("embedding"),
                (vid + F.lit(20_000_000)).alias("seq"),
            )
            for bid, bdf in enumerate([b0, b1, b2]):
                m.process(spark, bdf, bid)
            _ANN_IVM_STATE[key] = root
    return AnnIndexMaintainer(root=f"{root}/index", cents=cents)


#: the oracle is a STATIC REBUILD over the live corpus: updates applied,
#: deletes gone, then the identical IVF chain (assignment, probe order,
#: cosine, rank) the static-codebook entry already hash-matches
_ANN_IVM_CORPUS_CTE = f"""corpus AS (
  SELECT e.vec_id,
         CASE WHEN e.vec_id % {_ANN_IVM_UPD_MOD} = {_ANN_IVM_UPD_RES}
                   AND n.embedding IS NOT NULL
              THEN n.embedding ELSE e.embedding END AS embedding
  FROM embeddings e LEFT JOIN embeddings n ON n.vec_id = e.vec_id + 1
  WHERE e.vec_id % {_ANN_IVM_DEL_MOD} <> {_ANN_IVM_DEL_RES}
),
"""

ANN_TOPK_MAINTAINED_SQL = _ivf_sql(
    _cents_values(ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)),
    rel="corpus",
    extra_ctes=_ANN_IVM_CORPUS_CTE,
)


def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality MEASUREMENT as a first-class query: per-query
    recall@10 of the IVF index (3-probe, static codebook) against the
    exact brute-force top-10, computed in ONE plan — the audit a training
    pipeline runs before trusting an ANN index for hard-negative mining
    or near-dup blocking. Exact integer hit counts and ppm recall (no
    float tolerance); both the truth side and the index side are the
    already-oracled entry plans, so this entry additionally proves they
    compose. Scale shape: truth is the broadcast-query brute scan (the
    documented exhaustive baseline — at 100 TB you run it on a sampled
    query set, which is exactly what vec_id < 10 is), the index side is
    the probed-cells-only IVF join; the final hit join is a tiny
    (queries x k) equi-join."""
    from kafka_cdc_hudi_spark.plans.catalog_text import ann_topk_bruteforce

    exact = ann_topk_bruteforce(spark, sf_dir).select("qid", "nid")
    approx = ann_topk_ivf(spark, sf_dir).select("qid", "nid").withColumn(
        "hit", F.lit(1)
    )
    return (
        exact.join(approx, ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("n_hits"),
        )
        .withColumn("recall_ppm", F.expr("n_hits * 1000000 DIV n_exact"))
    )


def _recall_sql() -> str:
    # compose the two already-proven oracle chains: brute-force truth +
    # IVF probe, joined on (qid, nid) for exact integer hit counts
    ivf_body = ANN_TOPK_IVF_SQL.strip()
    assert ivf_body.startswith("WITH ")
    brute = f"""
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
bp AS (
  SELECT q.qid, e.vec_id AS nid,
         {_DOT.format(A="q.qe", B="e.embedding")}
         / ({_NORM.format(A="q.qe")} * {_NORM.format(A="e.embedding")}) AS cosine
  FROM embeddings e, q
  WHERE e.vec_id <> q.qid
),
exact AS (
  SELECT qid, nid FROM bp
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) <= {_IVF_K}
),
ivf AS (
  SELECT qid, nid FROM scored
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) <= {_IVF_K}
)
SELECT e.qid,
       COUNT(*) AS n_exact,
       COUNT(i.nid) AS n_hits,
       CAST((COUNT(i.nid) * 1000000) // COUNT(*) AS BIGINT) AS recall_ppm
FROM exact e LEFT JOIN ivf i ON e.qid = i.qid AND e.nid = i.nid
GROUP BY e.qid
"""
    # reuse the IVF chain's CTEs (cents/asg_d/asg/probe/cand/scored), drop
    # its final SELECT, and append the recall CTEs
    head = ivf_body[: ivf_body.index("\nSELECT qid, nid, cosine,")]
    return head + ",\n" + brute


ANN_RECALL_AT_K_SQL = _recall_sql()


# -- trained IVF: end-to-end (training + probe) hash-verified -----------------

#: the correctness driver evaluates oracles at this scale factor (driver
#: contract); the oracle-literal builder trains on the same parquet
_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def ann_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 with TRAINED centroids, end-to-end oracle-verified:
    kmeans-lite trains on the deterministic SQL-expressible sample
    (vec_id % 4 == 0 AND vec_id < 8192, driver-bounded to <= 2048 rows,
    scan-prunable), and the SAME numpy trainer runs at oracle-build time on
    the same rows read via DuckDB — so the oracle's centroid literals are
    bit-identical to the query's, and training + assignment + probe +
    ranking all hash-match. Closes the round-5 gap where only the static
    codebook was value-oracled and the trained path was recall-floored."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train_sql_sample(e, n_cells=_IVF_CELLS, iters=5)
    assigned = ivf_assign_arrow(e, cents)
    q = e.filter(F.col("vec_id") < 10)
    return ivf_topk(q, assigned, cents, k=_IVF_K, n_probe=_IVF_PROBE)


def ann_recall_trained_vs_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality A/B in one plan: per-query recall@10 of the TRAINED
    IVF codebook vs the STATIC seeded one, both against the exact
    brute-force truth — the measurement that justifies paying for index
    training before a 100-TB build. Exact integer hits + ppm recall; all
    three sides are already-oracled entry plans. The oracle is
    sf-dependent (trained centroids are re-derived per scale factor via
    ``recall_trained_vs_static_sql_for``, the trained-IVF pattern)."""
    from kafka_cdc_hudi_spark.plans.catalog_text import ann_topk_bruteforce

    exact = ann_topk_bruteforce(spark, sf_dir).select("qid", "nid")
    static = (
        ann_topk_ivf(spark, sf_dir).select("qid", "nid").withColumn("hit_s", F.lit(1))
    )
    trained = (
        ann_topk_ivf_trained(spark, sf_dir)
        .select("qid", "nid")
        .withColumn("hit_t", F.lit(1))
    )
    return (
        exact.join(static, ["qid", "nid"], "left")
        .join(trained, ["qid", "nid"], "left")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit_s").alias("n_hits_static"),
            F.count("hit_t").alias("n_hits_trained"),
        )
        .withColumn("recall_static_ppm", F.expr("n_hits_static * 1000000 DIV n_exact"))
        .withColumn("recall_trained_ppm", F.expr("n_hits_trained * 1000000 DIV n_exact"))
    )


def recall_trained_vs_static_sql_for(sf_dir: str) -> str | None:
    """Per-SF oracle for :func:`ann_recall_trained_vs_static` — the two
    IVF oracle chains (static literals + per-SF-retrained literals) and
    the brute-force truth composed as derived tables. None if the sf's
    testdata is absent (rows-only driver fallback)."""
    trained_sql = ivf_trained_sql_for(sf_dir)
    if trained_sql is None:
        return None
    return f"""
WITH bp AS (
  SELECT q.qid, e.vec_id AS nid,
         {_DOT.format(A="q.qe", B="e.embedding")}
         / ({_NORM.format(A="q.qe")} * {_NORM.format(A="e.embedding")}) AS cosine
  FROM embeddings e,
       (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10) q
  WHERE e.vec_id <> q.qid
),
exact AS (
  SELECT qid, nid FROM bp
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) <= {_IVF_K}
),
sivf AS (SELECT qid, nid FROM ({ANN_TOPK_IVF_SQL}) _s),
tivf AS (SELECT qid, nid FROM ({trained_sql}) _t)
SELECT e.qid,
       COUNT(*) AS n_exact,
       COUNT(s.nid) AS n_hits_static,
       COUNT(t.nid) AS n_hits_trained,
       CAST((COUNT(s.nid) * 1000000) // COUNT(*) AS BIGINT) AS recall_static_ppm,
       CAST((COUNT(t.nid) * 1000000) // COUNT(*) AS BIGINT) AS recall_trained_ppm
FROM exact e
LEFT JOIN sivf s ON e.qid = s.qid AND e.nid = s.nid
LEFT JOIN tivf t ON e.qid = t.qid AND e.nid = t.nid
GROUP BY e.qid
"""


def ivf_trained_sql_for(sf_dir: str) -> str | None:
    """Build the trained-IVF oracle FOR A GIVEN SCALE FACTOR by rerunning
    the shared kmeans core on that sf's parquet (read via DuckDB — no Spark
    at import). The embeddings tables are generated independently per sf
    (same vec_id != same vector), so the centroid literals are only valid
    against the sf they were trained from: the registry bakes the driver's
    correctness sf (sf0.01); tests/test_oracle.py rebuilds for its local
    SF_DIR via this function. Returns None (weaker rows-only driver check)
    if the testdata is absent, so importing never fails data-less."""
    import duckdb

    from kafka_cdc_hudi_spark.operators.similarity import (
        TRAIN_SAMPLE_BOUND,
        TRAIN_SAMPLE_MOD,
        kmeans_lite,
    )

    try:
        rows = duckdb.sql(
            f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
            f"WHERE vec_id % {TRAIN_SAMPLE_MOD} = 0 AND vec_id < {TRAIN_SAMPLE_BOUND} "
            "ORDER BY vec_id"
        ).fetchall()
    except Exception:
        return None
    import numpy as np

    x = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    return _ivf_sql(_cents_values(kmeans_lite(x, _IVF_CELLS, iters=5)))


ANN_RECALL_TRAINED_VS_STATIC_SQL = recall_trained_vs_static_sql_for(_ORACLE_SF_DIR)


ANN_TOPK_IVF_TRAINED_SQL = ivf_trained_sql_for(_ORACLE_SF_DIR)


# -- PCA whitening ------------------------------------------------------------


def embedding_pca_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-whitened embedding projection — the standard preprocessing
    before cosine retrieval / clustering on anisotropic embeddings
    (decorrelates dimensions, equalizes variance; e.g. the whitening step
    in SimCSE-style pipelines). Train: covariance + eigh on the SAME
    hard-bounded deterministic sample as the IVF trainer (≤2048 rows — at
    100 TB the projection trains on a sample and broadcasts, never scans).
    Apply: pc_k = dot(x, w_k) - dot(mean, w_k), a pure literal projection
    (512 codegen'd flops/row, zero shuffle, scan-parallel). Identity used:
    (x - mean)·w == x·w - mean·w, so no per-row centering array is
    needed and the mean folds into one baked scalar per component."""
    import numpy as np

    from kafka_cdc_hudi_spark.operators.similarity import pca_whiten_train

    e = load_table(spark, sf_dir, "embeddings")
    mu, ws, _lams = pca_whiten_train(e)
    cols = []
    for k, w in enumerate(ws):
        arr = F.array(*[F.lit(float(v)) for v in w])
        d = F.aggregate(
            F.zip_with(F.col("embedding"), arr, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cols.append((d - F.lit(float(np.dot(mu, w)))).alias(f"pc{k}"))
    return e.select("vec_id", *cols, "label")


def pca_whiten_sql_for(sf_dir: str) -> str | None:
    """Oracle builder (sf-dependent trained artifact, the
    ivf_trained_sql_for pattern): re-derive mean/weights from the same
    sample rows via DuckDB + the shared numpy core, bake them as literals.
    Scalar constants go through CAST('repr' AS DOUBLE) (bare full-precision
    literals parse as DECIMAL and double-round the last bit)."""
    import duckdb

    from kafka_cdc_hudi_spark.operators.similarity import (
        TRAIN_SAMPLE_BOUND,
        TRAIN_SAMPLE_MOD,
        pca_whiten_core,
    )

    try:
        rows = duckdb.sql(
            f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
            f"WHERE vec_id % {TRAIN_SAMPLE_MOD} = 0 AND vec_id < {TRAIN_SAMPLE_BOUND} "
            "ORDER BY vec_id"
        ).fetchall()
    except Exception:
        return None
    import numpy as np

    x = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    mu, ws, _lams = pca_whiten_core(x)
    terms = []
    for k, w in enumerate(ws):
        # per-element string cast: bare full-precision literals parse as
        # DECIMAL and double-round the last bit (see pq_sub_dot's rule 2);
        # eigenvector weights, unlike the dyadic md5 centroids, hit this
        lit = "[" + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in w) + "]"
        c = repr(float(np.dot(mu, w)))
        terms.append(
            f"({_DOT.format(A='embedding', B=lit)}) - CAST('{c}' AS DOUBLE) AS pc{k}"
        )
    return f"SELECT vec_id, {', '.join(terms)}, label FROM embeddings"


EMBEDDING_PCA_WHITEN_SQL = pca_whiten_sql_for(_ORACLE_SF_DIR)


# -- product quantization: encode + ADC scan ----------------------------------
#
# The memory-bound half of an IVF-PQ index (operators/similarity.py). Both
# entries carry FULL SQL oracles: the deterministic seeded codebooks are
# re-emitted as literals and the positional-sum dot products reproduce
# Spark bit-for-bit, so codes, packed words, ADC lookups, and ranks all
# hash-match.

_PQ_SUB, _PQ_CODES, _PQ_K = 8, 16, 10


def embedding_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding: 64-dim float vectors compress to 8 x 4-bit codes (one
    32-bit word, 64x smaller than raw floats) — the vector-compression
    build pass of an IVF-PQ index. Pure projection over broadcast codebook
    literals; zero shuffle, scan-parallel at any corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(EMBEDDING_DIM, _PQ_SUB, _PQ_CODES)
    return pq_encode_arrow(e, books)


def ann_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10: queries precompute per-subspace dot tables; candidates
    are scored by 8 table lookups on their codes — the raw corpus vectors
    are never read at query time (the PQ promise: the scan touches 4 bytes
    per vector, not 256). Queries broadcast; WindowGroupLimit top-k.
    Retrieval quality vs exact dot-product truth is floor-pinned in
    tests/test_similarity.py::test_pq_adc_recall."""
    e = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(EMBEDDING_DIM, _PQ_SUB, _PQ_CODES)
    enc = pq_encode_arrow(e, books)
    q = e.filter(F.col("vec_id") < 10)
    return pq_adc_topk(q, enc, books, k=_PQ_K)


def _pq_dots_list_duck(col: str, m: int, book) -> str:
    acc = f"{col}[{{i}}]"
    ds = book.shape[1]
    return "[" + ",".join(pq_sub_dot(acc, m, ds, c) for c in book) + "]"


def _pq_enc_cte() -> str:
    books = pq_codebooks(EMBEDDING_DIM, _PQ_SUB, _PQ_CODES)
    codes = []
    for m, book in enumerate(books):
        darr = _pq_dots_list_duck("embedding", m, book)
        codes.append(
            f"CAST(list_position({darr}, list_max({darr})) - 1 AS INT) AS code_{m}"
        )
    return f"enc AS (SELECT vec_id, {', '.join(codes)} FROM embeddings)"


_PQ_PACKED = " + ".join(
    f"CAST(code_{m} AS BIGINT) * {_PQ_CODES ** m}" for m in range(_PQ_SUB)
)

EMBEDDING_PQ_ENCODE_SQL = f"""
WITH {_pq_enc_cte()}
SELECT vec_id, {', '.join(f'code_{m}' for m in range(_PQ_SUB))},
       ({_PQ_PACKED}) AS pq_code
FROM enc
"""


def _pq_adc_sql() -> str:
    books = pq_codebooks(EMBEDDING_DIM, _PQ_SUB, _PQ_CODES)
    qd = ", ".join(
        f"{_pq_dots_list_duck('embedding', m, book)} AS qd_{m}"
        for m, book in enumerate(books)
    )
    lookup = " + ".join(f"q.qd_{m}[enc.code_{m} + 1]" for m in range(_PQ_SUB))
    return f"""
WITH {_pq_enc_cte()},
q AS (SELECT vec_id AS qid, {qd} FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.qid, enc.vec_id AS nid, ({lookup}) AS adc_dot
  FROM enc CROSS JOIN q
  WHERE q.qid <> enc.vec_id)
SELECT qid, nid, adc_dot,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_dot DESC, nid) AS INT) AS rank
FROM scored QUALIFY rank <= {_PQ_K}
"""


ANN_TOPK_PQ_ADC_SQL = _pq_adc_sql()


def ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the full two-level ANN index — IVF cells prune each query's
    scan to 3 of 8 cells, PQ/ADC scores the survivors by table lookup. The
    stored index is (cell, 32-bit code) per vector; raw vectors are read
    only at build time. Oracle: both halves' literal artifacts compose, so
    assignment, codes, probe order, lookups, and ranks all hash-match."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)
    books = pq_codebooks(EMBEDDING_DIM, _PQ_SUB, _PQ_CODES)
    q = e.filter(F.col("vec_id") < 10)
    return ivfpq_topk(q, e, cents, books, k=_PQ_K, n_probe=_IVF_PROBE)


def _ivfpq_scored_ctes() -> str:
    """CTE chain ending in ``scored`` (per-query ADC scores over the probed
    cells) — shared by the plain IVF-PQ oracle and the exact-rerank one."""
    books = pq_codebooks(EMBEDDING_DIM, _PQ_SUB, _PQ_CODES)
    cents_values = _cents_values(ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS))
    qd = ", ".join(
        f"{_pq_dots_list_duck('embedding', m, book)} AS qd_{m}"
        for m, book in enumerate(books)
    )
    lookup = " + ".join(f"q.qd_{m}[i.code_{m} + 1]" for m in range(_PQ_SUB))
    return f"""
WITH cents(cell, c) AS (VALUES {cents_values}),
asg_d AS (
  SELECT e.vec_id, e.embedding, cents.cell,
         {_DOT.format(A='e.embedding', B='cents.c')} AS d
  FROM embeddings e CROSS JOIN cents),
asg AS (
  SELECT vec_id, cell FROM asg_d
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) = 1),
{_pq_enc_cte()},
idx AS (SELECT asg.vec_id, asg.cell,
               {', '.join(f'enc.code_{m}' for m in range(_PQ_SUB))}
        FROM asg JOIN enc USING (vec_id)),
probe AS (
  SELECT vec_id AS qid, cell FROM asg_d
  WHERE vec_id < 10
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) <= {_IVF_PROBE}),
q AS (SELECT vec_id AS qid, {qd} FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT p.qid, i.vec_id AS nid, ({lookup}) AS adc_dot
  FROM probe p JOIN idx i USING (cell) JOIN q USING (qid)
  WHERE p.qid <> i.vec_id)"""


def _ivfpq_sql() -> str:
    return f"""
{_ivfpq_scored_ctes()}
SELECT qid, nid, adc_dot,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_dot DESC, nid) AS INT) AS rank
FROM scored QUALIFY rank <= {_PQ_K}
"""


ANN_TOPK_IVFPQ_SQL = _ivfpq_sql()


#: ADC shortlist width for the exact-rerank entry: 5x the final k — wide
#: enough that the exact stage, not quantization, decides the final order
_RERANK_C = 50


def ann_topk_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + EXACT RE-RANK — the production retrieval shape: the
    quantized index (4 bytes/vector) prunes and coarsely scores, an ADC
    shortlist of C=50 per query survives, and only those C raw vectors are
    re-read for exact cosine, which decides the final top-10. At scale the
    (shortlist x query-vector) frame is queries x C rows — broadcast into
    the raw-corpus scan, so the refine stage costs one broadcast-hash-join
    pass over the corpus and reads full vectors for 50 rows per query
    instead of all of them. Output ranks are EXACT for every shortlisted
    neighbor (quantization error only costs recall, never ordering) —
    directly comparable to ann_topk_bruteforce rows."""
    from kafka_cdc_hudi_spark.functions.vectors import cosine

    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)
    books = pq_codebooks(EMBEDDING_DIM, _PQ_SUB, _PQ_CODES)
    q = e.filter(F.col("vec_id") < 10)
    shortlist = ivfpq_topk(q, e, cents, books, k=_RERANK_C, n_probe=_IVF_PROBE).select(
        "qid", "nid"
    )
    qe = q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    sl = shortlist.join(qe, "qid")
    exact = (
        e.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("ne"))
        .join(F.broadcast(sl), "nid")
        .withColumn("cosine", cosine(F.col("qe"), F.col("ne")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PQ_K)
        .select("qid", "nid", "cosine", "rank")
    )


def _ivfpq_rerank_sql() -> str:
    cos = (
        f"{_DOT.format(A='qv.embedding', B='nv.embedding')}"
        f" / ({_NORM.format(A='qv.embedding')} * {_NORM.format(A='nv.embedding')})"
    )
    return f"""
{_ivfpq_scored_ctes()},
short AS (
  SELECT qid, nid FROM scored
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY adc_dot DESC, nid) <= {_RERANK_C}),
exact AS (
  SELECT s.qid, s.nid, {cos} AS cosine
  FROM short s
  JOIN embeddings qv ON qv.vec_id = s.qid
  JOIN embeddings nv ON nv.vec_id = s.nid)
SELECT qid, nid, cosine,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INT) AS rank
FROM exact QUALIFY rank <= {_PQ_K}
"""


ANN_TOPK_IVFPQ_RERANK_SQL = _ivfpq_rerank_sql()


# -- SemDeDup: k-means semantic clustering + within-cluster prune -------------
#
# Semantic deduplication in the SemDeDup style (Abbas et al. 2023,
# arXiv:2303.09540): cluster the corpus embeddings with k-means, then prune
# within each cluster any document whose cosine to a lower-id clustermate
# exceeds tau — cross-cluster near-dups are deliberately out of scope (the
# paper's own recall trade for near-linear cost). Differs from
# dedup_embedding_cosine (SRP-bucket pair mining) in BOTH halves: candidates
# come from a trained data-adapted partition of the space, and the output is
# the per-document keep/prune decision, not the pair list.

SEMDEDUP_TAU = 0.35
_SEMDEDUP_TARGET_CELL = 96
_SEMDEDUP_MIN_CELLS, _SEMDEDUP_MAX_CELLS = 8, 256


def semdedup_cells_for(n_rows: int) -> int:
    """Cell count that holds CLUSTER SIZE (not cluster count) roughly fixed
    as the corpus grows — the property that makes within-cluster pairing
    LINEAR in corpus size: with clusters capped near ``_SEMDEDUP_TARGET_CELL``
    docs, pairs-per-cluster is a constant and total candidate work is
    N * O(target). Doubling cells until the mean cluster fits mirrors the
    SemDeDup paper's practice of scaling cluster count with the corpus
    (50k clusters for LAION); the ``_SEMDEDUP_MAX_CELLS`` clamp keeps the
    broadcast codebook and the oracle's literal block bounded — at 100 TB
    you raise the clamp, not the algorithm."""
    c = _SEMDEDUP_MIN_CELLS
    while c < _SEMDEDUP_MAX_CELLS and n_rows // c > _SEMDEDUP_TARGET_CELL:
        c *= 2
    return c


def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings corpus: kmeans-lite is trained on the
    deterministic SQL-expressible sample (bounded 2048-row collect, the
    trained-IVF pattern), every vector is assigned to its argmax-dot cell
    (broadcast codebook, one scan), and within each cell a document is
    pruned when a smaller-id clustermate sits at cosine >= SEMDEDUP_TAU
    (greedy min-id survivor — deterministic, so the whole decision is
    SQL-reproducible). Output: one row per document with its cluster, the
    keep/prune verdict, and the canonical survivor it duplicates (-1 when
    kept).

    Scale shape: candidate generation is an equi-join on ``cell`` whose
    per-key size is bounded by :func:`semdedup_cells_for` (cluster size,
    not count, is held fixed → pair work linear in N); the codebook is a
    driver artifact broadcast as literals; one count job + one training
    collect, both bounded. The assignment is localCheckpointed because the
    self-join references it twice (the standing LSH-chain rule). Oracle:
    per-SF builder :func:`semdedup_sql_for` reruns the identical numpy
    trainer on the same rows via DuckDB and emits centroid literals, so
    training, assignment, cosines, and verdicts all hash-match."""
    from kafka_cdc_hudi_spark.functions.vectors import cosine
    from kafka_cdc_hudi_spark.operators.similarity import ivf_assign_pandas

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_cells = semdedup_cells_for(e.count())
    cents = ivf_train_sql_sample(e, n_cells=n_cells, iters=5)
    # native expressions up to 64 cells (codegen-friendly); the Arrow matmul
    # kernel beyond (identical assignments — test_similarity.py pins the
    # equality). The oracle SFs (<=2000 rows) always take the native path.
    assign = ivf_assign if n_cells <= 64 else ivf_assign_pandas
    asg = assign(e, cents).localCheckpoint(eager=False)
    left = asg.select(
        "cell", F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    right = asg.select(
        "cell", F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    dup = (
        left.join(right, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
        .groupBy("vec_b")
        .agg(F.min("vec_a").alias("dup_min"))
    )
    return (
        asg.select("vec_id", "cell")
        .join(dup, asg.vec_id == dup.vec_b, "left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("dup_min").isNull(), 1).otherwise(0).cast("int").alias("keep"),
            F.coalesce(F.col("dup_min"), F.lit(-1)).cast("long").alias("dup_of"),
        )
    )


def semdedup_sql_for(sf_dir: str) -> str | None:
    """Per-SF oracle for :func:`dedup_semantic_clusters`: rerun the shared
    kmeans core on that SF's parquet (read via DuckDB, no Spark at import),
    re-derive the adaptive cell count from the same row count, and emit the
    centroids as literals. None (rows-only driver fallback) if the testdata
    is absent."""
    import duckdb

    from kafka_cdc_hudi_spark.operators.similarity import (
        TRAIN_SAMPLE_BOUND,
        TRAIN_SAMPLE_MOD,
        kmeans_lite,
    )

    try:
        n_rows = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchone()[0]
        rows = duckdb.sql(
            f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
            f"WHERE vec_id % {TRAIN_SAMPLE_MOD} = 0 AND vec_id < {TRAIN_SAMPLE_BOUND} "
            "ORDER BY vec_id"
        ).fetchall()
    except Exception:
        return None
    import numpy as np

    x = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    cents = kmeans_lite(x, semdedup_cells_for(n_rows), iters=5)
    cos = (
        f"{_DOT.format(A='x.embedding', B='y.embedding')} "
        f"/ ({_NORM.format(A='x.embedding')} * {_NORM.format(A='y.embedding')})"
    )
    return f"""
WITH cents(cell, c) AS (VALUES {_cents_values(cents)}),
asg AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, cents.cell,
           {_DOT.format(A='e.embedding', B='cents.c')} AS d
    FROM embeddings e CROSS JOIN cents)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cell) = 1),
dup AS (
  SELECT y.vec_id AS vec_b, MIN(x.vec_id) AS dup_min
  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE {cos} >= {SEMDEDUP_TAU}
  GROUP BY y.vec_id)
SELECT a.vec_id, a.cell,
       CAST(CASE WHEN d.dup_min IS NULL THEN 1 ELSE 0 END AS INT) AS keep,
       CAST(COALESCE(d.dup_min, -1) AS BIGINT) AS dup_of
FROM asg a LEFT JOIN dup d ON a.vec_id = d.vec_b
"""


DEDUP_SEMANTIC_CLUSTERS_SQL = semdedup_sql_for(_ORACLE_SF_DIR)




# -- hybrid retrieval: BM25 + IVF fused by reciprocal-rank fusion -----------

#: arm depth, fused top-k, query count, RRF damping constant (the standard
#: k=60 from the RRF literature)
_HY_ARM_K, _HY_K, _HY_NQ, _RRF_C = 20, 10, 5, 60


def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the production RAG retrieval shape: a LEXICAL arm
    (exact BM25 over the documents inverted index, streaming/bm25_ivm.py)
    and a SEMANTIC arm (IVF cosine top-k over the embeddings, static
    codebook) each produce a top-20 ranking for the same 5 query ids;
    the two rankings fuse by reciprocal-rank fusion
    ``score = sum(1 / (60 + rank))`` and the fused top-10 returns.

    RRF fuses RANKS, not scores, so the fusion layer adds no new float
    hazards (each 1/(60+rank) is one exact-int division; the two-arm sum
    is a fixed-order expression) and the oracle composes the two proven
    SQL chains verbatim as subqueries. Note the deliberate asymmetry the
    fusion must handle: BM25 retrieves the query document itself (rank 1
    self-hit) while ``ivf_topk`` excludes self — so every query has docs
    ranked by only one arm, exercising the COALESCE path non-vacuously.

    Scale shape: each arm is its own proven plan (query-term broadcast
    into posting lists; centroid probe + cell equi-join); fusion is a
    tiny (n_queries x arm_k) full-outer join + WindowGroupLimit."""
    from kafka_cdc_hudi_spark.functions.textfns import tokens
    from kafka_cdc_hudi_spark.streaming.bm25_ivm import bm25_topk, query_pruned_postings

    d = load_table(spark, sf_dir, "documents")
    qd = d.filter(F.col("doc_id") < _HY_NQ).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    # one-shot lex arm: postings prune to the query-term set below the
    # aggregation (r11 scale fix, same as text_bm25_topk)
    posts = query_pruned_postings(d, qd)
    dl = d.select("doc_id", F.size(tokens("text")).cast("long").alias("dl"))
    lex = bm25_topk(qd, posts, dl, k=_HY_ARM_K).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)
    sem = ivf_topk(
        e.filter(F.col("vec_id") < _HY_NQ),
        ivf_assign_arrow(e, cents),
        cents,
        k=_HY_ARM_K,
        n_probe=_IVF_PROBE,
    ).select(
        F.col("qid").alias("query_id"),
        F.col("nid").alias("doc_id"),
        F.col("rank").alias("sem_rank"),
    )
    return _rrf_fuse(lex, sem)


def _rrf_fuse(lex, sem):
    """Spark-side RRF fusion of two (query_id, doc_id, *_rank) arms —
    shared by the static and maintained hybrid entries."""
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_C) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(_RRF_C) + F.col("sem_rank")), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HY_K)
        .select("query_id", "doc_id", "rrf_score", "lex_rank", "sem_rank", "rank")
    )


def _rrf_fusion_sql(lex_stmt: str, sem_stmt: str) -> str:
    """DuckDB-side fusion wrapper over two self-contained arm statements
    (each arm's WITH names are scoped to its subquery, so the two corpus
    CTEs cannot collide)."""
    return f"""
WITH lex AS (SELECT query_id, doc_id, rank AS lex_rank FROM ({lex_stmt})),
sem AS (SELECT qid AS query_id, nid AS doc_id, rank AS sem_rank FROM ({sem_stmt})),
fused AS (
  SELECT COALESCE(lex.query_id, sem.query_id) AS query_id,
         COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         lex_rank, sem_rank,
         COALESCE(CAST('1.0' AS DOUBLE) / ({_RRF_C} + lex_rank), CAST('0.0' AS DOUBLE))
         + COALESCE(CAST('1.0' AS DOUBLE) / ({_RRF_C} + sem_rank), CAST('0.0' AS DOUBLE)) AS rrf_score
  FROM lex FULL OUTER JOIN sem
    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id
)
SELECT query_id, doc_id, rrf_score, lex_rank, sem_rank,
       CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
FROM fused
QUALIFY rank <= {_HY_K}
"""


def _hybrid_rrf_sql() -> str:
    from kafka_cdc_hudi_spark.plans.catalog_text import _bm25_sql

    return _rrf_fusion_sql(
        _bm25_sql("documents", k=_HY_ARM_K, query_max=_HY_NQ),
        _ivf_sql(
            _cents_values(ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)),
            k=_HY_ARM_K,
            query_max=_HY_NQ,
        ),
    )


HYBRID_RETRIEVAL_RRF_SQL = _hybrid_rrf_sql()


def hybrid_retrieval_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search over the MAINTAINED indexes — the full production
    story in one entry: the corpus churns under CDC (the BM25 script
    rewrites doc_id%9==4 and deletes doc_id%12==7; the vector script
    re-embeds vec_id%7==3 across cells and deletes vec_id%13==5,
    independently — a real pipeline's text and embedding refreshes are
    not atomic), both maintained indexes absorb their deltas at
    O(churn), and queries fuse the two LIVE rankings by RRF. The oracle
    composes the two maintained entries' full-recompute chains (each
    over its own post-CDC corpus CTE) under the same fusion wrapper, so
    the driver value-checks maintenance AND fusion end-to-end. Deleted
    docs/vectors must be absent from their arm — and a doc deleted from
    ONE side only must still surface through the other arm's rank (the
    COALESCE path), which the oracle enforces exactly."""
    from kafka_cdc_hudi_spark.plans.catalog_text import bm25_maintainer_for

    mb = bm25_maintainer_for(spark, sf_dir)
    did = F.col("doc_id")
    qd = load_table(spark, sf_dir, "documents").filter(did < _HY_NQ).select(
        did.alias("query_id"), "text"
    )
    lex = mb.topk(spark, qd, k=_HY_ARM_K).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    ma = ann_maintainer_for(spark, sf_dir)
    qe = ma.index(spark).filter(F.col("vec_id") < _HY_NQ).select("vec_id", "embedding")
    sem = ma.topk(spark, qe, k=_HY_ARM_K, n_probe=_IVF_PROBE).select(
        F.col("qid").alias("query_id"),
        F.col("nid").alias("doc_id"),
        F.col("rank").alias("sem_rank"),
    )
    return _rrf_fuse(lex, sem)


def _hybrid_maintained_sql() -> str:
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _BM25_CORPUS_CTE,
        _bm25_sql,
    )

    return _rrf_fusion_sql(
        _bm25_sql("corpus", extra_ctes=_BM25_CORPUS_CTE, k=_HY_ARM_K, query_max=_HY_NQ),
        _ivf_sql(
            _cents_values(ivf_static_codebook(EMBEDDING_DIM, _IVF_CELLS)),
            rel="corpus",
            extra_ctes=_ANN_IVM_CORPUS_CTE,
            k=_HY_ARM_K,
            query_max=_HY_NQ,
        ),
    )


HYBRID_RETRIEVAL_MAINTAINED_SQL = _hybrid_maintained_sql()


STREAMING_QUERIES: dict[str, tuple] = {
    "hybrid_retrieval_rrf": (hybrid_retrieval_rrf, HYBRID_RETRIEVAL_RRF_SQL),
    "hybrid_retrieval_maintained": (hybrid_retrieval_maintained, HYBRID_RETRIEVAL_MAINTAINED_SQL),
    "embedding_pq_encode": (embedding_pq_encode, EMBEDDING_PQ_ENCODE_SQL),
    "ann_topk_pq_adc": (ann_topk_pq_adc, ANN_TOPK_PQ_ADC_SQL),
    "ann_topk_ivfpq": (ann_topk_ivfpq, ANN_TOPK_IVFPQ_SQL),
    "ann_topk_ivfpq_rerank": (ann_topk_ivfpq_rerank, ANN_TOPK_IVFPQ_RERANK_SQL),
    "embedding_pca_whiten": (embedding_pca_whiten, EMBEDDING_PCA_WHITEN_SQL),
    "events_tumbling_windows": (events_tumbling_windows, EVENTS_TUMBLING_SQL),
    "events_sliding_windows": (events_sliding_windows, EVENTS_SLIDING_SQL),
    "events_session_windows": (events_session_windows, EVENTS_SESSION_SQL),
    "user_running_stats_batch": (user_running_stats_batch, USER_RUNNING_STATS_SQL),
    "events_user_rate_window": (events_user_rate_window, EVENTS_USER_RATE_SQL),
    "events_user_gaps": (events_user_gaps, EVENTS_USER_GAPS_SQL),
    "events_ewma_forecast": (events_ewma_forecast, EVENTS_EWMA_FORECAST_SQL),
    "ann_topk_ivf": (ann_topk_ivf, ANN_TOPK_IVF_SQL),
    "ann_topk_maintained": (ann_topk_maintained, ANN_TOPK_MAINTAINED_SQL),
    "ann_recall_at_k": (ann_recall_at_k, ANN_RECALL_AT_K_SQL),
    "ann_recall_trained_vs_static": (ann_recall_trained_vs_static, ANN_RECALL_TRAINED_VS_STATIC_SQL),
    "events_partitioned_day_slice": (events_partitioned_day_slice, EVENTS_PARTITIONED_DAY_SQL),
    "ann_topk_ivf_trained": (ann_topk_ivf_trained, ANN_TOPK_IVF_TRAINED_SQL),
    "ann_topk_srp": (ann_topk_srp, ANN_TOPK_SRP_SQL),
    "dedup_semantic_clusters": (dedup_semantic_clusters, DEDUP_SEMANTIC_CLUSTERS_SQL),
}
