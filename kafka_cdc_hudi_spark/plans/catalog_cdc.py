"""Oracle-checked CDC queries (driver contract, SURVEY §5.2).

Each entry runs the REAL engine path on deterministic fixtures generated
from the ``events`` parquet (plans/cdc_fixtures.py): events -> JSON CDC
envelopes -> declarative parse -> route/dedup/merge. The DuckDB oracle
computes the same answer directly from ``events`` (a JSON round-trip is an
identity, so parsing correctness is exactly what the comparison proves).

Op derivation (MUST stay in sync with cdc_fixtures):
    event_id % 10: 0->delete, 1->insert/create, 2->load/read, else update
DMS control records: event_id % 97 == 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.operators.cdc import (
    parse_debezium,
    parse_dms,
    raw_route_prefilter,
    route,
)
from kafka_cdc_hudi_spark.operators.dedup import latest_per_key
from kafka_cdc_hudi_spark.operators.merge import (
    merge_upsert_two_batches,
    partial_update_fold,
)
from kafka_cdc_hudi_spark.plans.cdc_fixtures import (
    EVENTS_PAYLOAD_SCHEMA,
    debezium_envelopes,
    dms_envelopes,
)
from kafka_cdc_hudi_spark.sources.tables import load_table

#: shared oracle fragment: events + derived debezium op + mtime
_EVT_CTE = """
evt AS (
  SELECT event_id, ts, user_id, event_type, value, props,
         CASE WHEN event_id % 10 = 0 THEN 'd'
              WHEN event_id % 10 = 1 THEN 'c'
              WHEN event_id % 10 = 2 THEN 'r'
              ELSE 'u' END AS operation,
         epoch_ms(ts) AS mtime,
         (event_id % 10 = 0) AS is_deleted
  FROM events
)
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


#: session-scoped MOR sink scratch dirs, keyed by (application id, sf_dir) —
#: same lifecycle as catalog_text._INDEX_CACHE. The dir must outlive the
#: query function so the returned DataFrame stays a lazy file scan (the
#: previous TemporaryDirectory forced a driver-side collect()). Lock: the
#: three queries sharing the table may be invoked concurrently by a
#: harness; two mkdtemp winners would split the v1/v2 history across dirs.
_MOR_SCRATCH: dict = {}
_MOR_LOCK = __import__("threading").Lock()


def _mor_scratch_dir(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    with _MOR_LOCK:
        if key not in _MOR_SCRATCH:
            _MOR_SCRATCH[key] = tempfile.mkdtemp(prefix="mor_query_")
        return _MOR_SCRATCH[key]


def _norm(df: DataFrame) -> DataFrame:
    """Rename engine helper column for oracle comparison."""
    return df.withColumnRenamed("_deleted", "is_deleted")


# -- queries -----------------------------------------------------------------


def cdc_parse_debezium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9/O11/O13/O14/O16: full parse of a Debezium stream incl. delete
    recovery from `before`."""
    env = debezium_envelopes(_events(spark, sf_dir))
    return _norm(parse_debezium(env, EVENTS_PAYLOAD_SCHEMA))


CDC_PARSE_DEBEZIUM_SQL = f"""
WITH {_EVT_CTE}
SELECT event_id, ts, user_id, event_type, value, props, mtime, operation, is_deleted
FROM evt
"""


def cdc_parse_dms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DMS dialect parse: control records dropped, ISO-string mtime."""
    env = dms_envelopes(_events(spark, sf_dir))
    return _norm(parse_dms(env, EVENTS_PAYLOAD_SCHEMA))


CDC_PARSE_DMS_SQL = """
SELECT event_id, ts, user_id, event_type, value, props,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS mtime,
       CASE WHEN event_id % 10 = 0 THEN 'delete'
            WHEN event_id % 10 = 1 THEN 'insert'
            WHEN event_id % 10 = 2 THEN 'load'
            ELSE 'update' END AS operation,
       (event_id % 10 = 0) AS is_deleted
FROM events
WHERE event_id % 97 <> 0
"""


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD TYPE-2 reconstruction of the full Debezium stream: every key
    version with its validity interval — the warehouse-history read the
    reference's latest-row-only merge throws away (glue/cdc_hudi.py keeps
    one row per key; this keeps them all, delete tombstones closing
    intervals without opening one, so a deleted key has no current row).
    One shuffle + one sort (the latest-per-key cost), no self-join."""
    from kafka_cdc_hudi_spark.operators.temporal import scd2_history

    env = debezium_envelopes(_events(spark, sf_dir))
    parsed = parse_debezium(env, EVENTS_PAYLOAD_SCHEMA)
    hist = scd2_history(parsed, ["user_id"], ts_col="ts", tiebreakers=["event_id"])
    return hist.select(
        "user_id", "event_id", "event_type", "value", "valid_from", "valid_to", "is_current"
    )


CDC_SCD2_HISTORY_SQL = f"""
WITH {_EVT_CTE},
h AS (
  SELECT user_id, event_id, event_type, value, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         is_deleted
  FROM evt)
SELECT user_id, event_id, event_type, value, valid_from, valid_to,
       (valid_to IS NULL) AS is_current
FROM h WHERE NOT is_deleted
"""


def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15: in-batch latest event per primary key (user_id), deterministic
    tie-break by event_id."""
    env = debezium_envelopes(_events(spark, sf_dir))
    parsed = parse_debezium(env, EVENTS_PAYLOAD_SCHEMA)
    return _norm(latest_per_key(parsed, ["user_id"], "mtime", tiebreakers=["event_id"]))


CDC_LATEST_PER_KEY_SQL = f"""
WITH {_EVT_CTE}
SELECT event_id, ts, user_id, event_type, value, props, mtime, operation, is_deleted
FROM evt
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, event_id DESC) = 1
"""


def cdc_latest_per_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15 with a composite primary key (user_id, event_type)
    (/root/reference/glue/cdc_hudi.py:148,157; FIXTURES A3.6)."""
    env = debezium_envelopes(_events(spark, sf_dir))
    parsed = parse_debezium(env, EVENTS_PAYLOAD_SCHEMA)
    return _norm(
        latest_per_key(parsed, ["user_id", "event_type"], "mtime", tiebreakers=["event_id"])
    )


CDC_LATEST_PER_COMPOSITE_KEY_SQL = f"""
WITH {_EVT_CTE}
SELECT event_id, ts, user_id, event_type, value, props, mtime, operation, is_deleted
FROM evt
QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY mtime DESC, event_id DESC) = 1
"""


def cdc_merge_two_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O18 (the heart): two micro-batch merges with precombine + delete
    semantics; returns the final table state. Batch A = even event_id,
    batch B = odd, so keys interleave and arrive out of order across
    batches (FIXTURES A3.5).

    r14 optimization (guide §2.3/§2.4): the fused one-pass fold
    (``merge_upsert_two_batches``, pinned equal to the sequential
    ``merge_upsert`` chain in tests/test_merge.py) replaces the two-filter
    shape that executed the envelope+parse lineage TWICE and paid two
    exchanges — now one pass, one exchange, map-side combine."""
    env = debezium_envelopes(_events(spark, sf_dir))
    parsed = parse_debezium(env, EVENTS_PAYLOAD_SCHEMA)
    s2 = merge_upsert_two_batches(
        parsed.drop("operation"),
        F.col("event_id") % 2 == 1,
        ["user_id"],
        tiebreakers=["event_id"],
    )
    return s2.select("event_id", "ts", "user_id", "event_type", "value", "props", "mtime")


CDC_MERGE_TWO_BATCHES_SQL = f"""
WITH {_EVT_CTE},
s1 AS (
  SELECT * FROM evt WHERE event_id % 2 = 0
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, event_id DESC) = 1
),
-- stored state drops the delete flag; surviving rows are never "deleted"
s1k AS (
  SELECT event_id, ts, user_id, event_type, value, props, mtime,
         FALSE AS is_deleted, 0 AS src
  FROM s1 WHERE NOT is_deleted
),
b2 AS (
  SELECT event_id, ts, user_id, event_type, value, props, mtime, is_deleted, 1 AS src
  FROM evt WHERE event_id % 2 = 1
),
merged AS (
  SELECT * FROM (SELECT * FROM s1k UNION ALL SELECT * FROM b2)
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, src DESC, event_id DESC) = 1
)
SELECT event_id, ts, user_id, event_type, value, props, mtime
FROM merged WHERE NOT is_deleted
"""


def cdc_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read sink: the same two-batch merge as
    ``cdc_merge_two_batches`` but committed as O(batch) delta appends and
    folded at read time (sinks/keyed_table.py mode="mor" — the Hudi
    MERGE_ON_READ capability the reference's COW setup lacks).

    Fold semantics = global latest per key by (mtime, commit, event_id)
    with tombstones first-class, so the oracle is a single QUALIFY over the
    union — delete tombstones suppress older cross-commit inserts (Hudi MOR
    log-merge precombine), which is where this differs from the COW query.
    """
    t = _mor_table(spark, sf_dir)
    # Lazy read straight off the sink files — O(1) driver memory; the MOR
    # fold (delta union + latest-per-key) runs distributed at action time.
    return t.read(spark).select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "mtime"
    )


def _mor_table(spark: SparkSession, sf_dir: str):
    """Two-batch MOR table in the session-scoped scratch dir (batch A = even
    event_id as commit v1, batch B = odd as v2). Idempotent on
    re-invocation: merge_batch replays are no-ops for already-committed
    batch ids (sinks/keyed_table.py pointer protocol), so every query
    sharing this table sees the same v1/v2 history."""
    from kafka_cdc_hudi_spark.sinks.keyed_table import KeyedParquetTable

    env = debezium_envelopes(_events(spark, sf_dir))
    # Batch cache (reference O5, /root/reference/glue/cdc_hudi.py:255): the
    # two commits below are separate WRITE actions, and without a persist
    # each re-executes the whole generate+to_json+from_json fixture lineage
    # (~0.4s/commit at sf0.1, measured single-tenant r6). The streaming
    # driver persists real batches the same way; safe to unpersist eagerly
    # because the fold-read scans sink files, not this lineage.
    parsed = parse_debezium(env, EVENTS_PAYLOAD_SCHEMA).persist()
    a = parsed.filter(F.col("event_id") % 2 == 0).drop("operation")
    b = parsed.filter(F.col("event_id") % 2 == 1).drop("operation")
    t = KeyedParquetTable(
        root=_mor_scratch_dir(spark, sf_dir), keys=["user_id"], order_col="mtime",
        tiebreakers=["event_id"], mode="mor",
    )
    # serialize the build: concurrent first-invocations would race the
    # batch-id replay check and double-commit
    try:
        with _MOR_LOCK:
            t.merge_batch(spark, a, batch_id=0)
            t.merge_batch(spark, b, batch_id=1)
    finally:
        parsed.unpersist()
    return t


CDC_MERGE_MOR_SQL = f"""
WITH {_EVT_CTE},
allrows AS (
  SELECT *, CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src FROM evt
),
merged AS (
  SELECT * FROM allrows
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, src DESC, event_id DESC) = 1
)
SELECT event_id, ts, user_id, event_type, value, props, mtime
FROM merged WHERE NOT is_deleted
"""


def cdc_merge_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-COW sink: the same two-batch merge as
    ``cdc_merge_two_batches`` but committed through mode="cow-bucketed"
    (sinks/keyed_table.py) — each commit merges and rewrites only the key
    buckets the batch touches (Hudi file-group semantics), so commit cost is
    O(touched fraction), not O(table), while reads keep the COW profile
    (no fold). State is equivalent to plain COW by construction, so the
    oracle is the COW two-batch QUALIFY; the O(touched)-rewrite property
    itself is pinned in tests/test_bucketed_cow.py."""
    t = _bucketed_table(spark, sf_dir)
    return t.read(spark).select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "mtime"
    )


def _bucketed_table(spark: SparkSession, sf_dir: str):
    """Two-batch bucketed-COW table in a session-scoped scratch dir (same
    lifecycle/locking rationale as :func:`_mor_table`)."""
    from kafka_cdc_hudi_spark.sinks.keyed_table import (
        MODE_COW_BUCKETED,
        KeyedParquetTable,
    )

    env = debezium_envelopes(_events(spark, sf_dir))
    # batch cache across the two write actions — see _mor_table
    parsed = parse_debezium(env, EVENTS_PAYLOAD_SCHEMA).persist()
    a = parsed.filter(F.col("event_id") % 2 == 0).drop("operation")
    b = parsed.filter(F.col("event_id") % 2 == 1).drop("operation")
    t = KeyedParquetTable(
        root=_mor_scratch_dir(spark, f"bucketed|{sf_dir}"),
        keys=["user_id"],
        order_col="mtime",
        tiebreakers=["event_id"],
        mode=MODE_COW_BUCKETED,
        n_buckets=16,
    )
    try:
        with _MOR_LOCK:
            t.merge_batch(spark, a, batch_id=0)
            t.merge_batch(spark, b, batch_id=1)
    finally:
        parsed.unpersist()
    return t


def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: the MOR table's state AS OF commit v1 (batch A only) —
    the Hudi/Delta versioned-read capability on the pure-Spark sink. The
    oracle recomputes state-after-A directly from events: latest-per-key of
    the even-id slice with tombstones dropped at read (MOR fold)."""
    t = _mor_table(spark, sf_dir)
    return t.read(spark, version=1).select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "mtime"
    )


CDC_TIME_TRAVEL_SQL = f"""
WITH {_EVT_CTE},
s1 AS (
  SELECT * FROM evt WHERE event_id % 2 = 0
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, event_id DESC) = 1
)
SELECT event_id, ts, user_id, event_type, value, props, mtime
FROM s1 WHERE NOT is_deleted
"""


def cdc_incremental_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental read: per-key changes between commit v1 (batch A) and
    v2 (final state) — insert/update/delete rows with delete rows carrying
    the key and null payload (the Hudi incremental-query shape). One
    full-outer shuffle join on the key; unchanged keys drop out via the
    row-hash comparison."""
    t = _mor_table(spark, sf_dir)
    return t.diff(spark, 1, 2).select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "mtime",
        "_change_type",
    )


CDC_INCREMENTAL_DIFF_SQL = f"""
WITH {_EVT_CTE},
s1 AS (
  SELECT event_id, ts, user_id, event_type, value, props, mtime
  FROM (
    SELECT * FROM evt WHERE event_id % 2 = 0
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, event_id DESC) = 1
  ) WHERE NOT is_deleted
),
allrows AS (
  SELECT *, CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src FROM evt
),
s2 AS (
  SELECT event_id, ts, user_id, event_type, value, props, mtime
  FROM (
    SELECT * FROM allrows
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, src DESC, event_id DESC) = 1
  ) WHERE NOT is_deleted
)
SELECT s2.event_id, s2.ts,
       COALESCE(s2.user_id, s1.user_id) AS user_id,
       s2.event_type, s2.value, s2.props, s2.mtime,
       CASE WHEN s1.user_id IS NULL THEN 'insert'
            WHEN s2.user_id IS NULL THEN 'delete'
            ELSE 'update' END AS _change_type
FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
WHERE s1.user_id IS NULL OR s2.user_id IS NULL
   OR s1.event_id IS DISTINCT FROM s2.event_id
   OR s1.ts IS DISTINCT FROM s2.ts
   OR s1.event_type IS DISTINCT FROM s2.event_type
   OR s1.value IS DISTINCT FROM s2.value
   OR s1.props IS DISTINCT FROM s2.props
   OR s1.mtime IS DISTINCT FROM s2.mtime
"""


def cdc_route_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8: one stream carries two tables interleaved; route to `events`."""
    events = _events(spark, sf_dir)
    own = debezium_envelopes(events.filter(F.col("event_id") % 3 != 0), table="events")
    foreign = debezium_envelopes(events.filter(F.col("event_id") % 3 == 0), table="other_tbl")
    stream = own.unionByName(foreign)
    parsed = parse_debezium(stream, EVENTS_PAYLOAD_SCHEMA, keep_routing=True)
    return _norm(route(parsed, "test_db", "events"))


CDC_ROUTE_MULTITABLE_SQL = f"""
WITH {_EVT_CTE}
SELECT event_id, ts, user_id, event_type, value, props, mtime, operation, is_deleted
FROM evt WHERE event_id % 3 <> 0
"""


def cdc_schema_drift_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10: dynamic schema inference + drift merge, end-to-end with NO
    declared schema. The fixture's producer added a ``score`` column
    mid-stream (odd event_ids); the engine infers the payload schema from
    the legacy slice, detects the drifted slice widens it, merges the two
    inferences (``merge_payload_schemas`` — same code the streaming driver's
    drift hook runs), and parses the WHOLE stream with the merged schema.
    Legacy rows surface ``score`` as null. Inference types everything from
    JSON (ts stays a string — the reference's infer-per-batch behavior,
    /root/reference/glue/cdc_hudi.py:234); the declared-schema entries above
    prove the typed fast path."""
    from kafka_cdc_hudi_spark.config import DIALECT_DEBEZIUM
    from kafka_cdc_hudi_spark.operators.cdc import infer_payload_schema, merge_payload_schemas
    from kafka_cdc_hudi_spark.plans.cdc_fixtures import drifted_debezium_envelopes

    # the envelope fixture lineage (CPU-heavy per-row to_json) is executed
    # THREE times below — once per inference slice, once for the final
    # parse. One localCheckpoint pays it once (r14, guide §1.2 "don't
    # compute things you throw away": warm 7.3 s -> 2.8 s at sf0.1). A
    # real Kafka stream arrives materialized; only the fixture had this.
    stream = drifted_debezium_envelopes(_events(spark, sf_dir)).localCheckpoint()
    # JSON-path presence test, not a substring match: a payload whose TEXT
    # happens to contain '"score"' (e.g. inside props) must not be
    # misclassified as drifted. Drifted rows are odd event_ids, which are
    # never deletes (id % 10 == 0 is even), so `after` is always populated
    # there and score = user_id + 1000 is never null.
    has_score = F.get_json_object(F.col("value"), "$.after.score").isNotNull()
    legacy = stream.filter(~has_score)
    drifted = stream.filter(has_score)
    cached = infer_payload_schema(spark, legacy, DIALECT_DEBEZIUM, what="legacy slice")
    if "score" in cached.fieldNames():  # not assert: must survive python -O
        raise ValueError("drift fixture regressed: legacy slice already carries 'score'")
    widened = infer_payload_schema(spark, drifted, DIALECT_DEBEZIUM, what="drifted slice")
    merged = merge_payload_schemas(cached, widened)
    return _norm(parse_debezium(stream, merged))


CDC_SCHEMA_DRIFT_SQL = f"""
WITH {_EVT_CTE}
SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, user_id, event_type,
       value, props,
       CASE WHEN event_id % 2 = 1 THEN user_id + 1000 END AS score,
       mtime, operation, is_deleted
FROM evt
"""


def cdc_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance, driver-grade: the per-event_type
    COUNT/SUM aggregate of commit v1 is rolled forward to v2 by applying
    the commit's PRE-IMAGE diff (operators/incremental.py) — never
    re-scanning v2 on the Spark side. The ORACLE computes the v2 aggregate
    directly from the raw events, so a green row proves
    maintained-from-deltas == direct-recompute across engines: the
    insert/update/delete retraction algebra (incl. updates that move a
    row between event_types) has to be exactly right or the decimal sums
    diverge."""
    from kafka_cdc_hudi_spark.operators.incremental import maintain_sum_agg, sum_agg

    t = _mor_table(spark, sf_dir)
    state_v1 = sum_agg(t.read(spark, version=1), ["event_type"], ["value"])
    changes = t.diff(spark, 1, 2, include_pre_image=True)
    maintained = maintain_sum_agg(state_v1, changes, ["event_type"], ["value"])
    return maintained.select(
        "event_type",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


CDC_INCREMENTAL_AGG_SQL = f"""
WITH {_EVT_CTE},
allrows AS (
  SELECT *, CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src FROM evt
),
s2 AS (
  SELECT event_type, value
  FROM (
    SELECT * FROM allrows
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, src DESC, event_id DESC) = 1
  ) WHERE NOT is_deleted
)
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
FROM s2
GROUP BY event_type
"""


def cdc_incremental_enriched_agg_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Materialized-view maintenance for an ENRICHED view — the common
    fact-to-dimension reporting shape (revenue per customer segment):
    ``V = events_state JOIN customer_dim ON user -> GROUP BY segment``.
    The v1 aggregate is rolled forward to v2 by enriching ONLY the
    commit's pre-image diff against the broadcast dimension and applying
    the same retraction algebra as the plain entry — the fact table is
    never re-scanned and the dim join touches change-set-sized input.
    The dim attribute rides the immutable primary key (a row can never
    move between segments), so the pre-image group equals the post-image
    group by construction. The ORACLE recomputes the v2 enriched
    aggregate directly from raw events joined to the customer table, so a
    green row proves maintained-from-deltas == direct-recompute THROUGH
    the dimension join across engines."""
    from kafka_cdc_hudi_spark.operators.incremental import maintain_sum_agg, sum_agg

    t = _mor_table(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    state_v1 = sum_agg(
        t.read(spark, version=1).join(F.broadcast(dim), "user_id"),
        ["c_mktsegment"],
        ["value"],
    )
    changes = t.diff(spark, 1, 2, include_pre_image=True)
    enriched = changes.join(F.broadcast(dim), "user_id").withColumn(
        "_pre_c_mktsegment", F.col("c_mktsegment")
    )
    maintained = maintain_sum_agg(state_v1, enriched, ["c_mktsegment"], ["value"])
    return maintained.select(
        "c_mktsegment",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


CDC_INCREMENTAL_ENRICHED_AGG_SQL = f"""
WITH {_EVT_CTE},
allrows AS (
  SELECT *, CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src FROM evt
),
s2 AS (
  SELECT user_id, value
  FROM (
    SELECT * FROM allrows
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, src DESC, event_id DESC) = 1
  ) WHERE NOT is_deleted
)
SELECT c.c_mktsegment, COUNT(*) AS n_rows,
       CAST(SUM(CAST(s2.value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
FROM s2 JOIN customer c ON s2.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


def cdc_incremental_minmax_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX materialized-view maintenance, driver-grade: commit v1's
    per-event_type extremes roll forward to v2 by the PARTIAL-RECOMPUTE
    strategy (operators/incremental.py:maintain_minmax_agg — insert-only
    groups fold algebraically, retraction-touched groups re-aggregate from
    the post-commit base only). The oracle recomputes v2 directly from raw
    events, so a green row proves the split between the algebraic and
    recompute paths is exactly right."""
    from kafka_cdc_hudi_spark.operators.incremental import (
        maintain_minmax_agg,
        minmax_agg,
    )

    t = _mor_table(spark, sf_dir)
    state_v1 = minmax_agg(t.read(spark, version=1), ["event_type"], "value")
    changes = t.diff(spark, 1, 2, include_pre_image=True)
    base_v2 = t.read(spark, version=2)
    return maintain_minmax_agg(state_v1, changes, base_v2, ["event_type"], "value")


CDC_INCREMENTAL_MINMAX_SQL = f"""
WITH {_EVT_CTE},
allrows AS (
  SELECT *, CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src FROM evt
),
s2 AS (
  SELECT event_type, value
  FROM (
    SELECT * FROM allrows
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, src DESC, event_id DESC) = 1
  ) WHERE NOT is_deleted
)
SELECT event_type, COUNT(*) AS n_rows,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM s2
GROUP BY event_type
"""


def cdc_merge_partial_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-update payload merge (Hudi OverwriteNonDefaults semantics):
    a sparse update stream where each event carries only SOME fields
    (deterministic presence masks by event_id) folds to per-key state in
    which every column holds its last non-null value written after the last
    delete. Runs the real ``partial_update_fold`` operator — one shuffle,
    map-side combine. Ordering is the exact long ``mtime * 2^20 +
    event_id`` (collision-free while event_id < 1,048,576 — the fixture
    cap; production keys would widen the shift)."""
    env = debezium_envelopes(_events(spark, sf_dir))
    parsed = parse_debezium(env, EVENTS_PAYLOAD_SCHEMA)
    hist = parsed.select(
        "user_id",
        (F.col("mtime") * F.lit(1048576) + F.col("event_id")).alias("ord"),
        F.when(F.col("event_id") % 2 == 0, F.col("event_type")).alias("event_type"),
        F.when(F.col("event_id") % 3 == 0, F.col("value")).alias("value"),
        F.when(F.col("event_id") % 5 == 0, F.col("props")).alias("props"),
        "_deleted",
    )
    out = partial_update_fold(hist, ["user_id"], "ord", "_deleted")
    return out.select(
        "user_id",
        "event_type",
        "value",
        "props",
        F.expr("ord div 1048576").alias("mtime"),
    )


CDC_MERGE_PARTIAL_UPDATES_SQL = f"""
WITH {_EVT_CTE},
h AS (
  SELECT user_id,
         mtime * 1048576 + event_id AS ord,
         CASE WHEN event_id % 2 = 0 THEN event_type END AS event_type,
         CASE WHEN event_id % 3 = 0 THEN value END AS value,
         CASE WHEN event_id % 5 = 0 THEN props END AS props,
         is_deleted
  FROM evt),
g AS (
  SELECT user_id,
         MAX(CASE WHEN is_deleted THEN ord END) AS dmax,
         MAX(CASE WHEN NOT is_deleted THEN ord END) AS smax,
         MAX(ord) FILTER (WHERE NOT is_deleted AND event_type IS NOT NULL) AS vmax_et,
         arg_max(event_type, ord)
           FILTER (WHERE NOT is_deleted AND event_type IS NOT NULL) AS val_et,
         MAX(ord) FILTER (WHERE NOT is_deleted AND value IS NOT NULL) AS vmax_v,
         arg_max(value, ord)
           FILTER (WHERE NOT is_deleted AND value IS NOT NULL) AS val_v,
         MAX(ord) FILTER (WHERE NOT is_deleted AND props IS NOT NULL) AS vmax_p,
         arg_max(props, ord)
           FILTER (WHERE NOT is_deleted AND props IS NOT NULL) AS val_p
  FROM h GROUP BY 1)
SELECT user_id,
       CASE WHEN vmax_et IS NOT NULL AND (dmax IS NULL OR vmax_et > dmax)
            THEN val_et END AS event_type,
       CASE WHEN vmax_v IS NOT NULL AND (dmax IS NULL OR vmax_v > dmax)
            THEN val_v END AS value,
       CASE WHEN vmax_p IS NOT NULL AND (dmax IS NULL OR vmax_p > dmax)
            THEN val_p END AS props,
       smax // 1048576 AS mtime
FROM g
WHERE smax IS NOT NULL AND (dmax IS NULL OR smax > dmax)
"""


def cdc_merge_dms_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PRIMARY path (/root/reference/glue/cdc_hudi.py:
    147-154,183-216) on the DMS dialect END-TO-END: raw wire envelopes —
    ISO-8601 STRING timestamps as the precombine key (lexicographic ==
    chronological, SURVEY §1.2), `record-type` control rows, `load` ops —
    interleaved with a FOREIGN table's stream, through the raw-substring
    scan prefilter -> parse_dms -> typed route -> two-batch dedup+merge
    (VERDICT r8 item 6: every prior merge entry fed Debezium fixtures;
    this one value-checks the DMS envelope family through the full merge).

    The foreign stream reuses the same keys with PERTURBED payload values,
    so a routing failure changes the merged state and hash-mismatches the
    oracle — route is load-bearing, not decorative. The oracle is a closed
    form over `events` alone (control rows absent, ops mapped per the
    fixture, string-mtime precombine), mirroring the proven
    CDC_MERGE_TWO_BATCHES shape."""
    ev = _events(spark, sf_dir)
    own = dms_envelopes(ev)
    foreign = dms_envelopes(
        ev.filter(F.col("event_id") % 5 == 0).withColumn(
            "value", F.col("value") + F.lit(1_000_000.0)
        ),
        table="events_mirror",
    )
    from kafka_cdc_hudi_spark.config import DIALECT_DMS

    env = own.unionByName(foreign)
    pref = raw_route_prefilter(env, "test_db", "events", dialect=DIALECT_DMS)
    parsed = route(
        parse_dms(pref, EVENTS_PAYLOAD_SCHEMA, keep_routing=True),
        "test_db",
        "events",
    )
    # fused one-pass two-batch fold — see cdc_merge_two_batches (r14)
    s2 = merge_upsert_two_batches(
        parsed.drop("operation"),
        F.col("event_id") % 2 == 1,
        ["user_id"],
        tiebreakers=["event_id"],
    )
    return s2.select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "mtime"
    )


CDC_MERGE_DMS_E2E_SQL = """
WITH dms AS (
  SELECT event_id, ts, user_id, event_type, value, props,
         strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') AS mtime,
         (event_id % 10 = 0) AS is_deleted
  FROM events
  WHERE event_id % 97 <> 0
),
s1 AS (
  SELECT * FROM dms WHERE event_id % 2 = 0
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, event_id DESC) = 1
),
s1k AS (
  SELECT event_id, ts, user_id, event_type, value, props, mtime,
         FALSE AS is_deleted, 0 AS src
  FROM s1 WHERE NOT is_deleted
),
b2 AS (
  SELECT event_id, ts, user_id, event_type, value, props, mtime, is_deleted, 1 AS src
  FROM dms WHERE event_id % 2 = 1
),
merged AS (
  SELECT * FROM (SELECT * FROM s1k UNION ALL SELECT * FROM b2)
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY mtime DESC, src DESC, event_id DESC) = 1
)
SELECT event_id, ts, user_id, event_type, value, props, mtime
FROM merged WHERE NOT is_deleted
"""


CDC_QUERIES: dict[str, tuple] = {
    "cdc_merge_dms_e2e": (cdc_merge_dms_e2e, CDC_MERGE_DMS_E2E_SQL),
    "cdc_merge_partial_updates": (
        cdc_merge_partial_updates,
        CDC_MERGE_PARTIAL_UPDATES_SQL,
    ),
    "cdc_incremental_agg_maintenance": (
        cdc_incremental_agg_maintenance,
        CDC_INCREMENTAL_AGG_SQL,
    ),
    "cdc_incremental_enriched_agg_maintenance": (
        cdc_incremental_enriched_agg_maintenance,
        CDC_INCREMENTAL_ENRICHED_AGG_SQL,
    ),
    "cdc_incremental_minmax_maintenance": (
        cdc_incremental_minmax_maintenance,
        CDC_INCREMENTAL_MINMAX_SQL,
    ),
    "cdc_parse_debezium": (cdc_parse_debezium, CDC_PARSE_DEBEZIUM_SQL),
    "cdc_parse_dms": (cdc_parse_dms, CDC_PARSE_DMS_SQL),
    "cdc_latest_per_key": (cdc_latest_per_key, CDC_LATEST_PER_KEY_SQL),
    "cdc_scd2_history": (cdc_scd2_history, CDC_SCD2_HISTORY_SQL),
    "cdc_latest_per_composite_key": (
        cdc_latest_per_composite_key,
        CDC_LATEST_PER_COMPOSITE_KEY_SQL,
    ),
    "cdc_merge_two_batches": (cdc_merge_two_batches, CDC_MERGE_TWO_BATCHES_SQL),
    "cdc_merge_mor": (cdc_merge_mor, CDC_MERGE_MOR_SQL),
    # state-equivalent to COW -> same oracle; bucketed layout pinned in tests
    "cdc_merge_bucketed": (cdc_merge_bucketed, CDC_MERGE_TWO_BATCHES_SQL),
    "cdc_time_travel": (cdc_time_travel, CDC_TIME_TRAVEL_SQL),
    "cdc_incremental_diff": (cdc_incremental_diff, CDC_INCREMENTAL_DIFF_SQL),
    "cdc_route_multitable": (cdc_route_multitable, CDC_ROUTE_MULTITABLE_SQL),
    "cdc_schema_drift_parse": (cdc_schema_drift_parse, CDC_SCHEMA_DRIFT_SQL),
}
