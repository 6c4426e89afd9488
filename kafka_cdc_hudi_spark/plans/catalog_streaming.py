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
- ANN scale paths (IVF, SRP-LSH) are approximate + centroid-dependent, so
  not SQL-expressible: registered without an oracle (driver rows-only
  check); their recall against the exact brute-force oracle is asserted in
  tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.operators.similarity import (
    ivf_assign,
    ivf_topk,
    ivf_train_centroids,
    srp_topk,
)
from kafka_cdc_hudi_spark.functions.numeric import DEC
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


# -- ANN scale paths (approximate: rows-only driver check, recall in tests) ---


def ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10: kmeans-lite centroids trained on a deterministic sample
    (driver-side, broadcast as literals), candidates pruned to the 2 best
    cells per query. At scale the full corpus is scanned once for assignment
    and once per query batch within probed cells only."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = ivf_train_centroids(e, EMBEDDING_DIM, n_cells=8, iters=4)
    assigned = ivf_assign(e, cents)
    q = e.filter(F.col("vec_id") < 10)
    return ivf_topk(q, assigned, cents, k=10, n_probe=2)


def ann_topk_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH top-10: signed-random-projection signatures (seeded, so
    deterministic across runs), exact cosine only on bucket collisions."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return srp_topk(q, e, EMBEDDING_DIM, k=10, n_bits=4, n_tables=8)


STREAMING_QUERIES: dict[str, tuple] = {
    "events_tumbling_windows": (events_tumbling_windows, EVENTS_TUMBLING_SQL),
    "events_sliding_windows": (events_sliding_windows, EVENTS_SLIDING_SQL),
    "events_session_windows": (events_session_windows, EVENTS_SESSION_SQL),
    "user_running_stats_batch": (user_running_stats_batch, USER_RUNNING_STATS_SQL),
    "ann_topk_ivf": (ann_topk_ivf, None),
    "ann_topk_srp": (ann_topk_srp, None),
}
