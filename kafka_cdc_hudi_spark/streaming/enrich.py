"""In-flight dimension enrichment for the CDC driver.

The classic CDC-pipeline step the reference leaves to downstream engines:
join each micro-batch against a slowly-changing dimension table (user ->
segment, product -> category, ...) BEFORE it lands in the sink, so the
merged table is query-ready. At scale the dimension is orders of magnitude
smaller than the stream — the join must be a broadcast, and the dimension
snapshot must refresh on a cadence without restarting the query.

``DimLookup`` is a driver ``transform_hooks`` entry: a callable
``(df, batch_id) -> df`` that reloads the dimension parquet every
``refresh_every`` batches (cadence keyed on batch_id, so replays of a
batch see the same cadence slot) and broadcast-left-joins it. Reload cost
is one small read per cadence tick; between ticks the same cached
DataFrame is reused, and Spark re-broadcasts it per batch — exactly how a
foreachBatch lookup join behaves on a cluster.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DimLookup:
    """Broadcast lookup join against a periodically refreshed dimension.

    Parameters:
        path: parquet path of the dimension table
        on: equi-join key column(s) — must exist on both sides
        refresh_every: reload the snapshot when ``batch_id // refresh_every``
            advances (1 = every batch; default 10)
        select: optional columns to keep from the dimension (join keys are
            always kept); None keeps all — prefer listing the columns so
            the broadcast ships only what downstream needs
    """

    def __init__(
        self,
        path: str,
        on: Sequence[str] | str,
        refresh_every: int = 10,
        select: Sequence[str] | None = None,
    ):
        if refresh_every < 1:
            raise ValueError(f"refresh_every must be >= 1, got {refresh_every}")
        self.path = path
        self.on = [on] if isinstance(on, str) else list(on)
        self.refresh_every = refresh_every
        self.select = list(select) if select is not None else None
        self._epoch: int | None = None
        self._dim: DataFrame | None = None

    def _snapshot(self, df: DataFrame, batch_id: int) -> DataFrame:
        epoch = batch_id // self.refresh_every
        if self._dim is None or epoch != self._epoch:
            dim = df.sparkSession.read.parquet(self.path)
            if self.select is not None:
                dim = dim.select(*dict.fromkeys([*self.on, *self.select]))
            self._dim = dim
            self._epoch = epoch
        return self._dim

    def __call__(self, df: DataFrame, batch_id: int) -> DataFrame:
        return df.join(F.broadcast(self._snapshot(df, batch_id)), self.on, "left")
