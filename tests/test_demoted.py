"""Demoted registry entries (catalog.DEMOTED, r10 registry hygiene):
removed from FULL_REGISTRY to hold gate wall-time flat, but each stays
implemented with its oracle SQL in its catalog_* module. This smoke keeps
them executable (and their covered-by survivors present) every session;
their full value-oracle history is r1-r9 sweeps + driver rows."""

import pytest

from kafka_cdc_hudi_spark.plans.catalog import DEMOTED, FULL_REGISTRY
from kafka_cdc_hudi_spark.plans.catalog_analytics import ANALYTICS_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_cdc import CDC_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_streaming import STREAMING_QUERIES
from kafka_cdc_hudi_spark.plans.catalog_text import TEXT_QUERIES

from .conftest import SF_DIR

_SOURCE: dict[str, tuple] = {}
for d in (CDC_QUERIES, ANALYTICS_QUERIES, TEXT_QUERIES, STREAMING_QUERIES):
    _SOURCE.update(d)


def test_demoted_entries_still_defined_with_oracles():
    for name in DEMOTED:
        assert name in _SOURCE, f"{name} vanished from its catalog module"
        fn, sql = _SOURCE[name]
        assert callable(fn) and isinstance(sql, str) and sql.strip()


def test_covered_by_survivors_still_registered():
    """Every demotion reason names surviving entries; at least one named
    survivor must still be in FULL_REGISTRY or the demotion is unbacked."""
    for name, reason in DEMOTED.items():
        assert any(s in reason for s in FULL_REGISTRY), (name, reason)


@pytest.mark.parametrize("name", sorted(DEMOTED))
def test_demoted_entry_executes(spark, name):
    fn, _sql = _SOURCE[name]
    df = fn(spark, SF_DIR)
    assert df.columns
    assert df.limit(1).count() == 1, f"{name}: empty result"


def test_simhash_banding_law_guard():
    """The r12-demoted fixed-width SimHash entries raise past the banding-law
    bound (bits_per_band >= log2(N/target_bucket)) instead of materializing a
    quadratic candidate join (VERDICT r11 item 1)."""
    from kafka_cdc_hudi_spark.plans.catalog_text import (
        _SIMHASH_GUARD_MAX_EBUCKET,
        _banding_law_guard,
    )

    # under the bound: no-op (the smoke above exercises the real entries)
    _banding_law_guard(256 << 8, 8, "dedup_simhash_pairs")
    _banding_law_guard(256 << 10, 10, "dedup_simhash_wide_pairs")
    # past the bound: raises, names the scale-safe successor
    with pytest.raises(ValueError, match="dedup_simhash_band_scaled"):
        _banding_law_guard((256 << 8) + 1, 8, "dedup_simhash_pairs")
    # the measured r11 OOM point (500k docs, 10-bit bands) is rejected
    with pytest.raises(ValueError, match="banding law"):
        _banding_law_guard(500_000, 10, "dedup_simhash_wide_pairs")
    assert _SIMHASH_GUARD_MAX_EBUCKET << 10 < 500_000
