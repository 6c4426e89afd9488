"""Property-based equivalence for incremental aggregate maintenance:
for ANY keyed old/new table pair, applying the (pre-image) change set to
the old aggregate must equal recomputing the aggregate on the new table.
Hypothesis drives arbitrary insert/update(incl. group move)/delete mixes;
Spark evaluates the operator on small frames."""

from hypothesis import given, settings, strategies as st

from kafka_cdc_hudi_spark.operators.incremental import maintain_sum_agg, sum_agg

#: a table is {id: (group, amount)}; tiny domains force key collisions so
#: every change type and group-move shows up
_TABLES = st.dictionaries(
    keys=st.integers(min_value=0, max_value=9),
    values=st.tuples(
        st.sampled_from(["g0", "g1", "g2"]),
        st.decimals(
            min_value=-1000, max_value=1000, places=2, allow_nan=False
        ).map(float),
    ),
    max_size=10,
)


def _df(spark, table):
    rows = [(k, g, a) for k, (g, a) in sorted(table.items())]
    return spark.createDataFrame(rows or [], "id long, grp string, amount double")


def _changes_df(spark, old, new):
    """Build exactly the include_pre_image diff contract from two dicts."""
    rows = []
    for k in sorted(set(old) | set(new)):
        if k in old and k not in new:
            rows.append((k, None, None, "delete", old[k][0], old[k][1]))
        elif k in new and k not in old:
            rows.append((k, new[k][0], new[k][1], "insert", None, None))
        elif old[k] != new[k]:
            rows.append((k, new[k][0], new[k][1], "update", old[k][0], old[k][1]))
    return spark.createDataFrame(
        rows or [],
        "id long, grp string, amount double, _change_type string, "
        "_pre_grp string, _pre_amount double",
    )


@settings(max_examples=25, deadline=None)
@given(old=_TABLES, new=_TABLES)
def test_maintained_equals_recompute_for_any_change_mix(spark, old, new):
    prev = sum_agg(_df(spark, old), ["grp"], ["amount"])
    changes = _changes_df(spark, old, new)
    got = maintain_sum_agg(prev, changes, ["grp"], ["amount"])
    want = sum_agg(_df(spark, new), ["grp"], ["amount"])
    as_set = lambda df: {  # noqa: E731
        (r["grp"], r["n_rows"], str(r["sum_amount"])) for r in df.collect()
    }
    assert as_set(got) == as_set(want)
    assert dict(got.dtypes) == dict(want.dtypes)
