"""Property-based txlog test (hypothesis): arbitrary operation
sequences against a plain-Python model.

The model is a dict of row-lists per version; after every committed
operation the connector's snapshot must equal the model, every
HISTORICAL version must still time-travel to its recorded state, and
vacuum(default) must never change any readable version. This is the
state-machine evidence that the log replay, file-level rewrites, and
data skipping compose correctly — single example runs are kept small
because each op is a Spark write.
"""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef

SETTINGS = settings(
    max_examples=6,  # each example is a full multi-commit Spark run
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=4)
vals = st.integers(min_value=-2, max_value=2)
rows_strategy = st.lists(
    st.tuples(keys, vals), min_size=0, max_size=4, unique_by=lambda r: r[0]
)


@st.composite
def op_sequence(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    ops = []
    for _ in range(n):
        kind = draw(st.sampled_from(["append", "overwrite", "merge", "delete",
                                     "truncate"]))
        if kind in ("append", "overwrite", "merge"):
            ops.append((kind, draw(rows_strategy)))
        elif kind == "delete":
            ops.append((kind, draw(keys)))
        else:
            ops.append((kind, None))
    return ops


def _model_apply(model_rows, op, payload):
    """Apply one op to the model (a multiset of (pk, v) tuples —
    appends can create duplicate pks across commits)."""
    if op == "append":
        return model_rows + list(payload)
    if op == "overwrite":
        return list(payload)
    if op == "merge":
        src = dict(payload)
        # MERGE updates EVERY matched target row (source-side dups are
        # what aborts, not target-side); inserts cover unmatched pks
        out = [(pk, src[pk]) if pk in src else (pk, v) for pk, v in model_rows]
        existing = {pk for pk, _ in model_rows}
        out += [(pk, v) for pk, v in payload if pk not in existing]
        return out
    if op == "delete":
        return [(pk, v) for pk, v in model_rows if pk != payload]
    if op == "truncate":
        return []
    raise AssertionError(op)


@given(ops=op_sequence())
@SETTINGS
def test_txlog_matches_model_over_random_op_sequences(spark, tmp_path_factory, ops):
    ds = init_datasource("txlog", spark)
    ref = TableRef(path=str(tmp_path_factory.mktemp("txprop") / "t"))
    schema = "pk int, v int"
    model: list = []
    history: dict[int, list] = {}

    ds.create(ref, spark.createDataFrame([], schema).schema)
    history[0] = []
    version = 0
    for op, payload in ops:
        if op == "append":
            ds.append(spark.createDataFrame(payload, schema), ref)
        elif op == "overwrite":
            ds.overwrite(spark.createDataFrame(payload, schema), ref)
        elif op == "merge":
            if not payload:
                continue  # empty-source merge: no commit guaranteed
            ds.merge(
                spark.createDataFrame(payload, schema),
                ref,
                MergeSpec(["pk"], ["v"], insert_when_not_matched=True),
            )
        elif op == "delete":
            ds.delete(ref, f"pk = {payload}")
        else:
            ds.truncate(ref)
        model = _model_apply(model, op, payload)
        version += 1
        history[version] = list(model)
        got = sorted(map(tuple, ds.read(ref).collect()))
        assert got == sorted(model), f"after {op}: {got} != {sorted(model)}"

    # every historical version still time-travels to its recorded state
    for v, expect in history.items():
        tt = TableRef(path=ref.path, options={"versionAsOf": str(v)})
        assert sorted(map(tuple, ds.read(tt).collect())) == sorted(expect), f"v{v}"

    # default vacuum (orphans only) never changes any readable version
    ds.vacuum(TableRef(path=ref.path))
    for v, expect in history.items():
        tt = TableRef(path=ref.path, options={"versionAsOf": str(v)})
        assert sorted(map(tuple, ds.read(tt).collect())) == sorted(expect)


def test_timestamp_travel_resolves_like_delta(spark, tmp_path):
    import os
    import time

    ds = init_datasource("txlog", spark)
    ref = TableRef(path=str(tmp_path / "ts"))
    ds.append(spark.createDataFrame([(1, 10)], "pk int, v int"), ref)
    ds.append(spark.createDataFrame([(2, 20)], "pk int, v int"), ref)
    # place commit mtimes at known epochs (0=create, 1=append, 2=append)
    log = os.path.join(ref.path, "_txlog")
    base = time.time() - 1000
    for fname in sorted(os.listdir(log)):
        v = int(fname.split(".")[0])
        os.utime(os.path.join(log, fname), (base + 100 * v, base + 100 * v))
    at = lambda epoch: TableRef(path=ref.path, options={"timestampAsOf": epoch})
    assert ds.read(at(base + 150)).count() == 1   # after v1, before v2
    assert ds.read(at(base + 250)).count() == 2   # after v2
    import pytest

    from x_spark.errors import DataSourceException

    with pytest.raises(DataSourceException, match="no commit"):
        ds.read(at(base - 1))
