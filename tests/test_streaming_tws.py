"""transformWithStateInPandas variant of the custom-state operator.

FORMALLY DESCOPED in this environment (round 3): the API's Python
worker requires ``google.protobuf`` (state-server protocol), which is
absent here — a filesystem sweep finds no protobuf runtime or wheel to
vendor, and network installs are unavailable. The operator
(``streaming/events.stateful_user_stats_tws``) stays implemented and
this suite runs live wherever protobuf exists; the supported
custom-state path in this environment is ``applyInPandasWithState``
(``stream_stateful_user_stats``), with the built-in-agg twin
(``stream_user_stats_agg``) as the recommended production shape.
"""

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState's Python runner needs protobuf (not in container)",
)


def test_tws_matches_applyinpandaswithstate(spark, sf_dir):
    from x_spark.plans.streams import (
        q_stream_stateful_tws,
        q_stream_stateful_user_stats,
    )

    tws = {tuple(r) for r in q_stream_stateful_tws(spark, sf_dir).collect()}
    aip = {tuple(r) for r in q_stream_stateful_user_stats(spark, sf_dir).collect()}
    assert tws == aip
    assert tws  # non-vacuous
