"""transformWithStateInPandas variant of the custom-state operator
(ROADMAP round-2 gap 2).

The API's Python worker requires ``google.protobuf`` (state-server
protocol), which this container lacks — the suite SKIPS in that case
and runs live wherever protobuf is available, mirroring the
delta-spark gating policy (``test_delta_conformance.py`` proves the
fallback; this file proves the API path when the environment allows).
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
