"""Fuzz the config loader/validator: arbitrary mangled configs must
raise JobConfigException (typed), never KeyError/TypeError/NameError —
the reference's validator had inverted logic and NameError crashes
(SURVEY §8.6); ours must degrade cleanly on any input shape.
"""

import pytest
from hypothesis import given, settings, strategies as st

from x_spark.errors import JobConfigException
from x_spark.plans.config import JobConfig, substitute_params

scalars = st.one_of(st.none(), st.integers(), st.text(max_size=8), st.booleans())
endpoint = st.dictionaries(
    st.sampled_from(
        ["datasource", "query", "table", "path", "operation",
         "primary_key_column", "update_column", "bogus_key", "pre_sql"]
    ),
    st.one_of(scalars, st.lists(st.text(max_size=5), max_size=3)),
    max_size=5,
)
config = st.dictionaries(
    st.sampled_from(["version", "source", "target", "unknown"]),
    st.one_of(scalars, endpoint),
    max_size=4,
)


@settings(max_examples=200, deadline=None)
@given(config)
def test_from_dict_raises_typed_or_succeeds(raw):
    try:
        JobConfig.from_dict(dict(raw))
    except JobConfigException:
        pass  # typed rejection is the contract
    except (ValueError, TypeError) as e:
        # version coercion may raise int() errors — acceptable only for
        # non-dict version values
        assert "version" in raw


@given(st.text(max_size=30))
@settings(max_examples=100, deadline=None)
def test_substitute_params_never_crashes(text):
    try:
        out = substitute_params(text, {"a": 1})
        assert "${" not in out or "}" not in out.split("${", 1)[1]
    except JobConfigException:
        pass


def test_unknown_keys_rejected():
    with pytest.raises(JobConfigException, match="unknown source config keys"):
        JobConfig.from_dict(
            {
                "version": 0,
                "source": {"query": "select 1", "bogus_key": 1},
                "target": {"table": "t", "operation": "append"},
            }
        )
