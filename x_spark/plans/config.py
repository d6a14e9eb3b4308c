"""Job config loading: YAML + ``${param}`` templating + validation.

Reference parity (SURVEY §1.3, §2.10 X3/X5) with the reference's bugs
fixed deliberately (SURVEY §8):

- ``${param}`` substitution is literal text replacement over the raw
  YAML *content* before parse (etl/parent.py:30-34); the
  leftover-parameter check scans the substituted CONTENT, not the file
  path (fixes §8.5).
- Top-level keys are lowercased; nested keys stay case-sensitive
  (etl/parent.py:47-49, kept for parity, §8.14).
- ``datasource`` defaults to ``delta`` so the reference's shipped golden
  configs (which omit it) run (fixes §8.12).
- The validator works (fixes the inverted/broken logic of
  etl/validate.py, §8.6).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

import yaml

from x_spark.errors import JobConfigException

_PARAM_RE = re.compile(r"\$\{([A-Za-z0-9_.-]+)\}")

VALID_OPERATIONS = ("append", "insert", "overwrite", "update", "upsert", "delete")


def substitute_params(text: str, params: dict[str, Any] | None) -> str:
    """Literal ``${name}`` -> value replacement, then fail on leftovers."""
    for key, value in (params or {}).items():
        text = text.replace("${%s}" % key, str(value))
    leftover = sorted(set(_PARAM_RE.findall(text)))
    if leftover:
        raise JobConfigException(f"unresolved parameters in config: {leftover}")
    return text


def load_yaml_config(path: str, params: dict[str, Any] | None = None) -> dict:
    with open(path, "r", encoding="utf-8") as fh:
        raw = fh.read()
    config = yaml.safe_load(substitute_params(raw, params))
    if not isinstance(config, dict):
        raise JobConfigException(f"config at {path} is not a mapping")
    return {str(k).lower(): v for k, v in config.items()}


@dataclass(frozen=True)
class EndpointConfig:
    """One side of a job (source or target)."""

    datasource: str = "delta"
    query: str | None = None
    table: str | None = None
    path: str | None = None
    pre_sql: str | None = None
    post_sql: str | None = None
    # opt-in: treat pre_sql/post_sql as ';'-separated scripts instead of
    # one atomic statement (the reference only ever ran atomic hooks)
    sql_scripts: bool = False
    options: dict[str, str] = field(default_factory=dict)
    # target-only:
    operation: str | None = None
    primary_key_column: list[str] = field(default_factory=list)
    update_column: list[str] = field(default_factory=list)
    where_statement_on_table: str = "1=1"
    # layout for tables the job creates (ignored for existing targets,
    # whose layout is authoritative): hive partitioning for pruning
    partition_by: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, raw: dict, side: str) -> "EndpointConfig":
        known = {f for f in cls.__dataclass_fields__}
        unknown = set(raw) - known
        if unknown:
            raise JobConfigException(f"unknown {side} config keys: {sorted(unknown)}")
        kwargs = dict(raw)
        kwargs.setdefault("datasource", "delta")
        for list_key in ("primary_key_column", "update_column", "partition_by"):
            if list_key in kwargs and isinstance(kwargs[list_key], str):
                kwargs[list_key] = [kwargs[list_key]]
        return cls(**kwargs)


@dataclass(frozen=True)
class JobConfig:
    version: int
    source: EndpointConfig | None
    target: EndpointConfig

    @classmethod
    def from_dict(cls, raw: dict) -> "JobConfig":
        for key in ("version", "target"):
            if key not in raw:
                raise JobConfigException(f"job config missing required key {key!r}")
        operation = str(dict(raw["target"]).get("operation", "")).lower()
        if "source" not in raw and operation != "delete":
            raise JobConfigException("job config missing required key 'source'")
        job = cls(
            version=int(raw["version"]),
            source=(
                EndpointConfig.from_dict(dict(raw["source"]), "source")
                if "source" in raw
                else None
            ),
            target=EndpointConfig.from_dict(dict(raw["target"]), "target"),
        )
        job.validate()
        return job

    def validate(self) -> None:
        src, tgt = self.source, self.target
        # YAML happily yields non-string scalars (true, 1) for
        # operation — a typed config error, never an AttributeError
        op = tgt.operation.lower() if isinstance(tgt.operation, str) else ""
        if src is not None and src.query is None and src.table is None and src.path is None:
            raise JobConfigException("source requires one of query/table/path")
        if op not in VALID_OPERATIONS:
            raise JobConfigException(
                f"target.operation {tgt.operation!r} not in {VALID_OPERATIONS}"
            )
        if (tgt.table is None) == (tgt.path is None):
            raise JobConfigException("target requires exactly one of table/path")
        if op in ("update", "upsert"):
            if not tgt.primary_key_column:
                raise JobConfigException(f"{op} requires target.primary_key_column")
            if not tgt.update_column:
                raise JobConfigException(f"{op} requires target.update_column")

    @property
    def source_query(self) -> str:
        """Default query when only a table is given (etl/parent.py:108-111)."""
        if self.source.query:
            return self.source.query
        if self.source.table:
            return f"SELECT * FROM {self.source.table}"
        raise JobConfigException("source has neither query nor table")
