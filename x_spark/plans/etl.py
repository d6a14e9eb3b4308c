"""ETL job lifecycle + write-mode job classes.

Reference parity: etl/parent.py (factory + 8-step lifecycle),
etl/append.py, etl/overwrite.py, etl/update_and_upsert.py — re-expressed
over the datasource abstraction, with the reference's crash bugs fixed
(SURVEY §8.1-8.4) and the driver-side partition collect avoided on the
hot path (SURVEY §4).

Lifecycle (etl/parent.py:206-223; step numbering kept for parity —
step 02 was removed upstream):

    01 source pre_sql -> 03 create __source_view -> 04 source post_sql
    -> 05 target pre_sql -> 06 operate -> 07 target post_sql -> 08 clean
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from x_spark.errors import JobConfigException
from x_spark.plans.config import JobConfig, load_yaml_config
from x_spark.session import get_session
from x_spark.sources import init_datasource
from x_spark.sources.base import MergeSpec, TableRef

SOURCE_VIEW = "__source_view"


def init_etl_job(
    config: str | dict,
    params: dict[str, Any] | None = None,
    spark: SparkSession | None = None,
) -> "BaseETLJob":
    """Factory (etl/parent.py:10-65): YAML path or dict -> job object."""
    if isinstance(config, str):
        raw = load_yaml_config(config, params)
    else:
        raw = {str(k).lower(): v for k, v in config.items()}
    job_config = JobConfig.from_dict(raw)
    operation = job_config.target.operation.lower()  # type: ignore[union-attr]
    job_cls = {
        "append": AppendETLJob,
        "insert": AppendETLJob,
        "overwrite": OverwriteETLJob,
        "update": UpdateETLJob,
        "upsert": UpsertETLJob,
        "delete": DeleteETLJob,
    }[operation]
    return job_cls(job_config, spark or get_session())


class BaseETLJob:
    def __init__(self, config: JobConfig, spark: SparkSession) -> None:
        self.config = config
        self.spark = spark
        self.from_datasource = (
            init_datasource(config.source.datasource, spark)
            if config.source is not None
            else None
        )
        self.to_datasource = init_datasource(config.target.datasource, spark)

    # -- lifecycle -----------------------------------------------------
    def run(self) -> None:
        self.step_01_source_pre_sql()
        self.step_03_create_source_view()
        self.step_04_source_post_sql()
        self.step_05_target_pre_sql()
        self.step_06_operate()
        self.step_07_target_post_sql()
        self.step_08_clean()

    def _run_hook(self, datasource, endpoint, sql: str) -> None:
        """Lifecycle hook execution: atomic by default; ';'-separated
        scripts when the endpoint opts in with ``sql_scripts: true``."""
        if endpoint.sql_scripts:
            datasource.sql_script(sql)
        else:
            datasource.sql(sql)

    def step_01_source_pre_sql(self) -> None:
        src = self.config.source
        if src is not None and src.pre_sql:
            self._run_hook(self.from_datasource, src, src.pre_sql)

    def step_03_create_source_view(self) -> None:
        src = self.config.source
        if src is None:  # source-less ops (delete)
            return
        if src.path is not None and src.query is None:
            df = self.from_datasource.read(TableRef(path=src.path, options=src.options))
        else:
            df = self.from_datasource.sql(self.config.source_query)
        df.createOrReplaceTempView(SOURCE_VIEW)

    def step_04_source_post_sql(self) -> None:
        src = self.config.source
        if src is not None and src.post_sql:
            self._run_hook(self.from_datasource, src, src.post_sql)

    def step_05_target_pre_sql(self) -> None:
        # Routed to the TARGET datasource (fixes etl/parent.py:181 which
        # ran it on the source side, SURVEY §8.4).
        if self.config.target.pre_sql:
            self._run_hook(self.to_datasource, self.config.target, self.config.target.pre_sql)

    def step_06_operate(self) -> None:
        raise NotImplementedError

    def step_07_target_post_sql(self) -> None:
        if self.config.target.post_sql:
            self._run_hook(self.to_datasource, self.config.target, self.config.target.post_sql)

    def step_08_clean(self) -> None:
        if self.config.source is not None:
            self.spark.catalog.dropTempView(SOURCE_VIEW)

    # -- shared helpers ------------------------------------------------
    def source_df(self) -> DataFrame:
        return self.spark.table(SOURCE_VIEW)

    def target_ref(self) -> TableRef:
        tgt = self.config.target
        return TableRef(
            table=tgt.table,
            path=tgt.path,
            options=tgt.options,
            partition_by=list(tgt.partition_by),
        )

    def _target_sql_name(self) -> str:
        tgt = self.config.target
        return tgt.table if tgt.table else f"delta.`{tgt.path}`"

    def operation_sql(self) -> str:
        raise NotImplementedError

    def generate_sql(self) -> list[str]:
        """Dry-run: the SQL statements the lifecycle would execute, in
        order (the working replacement for the reference's stale
        ``generate_full_sql`` API, SURVEY §3.3/§8.11). MERGE is
        rendered as the ANSI statement Delta would run."""
        cfg = self.config

        def hook(endpoint, sql: str | None) -> list[str]:
            if not sql:
                return []
            if endpoint.sql_scripts:
                from x_spark.sources.base import split_sql_statements

                return split_sql_statements(sql)
            return [sql]

        stmts: list[str] = []
        if cfg.source is not None:
            stmts.extend(hook(cfg.source, cfg.source.pre_sql))
            if cfg.source.path is not None and cfg.source.query is None:
                stmts.append(
                    f"CREATE OR REPLACE TEMPORARY VIEW {SOURCE_VIEW} AS "
                    f"SELECT * FROM delta.`{cfg.source.path}`"
                )
            else:
                stmts.append(
                    f"CREATE OR REPLACE TEMPORARY VIEW {SOURCE_VIEW} AS {cfg.source_query}"
                )
            stmts.extend(hook(cfg.source, cfg.source.post_sql))
        stmts.extend(hook(cfg.target, cfg.target.pre_sql))
        stmts.append(self.operation_sql())
        stmts.extend(hook(cfg.target, cfg.target.post_sql))
        return stmts


class AppendETLJob(BaseETLJob):
    """W1 (etl/append.py:11-33): append __source_view to the target."""

    def step_06_operate(self) -> None:
        self.to_datasource.append(self.source_df(), self.target_ref())

    def operation_sql(self) -> str:
        return f"INSERT INTO {self._target_sql_name()} SELECT * FROM {SOURCE_VIEW}"


class OverwriteETLJob(BaseETLJob):
    """W2 (etl/overwrite.py): partition-scoped overwrite.

    Semantics (golden-confirmed, FIXTURES.md §2): only the partitions
    present in the source are replaced; other partitions survive; an
    unpartitioned target is fully overwritten.

    Scale note: the reference collects distinct partition tuples to the
    driver to build a replaceWhere string (etl/overwrite.py:26). The
    parquet connector's dynamic partition overwrite needs no driver
    collect at all; ``replace_where_predicate()`` still renders the
    reference-style predicate for dry-run/debug (bounded by partition
    count, metadata-scale only).
    """

    def step_06_operate(self) -> None:
        ds = self.to_datasource
        overwrite_dynamic = getattr(ds, "overwrite_dynamic", None)
        if overwrite_dynamic is not None:
            overwrite_dynamic(self.source_df(), self.target_ref())
        else:  # pragma: no cover - generic connector fallback
            ds.overwrite(self.source_df(), self.target_ref(), self.replace_where_predicate())

    def replace_where_predicate(self) -> str:
        """Reference-style replaceWhere string from the source's distinct
        partition tuples (etl/overwrite.py:20-36); '1=1' when the target
        is unpartitioned. Literals are typed and quote-escaped and NULL
        partition values render as IS NULL — the reference interpolated
        raw f-strings (SURVEY §7 hard-item 3)."""
        from x_spark.sources.base import partition_tuple_clause

        part_cols = self.to_datasource.partition_columns(self.target_ref())
        if not part_cols:
            return "1=1"
        tuples = self.source_df().select(*part_cols).distinct().collect()
        clauses = [partition_tuple_clause(row, part_cols) for row in tuples]
        return " OR ".join(clauses) if clauses else "1=0"

    def operation_sql(self) -> str:
        return (
            f"INSERT OVERWRITE {self._target_sql_name()} "
            f"REPLACE WHERE {self.replace_where_predicate()} "
            f"SELECT * FROM {SOURCE_VIEW}"
        )


class _MergeETLJob(BaseETLJob):
    insert_when_not_matched = False

    def merge_spec(self) -> MergeSpec:
        tgt = self.config.target
        return MergeSpec(
            primary_key_columns=list(tgt.primary_key_column),
            update_columns=list(tgt.update_column),
            extra_target_predicate=tgt.where_statement_on_table or "1=1",
            insert_when_not_matched=self.insert_when_not_matched,
        )

    def step_06_operate(self) -> None:
        self.to_datasource.merge(self.source_df(), self.target_ref(), self.merge_spec())

    def operation_sql(self) -> str:
        spec = self.merge_spec()
        cond = " AND ".join(
            [f"({spec.extra_target_predicate})"]
            + [f"TGT.{c} = SRC.{c}" for c in spec.primary_key_columns]
        )
        set_cols = list(dict.fromkeys(spec.update_columns + spec.primary_key_columns))
        set_clause = ", ".join(f"TGT.{c} = SRC.{c}" for c in set_cols)
        stmt = (
            f"MERGE INTO {self._target_sql_name()} AS TGT "
            f"USING {SOURCE_VIEW} AS SRC ON {cond} "
            f"WHEN MATCHED THEN UPDATE SET {set_clause}"
        )
        if spec.insert_when_not_matched:
            cols = ", ".join(set_cols)
            vals = ", ".join(f"SRC.{c}" for c in set_cols)
            stmt += f" WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
        return stmt


class UpdateETLJob(_MergeETLJob):
    """W3 (etl/update_and_upsert.py:10-46): matched rows updated, no inserts."""

    insert_when_not_matched = False


class UpsertETLJob(_MergeETLJob):
    """W4 (etl/update_and_upsert.py:49-57): update + insert-when-not-matched;
    inserted rows carry pk+update columns, other columns NULL
    (golden-confirmed quirk, SURVEY §8.7)."""

    insert_when_not_matched = True


class DeleteETLJob(BaseETLJob):
    """W7 extension: ANSI DELETE scoped by ``where_statement_on_table``.

    Source-less — the lifecycle's source steps no-op. Rows where the
    predicate is TRUE are removed; FALSE/NULL survive."""

    def step_06_operate(self) -> None:
        self.to_datasource.delete(
            self.target_ref(), self.config.target.where_statement_on_table
        )

    def operation_sql(self) -> str:
        return (
            f"DELETE FROM {self._target_sql_name()} "
            f"WHERE {self.config.target.where_statement_on_table}"
        )
