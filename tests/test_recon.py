"""Recon engine tests — FIXTURES.md §3 (the reference's recon.yml shape)
plus tolerance/NULL semantics (SURVEY §8.9)."""

from pyspark.sql import Row

from x_spark import init_recon_job


def recon_config(n_sources, query="SELECT 1 AS C1, 2 AS C2"):
    return {
        "version": 0,
        "group_by": ["C1"],
        "data": [
            {
                "name": f"source{i}",
                "datasource": "parquet",
                "query": query,
                "metrics": [{"sum_c2": "sum(C2)"}, {"avg_c2": "avg(C2)"}],
            }
            for i in range(1, n_sources + 1)
        ],
    }


def test_three_source_join(spark):
    out = init_recon_job(recon_config(3), spark=spark).run()
    rows = out.collect()
    assert len(rows) == 1
    row = rows[0].asDict()
    assert row["C1"] == 1
    for i in (1, 2, 3):
        assert row[f"source{i}_sum_c2"] == 2
        assert row[f"source{i}_avg_c2"] == 2.0
    # compare columns only materialize for exactly 2 sources
    assert not any(c.startswith(("delta_", "match_")) for c in out.columns)


def test_two_source_compare_columns(spark):
    out = init_recon_job(recon_config(2), spark=spark).run()
    row = out.collect()[0].asDict()
    assert row["delta_sum_c2"] == 0
    assert row["delta_avg_c2"] == 0.0
    assert row["match_sum_c2"] is True
    assert row["match_avg_c2"] is True


def test_two_source_tolerance_and_mismatch(spark):
    cfg = recon_config(2)
    # within 1e-3 relative tolerance on the float metric
    cfg["data"][1]["query"] = "SELECT 1 AS C1, cast(2.0005 as double) AS C2"
    out = init_recon_job(cfg, spark=spark).run()
    row = out.collect()[0].asDict()
    assert row["match_avg_c2"] is True  # |2-2.0005|/2.0005 < 1e-3
    # sum is bigint vs double -> exact compare path on source1's dtype
    assert row["match_sum_c2"] is False


def test_disjoint_groups_full_outer(spark):
    cfg = {
        "version": 0,
        "group_by": ["k"],
        "data": [
            {"datasource": "parquet", "query": "SELECT 1 AS k, 10 AS v", "metrics": [{"s": "sum(v)"}]},
            {"datasource": "parquet", "query": "SELECT 2 AS k, 20 AS v", "metrics": [{"s": "sum(v)"}]},
        ],
    }
    out = init_recon_job(cfg, spark=spark).run()
    rows = {r["k"]: r.asDict() for r in out.collect()}
    assert set(rows) == {1, 2}
    # full outer join: missing side is NULL -> match False, delta NULL
    assert rows[1]["source_1_s"] == 10 and rows[1]["source_2_s"] is None
    assert rows[1]["match_s"] is False
    assert rows[2]["match_s"] is False


def test_pairwise_compare_three_sources(spark):
    cfg = recon_config(3)
    cfg["compare"] = "pairwise"
    cfg["data"][2]["query"] = "SELECT 1 AS C1, cast(9.0 as double) AS C2"
    out = init_recon_job(cfg, spark=spark).run()
    row = out.collect()[0].asDict()
    # source2 matches the baseline, source3 does not
    assert row["match_source2_avg_c2"] is True
    assert row["match_source3_avg_c2"] is False
    assert row["delta_source3_avg_c2"] == 7.0
    # baseline itself has no compare columns
    assert "match_source1_avg_c2" not in row


def test_param_templating(tmp_path, spark):
    yml = tmp_path / "recon.yml"
    yml.write_text(
        """
version: 0
group_by: [C1]
data:
  - datasource: parquet
    query: SELECT 1 AS C1, ${val} AS C2
    metrics:
      - sum_c2: sum(C2)
"""
    )
    job = init_recon_job(str(yml), params={"val": 7}, spark=spark)
    row = job.run().collect()[0]
    assert row["source_1_sum_c2"] == 7

    import pytest

    from x_spark.errors import JobConfigException

    with pytest.raises(JobConfigException):
        init_recon_job(str(yml), params={}, spark=spark)
