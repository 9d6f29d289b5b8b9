"""Node lifecycle additions: incremental HWM, contracts, pre/post SQL,
materialized views (reference phases: node.py:222-392)."""

import pytest
from pyspark.sql import Row, functions as F

from odibi_spark.plans import Pipeline


def _yaml(tmp_path, src, state, out):
    return f"""
name: inc_demo
nodes:
  - name: sink
    read: {{format: parquet, path: "{src}"}}
    incremental: {{mode: stateful, column: at}}
    state_path: "{state}"
    write: {{path: "{out}", mode: append}}
"""


class TestIncrementalNode:
    def test_hwm_cycle_through_pipeline(self, spark, tmp_path):
        import datetime

        ts = datetime.datetime.fromisoformat
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        state = str(tmp_path / "state.json")
        b1 = spark.createDataFrame(
            [Row(id=1, at=ts("2024-01-01 00:00:00")), Row(id=2, at=ts("2024-01-02 00:00:00"))]
        )
        b1.write.mode("overwrite").parquet(src)
        y = _yaml(tmp_path, src, state, out)
        r1 = Pipeline.from_yaml(y, spark).run()
        assert r1["sink"].status == "success", r1["sink"].error
        assert spark.read.parquet(out).count() == 2

        # second run, source grew by one row; only the new row appends
        b2 = spark.createDataFrame([Row(id=3, at=ts("2024-01-03 00:00:00"))])
        b2.write.mode("append").parquet(src)
        r2 = Pipeline.from_yaml(y, spark).run()
        assert r2["sink"].status == "success", r2["sink"].error
        assert spark.read.parquet(out).count() == 3

        # third run with no new data: nothing appended (idempotent)
        r3 = Pipeline.from_yaml(y, spark).run()
        assert r3["sink"].status == "success"
        assert spark.read.parquet(out).count() == 3


class TestContracts:
    def test_schema_contract_blocks(self, spark, tmp_path):
        src = str(tmp_path / "c_src")
        spark.createDataFrame([Row(a=1)]).write.mode("overwrite").parquet(src)
        y = f"""
name: c
nodes:
  - name: n
    read: {{format: parquet, path: "{src}"}}
    contracts:
      - {{name: shape, type: schema, columns: {{a: bigint, missing_col: string}}}}
"""
        r = Pipeline.from_yaml(y, spark).run()
        assert r["n"].status == "failed" and "schema mismatch" in r["n"].error

    def test_row_count_contract(self, spark, tmp_path):
        src = str(tmp_path / "rc_src")
        spark.createDataFrame([Row(a=1)]).write.mode("overwrite").parquet(src)
        y = f"""
name: c2
nodes:
  - name: n
    read: {{format: parquet, path: "{src}"}}
    contracts:
      - {{name: enough, type: row_count, min: 100}}
"""
        r = Pipeline.from_yaml(y, spark).run()
        assert r["n"].status == "failed" and "row count" in r["n"].error


class TestPrePostSqlAndViews:
    def test_pre_post_sql_and_materialized_view(self, spark, tmp_path):
        src = str(tmp_path / "v_src")
        spark.createDataFrame([Row(a=1), Row(a=2)]).write.mode("overwrite").parquet(src)
        y = f"""
name: v
nodes:
  - name: n
    pre_sql: ["CREATE OR REPLACE TEMP VIEW pre_marker AS SELECT 42 AS x"]
    read: {{format: parquet, path: "{src}"}}
    materialize_view: my_view
    post_sql: ["CREATE OR REPLACE TEMP VIEW post_marker AS SELECT 43 AS x"]
"""
        r = Pipeline.from_yaml(y, spark).run()
        assert r["n"].status == "success", r["n"].error
        assert spark.table("pre_marker").collect()[0].x == 42
        assert spark.table("post_marker").collect()[0].x == 43
        assert spark.table("my_view").count() == 2


class TestSkipIfUnchanged:
    def test_write_skipped_on_identical_content(self, spark, tmp_path):
        import os

        src = str(tmp_path / "s_src")
        out = str(tmp_path / "s_out")
        state = str(tmp_path / "s_state.json")
        spark.createDataFrame([Row(a=1)]).write.mode("overwrite").parquet(src)
        y = f"""
name: s
nodes:
  - name: n
    read: {{format: parquet, path: "{src}"}}
    state_path: "{state}"
    write: {{path: "{out}", mode: overwrite, skip_if_unchanged: true}}
"""
        r1 = Pipeline.from_yaml(y, spark).run()
        assert r1["n"].status == "success", r1["n"].error
        mtime1 = max(os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out))
        r2 = Pipeline.from_yaml(y, spark).run()
        assert r2["n"].status == "success"
        mtime2 = max(os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out))
        assert mtime1 == mtime2  # second write skipped


class TestResume:
    def test_resume_reuses_succeeded_nodes(self, spark, tmp_path):
        src = str(tmp_path / "r_src")
        out = str(tmp_path / "r_out")
        spark.createDataFrame([Row(a=1), Row(a=2)]).write.mode("overwrite").parquet(src)
        y = f"""
name: r
nodes:
  - name: base
    read: {{format: parquet, path: "{src}"}}
    write: {{path: "{out}", mode: overwrite}}
  - name: child
    depends_on: [base]
    transform:
      - {{function: filter_rows, params: {{condition: "a > 1"}}}}
"""
        pipe = Pipeline.from_yaml(y, spark)
        r1 = pipe.run()
        assert all(r.status == "success" for r in r1.values())
        # resume: base re-registered from its parquet, child re-runs
        pipe2 = Pipeline.from_yaml(y, spark)
        r2 = pipe2.run(resume_from=r1)
        assert r2["base"].status == "success" and r2["child"].status == "success"
        assert pipe2.context.get("child").count() == 1


class TestRowsWritten:
    def test_rows_written_observed_without_extra_scan(self, spark, tmp_path):
        src = str(tmp_path / "rw_src")
        spark.range(37).write.mode("overwrite").parquet(src)
        y = f"""
name: rw
nodes:
  - name: n
    read: {{format: parquet, path: "{src}"}}
    write: {{path: "{tmp_path}/rw_out", mode: overwrite}}
"""
        r = Pipeline.from_yaml(y, spark).run()
        assert r["n"].status == "success", r["n"].error
        assert r["n"].rows_written == 37


class TestPrivacy:
    def test_pii_anonymized_before_write(self, spark, tmp_path):
        src = str(tmp_path / "p_src")
        spark.createDataFrame([Row(id=1, email="a@x.com")]).write.mode(
            "overwrite"
        ).parquet(src)
        y = f"""
name: p
nodes:
  - name: n
    read: {{format: parquet, path: "{src}"}}
    privacy: {{pii_columns: [email], method: sha256, salt: s}}
    write: {{path: "{tmp_path}/p_out", mode: overwrite}}
"""
        r = Pipeline.from_yaml(y, spark).run()
        assert r["n"].status == "success", r["n"].error
        row = spark.read.parquet(str(tmp_path / "p_out")).collect()[0]
        assert len(row.email) == 64 and "@" not in row.email
