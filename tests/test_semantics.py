"""Semantic layer tests (reference model: odibi/semantics/query.py)."""

import pytest
from pyspark.sql import Row

from odibi_spark.semantics import Dimension, Metric, SemanticModel, SemanticQuery


@pytest.fixture(scope="module")
def model(spark):
    spark.createDataFrame(
        [
            Row(region="NA", amount=100.0, cost=60.0, d="2024-01-05"),
            Row(region="NA", amount=50.0, cost=30.0, d="2024-02-10"),
            Row(region="EU", amount=80.0, cost=80.0, d="2024-01-20"),
        ]
    ).withColumn("d", __import__("pyspark.sql.functions", fromlist=["F"]).to_date("d")) \
     .createOrReplaceTempView("sales")
    m = SemanticModel(source="sales")
    m.add_metric(Metric(name="revenue", expr="SUM(amount)"))
    m.add_metric(Metric(name="cost_total", expr="SUM(cost)"))
    m.add_metric(Metric(name="margin", formula="(revenue - cost_total) / revenue"))
    m.add_dimension(Dimension(name="region"))
    m.add_dimension(Dimension(name="month", column="d", grain="month"))
    return m


def test_simple_by(spark, model):
    out = SemanticQuery(model).execute(spark, "revenue BY region")
    got = {r.region: r.revenue for r in out.collect()}
    assert got == {"NA": 150.0, "EU": 80.0}


def test_derived_metric_inlined_with_nullif(spark, model):
    sql = SemanticQuery(model).to_sql("margin BY region")
    assert "NULLIF" in sql and "SUM(amount)" in sql
    got = {r.region: r.margin for r in
           SemanticQuery(model).execute(spark, "margin BY region").collect()}
    assert got["NA"] == pytest.approx(0.4)
    assert got["EU"] == pytest.approx(0.0)


def test_where_and_time_grain(spark, model):
    out = SemanticQuery(model).execute(
        spark, "revenue BY month WHERE region = 'NA'"
    )
    rows = {str(r.month)[:7]: r.revenue for r in out.collect()}
    assert rows == {"2024-01": 100.0, "2024-02": 50.0}


def test_no_dims(spark, model):
    out = SemanticQuery(model).execute(spark, "revenue, cost_total")
    r = out.collect()[0]
    assert r.revenue == 230.0 and r.cost_total == 170.0


def test_unknown_metric_rejected(model):
    with pytest.raises(ValueError, match="unknown metrics"):
        SemanticQuery(model).to_sql("bogus BY region")


def test_division_by_zero_guarded(spark, model):
    # EU margin divides by revenue 80 (fine); force a zero-revenue group
    spark.createDataFrame([Row(region="ZZ", amount=0.0, cost=5.0)]) \
        .createOrReplaceTempView("sales_zero")
    m = SemanticModel(source="sales_zero")
    m.add_metric(Metric(name="revenue", expr="SUM(amount)"))
    m.add_metric(Metric(name="cost_total", expr="SUM(cost)"))
    m.add_metric(Metric(name="margin", formula="(revenue - cost_total) / revenue"))
    m.add_dimension(Dimension(name="region"))
    out = SemanticQuery(m).execute(spark, "margin BY region").collect()
    assert out[0].margin is None  # NULL, not a crash


def test_materialize(spark, model, tmp_path):
    out = SemanticQuery(model).materialize(
        spark, "revenue BY region", path=str(tmp_path / "mat")
    )
    assert out.count() == 2
