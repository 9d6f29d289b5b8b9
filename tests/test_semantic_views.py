"""Semantic view DDL rendering — golden-text pins (reference
odibi/semantics/views.py). Pure text, no Spark session needed."""

import pytest

from odibi_spark.semantics.metrics import Dimension, Metric, SemanticModel
from odibi_spark.semantics.views import (
    ensure_schema_sql,
    render_all_views,
    render_view_ddl,
)


def model():
    return (
        SemanticModel(source="sales.orders")
        .add_metric(Metric("revenue", expr="SUM(total_amount)", description="gross revenue"))
        .add_metric(Metric("order_count", expr="COUNT(*)"))
        .add_metric(
            Metric(
                "avg_order_value",
                formula="revenue / order_count",
                description="revenue per order",
            )
        )
        .add_dimension(Dimension("segment", column="market_segment"))
        .add_dimension(Dimension("order_month", column="order_date", grain="month"))
    )


class TestViewDDL:
    def test_tsql_golden(self):
        ddl = render_view_ddl(
            model(),
            view_name="v_revenue_by_segment",
            metrics=["revenue", "avg_order_value"],
            dimensions=["segment", "order_month"],
            schema="mart",
            dialect="tsql",
            description="Monthly revenue per segment",
        )
        expected = """\
-- View: v_revenue_by_segment
-- Monthly revenue per segment
-- Source: sales.orders
--   metric revenue (simple) — gross revenue
--   metric avg_order_value (derived) — revenue per order
CREATE OR ALTER VIEW [mart].[v_revenue_by_segment] AS
SELECT
    market_segment AS segment,
    DATETRUNC(month, order_date) AS order_month,
    SUM(total_amount) AS revenue,
    (SUM(total_amount)) / NULLIF((COUNT(*)), 0) AS avg_order_value
FROM sales.orders
GROUP BY market_segment, DATETRUNC(month, order_date)
"""
        assert ddl == expected

    def test_ansi_golden(self):
        ddl = render_view_ddl(
            model(),
            view_name="v_kpis",
            metrics=["order_count"],
            dimensions=["order_month"],
            where="status = 'O'",
            dialect="ansi",
        )
        expected = """\
-- View: v_kpis
-- Source: sales.orders
--   metric order_count (simple)
CREATE OR REPLACE VIEW "v_kpis" AS
SELECT
    DATE_TRUNC('month', order_date) AS order_month,
    COUNT(*) AS order_count
FROM sales.orders
WHERE status = 'O'
GROUP BY DATE_TRUNC('month', order_date)
"""
        assert ddl == expected

    def test_derived_inlines_longest_name_first(self):
        m = (
            SemanticModel(source="t")
            .add_metric(Metric("net_revenue", expr="SUM(net)"))
            .add_metric(Metric("revenue", expr="SUM(gross)"))
            .add_metric(Metric("margin", formula="net_revenue / revenue"))
        )
        ddl = render_view_ddl(m, view_name="v", metrics=["margin"], dialect="ansi")
        assert "(SUM(net)) / NULLIF((SUM(gross)), 0) AS margin" in ddl

    def test_unknown_metric_and_dimension_raise(self):
        with pytest.raises(ValueError, match="unknown metric"):
            render_view_ddl(model(), view_name="v", metrics=["nope"])
        with pytest.raises(ValueError, match="unknown dimension"):
            render_view_ddl(
                model(), view_name="v", metrics=["revenue"], dimensions=["nope"]
            )
        with pytest.raises(ValueError, match="unknown dialect"):
            render_view_ddl(
                model(), view_name="v", metrics=["revenue"], dialect="mysql"
            )

    def test_ensure_schema(self):
        tsql = ensure_schema_sql("mart", "tsql")
        assert "sys.schemas" in tsql and "EXEC('CREATE SCHEMA [mart]')" in tsql
        assert ensure_schema_sql("mart", "ansi") == 'CREATE SCHEMA IF NOT EXISTS "mart"'

    def test_render_all_views(self):
        out = render_all_views(
            model(),
            [
                {"name": "v1", "metrics": ["revenue"], "dimensions": ["segment"]},
                {"name": "v2", "metrics": ["order_count"]},
            ],
            dialect="ansi",
        )
        assert set(out) == {"v1", "v2"}
        assert "GROUP BY" in out["v1"] and "GROUP BY" not in out["v2"]

    def test_spark_accepts_ansi_ddl(self, spark):
        """The ANSI dialect must be executable by Spark itself (same
        dialect family) — proves the rendered text is real SQL."""
        spark.range(10).selectExpr(
            "id AS total_amount",
            "CAST(concat('2024-01-', lpad(CAST(id % 28 + 1 AS STRING), 2, '0')) AS DATE) AS order_date",
            "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS market_segment",
        ).createOrReplaceTempView("sales_orders")
        m = model()
        m.source = "sales_orders"
        ddl = render_view_ddl(
            m,
            view_name="v_exec",
            metrics=["revenue", "avg_order_value"],
            dimensions=["segment"],
            dialect="ansi",
        )
        # Spark has no CREATE OR REPLACE VIEW "quoted" syntax for temp
        # views with double quotes unless ANSI quoting is on; strip the
        # header and run the SELECT body as a query
        body = ddl.split(" AS\n", 1)[1]
        rows = spark.sql(body).collect()
        assert {r["segment"] for r in rows} == {"A", "B"}
        for r in rows:
            assert r["avg_order_value"] == pytest.approx(r["revenue"] / 5)
