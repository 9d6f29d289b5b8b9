"""Data Story report: per-node sections, schema/sample/validation
detail, DAG SVG (reference odibi/story/generator.py + renderers.py).
Snapshot-style assertions on structure, not exact bytes (the report
embeds timestamps)."""

from pyspark.sql import Row

from odibi_spark.lineage import render_dag_svg, render_story
from odibi_spark.plans import Pipeline


def _star_pipeline(spark, tmp_path):
    """Miniature star-schema run: dim + fact -> join (mirrors
    examples/star_schema.yaml shape on tmp data)."""
    dim = str(tmp_path / "dim")
    fact = str(tmp_path / "fact")
    spark.createDataFrame(
        [Row(k=1, name="a"), Row(k=2, name="b")]
    ).write.mode("overwrite").parquet(dim)
    spark.createDataFrame(
        [Row(k=1, amount=10.0), Row(k=1, amount=5.0), Row(k=2, amount=7.0)]
    ).write.mode("overwrite").parquet(fact)
    y = f"""
name: star_demo
nodes:
  - name: dim_k
    read: {{format: parquet, path: "{dim}"}}
  - name: fact_sales
    read: {{format: parquet, path: "{fact}"}}
    validation:
      tests:
        - {{name: amount_positive, type: range, column: amount, min: 0}}
  - name: mart
    depends_on: [dim_k, fact_sales]
    transform:
      - sql: "SELECT d.name, SUM(f.amount) AS total FROM fact_sales f JOIN dim_k d ON f.k = d.k GROUP BY d.name"
    write: {{path: "{tmp_path}/mart", mode: overwrite}}
"""
    pipe = Pipeline.from_yaml(y, spark)
    return pipe, pipe.run()


class TestStory:
    def test_per_node_sections_with_schema_and_samples(self, spark, tmp_path):
        pipe, results = _star_pipeline(spark, tmp_path)
        assert all(r.status == "success" for r in results.values())
        doc = render_story(
            pipe.config, results,
            path=str(tmp_path / "story.html"), context=pipe.context,
        )
        # per-node sections
        for node in ("dim_k", "fact_sales", "mart"):
            assert f'id="node-{node}"' in doc
        # schema of the mart output
        assert "Output schema" in doc and "<td>total</td>" in doc
        # sample rows rendered
        assert "Sample (5 rows)" in doc
        # validation detail with pass mark
        assert "amount_positive" in doc and "✓" in doc
        # DAG svg with status-colored boxes and an edge
        assert "<svg" in doc and "<line" in doc
        # scoreboard
        assert "3 passed" in doc

    def test_failed_node_shows_error_and_color(self, spark, tmp_path):
        y = f"""
name: broken
nodes:
  - name: nope
    read: {{format: parquet, path: "{tmp_path}/does_not_exist"}}
  - name: child
    depends_on: [nope]
"""
        pipe = Pipeline.from_yaml(y, spark)
        results = pipe.run()
        doc = render_story(pipe.config, results, context=pipe.context)
        assert "1 failed" in doc and "1 skipped" in doc
        assert 'class="err"' in doc          # error text block
        assert "#c62828" in doc and "#f9a825" in doc

    def test_story_without_context_still_renders(self, spark, tmp_path):
        pipe, results = _star_pipeline(spark, tmp_path)
        doc = render_story(pipe.config, results)
        assert "Run summary" in doc and "Output schema" not in doc

    def test_dag_svg_layout_is_deterministic(self, spark, tmp_path):
        pipe, results = _star_pipeline(spark, tmp_path)
        assert render_dag_svg(pipe.config, results) == render_dag_svg(
            pipe.config, results
        )
        # mart sits one layer right of its two parents
        svg = render_dag_svg(pipe.config, results)
        assert svg.count("<rect") == 3 and svg.count("<line") == 2

    def test_lineage_edges_and_validation_drilldown(self, spark, tmp_path):
        """Per-node lineage links (upstream + downstream) and the
        summary-table validation drill-down (VERDICT r3 item 8)."""
        pipe, results = _star_pipeline(spark, tmp_path)
        doc = render_story(pipe.config, results, context=pipe.context)
        # upstream links inside the mart section
        assert 'depends on: <a href="#node-dim_k">dim_k</a>' in doc
        # downstream 'feeds' links on both parents
        assert doc.count('feeds: <a href="#node-mart">mart</a>') == 2
        # summary validation cell links to the node's validation anchor
        assert 'href="#node-fact_sales-validation">✓ 1/1 tests</a>' in doc
        assert 'id="node-fact_sales-validation"' in doc
        # validation table carries fail-rate vs threshold + action
        assert "fail rate / threshold" in doc and "0.00%" in doc
        # DAG nodes are clickable anchors
        svg = render_dag_svg(pipe.config, results)
        assert svg.count('<a href="#node-') == 3
