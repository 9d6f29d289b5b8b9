"""Recipe system: reusable node templates with ${recipe.var}
substitution, extends inheritance, and node-override merging
(reference: odibi/recipes/__init__.py)."""

import pytest

from odibi_spark.plans.recipes import (
    Recipe,
    load_recipes,
    resolve_recipes,
)


def _pipeline_doc(node, recipes=None):
    doc = {"name": "p", "nodes": [node]}
    if recipes is not None:
        doc["recipes"] = recipes
    return doc


SCRUB = {
    "description": "scrub text",
    "required_vars": ["column"],
    "optional_vars": {"lower": True},
    "template": {
        "transform": [
            {
                "function": "clean_text",
                "params": {"columns": ["${recipe.column}"], "lower": "${recipe.lower}"},
            }
        ]
    },
}


class TestSubstitution:
    def test_full_match_preserves_type(self):
        doc = resolve_recipes(
            _pipeline_doc(
                {
                    "name": "n",
                    "read": {"path": "/x", "format": "parquet"},
                    "recipe": "scrub",
                    "recipe_vars": {"column": "body", "lower": False},
                },
                {"scrub": SCRUB},
            )
        )
        params = doc["nodes"][0]["transform"][0]["params"]
        assert params["columns"] == ["body"]
        assert params["lower"] is False  # bool survived, not "False"

    def test_optional_var_default_applies(self):
        doc = resolve_recipes(
            _pipeline_doc(
                {
                    "name": "n",
                    "read": {"path": "/x"},
                    "recipe": "scrub",
                    "recipe_vars": {"column": "body"},
                },
                {"scrub": SCRUB},
            )
        )
        assert doc["nodes"][0]["transform"][0]["params"]["lower"] is True

    def test_embedded_placeholder_stringifies(self):
        recipes = {
            "w": {
                "required_vars": ["layer"],
                "template": {"write": {"path": "/lake/${recipe.layer}/out"}},
            }
        }
        doc = resolve_recipes(
            _pipeline_doc(
                {
                    "name": "n",
                    "read": {"path": "/x"},
                    "recipe": "w",
                    "recipe_vars": {"layer": "silver"},
                },
                recipes,
            )
        )
        assert doc["nodes"][0]["write"]["path"] == "/lake/silver/out"

    def test_missing_required_var_raises_with_names(self):
        with pytest.raises(ValueError, match=r"requires \['column'\]"):
            resolve_recipes(
                _pipeline_doc(
                    {"name": "n", "read": {"path": "/x"}, "recipe": "scrub"},
                    {"scrub": SCRUB},
                )
            )

    def test_unknown_var_in_template_raises(self):
        recipes = {"r": {"template": {"write": {"path": "${recipe.nope}"}}}}
        with pytest.raises(ValueError, match="nope"):
            resolve_recipes(
                _pipeline_doc(
                    {"name": "n", "read": {"path": "/x"}, "recipe": "r"}, recipes
                )
            )

    def test_unknown_recipe_lists_available(self):
        with pytest.raises(ValueError, match="unknown recipe 'ghost'"):
            resolve_recipes(
                _pipeline_doc(
                    {"name": "n", "read": {"path": "/x"}, "recipe": "ghost"},
                    {"scrub": SCRUB},
                )
            )


class TestMergePrecedence:
    def test_node_scalar_wins_and_dicts_merge(self):
        recipes = {
            "r": {
                "template": {
                    "write": {"path": "/default", "mode": "append", "format": "parquet"}
                }
            }
        }
        doc = resolve_recipes(
            _pipeline_doc(
                {
                    "name": "n",
                    "read": {"path": "/x"},
                    "recipe": "r",
                    "write": {"path": "/mine"},
                },
                recipes,
            )
        )
        w = doc["nodes"][0]["write"]
        assert w == {"path": "/mine", "mode": "append", "format": "parquet"}

    def test_node_list_replaces_template_list(self):
        recipes = {
            "r": {
                "template": {
                    "transform": [{"function": "distinct", "params": {}}]
                }
            }
        }
        doc = resolve_recipes(
            _pipeline_doc(
                {
                    "name": "n",
                    "read": {"path": "/x"},
                    "recipe": "r",
                    "transform": [{"sql": "SELECT 1 AS one"}],
                },
                recipes,
            )
        )
        assert doc["nodes"][0]["transform"] == [{"sql": "SELECT 1 AS one"}]

    def test_reserved_fields_rejected_in_template(self):
        with pytest.raises(ValueError, match="name"):
            Recipe.model_validate({"template": {"name": "hijack"}})


class TestExtends:
    BASE = {
        "required_vars": ["path"],
        "optional_vars": {"mode": "overwrite"},
        "template": {
            "write": {"path": "${recipe.path}", "mode": "${recipe.mode}"}
        },
    }

    def test_child_overlays_parent(self):
        recipes = load_recipes(
            {
                "base": self.BASE,
                "child": {
                    "extends": "base",
                    "required_vars": ["column"],
                    "template": {
                        "transform": [
                            {
                                "function": "trim_whitespace",
                                "params": {"columns": ["${recipe.column}"]},
                            }
                        ],
                        "write": {"mode": "append"},
                    },
                },
            }
        )
        child = recipes["child"]
        assert child.required_vars == ["path", "column"]
        assert child.template["write"]["mode"] == "append"  # child wins
        assert child.template["write"]["path"] == "${recipe.path}"  # inherited
        assert child.template["transform"][0]["function"] == "trim_whitespace"

    def test_cycle_detected(self):
        with pytest.raises(ValueError, match="ircular"):
            load_recipes(
                {
                    "a": {"extends": "b", "template": {"cache": True}},
                    "b": {"extends": "a", "template": {"cache": True}},
                }
            )

    def test_extends_unknown_parent(self):
        with pytest.raises(ValueError, match="unknown recipe 'nope'"):
            load_recipes({"a": {"extends": "nope", "template": {"cache": True}}})


class TestBuiltins:
    def test_builtins_load_and_inline_overrides(self):
        recipes = load_recipes()
        assert "silver_dedup_latest" in recipes
        override = load_recipes(
            {"silver_dedup_latest": {"template": {"cache": True}}}
        )
        assert override["silver_dedup_latest"].template == {"cache": True}

    def test_empty_recipes_block_is_consumed(self):
        from odibi_spark.plans.config import load_pipeline_yaml

        cfg = load_pipeline_yaml(
            "name: p\nrecipes:\nnodes:\n  - name: n\n"
            "    read: {path: /x, format: parquet}\n"
        )
        assert cfg.nodes[0].name == "n"

    def test_doc_without_recipes_passes_through_unchanged(self):
        doc = {"name": "p", "nodes": [{"name": "n", "read": {"path": "/x"}}]}
        assert resolve_recipes(doc) is doc


class TestEndToEnd:
    def test_pipeline_yaml_with_recipe_runs(self, spark, tmp_path):
        """A recipe-driven dedup node behaves exactly like the
        hand-written equivalent: latest row per customer key."""
        from odibi_spark.plans.pipeline import Pipeline

        y = f"""
name: recipe_e2e
recipes:
  keep_latest:
    description: latest row per key
    required_vars: [keys, order_by, target]
    template:
      transform:
        - function: deduplicate
          params:
            keys: ${{recipe.keys}}
            order_by: ${{recipe.order_by}}
            descending: true
      write:
        path: ${{recipe.target}}
        mode: overwrite
nodes:
  - name: latest_orders
    read:
      format: parquet
      path: /root/testdata/sf0.001/orders.parquet
    recipe: keep_latest
    recipe_vars:
      keys: [o_custkey]
      order_by: [o_orderdate, o_orderkey]
      target: {tmp_path}/latest
"""
        results = Pipeline.from_yaml(y, spark).run()
        assert results["latest_orders"].status == "success", results[
            "latest_orders"
        ].error
        out = spark.read.parquet(str(tmp_path / "latest"))
        src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        assert out.count() == src.select("o_custkey").distinct().count()

    def test_project_yaml_with_recipe_resolves(self):
        from odibi_spark.plans.project import load_project_yaml

        cfg = load_project_yaml(
            """
name: proj
recipes:
  passthrough:
    template:
      cache: true
pipelines:
  - name: p1
    nodes:
      - name: n1
        read: {path: /x, format: parquet}
        recipe: passthrough
"""
        )
        assert cfg.pipelines[0].nodes[0].cache is True

    def test_cli_list_recipes(self, capsys):
        from odibi_spark.cli import main

        assert main(["list", "recipes", "--json"]) == 0
        import json

        entries = json.loads(capsys.readouterr().out)
        assert "bronze_ingest" in entries


class TestCurationRecipesExample:
    def test_example_yaml_runs_with_env_and_recipes(self, spark, tmp_path):
        """examples/curation_recipes.yaml end-to-end: loader env vars,
        vars:, an extends recipe chain, environments overlay, and the
        lm_score / cluster_embeddings operators."""
        import pathlib

        from odibi_spark.plans.config import load_pipeline_yaml
        from odibi_spark.plans.pipeline import Pipeline

        text = pathlib.Path("examples/curation_recipes.yaml").read_text()
        text = text.replace("/tmp/odibi_curation", str(tmp_path))
        cfg = load_pipeline_yaml(
            text, env="ci",
            environment={
                "DOCS_PATH": "/root/testdata/sf0.001/documents.parquet",
                "EMB_PATH": "/root/testdata/sf0.001/embeddings.parquet",
            },
        )
        assert cfg.max_workers == 2  # environments: ci overlay applied
        results = Pipeline(cfg, spark).run()
        for node in ("doc_quality", "topic_clusters"):
            assert results[node].status == "success", results[node].error
        quality = spark.read.parquet(str(tmp_path / "quality"))
        assert {"doc_id", "n_tokens", "avg_nll"} <= set(quality.columns)
        clusters = spark.read.parquet(str(tmp_path / "clusters"))
        assert clusters.select("cluster").distinct().count() <= 4

    def test_example_data_tests_pass(self, spark):
        from odibi_spark.plans.datatests import run_data_tests

        summary = run_data_tests(spark, "examples/tests/curation_test.yaml")
        assert (summary.passed, summary.failed) == (3, 0), [
            (c.name, c.message) for c in summary.cases
        ]
