"""Config loader: ${VAR}/${vars.x}/${date:...} substitution, imports,
environments overlays, secrets CLI (reference:
odibi/utils/config_loader.py + cli/secrets.py)."""

from datetime import datetime

import pytest

from odibi_spark.plans.loader import (
    collect_env_vars,
    find_env_vars,
    load_config,
    resolve_date_expression,
    substitute_env,
)

NOW = datetime(2024, 3, 15, 10, 30, 45)


class TestEnvSubstitution:
    def test_both_spellings_substitute(self):
        out = substitute_env(
            "a: ${TOKEN}\nb: ${env:TOKEN}", {"TOKEN": "xyz"}
        )
        assert out == "a: xyz\nb: xyz"

    def test_missing_var_names_the_variable(self):
        with pytest.raises(ValueError, match="SECRET_KEY"):
            substitute_env("k: ${SECRET_KEY}", {})

    def test_recipe_and_vars_placeholders_untouched(self):
        text = "a: ${recipe.col}\nb: ${vars.x}\nc: ${date:today}"
        assert substitute_env(text, {}) == text

    def test_find_env_vars_order_and_dedup(self):
        assert find_env_vars("${B} ${A} ${env:B}") == ["B", "A"]


class TestDateExpressions:
    def test_named(self):
        assert resolve_date_expression("today", now=NOW) == "2024-03-15"
        assert resolve_date_expression("yesterday", now=NOW) == "2024-03-14"
        assert resolve_date_expression("start_of_month", now=NOW) == "2024-03-01"
        assert resolve_date_expression("end_of_month", now=NOW) == "2024-03-31"
        assert resolve_date_expression("start_of_year", now=NOW) == "2024-01-01"
        assert (
            resolve_date_expression("now", now=NOW) == "2024-03-15 10:30:45"
        )

    def test_relative_with_overflow(self):
        assert resolve_date_expression("-7d", now=NOW) == "2024-03-08"
        assert resolve_date_expression("+2w", now=NOW) == "2024-03-29"
        jan31 = datetime(2024, 1, 31)
        assert resolve_date_expression("+1m", now=jan31) == "2024-02-29"
        feb29 = datetime(2024, 2, 29)
        assert resolve_date_expression("+1y", now=feb29) == "2025-02-28"
        assert resolve_date_expression("-1m", now=NOW) == "2024-02-15"

    def test_custom_format(self):
        assert (
            resolve_date_expression("today", "%Y%m%d", now=NOW) == "20240315"
        )

    def test_unknown_expression_raises(self):
        with pytest.raises(ValueError, match="nonsense"):
            resolve_date_expression("nonsense", now=NOW)


class TestVarsAndDates:
    def test_vars_fullmatch_preserves_type(self):
        doc = load_config(
            """
vars:
  workers: 8
  prefix: silver
name: "${vars.prefix}_p"
max_workers: "${vars.workers}"
nodes: []
""",
        )
        assert doc["max_workers"] == 8
        assert doc["name"] == "silver_p"
        assert "vars" not in doc

    def test_undefined_var_raises(self):
        with pytest.raises(ValueError, match="ghost"):
            load_config("vars: {a: 1}\nname: ${vars.ghost}\n")

    def test_date_placeholder_resolves(self):
        doc = load_config(
            "name: p\npath: /lake/${date:today}/in\n", now=NOW
        )
        assert doc["path"] == "/lake/2024-03-15/in"

    def test_date_with_format(self):
        doc = load_config(
            "name: p\npath: /lake/${date:-1d:%Y%m%d}/in\n", now=NOW
        )
        assert doc["path"] == "/lake/20240314/in"


class TestImportsAndEnvironments:
    def test_imports_merge_imported_wins_and_pipelines_append(self, tmp_path):
        (tmp_path / "shared.yaml").write_text(
            "defaults: {mode: overwrite, fmt: parquet}\n"
            "pipelines: [{name: shared_p, nodes: []}]\n"
        )
        main = tmp_path / "main.yaml"
        main.write_text(
            "imports: [shared.yaml]\n"
            "name: proj\n"
            "defaults: {mode: append, extra: 1}\n"
            "pipelines: [{name: main_p, nodes: []}]\n"
        )
        doc = load_config(str(main))
        # reference semantics: imported values win on conflicts
        assert doc["defaults"] == {"mode": "overwrite", "extra": 1, "fmt": "parquet"}
        assert [p["name"] for p in doc["pipelines"]] == ["main_p", "shared_p"]
        assert "imports" not in doc

    def test_import_vars_resolve_at_top_level(self, tmp_path):
        """An imported file's ${vars.x} may reference vars defined in
        the parent — substitution runs once over the merged doc."""
        (tmp_path / "inc.yaml").write_text("path: /lake/${vars.layer}/t\n")
        main = tmp_path / "main.yaml"
        main.write_text(
            "imports: [inc.yaml]\nvars: {layer: gold}\nname: p\n"
        )
        doc = load_config(str(main))
        assert doc["path"] == "/lake/gold/t"

    def test_missing_import_raises(self, tmp_path):
        main = tmp_path / "main.yaml"
        main.write_text("imports: [nope.yaml]\nname: p\n")
        with pytest.raises(FileNotFoundError, match="nope.yaml"):
            load_config(str(main))

    def test_environments_overlay_applied_and_consumed(self):
        text = """
name: p
target: /lake/dev
environments:
  prod:
    target: /lake/prod
"""
        dev = load_config(text)
        assert dev["target"] == "/lake/dev"
        prod = load_config(text, env="prod")
        assert prod["target"] == "/lake/prod"
        assert "environments" not in prod

    def test_external_env_file_merges_on_top(self, tmp_path):
        (tmp_path / "env.prod.yaml").write_text("workers: 32\n")
        main = tmp_path / "main.yaml"
        main.write_text(
            "name: p\nworkers: 4\n"
            "environments: {prod: {target: /prod}}\n"
        )
        doc = load_config(str(main), env="prod")
        assert doc["workers"] == 32
        assert doc["target"] == "/prod"

    def test_relative_import_from_text_raises(self):
        with pytest.raises(ValueError, match="file path"):
            load_config("imports: [x.yaml]\nname: p\n")


class TestPipelineIntegration:
    def test_load_pipeline_yaml_env_and_vars(self, tmp_path):
        from odibi_spark.plans.config import load_pipeline_yaml

        y = tmp_path / "p.yaml"
        y.write_text(
            """
vars: {table: orders}
name: p
nodes:
  - name: load
    read:
      format: parquet
      path: ${DATA_ROOT}/${vars.table}.parquet
environments:
  prod:
    max_workers: 16
"""
        )
        cfg = load_pipeline_yaml(
            str(y), environment={"DATA_ROOT": "/lake"}
        )
        assert cfg.nodes[0].read.path == "/lake/orders.parquet"
        assert cfg.max_workers == 4
        prod = load_pipeline_yaml(
            str(y), env="prod", environment={"DATA_ROOT": "/lake"}
        )
        assert prod.max_workers == 16

    def test_env_substitution_composes_with_recipes(self, tmp_path):
        from odibi_spark.plans.config import load_pipeline_yaml

        y = tmp_path / "p.yaml"
        y.write_text(
            """
name: p
recipes:
  ingest:
    required_vars: [target]
    template:
      write: {path: "${recipe.target}", mode: overwrite}
nodes:
  - name: n
    read: {path: ${SRC}, format: parquet}
    recipe: ingest
    recipe_vars: {target: /out}
"""
        )
        cfg = load_pipeline_yaml(str(y), environment={"SRC": "/in"})
        assert cfg.nodes[0].read.path == "/in"
        assert cfg.nodes[0].write.path == "/out"


class TestSecretsCli:
    def test_collect_env_vars_follows_imports(self, tmp_path):
        (tmp_path / "inc.yaml").write_text("b: ${B_TOKEN}\n")
        main = tmp_path / "main.yaml"
        main.write_text("imports: [inc.yaml]\na: ${A_TOKEN}\nname: p\n")
        assert collect_env_vars(str(main)) == ["A_TOKEN", "B_TOKEN"]

    def test_secrets_init_writes_template(self, tmp_path, capsys):
        from odibi_spark.cli import main

        y = tmp_path / "p.yaml"
        y.write_text("name: p\nurl: ${HOOK_URL}\nkey: ${API_KEY}\n")
        out = tmp_path / ".env.template"
        assert main(["secrets", "init", str(y), "--out", str(out)]) == 0
        content = out.read_text()
        assert "HOOK_URL=" in content and "API_KEY=" in content

    def test_secrets_validate_exit_codes(self, tmp_path, monkeypatch):
        from odibi_spark.cli import main

        y = tmp_path / "p.yaml"
        y.write_text("name: p\nkey: ${ODIBI_TEST_SECRET_XYZ}\n")
        assert main(["secrets", "validate", str(y)]) == 1
        monkeypatch.setenv("ODIBI_TEST_SECRET_XYZ", "v")
        assert main(["secrets", "validate", str(y)]) == 0
