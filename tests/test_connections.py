"""Connection layer + plugin registry (reference: odibi/connections/,
odibi/plugins.py). Path/option building is pure logic — offline tests;
cloud execution is environment-gated by design."""

import json

import pytest

from odibi_spark.connections import (
    ADLSConnection,
    AzureSQLConnection,
    HttpConnection,
    LocalConnection,
    PostgresConnection,
    UnityCatalogConnection,
    build_connections,
    create_connection,
    register_connection_factory,
)


class TestLocal:
    def test_joins_relative(self):
        c = LocalConnection("/data/lake")
        assert c.get_path("bronze/orders") == "/data/lake/bronze/orders"

    def test_absolute_passthrough(self):
        c = LocalConnection("/data/lake")
        assert c.get_path("/tmp/x.parquet") == "/tmp/x.parquet"

    def test_uri_base(self):
        c = LocalConnection("dbfs:/mnt/lake/")
        assert c.is_uri
        assert c.get_path("gold/facts") == "dbfs:/mnt/lake/gold/facts"

    def test_windows_drive_is_not_uri(self):
        assert not LocalConnection("C:/data").is_uri


class TestADLS:
    def test_abfss_path(self):
        c = ADLSConnection(
            account="acct", container="lake", path_prefix="bronze",
            auth_mode="direct_key", account_key="k",
        )
        assert (
            c.get_path("orders/2024")
            == "abfss://lake@acct.dfs.core.windows.net/bronze/orders/2024"
        )

    def test_direct_key_conf(self):
        c = ADLSConnection("acct", "lake", auth_mode="direct_key", account_key="sekrit")
        assert c.spark_conf() == {
            "fs.azure.account.key.acct.dfs.core.windows.net": "sekrit"
        }

    def test_service_principal_conf(self):
        c = ADLSConnection(
            "acct", "lake", auth_mode="service_principal",
            tenant_id="t", client_id="c", client_secret="s",
        )
        conf = c.spark_conf()
        assert conf["fs.azure.account.auth.type.acct.dfs.core.windows.net"] == "OAuth"
        assert "login.microsoftonline.com/t" in conf[
            "fs.azure.account.oauth2.client.endpoint.acct.dfs.core.windows.net"
        ]

    def test_missing_auth_fields_rejected(self):
        with pytest.raises(ValueError, match="requires"):
            ADLSConnection("acct", "lake", auth_mode="direct_key")

    def test_key_vault_gated_not_silent(self):
        c = ADLSConnection(
            "acct", "lake", auth_mode="key_vault",
            key_vault_name="kv", secret_name="sec",
        )
        with pytest.raises(NotImplementedError, match="vendor SDKs"):
            c.spark_conf()


class TestJdbc:
    def test_postgres_options(self):
        c = PostgresConnection(host="db.internal", database="wh", user="u", password="p")
        o = c.spark_options()
        assert o["url"] == "jdbc:postgresql://db.internal:5432/wh"
        assert o["driver"] == "org.postgresql.Driver"
        assert c.get_path("orders") == "public.orders"
        assert c.get_path("sales.orders") == "sales.orders"

    def test_azure_sql_url(self):
        c = AzureSQLConnection(server="myserver", database="wh", user="u", password="p")
        assert c.spark_options()["url"].startswith(
            "jdbc:sqlserver://myserver.database.windows.net:1433;database=wh;encrypt=true"
        )
        assert c.get_path("dim_date") == "dbo.dim_date"

    def test_missing_fields(self):
        with pytest.raises(ValueError, match="missing"):
            PostgresConnection(host="h", database="", user="u", password="p")


class TestHttp:
    def test_url_join_and_auth_header(self):
        c = HttpConnection(
            "https://api.example.com/v1/",
            auth={"mode": "api_key", "api_key": "K", "value_template": "Bearer {token}"},
        )
        assert c.get_path("items") == "https://api.example.com/v1/items"
        assert c.request_headers()["Authorization"] == "Bearer K"

    def test_bad_template_rejected(self):
        for tmpl in ("{token}{token}", "no placeholder", "{token} {extra}"):
            with pytest.raises(ValueError, match="value_template"):
                HttpConnection(
                    "https://x", auth={"mode": "api_key", "api_key": "K", "value_template": tmpl}
                )


class TestUnityCatalog:
    def test_qualification(self):
        c = UnityCatalogConnection("prod", "gold")
        assert c.get_path("facts") == "prod.gold.facts"
        assert c.get_path("silver.facts") == "prod.silver.facts"
        assert c.get_path("dev.x.y") == "dev.x.y"


class TestFactory:
    def test_create_builtin_with_alias(self):
        c = create_connection("adls", {
            "account_name": "a", "container": "c",
            "auth_mode": "direct_key", "account_key": "k",
        })
        assert isinstance(c, ADLSConnection)

    def test_unknown_type(self):
        with pytest.raises(ValueError, match="unknown connection type"):
            create_connection("ftp", {})

    def test_bad_kwargs_named(self):
        with pytest.raises(ValueError, match="connection 'lake'"):
            create_connection("local", {"nope": 1}, name="lake")

    def test_plugin_factory_and_build(self):
        class Dummy(LocalConnection):
            pass

        register_connection_factory("dummy", lambda name, cfg: Dummy(**cfg))
        conns = build_connections({
            "a": {"type": "dummy", "base_path": "/x"},
            "b": {"type": "local", "config": {"base_path": "/y"}},
        })
        assert isinstance(conns["a"], Dummy)
        assert conns["b"].get_path("z") == "/y/z"


class TestPipelineIntegration:
    def test_local_connection_resolves_node_paths(self, spark, tmp_path):
        import pandas as pd

        from odibi_spark.plans.pipeline import Pipeline

        src = tmp_path / "in" / "orders.parquet"
        src.parent.mkdir()
        pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}).to_parquet(src)
        yaml_text = f"""
name: conn_e2e
connections:
  lake:
    type: local
    base_path: "{tmp_path}"
nodes:
  - name: out
    read: {{path: in/orders.parquet, connection: lake}}
    transform:
      - function: filter_rows
        params: {{condition: "v > 15"}}
    write: {{path: out/orders, connection: lake}}
"""
        results = Pipeline.from_yaml(yaml_text, spark).run()
        assert results["out"].status == "success", results["out"].error
        got = spark.read.parquet(str(tmp_path / "out" / "orders"))
        assert got.count() == 2

    def test_unknown_connection_fails_clearly(self, spark):
        from odibi_spark.plans.pipeline import Pipeline

        yaml_text = """
name: bad
nodes:
  - name: n
    read: {path: /nope.parquet, connection: missing}
"""
        results = Pipeline.from_yaml(yaml_text, spark).run()
        assert results["n"].status == "failed"
        assert "unknown connection 'missing'" in results["n"].error


class TestPlugins:
    def test_load_plugin_module_registers_transform(self, tmp_path, monkeypatch):
        import sys

        mod = tmp_path / "my_plugin.py"
        mod.write_text(
            "from odibi_spark.registry import transform\n"
            "from odibi_spark.plugins import register_connection_factory\n"
            "from odibi_spark.connections import LocalConnection\n"
            "@transform('plugin_double')\n"
            "def plugin_double(ec):\n"
            "    return ec.sql('SELECT k, v * 2 AS v FROM df')\n"
            "register_connection_factory('pluginfs', lambda n, c: LocalConnection(**c))\n"
        )
        monkeypatch.syspath_prepend(str(tmp_path))
        sys.modules.pop("my_plugin", None)
        from odibi_spark.plugins import load_plugins
        from odibi_spark.registry import get_registry

        load_plugins(["my_plugin"])
        assert get_registry().has("plugin_double")
        assert create_connection("pluginfs", {"base_path": "/p"}).get_path("a") == "/p/a"


class TestDiscovery:
    @pytest.fixture()
    def lake(self, tmp_path):
        import pandas as pd

        (tmp_path / "bronze").mkdir()
        pd.DataFrame({"a": [1, 2, 3], "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"])}).to_parquet(
            tmp_path / "bronze" / "t1.parquet"
        )
        pd.DataFrame({"x": ["u", "v"], "y": [1.5, None]}).to_csv(
            tmp_path / "bronze" / "t2.csv", index=False
        )
        # spark-style output dir
        d = tmp_path / "gold" / "facts"
        d.mkdir(parents=True)
        pd.DataFrame({"k": [1]}).to_parquet(d / "part-00000-abc.snappy.parquet")
        (d / "_SUCCESS").touch()
        return tmp_path

    def test_discover_catalog(self, lake):
        out = LocalConnection(str(lake)).discover_catalog()
        names = {d["name"] for d in out["datasets"]}
        assert "bronze/t1.parquet" in names and "bronze/t2.csv" in names
        assert "gold/facts" in names  # part-file dir is one dataset
        facts = next(d for d in out["datasets"] if d["name"] == "gold/facts")
        assert facts["format"] == "parquet" and facts["size_bytes"] > 0

    def test_discover_pattern_and_schema(self, lake):
        out = LocalConnection(str(lake)).discover_catalog(
            pattern="*.parquet", include_schema=True
        )
        assert {d["name"] for d in out["datasets"]} == {"bronze/t1.parquet"}
        cols = {c["name"] for c in out["datasets"][0]["schema"]}
        assert cols == {"a", "ts"}

    def test_get_schema_parquet_and_dir(self, lake):
        c = LocalConnection(str(lake))
        s = c.get_schema("bronze/t1.parquet")
        assert {x["name"] for x in s["columns"]} == {"a", "ts"}
        s2 = c.get_schema("gold/facts")
        assert [x["name"] for x in s2["columns"]] == ["k"]

    def test_preview_and_profile(self, lake):
        c = LocalConnection(str(lake))
        pv = c.preview("bronze/t2.csv", rows=1)
        assert pv["columns"] == ["x", "y"] and pv["rows"] == [["u", 1.5]]
        pr = c.profile("bronze/t1.parquet")
        assert pr["row_count"] == 3
        assert pr["columns"]["a"]["min"] == "1" and pr["columns"]["a"]["max"] == "3"

    def test_freshness(self, lake):
        c = LocalConnection(str(lake))
        fr = c.get_freshness("bronze/t1.parquet", timestamp_column="ts")
        assert fr["age_hours"] < 1
        assert fr["max_ts"].startswith("2024-01-03")

    def test_gated_on_uri_and_non_local(self):
        with pytest.raises(NotImplementedError):
            LocalConnection("dbfs:/mnt/x").discover_catalog()
        with pytest.raises(NotImplementedError):
            UnityCatalogConnection("c").preview("t")


class TestCli:
    def test_discover_and_schema_cli(self, tmp_path, capsys):
        import pandas as pd

        from odibi_spark.cli import main

        pd.DataFrame({"a": [1]}).to_parquet(tmp_path / "d.parquet")
        assert main(["discover", str(tmp_path)]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["count"] == 1
        assert main(["schema", str(tmp_path / "d.parquet")]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["columns"] == [{"name": "a", "type": "int64"}]

    def test_lineage_cli(self, tmp_path, capsys):
        from odibi_spark.cli import main

        y = tmp_path / "p.yaml"
        y.write_text(
            "name: demo\nnodes:\n"
            "  - name: a\n    read: {path: /x.parquet}\n"
            "  - name: b\n    depends_on: [a]\n"
        )
        assert main(["lineage", str(y)]) == 0
        out = json.loads(capsys.readouterr().out)
        assert [n["name"] for n in out["nodes"]] == ["a", "b"]
        assert out["nodes"][1]["depends_on"] == ["a"]
