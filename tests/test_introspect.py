"""Config-manual generator (r15; reference introspect.py parity)."""

import subprocess
import sys

from odibi_spark.introspect import (
    discover_models,
    generate_config_manual,
    transformer_rows,
)


class TestConfigManual:
    def test_deterministic(self):
        assert generate_config_manual() == generate_config_manual()

    def test_covers_every_config_model(self):
        md = generate_config_manual()
        for _mod, cls in discover_models():
            assert f"### `{cls.__name__}`" in md, cls.__name__

    def test_covers_every_registered_transformer(self):
        md = generate_config_manual()
        rows = transformer_rows()
        assert len(rows) > 50  # the registry is the full operator surface
        for name, _sig, _summary in rows:
            assert f"| `{name}` |" in md, name

    def test_required_vs_default_marking(self):
        md = generate_config_manual()
        # ReadConfig.format has a default; NodeConfig.name is required
        assert "default: `'parquet'`" in md
        assert "**required**" in md

    def test_committed_manual_has_no_drift(self, tmp_path):
        """The committed examples/config_manual.md must regenerate
        identically from the models — a field or transformer change
        without the manual fails here (the reference's generated
        yaml_schema.md discipline). Regenerated in a SUBPROCESS: the
        committed manual documents the library's own registry, and an
        earlier test in the session may have registered extra
        @transform operators into this process's global registry."""
        out = tmp_path / "manual.md"
        proc = subprocess.run(
            [sys.executable, "-m", "odibi_spark.cli", "docs",
             "config-manual", "--out", str(out)],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        with open("examples/config_manual.md", encoding="utf-8") as fh:
            committed = fh.read()
        assert committed == out.read_text(), (
            "examples/config_manual.md is stale — regenerate with "
            "`python -m odibi_spark.cli docs config-manual --out "
            "examples/config_manual.md`"
        )

    def test_cli_manual_structure(self, tmp_path):
        # structural checks on the clean-process CLI output (full
        # equality with the committed file is the drift test above)
        out = tmp_path / "manual.md"
        proc = subprocess.run(
            [sys.executable, "-m", "odibi_spark.cli", "docs",
             "config-manual", "--out", str(out)],
            capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        md = out.read_text()
        assert md.startswith("# odibi_spark Configuration Reference")
        assert "## Transformation Reference" in md
