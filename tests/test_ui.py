"""Observability UI: stdlib HTTP dashboard over the catalog
(reference: odibi/cli/ui.py + odibi/ui/app.py)."""

import json
import threading
import time
import urllib.request

import pytest

from odibi_spark.catalog import Catalog
from odibi_spark.ui import make_server, render_dashboard


class R:
    def __init__(self, status="success", rows=10):
        self.status = status
        self.rows_written = rows
        self.error = None
        self.duration_s = 1.0


@pytest.fixture()
def seeded_catalog(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "_sys"))
    now = time.time()
    cat.record_run(
        run_id="r1", pipeline="orders_daily",
        results={"load": R(), "agg": R("failed", 0)},
        started_at=now - 60, finished_at=now - 30,
    )
    cat.update_daily_stats(
        pipeline="orders_daily", results={"load": R()},
        started_at=now - 60, finished_at=now - 30,
    )
    return cat


@pytest.fixture()
def server(seeded_catalog):
    srv = make_server(seeded_catalog, port=0)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()
    srv.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as resp:
        return resp.status, resp.read().decode()


class TestDashboard:
    def test_html_renders_catalog_content(self, seeded_catalog):
        page = render_dashboard(seeded_catalog)
        assert "orders_daily" in page
        assert "Pipeline health" in page
        assert "Daily stats" in page

    def test_index_serves_html(self, server):
        status, body = _get(server + "/")
        assert status == 200
        assert "<title>odibi_spark" in body
        assert "orders_daily" in body

    def test_api_health(self, server):
        status, body = _get(server + "/api/health")
        rows = json.loads(body)
        assert status == 200
        assert rows[0]["pipeline"] == "orders_daily"
        assert rows[0]["total_failures"] == 1  # one node failed => run failed

    def test_api_runs_with_limit(self, server):
        _, body = _get(server + "/api/runs?limit=1")
        rows = json.loads(body)
        assert len(rows) == 1
        assert rows[0]["run_id"] == "r1"

    def test_api_daily_stats(self, server):
        _, body = _get(server + "/api/daily-stats")
        assert json.loads(body)[0]["pipeline"] == "orders_daily"

    def test_unknown_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server + "/nope")
        assert e.value.code == 404

    def test_empty_catalog_api_degrades_gracefully(self, spark, tmp_path):
        srv = make_server(Catalog(spark, str(tmp_path / "_empty")), port=0)
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            status, body = _get(f"http://127.0.0.1:{port}/api/pipelines")
            assert status == 200
            assert json.loads(body)["rows"] == []
        finally:
            srv.shutdown()
            srv.server_close()
