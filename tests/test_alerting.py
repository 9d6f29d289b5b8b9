"""Alerting: throttling, payload shapes, pipeline lifecycle wiring
(reference odibi/utils/alerting.py + pipeline.py:1443-1515). Fully
offline — transport is an injected recorder, no sockets."""

import pytest
from pyspark.sql import Row

from odibi_spark.alerting import (
    AlertThrottler,
    build_payload,
    send_alert,
    send_pipeline_alerts,
)
from odibi_spark.plans.config import AlertConfig


class Recorder:
    def __init__(self, status=200, raise_exc=None):
        self.calls = []
        self.status = status
        self.raise_exc = raise_exc

    def __call__(self, url, data, headers):
        self.calls.append((url, data, headers))
        if self.raise_exc:
            raise self.raise_exc
        return self.status


class FakeResult:
    def __init__(self, status, duration_s=1.0, error=None, rows_written=None):
        self.status = status
        self.duration_s = duration_s
        self.error = error
        self.rows_written = rows_written


def cfg(**kw):
    base = dict(type="webhook", url="http://alerts.local/hook", on_events=["on_failure"])
    base.update(kw)
    return AlertConfig(**base)


class TestThrottler:
    def test_throttles_within_window(self):
        t = [0.0]
        th = AlertThrottler(clock=lambda: t[0])
        assert th.should_send("k", throttle_minutes=15)
        assert not th.should_send("k", throttle_minutes=15)
        t[0] = 16 * 60
        assert th.should_send("k", throttle_minutes=15)

    def test_hourly_rate_limit(self):
        t = [0.0]
        th = AlertThrottler(clock=lambda: t[0])
        for i in range(3):
            t[0] = i * 60.0  # past the 0-minute throttle each time
            assert th.should_send("k", throttle_minutes=0, max_per_hour=3)
        t[0] = 4 * 60.0
        assert not th.should_send("k", throttle_minutes=0, max_per_hour=3)
        t[0] = 3601.0  # next hour bucket
        assert th.should_send("k", throttle_minutes=0, max_per_hour=3)

    def test_rollback_frees_budget(self):
        th = AlertThrottler(clock=lambda: 100.0)
        assert th.should_send("k")
        th.rollback("k")
        assert th.should_send("k")


class TestSendAlert:
    def test_delivers_and_throttles_repeat(self):
        rec = Recorder()
        th = AlertThrottler(clock=lambda: 0.0)
        ctx = {"pipeline": "p", "event_type": "on_failure", "status": "FAILED"}
        assert send_alert(cfg(), "boom", ctx, transport=rec, throttler=th)
        assert not send_alert(cfg(), "boom", ctx, transport=rec, throttler=th)
        assert len(rec.calls) == 1

    def test_failed_delivery_rolls_back_throttle(self):
        th = AlertThrottler(clock=lambda: 0.0)
        ctx = {"pipeline": "p", "event_type": "on_failure"}
        bad = Recorder(raise_exc=OSError("no route"))
        assert not send_alert(cfg(), "m", ctx, transport=bad, throttler=th)
        good = Recorder()
        assert send_alert(cfg(), "m", ctx, transport=good, throttler=th)

    def test_http_error_status_is_failure(self):
        th = AlertThrottler(clock=lambda: 0.0)
        rec = Recorder(status=500)
        assert not send_alert(
            cfg(), "m", {"pipeline": "p", "event_type": "on_failure"},
            transport=rec, throttler=th,
        )


class TestPayloads:
    def test_slack_payload_shape(self):
        p = build_payload(
            "slack", "msg",
            {"pipeline": "p", "status": "FAILED", "event_type": "on_failure"},
        )
        att = p["attachments"][0]
        assert att["color"] == "#FF0000" and "p" in att["title"]

    def test_teams_adaptive_card(self):
        p = build_payload(
            "teams", "msg",
            {"pipeline": "p", "status": "SUCCESS", "event_type": "on_success"},
        )
        card = p["attachments"][0]["content"]
        assert card["type"] == "AdaptiveCard"

    def test_webhook_payload_carries_context(self):
        p = build_payload(
            "webhook", "msg",
            {"pipeline": "p", "status": "SUCCESS", "nodes_passed": 3},
        )
        assert p["message"] == "msg" and p["nodes_passed"] == 3

    def test_quarantine_event_color(self):
        p = build_payload(
            "slack", "m",
            {"pipeline": "p", "status": "SUCCESS", "event_type": "on_quarantine"},
        )
        assert p["attachments"][0]["color"] == "#FFA500"


class TestPipelineAlerts:
    def test_fires_only_subscribed_events(self):
        rec = Recorder()
        th = AlertThrottler(clock=lambda: 0.0)
        alerts = [cfg(on_events=["on_failure"])]
        results = {"a": FakeResult("success")}
        out = send_pipeline_alerts(
            alerts, "on_success", "p", results, transport=rec, throttler=th
        )
        assert out == [] and rec.calls == []

    def test_failure_message_lists_failed_nodes(self):
        import json

        rec = Recorder()
        th = AlertThrottler(clock=lambda: 0.0)
        alerts = [cfg(on_events=["on_failure", "on_success"])]
        results = {
            "good": FakeResult("success"),
            "bad": FakeResult("failed", error="ValueError: x"),
            "down": FakeResult("skipped"),
        }
        sent = send_pipeline_alerts(
            alerts, "on_failure", "p", results, duration_s=2.5,
            transport=rec, throttler=th,
        )
        assert sent == [True]
        payload = json.loads(rec.calls[0][1])
        assert "Failed: bad" in payload["message"]
        assert payload["nodes_failed"] == 1 and payload["nodes_skipped"] == 1
        detail = {d["node"]: d for d in payload["node_details"]}
        assert detail["bad"]["error"] == "ValueError: x"

    def test_yaml_pipeline_run_fires_alerts(self, spark, tmp_path, monkeypatch):
        """End-to-end: alerts block in pipeline YAML; on_start fires at
        kickoff, on_failure at the end of a failing run."""
        import json

        import odibi_spark.plans.pipeline as pl_mod
        from odibi_spark.plans.pipeline import Pipeline

        rec = Recorder()
        monkeypatch.setattr(pl_mod, "_alert_transport", rec)
        pl_mod.get_throttler().reset()
        y = f"""
name: alerted
alerts:
  - type: webhook
    url: "http://alerts.local/hook"
    on_events: [on_start, on_success, on_failure]
nodes:
  - name: ok
    read: {{format: parquet, path: "{tmp_path}/missing.parquet"}}
"""
        r = Pipeline.from_yaml(y, spark).run()
        assert r["ok"].status == "failed"
        events = [json.loads(c[1])["event_type"] for c in rec.calls]
        assert events == ["on_start", "on_failure"]

    def test_yaml_pipeline_success_alert(self, spark, tmp_path, monkeypatch):
        import json

        import odibi_spark.plans.pipeline as pl_mod
        from odibi_spark.plans.pipeline import Pipeline

        spark.range(3).write.mode("overwrite").parquet(str(tmp_path / "src"))
        rec = Recorder()
        monkeypatch.setattr(pl_mod, "_alert_transport", rec)
        pl_mod.get_throttler().reset()
        y = f"""
name: alerted_ok
alerts:
  - type: slack
    url: "http://alerts.local/slack"
    on_events: [on_success]
nodes:
  - name: ok
    read: {{format: parquet, path: "{tmp_path}/src"}}
"""
        r = Pipeline.from_yaml(y, spark).run()
        assert r["ok"].status == "success"
        assert len(rec.calls) == 1
        payload = json.loads(rec.calls[0][1])
        assert payload["attachments"][0]["color"] == "#36a64f"

    def test_quarantine_and_gate_events_fire(self, spark, tmp_path, monkeypatch):
        """on_quarantine fires when validation quarantines rows;
        on_gate_block when a gate raises (reference AlertEvent enum)."""
        import json

        import odibi_spark.plans.pipeline as pl_mod
        from odibi_spark.plans.pipeline import Pipeline

        src = str(tmp_path / "qsrc")
        spark.createDataFrame(
            [Row(a=1), Row(a=None), Row(a=3)]
        ).write.mode("overwrite").parquet(src)
        rec = Recorder()
        monkeypatch.setattr(pl_mod, "_alert_transport", rec)
        pl_mod.get_throttler().reset()
        y = f"""
name: qalerts
alerts:
  - type: webhook
    url: "http://alerts.local/hook"
    on_events: [on_quarantine, on_gate_block, on_failure]
    metadata: {{throttle_minutes: 0, max_per_hour: 100}}
nodes:
  - name: n
    read: {{format: parquet, path: "{src}"}}
    validation:
      quarantine_path: "{tmp_path}/quarantined"
      tests:
        - {{name: a_set, type: not_null, column: a, quarantine: true}}
      gate:
        require_pass_rate: 0.99
        mode: fail
"""
        r = Pipeline.from_yaml(y, spark).run()
        assert r["n"].status == "failed"  # gate fails at 2/3 pass rate
        events = [json.loads(c[1])["event_type"] for c in rec.calls]
        assert events == ["on_quarantine", "on_gate_block", "on_failure"]
