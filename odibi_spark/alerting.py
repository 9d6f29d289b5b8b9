"""Pipeline alerting: webhook/Slack/Teams notifications with throttling.

Parity target (reference: odibi/utils/alerting.py — AlertThrottler :14,
send_alert :84, payload builders :230-420; pipeline wiring
odibi/pipeline.py:480,1356-1358,1443-1515). Spark-free module: alerts
fire from the driver on pipeline lifecycle events; delivery goes
through an injectable ``transport`` callable so tests (and air-gapped
clusters) never open sockets.

Events: on_start, on_success, on_failure, on_quarantine,
on_gate_block, on_threshold_breach.
"""

from __future__ import annotations

import datetime as _dt
import json
import logging
import time as _time
from typing import Any, Callable

logger = logging.getLogger(__name__)

ALERT_EVENTS = (
    "on_start",
    "on_success",
    "on_failure",
    "on_quarantine",
    "on_gate_block",
    "on_threshold_breach",
)

# transport(url, payload_bytes, headers) -> int http status
Transport = Callable[[str, bytes, dict[str, str]], int]


class AlertThrottler:
    """Prevent alert spam (reference alerting.py:14-73): at most one
    alert per key per ``throttle_minutes``, at most ``max_per_hour``
    per key per clock hour. ``should_send`` commits the budget up
    front; ``rollback`` frees it when delivery fails so a retry within
    the window still goes out. ``clock`` is injectable for tests."""

    def __init__(self, clock: Callable[[], float] = _time.time):
        self._clock = clock
        self._last: dict[str, float] = {}
        self._hour_counts: dict[str, int] = {}

    def should_send(
        self, key: str, throttle_minutes: int = 15, max_per_hour: int = 10
    ) -> bool:
        now = self._clock()
        last = self._last.get(key)
        if last is not None and now - last < throttle_minutes * 60:
            return False
        hour_key = f"{key}:{int(now // 3600)}"
        if self._hour_counts.get(hour_key, 0) >= max_per_hour:
            return False
        self._last[key] = now
        self._hour_counts[hour_key] = self._hour_counts.get(hour_key, 0) + 1
        return True

    def rollback(self, key: str) -> None:
        self._last.pop(key, None)
        hour_key = f"{key}:{int(self._clock() // 3600)}"
        if hour_key in self._hour_counts:
            self._hour_counts[hour_key] = max(0, self._hour_counts[hour_key] - 1)

    def reset(self) -> None:
        self._last.clear()
        self._hour_counts.clear()


_throttler = AlertThrottler()


def get_throttler() -> AlertThrottler:
    return _throttler


def _default_transport(url: str, data: bytes, headers: dict[str, str]) -> int:
    import urllib.request

    req = urllib.request.Request(url, data=data, headers=headers)
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status


def _event_color(event_type: str, status: str) -> str:
    if event_type == "on_quarantine":
        return "#FFA500"
    if event_type == "on_gate_block":
        return "#FF0000"
    if event_type == "on_threshold_breach":
        return "#FF6600"
    if status == "SUCCESS":
        return "#36a64f"
    if status == "STARTED":
        return "#0078D4"
    return "#FF0000"


def build_payload(
    alert_type: str, message: str, context: dict[str, Any]
) -> dict[str, Any]:
    """Channel-specific payload (reference alerting.py:230-420):
    Slack attachment, Teams Adaptive Card, or plain JSON webhook."""
    pipeline = context.get("pipeline", "unknown")
    status = context.get("status", "UNKNOWN")
    event_type = context.get("event_type", "")
    color = _event_color(event_type, status)
    fields = {
        "pipeline": pipeline,
        "status": status,
        "event": event_type,
        "duration_s": context.get("duration_s"),
        "nodes_passed": context.get("nodes_passed"),
        "nodes_failed": context.get("nodes_failed"),
        "nodes_skipped": context.get("nodes_skipped"),
        "timestamp": context.get("timestamp"),
    }
    if alert_type == "slack":
        return {
            "attachments": [
                {
                    "color": color,
                    "title": f"Pipeline {pipeline}: {status}",
                    "text": message,
                    "fields": [
                        {"title": k, "value": str(v), "short": True}
                        for k, v in fields.items()
                        if v is not None
                    ],
                }
            ]
        }
    if alert_type in ("teams", "teams_workflow"):
        facts = [
            {"title": k, "value": str(v)} for k, v in fields.items() if v is not None
        ]
        return {
            "type": "message",
            "attachments": [
                {
                    "contentType": "application/vnd.microsoft.card.adaptive",
                    "content": {
                        "type": "AdaptiveCard",
                        "version": "1.4",
                        "body": [
                            {
                                "type": "TextBlock",
                                "weight": "Bolder",
                                "text": f"Pipeline {pipeline}: {status}",
                            },
                            {"type": "TextBlock", "wrap": True, "text": message},
                            {"type": "FactSet", "facts": facts},
                        ],
                    },
                }
            ],
        }
    # generic webhook: message + full context (minus non-serializable)
    payload = {"message": message}
    payload.update(
        {k: v for k, v in context.items() if _json_safe(v)}
    )
    return payload


def _json_safe(v: Any) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False


def send_alert(
    config,
    message: str,
    context: dict[str, Any],
    throttle: bool = True,
    transport: Transport | None = None,
    throttler: AlertThrottler | None = None,
) -> bool:
    """Deliver one alert. Returns True if sent, False if throttled or
    delivery failed (failures roll back the throttle budget —
    reference alerting.py:120-132). Never raises: an alerting outage
    must not fail the pipeline."""
    th = throttler or _throttler
    key = None
    if throttle:
        key = f"{context.get('pipeline', 'unknown')}:{context.get('event_type', '')}"
        meta = getattr(config, "metadata", {}) or {}
        if not th.should_send(
            key,
            int(meta.get("throttle_minutes", 15)),
            int(meta.get("max_per_hour", 10)),
        ):
            return False
    payload = build_payload(getattr(config, "type", "webhook"), message, context)
    data = json.dumps(payload).encode("utf-8")
    send = transport or _default_transport
    try:
        status = send(config.url, data, {"Content-Type": "application/json"})
        if status >= 400:
            logger.error("alert delivery failed: HTTP %s", status)
            if key:
                th.rollback(key)
            return False
        return True
    except Exception as ex:  # delivery outage: never fail the pipeline
        logger.error("alert delivery failed: %s", ex)
        if key:
            th.rollback(key)
        return False


def send_pipeline_alerts(
    alerts,
    event: str,
    pipeline_name: str,
    results: dict[str, Any],
    duration_s: float | None = None,
    transport: Transport | None = None,
    throttler: AlertThrottler | None = None,
) -> list[bool]:
    """Fire every configured alert subscribed to ``event`` (reference
    pipeline.py:1443-1515): builds the node scoreboard + per-node
    detail context and a human summary message."""
    sent = []
    statuses = {n: r.status for n, r in results.items()}
    failed = sorted(n for n, s in statuses.items() if s == "failed")
    skipped = sorted(n for n, s in statuses.items() if s == "skipped")
    passed = sorted(n for n, s in statuses.items() if s == "success")
    status = "STARTED" if event == "on_start" else ("FAILED" if failed else "SUCCESS")
    msg = f"Pipeline '{pipeline_name}' {status}"
    total = len(statuses)
    if failed:
        msg += f" ({len(passed)}/{total} nodes passed). Failed: {', '.join(failed)}"
    elif total:
        msg += f" ({len(passed)}/{total} nodes passed)"
    context = {
        "pipeline": pipeline_name,
        "status": status,
        "event_type": event,
        "duration_s": round(duration_s, 3) if duration_s is not None else None,
        "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        "nodes_passed": len(passed),
        "nodes_failed": len(failed),
        "nodes_skipped": len(skipped),
        "nodes_total": total,
        "node_details": [
            {
                "node": n,
                "status": r.status,
                "duration_s": getattr(r, "duration_s", None),
                "rows_written": getattr(r, "rows_written", None),
                "error": getattr(r, "error", None),
            }
            for n, r in results.items()
        ],
    }
    for cfg in alerts:
        if event in (cfg.on_events or []):
            sent.append(
                send_alert(
                    cfg, msg, context, transport=transport, throttler=throttler
                )
            )
    return sent
