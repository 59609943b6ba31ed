"""S9: pluggable run-summary / failure notifier.

Reference: Slack webhook POSTs for per-task failures and an end-of-run
summary with 6 metrics (``dags/lib/slack_utils.py:23-68``,
``dags/get_securities_data.py:177-213``). Two reference bugs are fixed
rather than replicated (SURVEY §2.1 S9, §3.3):
  * the failure callback referenced an undefined variable in its except
    path (slack_utils.py:48) → we format from the caught exception;
  * the summary raised NameError when the pre-merge task never ran
    (get_securities_data.py:186) → RunMetrics defaults cover every field.
"""

from __future__ import annotations

import json
import logging
from collections.abc import Callable

from securities_pricing_data_pipeline_spark.plans.metrics import RunMetrics

log = logging.getLogger("securities_pipeline.notify")

Notifier = Callable[[str], None]


def format_summary(m: RunMetrics, status: str = "SUCCESS") -> str:
    """Reference summary shape (get_securities_data.py:196-205), thousands
    separators included."""
    d = m.trading_date.isoformat() if m.trading_date else "n/a"
    lines = [
        f"EOD pipeline {status} for trading date {d}",
        f"• raw rows: {m.raw_cnt:,}",
        f"• rejected rows: {m.reject_cnt:,}",
        f"• est. inserts: {m.est_inserts:,}",
        f"• est. updates: {m.est_updates:,}",
        f"• core rows (date): {m.core_cnt:,}",
        f"• fact rows (date): {m.fact_cnt:,}",
    ]
    lines.extend(f"• note: {n}" for n in m.notes)
    return "\n".join(lines)


def logging_notifier(text: str) -> None:
    """Default sink for tests/local runs."""
    log.info("%s", text)


def webhook_notifier(url: str, timeout_s: int = 10) -> Notifier:
    """Slack-compatible webhook sink: POST {"text": ...}. Import-gated."""

    def send(text: str) -> None:
        try:
            import requests

            requests.post(url, data=json.dumps({"text": text}), timeout=timeout_s)
        except Exception as exc:  # alerting must never fail the run
            log.warning("notifier failed: %s", exc)

    return send
