"""Structured logging parity (reference logger.go): JSON lines with
level/trace-id, format validation."""

from __future__ import annotations

import json
import logging

import pytest

from k8s_log_etl_spark.logging_setup import setup_logging, with_trace


def test_json_log_lines(capsys):
    logger = setup_logging(level="DEBUG", fmt="json")
    with_trace(logger, "line-42").warning("slow upstream")
    line = capsys.readouterr().err.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["level"] == "WARNING"
    assert rec["msg"] == "slow upstream"
    assert rec["trace_id"] == "line-42"
    assert "ts" in rec


def test_level_filtering(capsys):
    logger = setup_logging(level="ERROR", fmt="json")
    logger.info("hidden")
    logger.error("shown")
    lines = [l for l in capsys.readouterr().err.splitlines() if l.strip()]
    assert len(lines) == 1 and json.loads(lines[0])["msg"] == "shown"


def test_invalid_format_rejected():
    with pytest.raises(ValueError, match="invalid log format"):
        setup_logging(fmt="yaml")


def test_text_format(capsys):
    logger = setup_logging(level="INFO", fmt="text")
    logger.info("plain line")
    assert "plain line" in capsys.readouterr().err
