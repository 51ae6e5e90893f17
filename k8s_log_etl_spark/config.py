"""Pipeline configuration.

Mirrors the reference's config surface (k8s-log-etl
``internal/config/config.go:16-42``: filter levels/services, redact keys)
as a frozen dataclass. The full precedence chain (defaults < file < env <
flags, ``config.go:45-141``) is implemented in :func:`load_config`.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field, replace
from typing import Any


@dataclass(frozen=True)
class PipelineConfig:
    # Allowlists: empty tuple = allow everything (reference filter.go:30-35).
    filter_levels: tuple[str, ...] = ("WARN", "ERROR")
    filter_services: tuple[str, ...] = ()
    # Exact-case keys deleted from the residual fields map (filter.go:37-41).
    redact_keys: tuple[str, ...] = ("user_email", "token")
    # Sink behavior (reference main.go:480-537, sink/batched.go).
    output_type: str = "stdout"
    output_path: str = ""
    dlq_path: str = ""
    max_retries: int = 3
    backoff_base_ms: int = 50
    backoff_max_ms: int = 2000
    jitter_pct: float = 0.2
    batch_size: int = 1
    flush_interval_ms: int = 1000
    max_workers: int = 4

    @property
    def levels_upper(self) -> tuple[str, ...]:
        return tuple(v.upper() for v in self.filter_levels if v)

    @property
    def services_lower(self) -> tuple[str, ...]:
        return tuple(v.lower() for v in self.filter_services if v)

    def validate(self) -> None:
        """Cross-field validation mirroring reference config.go:362-451."""
        if self.output_type not in {"stdout", "file", "rotate", "rotating", "http", "webhook", "parquet"}:
            raise ValueError(f"invalid output_type {self.output_type!r}")
        if self.output_type in {"file", "rotate", "rotating", "parquet"} and not self.output_path:
            raise ValueError(f"output_type {self.output_type!r} requires output_path")
        for name in ("max_retries", "backoff_base_ms", "backoff_max_ms", "batch_size", "flush_interval_ms", "max_workers"):
            if getattr(self, name) < 0:
                raise ValueError(f"{name} must be non-negative")
        if self.backoff_max_ms < self.backoff_base_ms:
            raise ValueError("backoff_max_ms must be >= backoff_base_ms")
        if not (0.0 <= self.jitter_pct <= 1.0):
            raise ValueError("jitter_pct must be within [0, 1]")
        if self.dlq_path.startswith("s3://"):
            raise ValueError("s3:// DLQ paths are not supported")


_LIST_KEYS = {"filter_levels", "filter_services", "redact_keys"}


def _split_list(raw: str) -> tuple[str, ...]:
    # Reference splits on ',' and ';' and trims items (main.go:458-469).
    items: list[str] = []
    for part in raw.replace(";", ",").split(","):
        part = part.strip()
        if part:
            items.append(part)
    return tuple(items)


def _coerce(key: str, value: Any) -> Any:
    if key in _LIST_KEYS:
        if isinstance(value, str):
            return _split_list(value)
        return tuple(value)
    return value


def load_config(
    path: str | None = None,
    env: dict[str, str] | None = None,
    overrides: dict[str, Any] | None = None,
) -> PipelineConfig:
    """Build config with reference precedence: defaults < file < env < overrides."""
    cfg = PipelineConfig()
    if path:
        with open(path) as fh:
            data = json.load(fh)
        cfg = replace(cfg, **{k: _coerce(k, v) for k, v in data.items()})
    env = dict(os.environ if env is None else env)
    env_map = {
        "ETL_FILTER_LEVELS": "filter_levels",
        "ETL_FILTER_SERVICES": "filter_services",
        "ETL_REDACT_KEYS": "redact_keys",
        "ETL_OUTPUT_TYPE": "output_type",
        "ETL_OUTPUT_PATH": "output_path",
        "ETL_DLQ_PATH": "dlq_path",
    }
    env_updates = {
        field_name: _coerce(field_name, env[env_key])
        for env_key, field_name in env_map.items()
        if env_key in env
    }
    if env_updates:
        cfg = replace(cfg, **env_updates)
    if overrides:
        cfg = replace(cfg, **{k: _coerce(k, v) for k, v in overrides.items()})
    cfg.validate()
    return cfg
