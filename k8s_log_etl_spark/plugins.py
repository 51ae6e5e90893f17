"""Named transform registry (reference O8,
internal/plugins/registry.go:14-51): pipeline steps are
DataFrame→DataFrame functions registered by name and composed in
configured order. The built-in `filter_redact` wraps the level/service
filter + redaction stage exactly as the reference's only built-in does;
unknown names are a hard error (registry.go:32-34); an empty selection
falls back to the default chain (registry.go:26-28).

A transform takes (df, cfg) and returns the annotated df — it may add
drop reasons, rewrite columns, or tag errors, mirroring the
mutate/drop/error contract of the Go Transform type.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame

from k8s_log_etl_spark.config import PipelineConfig
from k8s_log_etl_spark.operators import lognorm

Transform = Callable[[DataFrame, PipelineConfig], DataFrame]

_REGISTRY: dict[str, Transform] = {}

DEFAULT_CHAIN = ("filter_redact",)


def register_transform(name: str, fn: Transform) -> None:
    if name in _REGISTRY:
        raise ValueError(f"transform {name!r} already registered")
    _REGISTRY[name] = fn


def build_transforms(names: tuple[str, ...] = ()) -> list[Transform]:
    selected = names or DEFAULT_CHAIN
    missing = [n for n in selected if n not in _REGISTRY]
    if missing:
        raise ValueError(f"unknown transform(s): {missing}; known: {sorted(_REGISTRY)}")
    return [_REGISTRY[n] for n in selected]


def apply_chain(df: DataFrame, cfg: PipelineConfig, names: tuple[str, ...] = ()) -> DataFrame:
    return reduce(lambda acc, fn: fn(acc, cfg), build_transforms(names), df)


# ---- built-ins -------------------------------------------------------------

register_transform("filter_redact", lambda df, cfg: lognorm.apply_filters(df, cfg))
