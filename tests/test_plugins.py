"""Transform registry parity (reference registry.go semantics):
default chain fallback, unknown-name hard error, custom registration,
composition order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from k8s_log_etl_spark import plugins
from k8s_log_etl_spark.config import PipelineConfig
from k8s_log_etl_spark.fixtures import fixture_df
from k8s_log_etl_spark.operators import lognorm


def _normalized(spark):
    return lognorm.normalize(lognorm.parse_json(lognorm.scan_lines(fixture_df(spark))))


def test_default_chain_is_filter_redact(spark):
    df = plugins.apply_chain(_normalized(spark), PipelineConfig())
    assert "drop_reason" in df.columns
    written = df.filter(
        F.col("json_ok") & F.col("norm_error").isNull() & F.col("drop_reason").isNull()
    )
    assert written.count() == 6  # fixture golden


def test_unknown_transform_is_hard_error():
    with pytest.raises(ValueError, match="unknown transform"):
        plugins.build_transforms(("no_such_transform",))


def test_custom_transform_composes(spark):
    name = "drop_payments_test"
    if name not in plugins._REGISTRY:
        plugins.register_transform(
            name,
            lambda df, cfg: df.withColumn(
                "drop_reason",
                F.when(F.col("service") == "payments", "other").otherwise(F.col("drop_reason")),
            ),
        )
    df = plugins.apply_chain(_normalized(spark), PipelineConfig(), ("filter_redact", name))
    reasons = {
        r["drop_reason"]
        for r in df.filter(F.col("json_ok") & F.col("norm_error").isNull()).collect()
    }
    assert "other" in reasons


def test_duplicate_registration_rejected():
    with pytest.raises(ValueError, match="already registered"):
        plugins.register_transform("filter_redact", lambda df, cfg: df)
