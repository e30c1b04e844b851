"""Metrics/observability surfaces (SURVEY §2.8, §5.5)."""

from isac_tpu.metrics.persist import load_result, save_result

__all__ = ["save_result", "load_result"]
