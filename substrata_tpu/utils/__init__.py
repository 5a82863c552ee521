"""Utilities: diagnostics aggregation + profiling helpers."""

from substrata_tpu.utils.diagnostics import DiagnosticsRegistry  # noqa: F401
