"""The single shared query/oracle registries every family module
registers into; the import order in ``__init__`` fixes registration order."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

EXTENSION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTENSION_ORACLES: dict[str, str] = {}
