"""Registration core: the QUERIES/ORACLES dicts and the @register decorator.

Kept import-free of the domain modules so every domain module can import it
without cycles; ``queries/__init__`` imports the domain modules for their
registration side effects and then applies the driver-priority ordering.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
