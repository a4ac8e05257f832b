"""Cloudpickle by-value registration, shared by every Arrow-UDF module.

Executors are plain Python workers that may not have the repo on
sys.path (the driver harness imports the package by file path), so any
module whose functions ride inside mapInPandas/applyInPandas closures
registers itself here and cloudpickle embeds the code in the task
instead of emitting a worker-side import.
"""

from __future__ import annotations

import sys


def ship_by_value(module_name: str) -> None:
    """Register `module_name` for pickle-by-value; silently a no-op on
    cloudpickle versions without the API (workers then need sys.path)."""
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:  # pragma: no cover - older cloudpickle
        pass
