"""Session-compat helpers.

``CONNECT_ERRS``: exactly the exception types a Spark Connect session
raises when code probes classic-only surfaces (``localCheckpoint``,
``sparkSession.sparkContext``, ``.rdd``).  Compat fallbacks catch THESE,
not bare ``Exception``, so a genuine failure (disk full, dead executors,
analysis error) surfaces instead of being silently downgraded to a
recompute-per-side path.
"""

from __future__ import annotations

from pyspark.errors import PySparkAttributeError, PySparkNotImplementedError

CONNECT_ERRS = (
    AttributeError,
    NotImplementedError,
    PySparkAttributeError,
    PySparkNotImplementedError,
)
