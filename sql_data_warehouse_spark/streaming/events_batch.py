"""Batch-equivalent event analytics (tumbling windows, sessionization)
— the SQL-checkable twins of the Structured Streaming jobs in
``streaming/jobs.py``. Populated incrementally."""

from __future__ import annotations
