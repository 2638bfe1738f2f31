"""Report-grade composite queries (reference Q10/Q12/Q13 analogs) —
multi-CTE KPI reports with segmentation CASE ladders, boundary-count
datediffs and guarded division. Populated incrementally."""

from __future__ import annotations
