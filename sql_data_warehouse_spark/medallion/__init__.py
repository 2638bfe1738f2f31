"""Medallion warehouse over the reference's own six CSV sources:
bronze (typed raw) → silver (cleansed) → gold (star schema + reports)
→ analysis queries Q02-Q13.

This is the direct-parity surface: the same data, the same
transformations, the same query results as the reference T-SQL
warehouse (scripts/bronze, scripts/silver, scripts/gold,
scripts/analysis under /root/reference) — re-expressed as pure
DataFrame transforms, with every stage hash-verified against a DuckDB
oracle that replays the identical pipeline in SQL.

Canonicalization decisions (SURVEY §1.5 — the reference's internal
naming mismatches resolved in favor of doc/data_catalog.md):
``sales_amount``, ``birthdate``, ``category``/``subcategory``,
``cst_marital_status``, fixed Q12 missing-comma bug (emit both
``total_products`` and ``lifespan``).

Determinism decisions (SURVEY §4.4):

- ``AS_OF = DATE'2026-01-01'`` replaces every ``GETDATE()`` call so
  results are reproducible; the future-birthdate cutoff set is
  identical for any as-of date through 2038 (verified: next future
  bdate after the valid range is 2038-10-17).
- T-SQL ANSI-PAD trailing-space equality is emulated by TRIM before
  every domain compare (values like ``'M '``, ``'R '``, ``'F '``).
- T-SQL ``INT/INT`` truncating division and ``AVG(INT)→INT`` are kept
  (integer-exact ⇒ no cross-engine float drift).
- ``ROUND(x, n)`` is implemented as ``floor(x*10^n + 0.5)/10^n`` —
  pure IEEE ops, bit-identical in Spark and DuckDB, T-SQL HALF-UP
  semantics (engine-native round() differs between the two engines on
  binary-boundary values).
"""
