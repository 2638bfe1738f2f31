"""Star-schema assembly over testdata (reference gold views V1–V3
analog): surrogate-key dimensions + fact with key lookups. Populated
incrementally."""

from __future__ import annotations
