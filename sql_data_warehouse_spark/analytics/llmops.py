"""Training-data-pipeline operators registered as gated queries:
dedup (exact / minhash-LSH / n-gram Jaccard / simhash), text analysis
(tokens, quality, language-ID, fingerprints), similarity search over
embeddings. Thin registration layer over ``operators/``."""

from __future__ import annotations
