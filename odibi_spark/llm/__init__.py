"""LLM training-data pipeline operators (beyond the reference surface;
BASELINE.json north star): deduplication families, similarity search,
text analysis, multimodal column plumbing — all designed for the
100 TB case: no driver-side loops, no row-at-a-time Python, candidate
generation before any pairwise work.
"""

from odibi_spark.llm import (  # noqa: F401
    ann_store, dedup, similarity, text, transforms, url,
)
