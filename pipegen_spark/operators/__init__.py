"""Operator library: large-scale training-data-pipeline operators.

Beyond the reference's relational surface (SURVEY.md §2A), these are the
first-class components a 100 TB curation pipeline needs: exact & fuzzy
deduplication, similarity search, text analysis, and multimodal-column
plumbing. All hot paths are JVM-side expressions (no row-at-a-time Python);
Python appears only in Arrow-batched `mapInPandas` for multimodal decode.
"""
