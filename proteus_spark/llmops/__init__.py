"""LLM-data-pipeline operators (beyond-reference; BASELINE.json north star).

Deduplication, similarity search, text analysis, and multimodal-column
plumbing over the ``documents``/``embeddings`` tables — all designed for
the 100 TB shape: no driver-side loops, no per-row Python in hot paths,
candidate-generation before pairwise verification so nothing is O(n^2) on
the full corpus.
"""
