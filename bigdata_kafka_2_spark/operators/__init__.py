"""Operator library: documented ``DataFrame -> DataFrame`` transforms.

Organized by family (SURVEY.md §2): ``relational`` (filters,
projections, aggregates, joins, windows, slices), ``similarity``
(cosine top-k, LSH ANN), ``dedup`` (exact + near-duplicate),
``text`` (language-ID, quality, tokens, fingerprints),
``multimodal`` (binary-column plumbing).

Every operator is declarative DataFrame composition — Catalyst chooses
the physical strategy. Pandas UDFs appear only where built-ins cannot
express the semantics (documented per-site).
"""
