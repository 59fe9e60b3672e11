"""End-to-end pipelines: index build, BM25 query serving, conformance oracle."""
