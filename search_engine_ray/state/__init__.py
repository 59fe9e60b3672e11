"""Persisted index state: segment layout, manifest, checkpoint/resume."""
