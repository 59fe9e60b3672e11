"""Per-batch transforms for ``Dataset.map_batches`` (Arrow in / Arrow out)."""
