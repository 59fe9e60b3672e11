"""Pure scalar / vector functions: no Ray, no I/O. Safe to import anywhere."""
