"""Per-family benchmark query modules (split in r13)."""
