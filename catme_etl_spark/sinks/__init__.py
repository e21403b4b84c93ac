"""Output sinks (SURVEY §2.1 S9–S12)."""
