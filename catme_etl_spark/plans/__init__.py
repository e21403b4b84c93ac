"""Physical-plan inspection utilities (SURVEY §4.4)."""
