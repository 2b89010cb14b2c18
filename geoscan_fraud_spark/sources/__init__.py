"""Sources and sinks (SURVEY §2.1)."""
