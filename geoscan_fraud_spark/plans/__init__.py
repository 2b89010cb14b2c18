"""Plan inspection and layout helpers."""
