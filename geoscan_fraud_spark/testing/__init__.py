"""Test support: oracle comparison + deterministic synthetic data."""
