"""Concrete telescope models."""
