"""Core m-mode analysis components."""
