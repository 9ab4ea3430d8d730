"""Small utilities shared across the package."""

from .util import cache_last, intpattern, natpattern  # noqa: F401
