"""Filename patterns and memoisation helpers.

Functional parity with /root/reference/drift/util/util.py (fresh
implementation).
"""

from __future__ import annotations

import functools
import math


def intpattern(n: int) -> str:
    """printf pattern wide enough for integers up to ``n``, always signed."""
    width = int(math.ceil(math.log10(n + 1))) + 1
    return f"%+0{width}d"


def natpattern(n: int) -> str:
    """printf pattern wide enough for naturals up to ``n`` (zero padded)."""
    width = int(math.ceil(math.log10(n + 1)))
    return f"%0{width}d"


def cache_last(func):
    """Memoise only the most recent call of ``func``.

    Useful for the per-m file accessors which are typically called several
    times in a row with the same arguments.
    """
    state = {"args": None, "kwargs": None, "set": False, "ret": None}

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if not state["set"] or args != state["args"] or kwargs != state["kwargs"]:
            state["ret"] = func(*args, **kwargs)
            state["args"] = args
            state["kwargs"] = kwargs
            state["set"] = True
        return state["ret"]

    return wrapper
