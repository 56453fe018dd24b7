"""Reference-API keyword compatibility.

The reference (SURVEY.md §2) and this package agree on behavior but a
number of public functions historically diverged on parameter NAMES
(``label_column`` vs ``cell_type_column``, ``save`` vs ``path``,
``random_state`` vs ``seed``). ``param_aliases`` lets one canonical
signature accept both spellings, so code written against the reference
keeps working keyword-for-keyword.

Canonical names follow the reference wherever the concept is identical
(tools/signature_audit.py enforces this); the pre-existing spellings of
this package stay accepted as aliases so nothing here ever breaks.
"""

from __future__ import annotations

import functools
from typing import Callable


def param_aliases(**aliases: str) -> Callable:
    """Accept alternate keyword spellings: ``alias_name -> canonical``.

    ``@param_aliases(cell_type_column="label_column")`` makes
    ``fn(cell_type_column=...)`` equivalent to ``fn(label_column=...)``.
    Passing both spellings raises ``TypeError``. The mapping is exposed
    as ``fn.__param_aliases__`` for the signature audit.
    """

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            for alias, canonical in aliases.items():
                if alias in kwargs:
                    if canonical in kwargs:
                        raise TypeError(
                            f"{fn.__name__}() got '{alias}' and its "
                            f"canonical form '{canonical}' — pass one")
                    kwargs[canonical] = kwargs.pop(alias)
            return fn(*args, **kwargs)

        merged = dict(getattr(fn, "__param_aliases__", {}))
        merged.update(aliases)
        wrapper.__param_aliases__ = merged
        return wrapper

    return deco
