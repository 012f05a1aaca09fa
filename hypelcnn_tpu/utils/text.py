"""Small string/path helpers (reference `common/common_ops.py:12-29`)."""

from __future__ import annotations

import ntpath


def path_leaf(path: str | None) -> str:
    if path is None:
        return ""
    head, tail = ntpath.split(path)
    return tail or ntpath.basename(head)


def replace_abbrs(value: str, abbreviations: dict) -> str:
    for key, abbr in abbreviations.items():
        value = value.replace(key, abbr)
    return value


def is_integer_num(n) -> bool:
    if isinstance(n, int):
        return True
    if isinstance(n, float):
        return n.is_integer()
    return False
