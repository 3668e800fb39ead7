"""docstring_parser stand-in for differential tests. The reference's
CLI builder (shmr/main.py:42-61) needs ``parse(doc, style=google)``
returning an object with ``short_description`` and ``params`` (each
with arg_name / type_name / description) covering every documented
argument — a KeyError otherwise. This parses exactly the reference's
own Google-style ``name (type): description`` lines."""

from __future__ import annotations

import re


class Style:
    google = "google"


class _Param:
    def __init__(self, arg_name: str, type_name: str, description: str):
        self.arg_name = arg_name
        self.type_name = type_name
        self.description = description


class _Doc:
    def __init__(self, short_description: str, params: list[_Param]):
        self.short_description = short_description
        self.params = params


_PARAM_RE = re.compile(r"^\s+(\w+)\s*\(([^)]*)\)\s*:\s*(.*)$")


def parse(text: str | None, style=None) -> _Doc:
    lines = (text or "").splitlines()
    short = lines[0].strip() if lines else ""
    params: list[_Param] = []
    in_args = False
    for line in lines:
        if line.strip() == "Args:":
            in_args = True
            continue
        if in_args:
            m = _PARAM_RE.match(line)
            if m:
                params.append(_Param(m.group(1), m.group(2), m.group(3)))
            elif line and not line[0].isspace():
                in_args = False
    return _Doc(short, params)
