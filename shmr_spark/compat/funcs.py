"""Public helper functions mirroring the reference's built-in surface
(/root/reference/shmr/funcs.py — 9 helpers, SURVEY.md §2.3), usable as
``--fn`` / ``--deser_fn`` / ``--ser_fn`` import paths in the compat
CLI.

The reference default codec is orjson; this container may not ship it,
so ``json_loads/json_dumps`` fall back to stdlib json transparently
(same ND-JSON wire format).
"""

from __future__ import annotations

import csv
import importlib
import io
from typing import Any

try:  # pragma: no cover - environment-dependent
    import orjson

    def json_loads(s: bytes | str) -> Any:
        return orjson.loads(s)

    def json_dumps(x: Any) -> bytes:
        return orjson.dumps(x)

except ImportError:  # pragma: no cover
    import json

    def json_loads(s: bytes | str) -> Any:
        return json.loads(s)

    def json_dumps(x: Any) -> bytes:
        return json.dumps(x, separators=(",", ":")).encode()


def csv_loads(line: bytes | str) -> list[str]:
    """One CSV line → list of string fields."""
    if isinstance(line, bytes):
        line = line.decode()
    return next(csv.reader(io.StringIO(line)))


def csv_dumps(row: list) -> bytes:
    buf = io.StringIO()
    csv.writer(buf).writerow(row)
    return buf.getvalue().rstrip("\r\n").encode()


def str_loads(line: bytes | str) -> str:
    if isinstance(line, bytes):
        line = line.decode()
    return line.rstrip("\n\r")


def str_dumps(x: Any) -> bytes:
    return str(x).encode()


def str2hashnumber(s: str) -> int:
    """Stable 64-bit int key for a string (the reference uses
    CityHash64; any stable hash satisfies the bucketing contract —
    we use Python's stable FNV-1a so CLI runs are reproducible across
    processes, unlike builtin hash())."""
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def identity(x: Any) -> Any:
    return x


def getitem_0(x) -> Any:
    return x[0]


def getitem_1(x) -> Any:
    return x[1]


def getitem_2(x) -> Any:
    return x[2]


_ALIASES = {
    # reference spellings → our implementations, so existing shmr
    # command lines run unchanged even without orjson installed
    "orjson.loads": "shmr_spark.compat.funcs.json_loads",
    "orjson.dumps": "shmr_spark.compat.funcs.json_dumps",
    "shmr.csv_loads": "shmr_spark.compat.funcs.csv_loads",
    "shmr.csv_dumps": "shmr_spark.compat.funcs.csv_dumps",
    "shmr.str_loads": "shmr_spark.compat.funcs.str_loads",
    "shmr.str_dumps": "shmr_spark.compat.funcs.str_dumps",
    "shmr.str2hashnumber": "shmr_spark.compat.funcs.str2hashnumber",
    "shmr.identity": "shmr_spark.compat.funcs.identity",
    "shmr.getitem_0": "shmr_spark.compat.funcs.getitem_0",
    "shmr.getitem_1": "shmr_spark.compat.funcs.getitem_1",
    "shmr.getitem_2": "shmr_spark.compat.funcs.getitem_2",
}


def resolve_fn(path: str):
    """Dynamic import of ``module.fn`` or ``module.Class.fn`` (the
    reference's --fn convention, /root/reference/shmr/misc.py:69-86 —
    reimplemented, not copied: we also honor the alias table above)."""
    path = _ALIASES.get(path, path)
    parts = path.split(".")
    for split in range(len(parts) - 1, 0, -1):
        mod_name = ".".join(parts[:split])
        try:
            obj = importlib.import_module(mod_name)
        except ImportError:
            if "orjson" in mod_name:
                raise ImportError(
                    f"{path}: orjson is not installed; use the default codec "
                    "(shmr_spark.compat.funcs.json_loads/json_dumps)"
                )
            continue
        try:
            for attr in parts[split:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"cannot resolve function import path: {path}")
