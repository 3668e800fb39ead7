"""cityhash import shim: the reference imports CityHash64 at module
scope (shmr/funcs.py:4). Differential tests only use integer keys, so
the function itself must never be called — calling it is a loud error,
not a silent wrong hash."""


def CityHash64(x):  # noqa: N802 (reference API name)
    raise NotImplementedError(
        "cityhash is not installed; differential tests must use integer keys"
    )
