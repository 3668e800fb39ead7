"""Minimal tqdm stand-in so the REFERENCE CLI can run in this
container for differential testing (tqdm is not installed and pip is
unavailable). Only the surface the reference touches at verbose=0/1:
iterator passthrough, total/desc kwargs, context manager, update().

Test scaffolding only — never imported by shmr_spark itself.
"""


class tqdm:
    def __init__(self, iterable=None, total=None, desc=None, **_kw):
        self.iterable = iterable

    def __iter__(self):
        return iter(self.iterable)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def update(self, n=1):
        pass

    def close(self):
        pass
