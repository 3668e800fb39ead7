"""fastnumbers stand-in for differential tests: the reference only
uses ``isfloat`` to sniff CLI argument strings.

Pinned to the real library's documented defaults
(https://fastnumbers.readthedocs.io — ``isfloat(x)``):

- inf/nan spellings rejected unless opted in (``allow_inf``/
  ``allow_nan`` default False);
- underscores rejected (``allow_underscores`` defaults False since
  fastnumbers 4.0) — CPython's ``float("1_0")`` accepts, the
  library does not;
- leading/trailing whitespace and a single leading sign accepted,
  as in ``float()``.

Known unpinnable residue: the real library recognizes single
non-ASCII unicode numerals like "½" (unicodedata-numeric) that
CPython's float() cannot convert — the reference would crash on
``float("½")`` after ``isfloat`` returns True. Real fastnumbers is
not installed in this environment, so differential tests that import
this shim verify against these documented semantics, not the C
extension itself."""


def isfloat(val) -> bool:
    s = str(val)
    if "_" in s:
        # allow_underscores=False is the library default (4.0+)
        return False
    try:
        float(s)
    except (TypeError, ValueError):
        return False
    # fastnumbers.isfloat rejects inf/nan spellings by default
    return s.strip().lower().lstrip("+-") not in {"inf", "infinity", "nan"}
