"""fastnumbers stand-in for differential tests: the reference only
uses ``isfloat`` to sniff CLI argument strings."""


def isfloat(val) -> bool:
    try:
        float(val)
    except (TypeError, ValueError):
        return False
    # fastnumbers.isfloat rejects inf/nan spellings by default
    return str(val).strip().lower().lstrip("+-") not in {"inf", "infinity", "nan"}
