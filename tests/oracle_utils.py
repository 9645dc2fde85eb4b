"""Result canonicalization for Spark-vs-DuckDB comparison, mirroring
the driver's order-insensitive compare: sort columns by name, canonical
string per value, sort rows."""

from __future__ import annotations

import math
from datetime import date, datetime


def canon_value(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        r = round(v, 6)
        if r == int(r):
            return str(int(r))
        return f"{r:.6f}".rstrip("0")
    if isinstance(v, (int, bool, str)):
        return str(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    try:
        # numpy scalars
        return canon_value(v.item())
    except AttributeError:
        return str(v)


def canon_frame(pdf):
    """(sorted column names, sorted canonical rows) for a pandas DF."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)
