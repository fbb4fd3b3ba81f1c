"""Value -> string rendering for logs and diff output.

The reference's StrVal (/root/reference/cmd/app.go:158-211) renders
every fetched cell for the insert path: numerics verbatim, []byte as
hex, time formatted, everything else via fmt/json fallback. Spark keeps
values typed end-to-end (SURVEY T5: don't port stringly-typed rows), so
this renderer exists only at the observability edge: compare-diff
output and log lines.
"""

from __future__ import annotations

import datetime
import decimal
import json


def render_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, decimal.Decimal):
        return format(v, "f")
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, (list, dict, tuple)):
        return json.dumps(v, default=str, separators=(",", ":"))
    return str(v)


def render_row(row) -> str:
    """One diff/log line per row: col=value pairs, reference-log style."""
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    return ", ".join(f"{k}={render_value(v)}" for k, v in d.items())
