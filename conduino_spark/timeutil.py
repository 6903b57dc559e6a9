"""Dtype-robust event-time helpers.

The engine's time layer is pure extension surface (time never appears in
conduino's model — SURVEY §2.7), so its contract is with the data: the
driver testdata has stored ``events.ts`` as parquet TIMESTAMP(NANOS)
(→ bigint under ``nanosAsLong``), as tz-aware ``timestamp``, and as
tz-naive ``timestamp[us]`` (→ ``TIMESTAMP_NTZ`` when
``spark.sql.parquet.inferTimestampNTZ.enabled`` is true) across rounds.
Every epoch extraction in the engine and the gate queries routes through
these helpers so any of those arrivals works.

The one-expression trick: ``cast("timestamp")`` is a no-op on
``TIMESTAMP``, a session-timezone reinterpretation on ``TIMESTAMP_NTZ``
(the session pins UTC, so values match DuckDB's naive semantics), and a
seconds conversion on numerics — whereas ``cast("long")`` directly on
``TIMESTAMP_NTZ`` and ``unix_micros`` on anything but ``TIMESTAMP`` are
analysis errors in Spark 4.1.2.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def ts_col(c: ColumnOrName) -> Column:
    """``c`` as a session-zone ``TIMESTAMP`` regardless of arrival dtype
    (timestamp / timestamp_ntz / numeric epoch-seconds)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp")


def epoch_seconds(c: ColumnOrName) -> Column:
    """Exact long epoch seconds (truncating, like DuckDB ``epoch``)."""
    return ts_col(c).cast("long")


def epoch_micros(c: ColumnOrName) -> Column:
    """Exact long epoch microseconds."""
    return F.unix_micros(ts_col(c))
