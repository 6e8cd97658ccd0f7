"""Typed-value codec for message-log records (Pulsar ``Schema<M>``
parity).

The reference's Pulsar builders take a pluggable schema supplier so
consumers see TYPED messages, not raw bytes (PulsarSources.java:84-92
``Schema<M>``; PulsarConsumerBuilder.java builder chain), the same
POJO-mapping ergonomics the Influx path has with its typed
measurements (InfluxDbSources.java:167-221). The message log
(streaming/message_log.py) carries ``value string`` — this module adds
the typed layer on top, StructType-driven on BOTH sides:

- **Producer side**: :meth:`StructCodec.encode` turns a typed record
  (dict) into the value string with STRICT validation — unknown
  fields, missing non-nullable fields, and type mismatches raise
  before anything hits the log (the analog of Pulsar rejecting a
  message that doesn't match the topic schema). For DataFrame
  producers :meth:`StructCodec.encode_col` is the JVM-side equivalent
  (``to_json(struct(...))``) — whole-stage codegen, no Python.
- **Consumer side**: :meth:`StructCodec.typed` projects a message-log
  DataFrame (batch or streaming) to typed columns via ``from_json`` —
  pure Catalyst, so watermarks/windows run on real types. Malformed or
  schema-mismatched values decode to null fields (from_json PERMISSIVE
  mode); :meth:`typed` optionally quarantines them instead of
  silently nulling (``on_malformed="keep"|"drop"|"fail"``).

Wire format is JSON — the log is line-JSON already, human-debuggable,
and from_json/to_json keep every decode/encode inside the JVM. The
codec owns the value column only; routing key, properties, event_time
stay the transport's (SCHEMA in message_log.py).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _parse_schema(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):
        raise ValueError(f"codec schema must be a struct, got {parsed}")
    return parsed


class StructCodec:
    """StructType-driven encode/decode for message-log values."""

    def __init__(self, schema: T.StructType | str):
        self.schema = _parse_schema(schema)
        self._fields = {f.name: f for f in self.schema.fields}

    # ------------------------------------------------------------------
    # producer side
    # ------------------------------------------------------------------
    def encode(self, record: dict[str, Any]) -> str:
        """Typed record -> value string, STRICTLY validated against the
        schema (unknown field / missing non-nullable / type mismatch
        raise). Use with ``append_segment`` or any non-DataFrame
        producer; DataFrame producers use :meth:`encode_col`."""
        unknown = set(record) - set(self._fields)
        if unknown:
            raise ValueError(
                f"unknown field(s) {sorted(unknown)} for schema "
                f"{self.schema.simpleString()}"
            )
        out: dict[str, Any] = {}
        for name, field in self._fields.items():
            if name not in record or record[name] is None:
                if not field.nullable:
                    raise ValueError(f"non-nullable field {name!r} is missing/null")
                continue
            out[name] = _to_json_value(record[name], field.dataType, name)
        return json.dumps(out, separators=(",", ":"), sort_keys=True)

    def encode_col(self, *field_cols: str | Column) -> Column:
        """JVM-side encode for DataFrame producers: columns (or an
        existing struct column) -> JSON value string, schema-shaped.
        ``to_json(struct(...))`` — whole-stage codegen, zero Python."""
        if len(field_cols) == 1 and not isinstance(field_cols[0], str):
            inner = field_cols[0]
        elif field_cols:
            inner = F.struct(*field_cols)
        else:
            inner = F.struct(*[F.col(f.name) for f in self.schema.fields])
        return F.to_json(inner)

    # ------------------------------------------------------------------
    # consumer side
    # ------------------------------------------------------------------
    def decode_col(self, value_col: str | Column = "value") -> Column:
        """``from_json`` of the value column with this schema — pure
        Catalyst, safe in streaming plans (watermarkable)."""
        return F.from_json(value_col, self.schema)

    def typed(
        self,
        df: DataFrame,
        value_col: str = "value",
        on_malformed: str = "keep",
    ) -> DataFrame:
        """Message-log DataFrame -> typed DataFrame: transport columns
        kept, ``value`` replaced by one column per schema field.

        Malformed = unparseable JSON OR a field that fails type
        conversion (both are "doesn't match the topic schema" in the
        Pulsar analogy; detected via from_json's corrupt-record
        column). ``on_malformed``:

        - ``"keep"`` (default): typed fields come back null where they
          failed, the raw value is preserved in ``_corrupt_value`` for
          quarantining — the PERMISSIVE-mode discipline.
        - ``"drop"``: malformed rows are filtered out.
        - ``"fail"``: the first malformed row fails the query
          (from_json FAILFAST) — Pulsar's reject-on-schema-mismatch
          analog, applied at read since the log is transport for ANY
          producer.
        """
        if on_malformed not in ("keep", "drop", "fail"):
            raise ValueError("on_malformed must be keep|drop|fail")
        if "_corrupt_value" in self._fields:
            raise ValueError("schema may not name a field '_corrupt_value'")
        passthrough = [c for c in df.columns if c != value_col]
        if on_malformed == "keep" and "_corrupt_value" in passthrough:
            raise ValueError(
                "input already carries a _corrupt_value column (a prior "
                "typed() output?) — drop or rename it before re-typing "
                "with on_malformed='keep', or the projection would emit "
                "duplicate _corrupt_value columns"
            )
        collisions = sorted(set(passthrough) & set(self._fields))
        if collisions:
            raise ValueError(
                f"schema field(s) {collisions} collide with the input "
                f"DataFrame's transport columns — the typed projection "
                f"would emit duplicate (ambiguous) column names. Rename "
                f"the schema fields or drop/rename the transport columns "
                f"before typed() (message-log transport names are fixed: "
                f"stream, seq, key, properties, event_time)."
            )
        if on_malformed == "fail":
            decoded = F.from_json(value_col, self.schema, {"mode": "FAILFAST"})
        else:
            widened = T.StructType(
                [*self.schema.fields, T.StructField("_corrupt_value", T.StringType())]
            )
            decoded = F.from_json(
                value_col,
                widened,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_value"},
            )
        out = df.select(*passthrough, decoded.alias("_v"))
        if on_malformed == "drop":
            out = out.filter(F.col("_v._corrupt_value").isNull())
        cols = [F.col(c) for c in passthrough]
        cols += [F.col("_v")[f.name].alias(f.name) for f in self.schema.fields]
        if on_malformed == "keep":
            cols.append(F.col("_v._corrupt_value").alias("_corrupt_value"))
        return out.select(*cols)


def _to_json_value(v: Any, dt: T.DataType, path: str) -> Any:
    """Python value -> JSON-shaped value for ``dt``, strict: a mismatch
    raises with the field path instead of silently coercing. Timestamps
    serialize as ISO-8601 (what from_json parses back); decimals as
    strings (lossless — from_json parses quoted decimals)."""

    def fail(expected: str):
        raise TypeError(
            f"field {path!r}: expected {expected}, got {type(v).__name__} ({v!r})"
        )

    if isinstance(dt, T.StringType):
        if not isinstance(v, str):
            fail("str")
        return v
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        if isinstance(v, bool) or not isinstance(v, int):
            fail("int")
        return v
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            fail("float")
        if isinstance(v, float) and not math.isfinite(v):
            fail("finite float")
        return float(v)
    if isinstance(dt, T.BooleanType):
        if not isinstance(v, bool):
            fail("bool")
        return v
    if isinstance(dt, T.TimestampType):
        if not isinstance(v, _dt.datetime):
            fail("datetime.datetime")
        return v.isoformat(sep=" ")
    if isinstance(dt, T.DateType):
        if isinstance(v, _dt.datetime) or not isinstance(v, _dt.date):
            fail("datetime.date")
        return v.isoformat()
    if isinstance(dt, T.DecimalType):
        if not isinstance(v, _decimal.Decimal):
            fail("decimal.Decimal")
        return str(v)
    if isinstance(dt, T.ArrayType):
        if not isinstance(v, (list, tuple)):
            fail("list")
        return [
            _to_json_value(x, dt.elementType, f"{path}[{i}]") for i, x in enumerate(v)
        ]
    if isinstance(dt, T.MapType):
        if not isinstance(v, dict):
            fail("dict")
        if not isinstance(dt.keyType, T.StringType):
            raise TypeError(f"field {path!r}: JSON maps need string keys, got {dt.keyType}")
        return {
            str(k): _to_json_value(x, dt.valueType, f"{path}[{k!r}]")
            for k, x in v.items()
        }
    if isinstance(dt, T.StructType):
        if not isinstance(v, dict):
            fail("dict")
        unknown = set(v) - {f.name for f in dt.fields}
        if unknown:
            raise TypeError(f"field {path!r}: unknown nested field(s) {sorted(unknown)}")
        out = {}
        for f in dt.fields:
            if v.get(f.name) is None:
                if not f.nullable:
                    raise TypeError(
                        f"field {path}.{f.name}: non-nullable, missing/null"
                    )
                continue
            out[f.name] = _to_json_value(v[f.name], f.dataType, f"{path}.{f.name}")
        return out
    raise TypeError(f"field {path!r}: unsupported codec type {dt.simpleString()}")


__all__ = ["StructCodec"]
