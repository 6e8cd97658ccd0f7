"""StructCodec: typed message-log values (Pulsar ``Schema<M>`` parity,
PulsarSources.java:84-92 / PulsarConsumerBuilder.java schema supplier).

Proofs: strict producer-side validation; a schema'd ROUND-TRIP through
the real message-log streaming source (encode → append_segment →
readStream → typed()); JVM encode path (encode_col) equivalence; and
the three malformed-value policies (quarantine / drop / reject)."""

from __future__ import annotations

import datetime as dt
import decimal
import os

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.streaming import message_log
from hazelcast_jet_contrib_spark.streaming.codec import StructCodec

ORDER_SCHEMA = (
    "order_id long, customer string, amount decimal(10,2), "
    "placed_at timestamp, tags array<string>, attrs map<string,long>, "
    "express boolean"
)


def _rec(i: int) -> dict:
    return {
        "order_id": i,
        "customer": f"cust-{i % 3}",
        "amount": decimal.Decimal(f"{100 + i}.25"),
        "placed_at": dt.datetime(2024, 1, 2, 3, 4, 5, 123000) + dt.timedelta(hours=i),
        "tags": [f"t{i}", "all"],
        "attrs": {"weight": i * 10},
        "express": i % 2 == 0,
    }


# ---------------------------------------------------------------------------
# producer-side strictness (session only for DDL-string parsing)
# ---------------------------------------------------------------------------


def test_encode_rejects_unknown_missing_and_mistyped_fields(spark):
    c = StructCodec("a long, b string")
    with pytest.raises(ValueError, match="unknown field"):
        c.encode({"a": 1, "b": "x", "zz": 9})
    with pytest.raises(TypeError, match="expected int"):
        c.encode({"a": "not-an-int", "b": "x"})
    with pytest.raises(TypeError, match="expected int"):
        c.encode({"a": True, "b": "x"})  # bool is not an int here
    with pytest.raises(TypeError, match="expected str"):
        c.encode({"a": 1, "b": 2})
    nn = StructCodec(
        __import__("pyspark").sql.types.StructType(
            [
                __import__("pyspark").sql.types.StructField(
                    "a", __import__("pyspark").sql.types.LongType(), nullable=False
                )
            ]
        )
    )
    with pytest.raises(ValueError, match="non-nullable"):
        nn.encode({})


def test_encode_rejects_non_finite_floats_and_nested_mismatches(spark):
    c = StructCodec("x double, nested struct<p:long,q:string>")
    with pytest.raises(TypeError, match="finite"):
        c.encode({"x": float("nan")})
    with pytest.raises(TypeError, match="unknown nested"):
        c.encode({"x": 1.0, "nested": {"p": 1, "q": "s", "r": 2}})
    ok = c.encode({"x": 1.5, "nested": {"p": 7, "q": "s"}})
    assert '"p":7' in ok


# ---------------------------------------------------------------------------
# the round-trip: encode → message log → readStream → typed()
# ---------------------------------------------------------------------------


def test_schema_roundtrip_through_message_log_stream(spark, tmp_path):
    codec = StructCodec(ORDER_SCHEMA)
    root = str(tmp_path / "log")
    os.makedirs(root)
    originals = [_rec(i) for i in range(12)]
    message_log.append_segment(
        root,
        "orders",
        [
            {"key": str(r["order_id"]), "value": codec.encode(r), "event_time": 1000 + i}
            for i, r in enumerate(originals)
        ],
    )
    message_log.register(spark)
    stream = spark.readStream.format("message_log").option("path", root).load()
    typed = codec.typed(stream)
    q = (
        typed.writeStream.format("memory")
        .queryName("typed_orders")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["order_id"]: r for r in spark.table("typed_orders").collect()}
    assert len(rows) == 12
    for orig in originals:
        got = rows[orig["order_id"]]
        assert got["customer"] == orig["customer"]
        assert got["amount"] == orig["amount"]  # Decimal, lossless
        assert got["placed_at"] == orig["placed_at"]
        assert got["tags"] == orig["tags"]
        assert got["attrs"] == orig["attrs"]
        assert got["express"] == orig["express"]
        assert got["_corrupt_value"] is None
        # transport columns survive the typed projection
        assert got["stream"] == "orders" and got["key"] == str(orig["order_id"])


def test_encode_col_jvm_path_matches_python_encode(spark):
    """DataFrame producers encode in the JVM (to_json) — decoding both
    encodings with the same codec yields identical typed values."""
    codec = StructCodec("a long, b string, c array<long>")
    py = spark.createDataFrame(
        [(codec.encode({"a": i, "b": f"s{i}", "c": [i, i + 1]}),) for i in range(5)],
        "value string",
    )
    jvm = (
        spark.range(5)
        .select(
            codec.encode_col(
                F.col("id").alias("a"),
                F.concat(F.lit("s"), F.col("id")).alias("b"),
                F.array(F.col("id"), F.col("id") + 1).alias("c"),
            ).alias("value")
        )
    )
    a = sorted(map(tuple, codec.typed(py, on_malformed="fail").collect()))
    b = sorted(map(tuple, codec.typed(jvm, on_malformed="fail").collect()))
    assert a == b and len(a) == 5


# ---------------------------------------------------------------------------
# malformed-value policies
# ---------------------------------------------------------------------------


@pytest.fixture()
def mixed_values(spark):
    good = StructCodec("a long, b string").encode({"a": 1, "b": "ok"})
    return spark.createDataFrame(
        [("k1", good), ("k2", "not json at all"), ("k3", '{"a":"NaN-ish","b":"x"}')],
        "key string, value string",
    )


def test_malformed_keep_quarantines_raw_value(mixed_values):
    codec = StructCodec("a long, b string")
    rows = {r["key"]: r for r in codec.typed(mixed_values).collect()}
    assert rows["k1"]["a"] == 1 and rows["k1"]["_corrupt_value"] is None
    assert rows["k2"]["a"] is None and rows["k2"]["_corrupt_value"] == "not json at all"
    # type mismatch is schema-mismatch too: field null, raw preserved
    assert rows["k3"]["a"] is None and rows["k3"]["b"] == "x"
    assert rows["k3"]["_corrupt_value"] == '{"a":"NaN-ish","b":"x"}'


def test_malformed_drop_filters_them(mixed_values):
    codec = StructCodec("a long, b string")
    kept = codec.typed(mixed_values, on_malformed="drop").collect()
    assert [r["key"] for r in kept] == ["k1"]
    assert "_corrupt_value" not in codec.typed(mixed_values, on_malformed="drop").columns


def test_malformed_fail_rejects_the_batch(mixed_values):
    codec = StructCodec("a long, b string")
    with pytest.raises(Exception, match="(?i)malformed"):
        codec.typed(mixed_values, on_malformed="fail").collect()


def test_typed_guards_reserved_column_and_bad_policy(spark):
    df = spark.createDataFrame([("x",)], "value string")
    with pytest.raises(ValueError, match="keep|drop|fail"):
        StructCodec("a long").typed(df, on_malformed="explode")
    with pytest.raises(ValueError, match="_corrupt_value"):
        StructCodec("_corrupt_value string").typed(df)


def test_typed_rejects_transport_column_collisions(spark):
    """A schema field named like a transport column (the message log
    fixes 'key'/'stream'/'seq'/...) would project DUPLICATE column
    names — ambiguous downstream. typed() refuses up front with the
    fix spelled out (review finding, round 11)."""
    df = spark.createDataFrame(
        [("s1", "k1", '{"key":"inner","amount":2}')],
        "stream string, key string, value string",
    )
    with pytest.raises(ValueError, match="collide.*key|key.*collide"):
        StructCodec("key string, amount long").typed(df)
    # non-colliding schema over the same transport df is fine
    got = StructCodec("amount long").typed(df).collect()[0]
    assert got["amount"] == 2 and got["key"] == "k1"


def test_typed_rejects_retyping_a_keep_output(spark):
    """A typed(on_malformed='keep') output carries _corrupt_value; the
    guard must catch feeding it back through typed() with the default
    policy instead of projecting two _corrupt_value columns (review
    finding, round 11). drop/fail modes don't emit the column, so they
    re-type fine."""
    codec = StructCodec("a long")
    df = spark.createDataFrame([("s", '{"a":1}')], "stream string, value string")
    once = codec.typed(df).withColumn(
        "value", F.lit('{"b":2}')
    )  # keep-output + a fresh value column
    with pytest.raises(ValueError, match="_corrupt_value"):
        StructCodec("b long").typed(once.withColumnRenamed("a", "b2"))
    kept = StructCodec("b long").typed(
        once.drop("_corrupt_value"), on_malformed="drop"
    )
    assert kept.collect()[0]["b"] == 2

# ---------------------------------------------------------------------------
# property: encode -> typed() decode is lossless for ANY conforming record
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_psettings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# a value strategy per palette type; names f0..fN so transport-column
# collisions can't occur
_PALETTE = {
    "long": st.integers(-(2**63), 2**63 - 1),
    "double": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "string": st.text(max_size=20),
    "boolean": st.booleans(),
    "array<long>": st.lists(st.integers(-(2**31), 2**31 - 1), max_size=4),
    "struct<a:long,b:string>": st.fixed_dictionaries(
        {"a": st.integers(-1000, 1000), "b": st.text(max_size=8)}
    ),
}


@st.composite
def _schema_and_records(draw):
    types = draw(
        st.lists(st.sampled_from(sorted(_PALETTE)), min_size=1, max_size=4)
    )
    ddl = ", ".join(f"f{i} {t}" for i, t in enumerate(types))
    n = draw(st.integers(1, 3))
    records = []
    for _ in range(n):
        rec = {}
        for i, t in enumerate(types):
            if draw(st.booleans()):  # every field is nullable in DDL strings
                rec[f"f{i}"] = draw(_PALETTE[t])
        records.append(rec)
    return ddl, types, records


@given(_schema_and_records())
@_psettings
def test_codec_roundtrip_lossless_for_any_conforming_record(spark, case):
    """For ANY schema drawn from the palette and ANY conforming records
    (random field subsets null): encode() -> typed() decode returns
    every value exactly — longs/bools/strings/arrays/structs equal,
    doubles bit-equal (json.dumps repr is shortest-roundtrip and
    Jackson parses to nearest) — and nothing lands in
    _corrupt_value."""
    ddl, types, records = case
    codec = StructCodec(ddl)
    values = [(i, codec.encode(r)) for i, r in enumerate(records)]
    df = spark.createDataFrame(values, "seq long, value string")
    out = {r["seq"]: r for r in codec.typed(df).collect()}
    assert len(out) == len(records)
    for i, rec in enumerate(records):
        row = out[i]
        assert row["_corrupt_value"] is None, row
        for j, t in enumerate(types):
            name = f"f{j}"
            expected = rec.get(name)
            got = row[name]
            if expected is None:
                assert got is None, (name, t, got)
            elif t == "struct<a:long,b:string>":
                assert got["a"] == expected["a"] and got["b"] == expected["b"]
            elif t == "array<long>":
                assert list(got) == expected
            else:
                assert got == expected, (name, t, expected, got)
