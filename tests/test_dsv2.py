"""DSv2 optimizer-pushdown source: bound-tightening semantics of
pushFilters and the safety contract that unsupported predicates are
returned to Spark and still enforced."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)

from hazelcast_jet_contrib_spark.sources.dsv2 import ZSetStoreReader


def _reader() -> ZSetStoreReader:
    return ZSetStoreReader("/dev/null", "value", "event_id")


def test_pushfilters_tightens_bounds_and_keeps_strictness():
    r = _reader()
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("score",), 10.0),
                GreaterThan(("score",), 10.0),  # tighter: strict wins at same value
                LessThan(("score",), 80.0),
                LessThanOrEqual(("score",), 50.0),  # tighter value wins
            ]
        )
    )
    assert residual == []
    assert (r.lo, r.lo_strict) == (10.0, True)
    assert (r.hi, r.hi_strict) == (50.0, False)


def test_pushfilters_equal_to_pins_both_bounds():
    r = _reader()
    assert list(r.pushFilters([EqualTo(("score",), 42.0)])) == []
    assert (r.lo, r.lo_strict) == (42.0, False)
    assert (r.hi, r.hi_strict) == (42.0, False)


def test_pushfilters_equal_to_never_relaxes_strict_bound():
    """GreaterThan(v) then EqualTo(v) is unsatisfiable (score > v AND
    score = v); both are absorbed, so the reader's range must stay
    EMPTY — EqualTo must not rewrite the strict lower bound to
    non-strict. Order-independence: the reverse order already worked."""
    r = _reader()
    assert list(r.pushFilters([GreaterThan(("score",), 5.0), EqualTo(("score",), 5.0)])) == []
    assert (r.lo, r.lo_strict) == (5.0, True)  # strict kept → (5,5] empty
    assert (r.hi, r.hi_strict) == (5.0, False)
    # empty-range check: lo==hi with one strict end admits nothing
    assert r.lo == r.hi and (r.lo_strict or r.hi_strict)

    r2 = _reader()
    assert list(r2.pushFilters([LessThan(("score",), 5.0), EqualTo(("score",), 5.0)])) == []
    assert (r2.hi, r2.hi_strict) == (5.0, True)
    assert (r2.lo, r2.lo_strict) == (5.0, False)


def test_pushfilters_returns_unsupported_predicates():
    r = _reader()
    other = StringStartsWith(("member",), "a")
    residual = list(r.pushFilters([GreaterThan(("score",), 1.0), other]))
    assert residual == [other]
    assert (r.lo, r.lo_strict) == (1.0, True)
    assert r.hi == math.inf


def test_unsupported_filter_still_enforced_end_to_end(spark):
    """A member predicate the store cannot push must come back correct:
    Spark re-evaluates the residual post-scan, so results match the
    parquet ground truth exactly."""
    from hazelcast_jet_contrib_spark.sources import dsv2

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dsv2.register(spark)
    path = "/root/testdata/sf0.001/events.parquet"
    df = (
        spark.read.format("zset_store")
        .option("path", path)
        .option("score_col", "value")
        .option("member_col", "event_id")
        .load()
        .filter((F.col("score") > 20.0) & (F.col("member").startswith("1")))
    )
    got = {(r["score"], r["member"]) for r in df.collect()}
    truth = {
        (float(r["value"]), str(r["event_id"]))
        for r in spark.read.parquet(path)
        .filter((F.col("value") > 20.0) & (F.col("event_id").cast("string").startswith("1")))
        .select("value", "event_id")
        .collect()
    }
    assert got == truth and len(got) > 0


def test_docstore_pushfilters_builds_find_document():
    from hazelcast_jet_contrib_spark.sources.dsv2 import DocStoreReader

    r = DocStoreReader("/dev/null", ["doc_id", "lang", "n_chars"])
    other = StringStartsWith(("lang",), "e")  # no find-language counterpart
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("n_chars",), 100),
                LessThanOrEqual(("n_chars",), 400),
                EqualTo(("lang",), "en"),
                other,
            ]
        )
    )
    assert residual == [other]
    assert r.find == {
        "n_chars": {"$gte": 100, "$lte": 400},
        "lang": {"$eq": "en"},
    }


def test_docstore_pushfilters_duplicate_slot_and_unknown_column_yielded():
    from pyspark.sql.datasource import In

    from hazelcast_jet_contrib_spark.sources.dsv2 import DocStoreReader

    r = DocStoreReader("/dev/null", ["doc_id", "lang"])
    dup = GreaterThanOrEqual(("doc_id",), 20)
    off_schema = EqualTo(("other_col",), 1)
    residual = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 10),
                dup,  # second $gte on the same field: re-checked by Spark
                off_schema,  # not a declared column: re-checked by Spark
                In(("lang",), ("en", "de")),
            ]
        )
    )
    assert residual == [dup, off_schema]
    assert r.find == {"doc_id": {"$gte": 10}, "lang": {"$in": ["en", "de"]}}


def test_kv_pushfilters_intersects_key_sets():
    """Conjunction semantics: EqualTo after In must INTERSECT (narrow),
    never union; disjoint sets intersect to empty and read() emits
    nothing without touching the store."""
    from pyspark.sql.datasource import In

    from hazelcast_jet_contrib_spark.sources.dsv2 import KVStoreReader

    r = KVStoreReader("/dev/null", "k", "v")
    assert list(r.pushFilters([In(("key",), ("a", "b", "c")), EqualTo(("key",), "b")])) == []
    assert r.keys == {"b"}

    r2 = KVStoreReader("/dev/null", "k", "v")
    assert list(r2.pushFilters([EqualTo(("key",), "a"), EqualTo(("key",), "z")])) == []
    assert r2.keys == set()
    assert list(r2.read(type("P", (), {"index": 0})())) == []  # no store I/O


def test_kv_pushfilters_prefixes_conjoin_and_value_filters_return():
    from hazelcast_jet_contrib_spark.sources.dsv2 import KVStoreReader

    r = KVStoreReader("/dev/null", "k", "v")
    on_value = StringStartsWith(("value",), "x")
    not_a_key_op = GreaterThan(("key",), "m")
    residual = list(
        r.pushFilters(
            [StringStartsWith(("key",), "ab"), StringStartsWith(("key",), "abc"),
             on_value, not_a_key_op]
        )
    )
    assert residual == [on_value, not_a_key_op]
    assert r.prefixes == ["ab", "abc"] and r.keys is None


def test_kv_prune_is_conservative():
    """Row-group stats pruning: prune only when the key range provably
    excludes every absorbed key/prefix; non-string stats never prune."""
    from hazelcast_jet_contrib_spark.sources.dsv2 import KVStoreReader

    class S:
        has_min_max = True

        def __init__(self, mn, mx):
            self.min, self.max = mn, mx

    r = KVStoreReader("/dev/null", "k", "v")
    r.keys = {"mm"}
    assert r._prune(S("aa", "cc")) is True  # mm > max
    assert r._prune(S("ma", "mz")) is False  # in range
    assert r._prune(S(1, 9)) is False  # non-string stats: keep
    r2 = KVStoreReader("/dev/null", "k", "v")
    r2.prefixes = ["zz"]
    assert r2._prune(S("aa", "cc")) is True  # max sorts below prefix
    assert r2._prune(S("aa", "zz9")) is False


def test_kv_store_end_to_end_matches_ground_truth(spark):
    """HMGET shape (In on key) + residual on value, checked against the
    parquet ground truth; the key column is numeric in the store and
    stringly-typed at the API — the cast happens inside the client."""
    from hazelcast_jet_contrib_spark.sources import dsv2

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dsv2.register(spark)
    path = "/root/testdata/sf0.001/customer.parquet"
    wanted = ["Customer#000000007", "Customer#000000011", "Customer#nope"]
    df = (
        spark.read.format("kv_store")
        .option("path", path)
        .option("key_col", "c_name")
        .option("value_col", "c_custkey")
        .load()
        .filter(F.col("key").isin(wanted))
    )
    got = {(r["key"], r["value"]) for r in df.collect()}
    assert got == {("Customer#000000007", "7"), ("Customer#000000011", "11")}


def test_ts_pushfilters_converts_bounds_to_epoch_ns():
    """Time comparisons become integer epoch-us bounds (Spark timestamp
    precision, the domain the emitted column lives in — no float
    rounding surface); tag/val predicates have no time-range
    counterpart and return to Spark."""
    import datetime

    from hazelcast_jet_contrib_spark.sources.dsv2 import TimeSeriesStoreReader

    r = TimeSeriesStoreReader("/dev/null", "ts", "event_type", "value")
    lo = datetime.datetime(2024, 1, 10)
    hi = datetime.datetime(2024, 1, 12)
    on_tag = EqualTo(("tag",), "click")
    residual = list(
        r.pushFilters([GreaterThanOrEqual(("time",), lo), LessThan(("time",), hi), on_tag])
    )
    assert residual == [on_tag]
    assert (r.lo, r.lo_strict) == (1704844800000000, False)
    assert (r.hi, r.hi_strict) == (1705017600000000, True)


def test_ts_pushfilters_equal_to_never_relaxes_strict_bound():
    """time > v then time = v is unsatisfiable; both absorbed, so the
    range must stay empty — same tighten-only rule as the zset reader."""
    import datetime

    from hazelcast_jet_contrib_spark.sources.dsv2 import TimeSeriesStoreReader

    r = TimeSeriesStoreReader("/dev/null", "ts", "event_type", "value")
    v = datetime.datetime(2024, 3, 1, 12, 0, 0)
    assert list(r.pushFilters([GreaterThan(("time",), v), EqualTo(("time",), v)])) == []
    assert r.lo == r.hi and r.lo_strict  # (v, v] admits nothing


def test_ts_pushfilters_non_datetime_value_is_yielded():
    """A time comparison whose literal isn't a datetime (e.g. a string
    that Catalyst didn't fold) cannot be converted to ns — it must come
    back for Spark to re-check, not be silently dropped."""
    import math as _math

    from hazelcast_jet_contrib_spark.sources.dsv2 import TimeSeriesStoreReader

    r = TimeSeriesStoreReader("/dev/null", "ts", "event_type", "value")
    f = GreaterThan(("time",), "2024-01-10")
    assert list(r.pushFilters([f])) == [f]
    assert r.lo == -_math.inf and r.hi == _math.inf


def test_ts_store_end_to_end_matches_ground_truth(spark):
    """Range + residual tag predicate against the parquet ground truth;
    exactness across the ns→us truncation boundary."""
    from hazelcast_jet_contrib_spark.sources import dsv2

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dsv2.register(spark)
    path = "/root/testdata/sf0.001/events.parquet"
    df = (
        spark.read.format("ts_store")
        .option("path", path)
        .option("time_col", "ts")
        .option("tag_col", "event_type")
        .option("field_col", "value")
        .load()
        .filter(
            (F.col("time") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("time") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
            & (F.col("tag") != "click")
        )
    )
    got = {(r["tag"], r["time"], r["val"]) for r in df.collect()}
    truth = {
        (str(r["event_type"]), r["ts"], float(r["value"]))
        for r in spark.read.parquet(path)
        .filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
            & (F.col("event_type") != "click")
        )
        .select("event_type", "ts", "value")
        .collect()
    }
    assert got == truth and len(got) > 0


def test_ts_store_ns_precision_truncates_before_masking(spark, tmp_path):
    """A store column with sub-microsecond timestamps must not crash the
    reader (unsafe ns->us cast), and the absorbed strict bound must be
    evaluated on the TRUNCATED values Spark's output carries: a row at
    X+500ns truncates to X, so it is excluded by `time > X` exactly as
    Spark itself would exclude it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hazelcast_jet_contrib_spark.sources import dsv2

    base = 1_704_844_800_000_000_000  # 2024-01-10T00:00:00 in ns
    tbl = pa.table(
        {
            "tag": ["a", "b", "c", "d"],
            "ts": pa.array(
                [base + 500, base + 1_000, base + 1_500, base + 2_000],
                pa.timestamp("ns"),
            ),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    path = str(tmp_path / "ns.parquet")
    pq.write_table(tbl, path)

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dsv2.register(spark)
    df = (
        spark.read.format("ts_store")
        .option("path", path)
        .option("time_col", "ts")
        .option("tag_col", "tag")
        .option("field_col", "v")
        .load()
        .filter(F.col("time") > F.lit("2024-01-10 00:00:00").cast("timestamp"))
    )
    got = sorted((r["tag"], r["val"]) for r in df.collect())
    # base+500 truncates to X (excluded by strict >); base+1000 is X+1us
    # (included); base+1500 truncates to X+1us (included)
    assert got == [("b", 2.0), ("c", 3.0), ("d", 4.0)], got
