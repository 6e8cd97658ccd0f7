"""Unit tests for text-analysis functions on hand-written (non-synthetic)
multilingual samples — validates the heuristics themselves, independent
of the oracle mirror checks in test_correctness_oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.functions import text as TX


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (1, "en", "The cat sat on the mat and it was happy with this."),
        (2, "es", "El perro corre por el parque y los gatos duermen como una piedra."),
        (3, "de", "Der Hund läuft durch den Park und die Katze ist nicht da."),
        (4, "fr", "Le chien court dans le parc et les chats dorment pour une heure."),
        (5, "zh", "猫坐在垫子上它很开心"),
        (6, "und", "xyzzy plugh foobar"),
    ]
    return spark.createDataFrame(rows, "id long, expected string, text string")


def test_lang_id_on_real_sentences(spark, samples):
    out = samples.select("expected", TX.lang_id("text").alias("got")).collect()
    for r in out:
        assert r["got"] == r["expected"], r


def test_fingerprint_invariant_under_reorder(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "delta gamma beta alpha")], "id long, text string"
    )
    fps = [r["fp"] for r in df.select(TX.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_word_shingles_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, ""), (4, "one two three")], "id long, text string"
    )
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", TX.word_shingles("text", 3).alias("sh")).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == ["one two three"]


def test_char_shingles(spark):
    df = spark.createDataFrame([(1, "abcdef"), (2, "abc")], "id long, text string")
    got = {
        r["id"]: r["sh"] for r in df.select("id", TX.shingles("text", 5).alias("sh")).collect()
    }
    assert got[1] == ["abcde", "bcdef"]
    assert got[2] == []


def test_quality_score_orders_sensibly(spark):
    df = spark.createDataFrame(
        [
            (1, "The report describes the data and the methods in detail " * 5),
            (2, "!!! ??? 123 456 ... ;;; %%% "),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["q"] for r in df.select("id", TX.quality_score("text").alias("q")).collect()}
    assert got[1] > got[2]
    assert 0.0 <= got[2] < got[1] <= 1.0


def test_token_estimate_counts_symbols(spark):
    df = spark.createDataFrame([(1, "hello, world! 42")], "id long, text string")
    # hello , world ! 42  -> 5
    assert df.select(TX.token_estimate("text").alias("t")).collect()[0]["t"] == 5
