"""DSv2 streaming WRITER tests (VERDICT r04 item 3): the message-log
producer as a first-class DataSourceStreamWriter with per-epoch
commit/abort, replacing the foreachBatch + idempotent-wrapper pattern
for this sink. Reference contract: the XA probes' prepared-transaction
survival across disconnect (xa-test/src/main/java/.../JdbcXaTest.java:
62-97) — staged-but-uncommitted data must never be visible, and a crash
between prepare and commit must be completable on reconnect without
duplication.
"""

from __future__ import annotations

import glob
import json
import os
import time

from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.streaming import message_log

import pytest

# Driver-tier split (VERDICT r17 item 3): this module is kill/restart/
# soak/protocol ROBUSTNESS coverage, not result correctness — it runs in
# the full tier (`pytest -m "slow or not slow"`, exercised and committed
# every round) but is excluded from the default driver-facing tier so the
# driver's verify window can complete. Oracle comparisons, plan audits,
# and kernel-equality pins all stay in the default tier.
pytestmark = pytest.mark.slow



def _fill(root: str, stream: str, n_segments: int, per_seg: int, start: int = 0):
    for seg in range(start, start + n_segments):
        message_log.append_segment(
            root,
            stream,
            [{"key": f"k-{seg}-{i}", "value": f"v-{i}"} for i in range(per_seg)],
            seq=seg,
        )


def _read_all(root: str, stream: str) -> list[dict]:
    rows = []
    for seg in sorted(glob.glob(os.path.join(root, stream, "*.jsonl"))):
        with open(seg) as f:
            rows += [json.loads(line) for line in f]
    return rows


def _run(spark, src, dst, ckpt, crash_flag=None):
    stream = (
        spark.readStream.format("message_log")
        .option("path", src)
        .load()
        .withColumn("value", F.upper("value"))
    )
    w = (
        stream.writeStream.format("message_log")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
    )
    if crash_flag:
        w = w.option("injectCrashFlag", crash_flag)
    q = w.start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()


def test_stream_writer_roundtrip_and_staging_invisibility(spark, tmp_path):
    """Source log -> transform -> message_log sink: every record lands
    exactly once in the destination log (routed by its stream column),
    and nothing but committed NNNNNN.jsonl segments is visible."""
    src, dst, ckpt = (str(tmp_path / d) for d in ("src", "dst", "ckpt"))
    os.makedirs(src)
    message_log.register(spark)
    _fill(src, "orders", 3, 40)
    _fill(src, "clicks", 2, 40)

    _run(spark, src, dst, ckpt)

    got_orders = _read_all(dst, "orders")
    got_clicks = _read_all(dst, "clicks")
    assert len(got_orders) == 120 and len(got_clicks) == 80
    keys = {(r["key"], r["value"]) for r in got_orders}
    assert len(keys) == 120
    assert all(r["value"].startswith("V-") for r in got_orders)  # transform ran
    # properties/event_time survive the writer (null here)
    assert {r["seq"] for r in got_orders} == {0, 1, 2}
    # no staged dotfiles remain after commit
    assert not glob.glob(os.path.join(dst, "*", ".staged-*"))


def test_stream_writer_crash_mid_commit_then_restart_no_dupes(spark, tmp_path):
    """Kill mid-epoch: the injected fault crashes the driver-side
    commit after promoting exactly ONE staged file, leaving the epoch
    half-promoted. Restarting from the same checkpoint replays the
    epoch; the deterministic segment naming + byte-compare promotion
    must complete it with zero loss and zero duplicates."""
    src, dst, ckpt = (str(tmp_path / d) for d in ("src", "dst", "ckpt"))
    os.makedirs(src)
    message_log.register(spark)
    # two streams => at least two staged files in the epoch, so "crash
    # after the first promote" really leaves the epoch torn
    _fill(src, "a", 2, 30)
    _fill(src, "b", 2, 30)
    flag = str(tmp_path / "crash.flag")
    open(flag, "w").close()

    try:
        _run(spark, src, dst, ckpt, crash_flag=flag)
    except Exception:
        pass  # the injected mid-commit crash fails the query
    assert not os.path.exists(flag), "fault was armed but never fired"
    torn = len(glob.glob(os.path.join(dst, "*", "*.jsonl")))
    assert torn >= 1, "crash fired before anything was promoted"

    _run(spark, src, dst, ckpt)  # restart from the same checkpoint

    expected = {f"k-{s}-{i}" for s in range(2) for i in range(30)}
    for stream in ("a", "b"):
        keys = [r["key"] for r in _read_all(dst, stream)]
        assert len(keys) == len(set(keys)), f"duplicates in {stream} after replay"
        assert set(keys) == expected, f"loss in {stream} after replay"
    assert not glob.glob(os.path.join(dst, "*", ".staged-*"))


def test_stream_writer_abort_removes_staged_files(tmp_path):
    """Unit-level 2PC contract: write() stages invisible files; abort()
    removes them; a reader of the destination sees nothing."""
    from unittest import mock

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
    )
    from pyspark.sql import Row

    dst = str(tmp_path / "dst")
    writer = MessageLogStreamWriter(dst, stream=None)
    ctx = mock.Mock()
    ctx.partitionId.return_value = 7
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        msg = writer.write(
            iter(
                [
                    Row(stream="s1", key="k1", value="v1"),
                    Row(stream="s2", key="k2", value="v2"),
                ]
            )
        )
    staged = glob.glob(os.path.join(dst, "*", ".staged-*"))
    assert len(staged) == 2
    assert not glob.glob(os.path.join(dst, "*", "*.jsonl"))  # invisible
    writer.abort([msg], batchId=3)
    assert not glob.glob(os.path.join(dst, "*", ".staged-*"))
    assert message_log._segments(os.path.join(dst, "s1")) == []


def test_stream_writer_commit_is_idempotent_and_detects_foreign_segment(tmp_path):
    """Replaying a fully-committed epoch must be a no-op (byte-equal
    EEXIST skip); a foreign producer occupying the target segment with
    DIFFERENT bytes must raise, not silently drop the epoch."""
    from unittest import mock

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
    )
    from pyspark.sql import Row

    dst = str(tmp_path / "dst")
    writer = MessageLogStreamWriter(dst, stream="s")
    ctx = mock.Mock()
    ctx.partitionId.return_value = 0
    rows = [Row(key="k", value="v")]
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        m1 = writer.write(iter(rows))
    writer.commit([m1], batchId=5)
    assert len(message_log._segments(os.path.join(dst, "s"))) == 1
    # full replay of the committed epoch: stage again, commit again
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        m2 = writer.write(iter(rows))
    writer.commit([m2], batchId=5)
    segs = message_log._segments(os.path.join(dst, "s"))
    assert segs == [5 * 10**6]
    assert len(_read_all(dst, "s")) == 1
    # foreign content in the slot -> hard error
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        m3 = writer.write(iter(rows))
    with open(os.path.join(dst, "s", f"{6 * 10**6:06d}.jsonl"), "w") as f:
        f.write('{"key": "foreign"}\n')
    try:
        writer.commit([m3], batchId=6)
        raise AssertionError("expected RuntimeError on foreign segment")
    except RuntimeError:
        pass


def test_segments_ignore_staged_and_foreign_files(tmp_path):
    """ADVICE r05 (high): an in-flight staged epoch must be INVISIBLE
    to every reader path. The old parse crashed with int('') on any
    dotfile ending in .jsonl — turning 'uncommitted epochs cannot be
    consumed' into 'consuming reader dies'. Only <digits>.jsonl names
    are segments."""
    sdir = tmp_path / "s"
    sdir.mkdir()
    (sdir / "000003.jsonl").write_text('{"key": "k"}\n')
    (sdir / "7000001.jsonl").write_text('{"key": "w"}\n')  # wider than 6 digits
    # legacy-style staged dotfile that previously crashed the parse
    (sdir / ".staged-0001-42-99.jsonl").write_text("{}\n")
    (sdir / ".staged-runid-0001-42-99.staging").write_text("{}\n")
    (sdir / "notes.txt").write_text("not a segment")
    (sdir / "partial.jsonl").write_text("{}\n")  # non-numeric stem
    assert message_log._segments(str(sdir)) == [3, 7000001]


def test_staged_epoch_invisible_to_concurrent_reader_offsets(tmp_path):
    """A reader computing latestOffset over a stream WHILE another
    query's epoch is staged must neither crash nor see the staged
    data."""
    from unittest import mock

    from pyspark.sql import Row

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamReader,
        MessageLogStreamWriter,
    )

    root = str(tmp_path / "root")
    message_log.append_segment(root, "s", [{"key": "k0"}], seq=0)
    writer = MessageLogStreamWriter(root, stream="s")
    ctx = mock.Mock()
    ctx.partitionId.return_value = 0
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        writer.write(iter([Row(key="k1", value="v1")]))  # staged, not committed
    reader = MessageLogStreamReader(root)
    assert reader.latestOffset() == {"s": 1}  # staged epoch invisible
    [part] = reader.partitions({"s": 0}, {"s": 1})
    assert [r[2] for r in reader.read(part)] == ["k0"]


def test_stream_writer_stages_canonical_order(tmp_path):
    """ADVICE r05 (medium): Spark does not guarantee row order within a
    partition across epoch replays. A replay that iterates the same
    rows in a different order must stage BYTE-IDENTICAL content, or the
    idempotent-replay byte compare would misfire as 'foreign
    producer'."""
    import glob as _glob
    from unittest import mock

    from pyspark.sql import Row

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
    )

    rows = [Row(key=f"k{i}", value=f"v{i}") for i in range(5)]
    blobs = []
    for order in (rows, list(reversed(rows))):
        dst = str(tmp_path / f"dst-{len(blobs)}")
        writer = MessageLogStreamWriter(dst, stream="s")
        ctx = mock.Mock()
        ctx.partitionId.return_value = 0
        with mock.patch("pyspark.TaskContext.get", return_value=ctx):
            writer.write(iter(order))
        [staged] = _glob.glob(os.path.join(dst, "s", ".staged-*"))
        blobs.append(open(staged, "rb").read())
    assert blobs[0] == blobs[1]


def test_concurrent_writers_same_root_sweep_is_scoped(tmp_path):
    """VERDICT r05 item 6: commit()'s orphan sweep must only remove
    THIS writer's staged files. A second query staging an epoch in the
    same stream while the first commits must keep its staged epoch and
    commit it afterwards."""
    from unittest import mock

    from pyspark.sql import Row

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
    )

    root = str(tmp_path / "root")
    wa = MessageLogStreamWriter(root, stream="s")
    wb = MessageLogStreamWriter(root, stream="s")
    assert wa.run_id != wb.run_id
    ctx = mock.Mock()
    ctx.partitionId.return_value = 0
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        ma = wa.write(iter([Row(key="a", value="1")]))
        mb = wb.write(iter([Row(key="b", value="2")]))
    # B commits first; A's staged epoch must survive B's sweep
    wb.commit([mb], batchId=2)
    assert any(
        f.startswith(f".staged-{wa.run_id}-")
        for f in os.listdir(os.path.join(root, "s"))
    ), "A's in-flight staged epoch was swept by B's commit"
    wa.commit([ma], batchId=1)
    segs = message_log._segments(os.path.join(root, "s"))
    assert segs == [1 * 10**6, 2 * 10**6]
    keys = sorted(r["key"] for r in _read_all(root, "s"))
    assert keys == ["a", "b"]
    assert not glob.glob(os.path.join(root, "s", ".staged-*"))


def test_concurrent_writers_same_stream_same_epoch_raise_not_lose(tmp_path):
    """Documented-unsupported: two queries writing the SAME stream with
    colliding (batchId, partitionId) must surface the foreign-producer
    error — never silently drop an epoch."""
    from unittest import mock

    import pytest
    from pyspark.sql import Row

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
    )

    root = str(tmp_path / "root")
    wa = MessageLogStreamWriter(root, stream="s")
    wb = MessageLogStreamWriter(root, stream="s")
    ctx = mock.Mock()
    ctx.partitionId.return_value = 0
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        ma = wa.write(iter([Row(key="a", value="1")]))
        mb = wb.write(iter([Row(key="b", value="2")]))
    wa.commit([ma], batchId=0)
    with pytest.raises(RuntimeError, match="foreign producer"):
        wb.commit([mb], batchId=0)


def test_stream_writer_partition_id_overflow_raises(tmp_path):
    """ADVICE r05 (low): partitionId >= 10**6 would alias the next
    batch's segment space (batchId*10**6 + pid) — hard error at write
    time, not a spurious foreign-producer failure at commit."""
    from unittest import mock

    import pytest
    from pyspark.sql import Row

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
    )

    writer = MessageLogStreamWriter(str(tmp_path / "dst"), stream="s")
    ctx = mock.Mock()
    ctx.partitionId.return_value = 10**6
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        with pytest.raises(ValueError, match="10\\*\\*6"):
            writer.write(iter([Row(key="k", value="v")]))


def test_dead_run_staged_files_reclaimed_past_ttl(tmp_path):
    """ADVICE r06: a run that dies HARD (abort() never runs; the
    restarted query mints a new run_id) leaves staged files no
    run-id-scoped sweep can ever reclaim. commit() therefore sweeps
    FOREIGN-run staged files past a TTL — old enough that no live
    writer's in-flight epoch (seconds old) can be confused with a
    leak — while keeping fresh foreign files untouched."""
    from unittest import mock

    from pyspark.sql import Row

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
    )

    root = str(tmp_path / "root")
    sdir = os.path.join(root, "s")
    os.makedirs(sdir)
    # a dead run's orphan: staged 2 hours ago, run long gone
    dead = os.path.join(sdir, ".staged-deadbeef0000-0000-x.staging")
    open(dead, "w").write('{"key": "zombie", "value": "z"}\n')
    old = time.time() - 7200
    os.utime(dead, (old, old))
    # a live concurrent writer's fresh staged epoch
    fresh = os.path.join(sdir, ".staged-cafecafe0000-0000-y.staging")
    open(fresh, "w").write('{"key": "live", "value": "l"}\n')

    w = MessageLogStreamWriter(root, stream="s", staged_ttl_seconds=3600.0)
    ctx = mock.Mock()
    ctx.partitionId.return_value = 0
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        msg = w.write(iter([Row(key="a", value="1")]))
    w.commit([msg], batchId=1)

    names = set(os.listdir(sdir))
    assert os.path.basename(dead) not in names, "dead run's orphan not reclaimed"
    assert os.path.basename(fresh) in names, "live writer's staged epoch swept"
    # and the zombie content never became a visible segment
    keys = sorted(r["key"] for r in _read_all(root, "s"))
    assert keys == ["a"]


def test_missing_staged_file_raises_unless_segment_exists(tmp_path):
    """ADVICE r07: commit() finding a staged file GONE is only safe
    when the target segment already exists (idempotent replay of a
    crash-mid-commit epoch). If the segment does NOT exist either, the
    staged epoch was reclaimed externally (e.g. another run's TTL
    sweep raced a stalled writer) — silently skipping would lose the
    epoch's data, so commit() must fail the epoch for replay."""
    import pytest
    from unittest import mock

    from pyspark.sql import Row

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
    )

    root = str(tmp_path / "root")
    w = MessageLogStreamWriter(root, stream="s")
    ctx = mock.Mock()
    ctx.partitionId.return_value = 0
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        msg = w.write(iter([Row(key="a", value="1")]))
    # normal promotion, then a REPLAY of the same commit message whose
    # staged file is gone but whose segment exists: idempotent no-op
    w.commit([msg], batchId=1)
    assert sorted(r["key"] for r in _read_all(root, "s")) == ["a"]
    w.commit([msg], batchId=1)  # must not raise
    # a NEW epoch whose staged file vanishes before promotion (and no
    # segment was ever written): loss — must raise, never skip
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        msg2 = w.write(iter([Row(key="b", value="2")]))
    os.unlink(msg2.staged[0][1])
    with pytest.raises(RuntimeError, match="reclaimed externally"):
        w.commit([msg2], batchId=2)
    # and the lost epoch's data never became visible
    assert sorted(r["key"] for r in _read_all(root, "s")) == ["a"]


def test_compaction_keeps_latest_per_key_with_stable_offsets(tmp_path):
    """Kafka compacted-topic contract: replaying the compacted log
    reaches the same final key->value state; survivors keep their
    original segment seq; fully-superseded segments become EMPTY files
    (offsets never move); keyless records always survive; re-running
    is a no-op; segments appended after the snapshot are untouched."""
    from hazelcast_jet_contrib_spark.streaming.message_log import (
        _segments,
        compact_stream,
    )

    root = str(tmp_path / "root")
    s0 = message_log.append_segment(root, "s", [
        {"key": "a", "value": "a1"}, {"key": "b", "value": "b1"},
        {"value": "keyless-1"},
    ])
    s1 = message_log.append_segment(root, "s", [
        {"key": "a", "value": "a2"},
    ])
    s2 = message_log.append_segment(root, "s", [
        {"key": "a", "value": "a3"}, {"key": "a", "value": "a4"},
        {"key": "c", "value": "c1"},
    ])

    stats = compact_stream(root, "s")
    assert stats == {
        "segments": 3, "records_before": 7, "records_after": 4, "dropped": 3,
    }
    segs = {seq: recs for seq, recs in _by_segment(root, "s").items()}
    # segment 0: 'a'@s0 superseded, b + keyless survive
    assert [r["value"] for r in segs[s0]] == ["b1", "keyless-1"]
    # segment 1 fully superseded -> EMPTY but PRESENT
    assert segs.get(s1, []) == [] and s1 in _segments(
        str(tmp_path / "root" / "s")
    )
    # segment 2: within-segment supersede drops a3, keeps a4 + c1
    assert [r["value"] for r in segs[s2]] == ["a4", "c1"]
    # final-state equivalence
    final = {}
    for seq in sorted(segs):
        for r in segs[seq]:
            if "key" in r:
                final[r["key"]] = r["value"]
    assert final == {"a": "a4", "b": "b1", "c": "c1"}
    # idempotent
    again = compact_stream(root, "s")
    assert again["dropped"] == 0 and again["records_after"] == 4
    # dirty tail appended after a compaction run stays untouched until
    # the NEXT run, then supersedes
    message_log.append_segment(root, "s", [{"key": "b", "value": "b2"}])
    stats3 = compact_stream(root, "s")
    assert stats3["dropped"] == 1  # old b1 goes
    final2 = {
        r["key"]: r["value"]
        for recs in _by_segment(root, "s").values()
        for r in recs if "key" in r
    }
    assert final2 == {"a": "a4", "b": "b2", "c": "c1"}


def _by_segment(root: str, stream: str) -> dict[int, list[dict]]:
    import glob as _glob

    out: dict[int, list[dict]] = {}
    for p in sorted(_glob.glob(os.path.join(root, stream, "*.jsonl"))):
        seq = int(os.path.basename(p)[: -len(".jsonl")])
        with open(p) as f:
            out[seq] = [json.loads(line) for line in f]
    return out


def test_compacted_log_replays_through_the_stream_reader(spark, tmp_path):
    """After compaction the DSv2 reader replays the log end-to-end:
    empty segments are skipped harmlessly, seqs are original, and the
    latest-per-key state matches."""
    from hazelcast_jet_contrib_spark.streaming.message_log import compact_stream

    root = str(tmp_path / "root")
    message_log.append_segment(root, "s", [{"key": "k", "value": "v1"}])
    message_log.append_segment(root, "s", [{"key": "k", "value": "v2"}])
    message_log.append_segment(root, "s", [{"key": "j", "value": "w1"}])
    compact_stream(root, "s")

    message_log.register(spark)
    q = (
        spark.readStream.format("message_log").option("path", root).load()
        .writeStream.format("memory").queryName("compacted_replay")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable(); q.stop(); q.awaitTermination()
    rows = spark.sql("select seq, key, value from compacted_replay").collect()
    assert {(r["seq"], r["key"], r["value"]) for r in rows} == {
        (1, "k", "v2"), (2, "j", "w1"),
    }


def test_compaction_never_touches_staged_epochs(tmp_path):
    """Compaction runs while a writer's epoch is STAGED (invisible
    dotfile): the staged file must survive untouched and the writer's
    later commit must still promote it — compaction only ever rewrites
    committed `<digits>.jsonl` segments."""
    from unittest import mock

    from pyspark.sql import Row

    from hazelcast_jet_contrib_spark.streaming.message_log import (
        MessageLogStreamWriter,
        compact_stream,
    )

    root = str(tmp_path / "root")
    message_log.append_segment(root, "s", [{"key": "k", "value": "old"}])
    message_log.append_segment(root, "s", [{"key": "k", "value": "new"}])

    w = MessageLogStreamWriter(root, stream="s")
    ctx = mock.Mock()
    ctx.partitionId.return_value = 0
    with mock.patch("pyspark.TaskContext.get", return_value=ctx):
        msg = w.write(iter([Row(key="z", value="staged-epoch")]))
    staged_path = msg.staged[0][1]
    before = open(staged_path).read()

    stats = compact_stream(root, "s")
    assert stats["dropped"] == 1  # old 'k' superseded
    assert open(staged_path).read() == before, "staged file rewritten!"

    w.commit([msg], batchId=7)
    vals = sorted(r["value"] for r in _read_all(root, "s"))
    assert vals == ["new", "staged-epoch"]


def test_stream_sink_2pc_roundtrip_staged_r17_driver_comparison(spark):
    """The STAGED round-17 K4 driver row (the 2PC epoch-committed
    streaming writer driven by a REAL streaming query with per-row
    stream routing) run through the EXACT driver comparison — the same
    forward-staging discipline as the SSE/WS sink rows: a later round
    promotes the pair with @query and changes nothing else."""
    from hazelcast_jet_contrib_spark.queries_connectors import (
        STREAM_SINK_2PC_ROUNDTRIP_ORACLE,
        stream_sink_2pc_roundtrip,
    )
    from tests.conftest import CORRECTNESS_SF, compare_with_oracle

    compare_with_oracle(
        spark,
        "stream_sink_2pc_roundtrip",
        CORRECTNESS_SF,
        queries={"stream_sink_2pc_roundtrip": stream_sink_2pc_roundtrip},
        oracles={"stream_sink_2pc_roundtrip": STREAM_SINK_2PC_ROUNDTRIP_ORACLE},
    )
