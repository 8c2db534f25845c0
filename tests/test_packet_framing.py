"""Packet-framing (P3) tests mirroring the reference's
dump/packets_test.go:83-273: single-byte packet, wrong sequence id,
16 MiB split reassembly, short reads, and the dump-stream OK/EOF/ERR
classification of slave_conn.go."""

import pytest

from binlog_spark.sources.packets import (
    MAX_PACKET_SIZE,
    MalformedPacketError,
    PacketSyncError,
    iter_dump_events,
    iter_packets,
    packetize_stream,
)


def wire(*payloads, start=0):
    return packetize_stream(list(payloads), start_sequence=start)


def test_single_byte_packet():
    assert list(iter_packets(wire(b"\x01"))) == [b"\x01"]


def test_multiple_packets_sequence():
    blob = wire(b"abc", b"defgh")
    assert list(iter_packets(blob)) == [b"abc", b"defgh"]


def test_wrong_sequence_id():
    blob = bytearray(wire(b"abc"))
    blob[3] = 7  # corrupt the sequence byte (reference ErrPktSync)
    with pytest.raises(PacketSyncError):
        list(iter_packets(bytes(blob)))


def test_exact_16mb_split_reassembles():
    big = bytes(range(256)) * (MAX_PACKET_SIZE // 256) + b"x" * (
        MAX_PACKET_SIZE % 256)
    assert len(big) == MAX_PACKET_SIZE
    # a payload of exactly 2^24-1 is followed by a zero-length terminator
    blob = wire(big)
    [got] = iter_packets(blob)
    assert got == big


def test_over_16mb_split_reassembles():
    big = b"z" * (MAX_PACKET_SIZE + 12345)
    blob = wire(big)
    [got] = iter_packets(blob)
    assert got == big


def test_truncated_body_raises():
    blob = wire(b"abcdef")[:-2]
    with pytest.raises(MalformedPacketError):
        list(iter_packets(blob))


def test_dangling_terminator_raises():
    blob = b"\x00\x00\x00\x00"  # zero-length packet, no previous split
    with pytest.raises(MalformedPacketError):
        list(iter_packets(blob))


def test_stream_ending_mid_split_raises():
    big = b"z" * MAX_PACKET_SIZE
    # drop the terminator packet: keep only the first wire packet
    blob = wire(big)[: 4 + MAX_PACKET_SIZE]
    with pytest.raises(MalformedPacketError):
        list(iter_packets(blob))


def test_dump_event_classification():
    blob = wire(b"\x00event-one", b"\x00event-two", b"\xfe\x00\x00",
                b"\xff\x12\x34error!")
    got = list(iter_dump_events(blob))
    assert got[0] == ("ok", b"event-one")
    assert got[1] == ("ok", b"event-two")
    assert got[2][0] == "eof"
    assert got[3][0] == "err"


def test_distributed_framing(spark):
    from binlog_spark.sources.packets import frames_from_dump_blobs

    blobs = [("b0", wire(b"\x00frameA", b"\x00frameB", b"\xfe")),
             ("b1", wire(b"\x00frameC"))]
    df = spark.createDataFrame(blobs, "blob_id string, blob binary")
    rows = {(r["blob_id"], r["seq"]): (r["status"], bytes(r["frame"]))
            for r in frames_from_dump_blobs(spark, df).collect()}
    assert rows[("b0", 0)] == ("ok", b"frameA")
    assert rows[("b0", 1)] == ("ok", b"frameB")
    assert rows[("b0", 2)][0] == "eof"
    assert rows[("b1", 0)] == ("ok", b"frameC")
