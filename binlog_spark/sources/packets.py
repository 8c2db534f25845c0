"""MySQL dump-protocol packet framing (P3) as a batch/stream source stage.

The reference reads the wire one packet at a time on a socket
(``readPacket``, /root/reference/dump/packets.go:32-102): 3-byte LE length
+ 1-byte sequence id, sequence-sync check, and reassembly of payloads
split at the 16 MiB (2^24-1) boundary — a zero-length packet terminates a
previous exact-multiple split. Our engine's equivalent consumes *captured
dump-stream blobs* (one blob per connection segment, e.g. from an
object-store landing zone) and splits them vectorized inside
``mapInPandas``: framing state never crosses a blob, so blobs parallelize
freely across executors while the byte-walk inside each blob stays
sequential exactly like the reference's loop.

The dump stream wraps each binlog event in a packet whose first payload
byte is the OK/ERR/EOF marker (slave_conn.go:83-110): 0x00=OK (event
follows), 0xFE=EOF, 0xFF=ERR. ``frames_from_dump_blobs`` strips the
marker and classifies, the distributed analogue of the reference's pump
goroutine.
"""

from __future__ import annotations

from typing import Iterator

MAX_PACKET_SIZE = (1 << 24) - 1

PKT_OK = 0x00
PKT_EOF = 0xFE
PKT_ERR = 0xFF


class PacketSyncError(ValueError):
    """Sequence-id mismatch (reference ErrPktSync/ErrPktSyncMul)."""


class MalformedPacketError(ValueError):
    """Zero-length terminator with no preceding split packet."""


def iter_packets(blob: bytes, start_sequence: int = 0) -> Iterator[bytes]:
    """Split one captured dump-stream blob into reassembled packets.

    Mirrors readPacket (dump/packets.go:32-102): LE24 length + sequence
    byte per wire packet; payloads of exactly 2^24-1 bytes continue into
    the next packet; a zero-length packet terminates such a chain.
    Raises PacketSyncError on a sequence gap, MalformedPacketError on a
    dangling terminator or truncated buffer.
    """
    pos = 0
    seq = start_sequence
    prev = None
    n = len(blob)
    while pos < n:
        if pos + 4 > n:
            raise MalformedPacketError(f"truncated packet header at {pos}")
        pkt_len = blob[pos] | blob[pos + 1] << 8 | blob[pos + 2] << 16
        got_seq = blob[pos + 3]
        if got_seq != seq & 0xFF:
            raise PacketSyncError(
                f"packet out of sync at {pos}: got seq {got_seq}, "
                f"want {seq & 0xFF}")
        seq += 1
        pos += 4
        if pkt_len == 0:
            if prev is None:
                raise MalformedPacketError(
                    f"zero-length packet with no previous split at {pos}")
            yield bytes(prev)
            prev = None
            continue
        if pos + pkt_len > n:
            raise MalformedPacketError(f"truncated packet body at {pos}")
        data = blob[pos : pos + pkt_len]
        pos += pkt_len
        if pkt_len < MAX_PACKET_SIZE:
            if prev is None:
                yield bytes(data)
            else:
                prev.extend(data)
                yield bytes(prev)
                prev = None
        else:
            if prev is None:
                prev = bytearray(data)
            else:
                prev.extend(data)
    if prev is not None:
        raise MalformedPacketError("stream ended mid-split-packet")


def packetize_stream(payloads, start_sequence: int = 0) -> bytes:
    """Inverse of ``iter_packets`` (test/bench generator): wrap payloads in
    wire packets, splitting at the 2^24-1 boundary like the server does."""
    out = bytearray()
    seq = start_sequence

    def emit(chunk: bytes):
        nonlocal seq
        out.extend(len(chunk).to_bytes(3, "little"))
        out.append(seq & 0xFF)
        out.extend(chunk)
        seq += 1

    for p in payloads:
        pos = 0
        while len(p) - pos >= MAX_PACKET_SIZE:
            emit(p[pos : pos + MAX_PACKET_SIZE])
            pos += MAX_PACKET_SIZE
        emit(p[pos:])  # final short packet (possibly empty terminator)
    return bytes(out)


def iter_dump_events(blob: bytes, start_sequence: int = 0):
    """Classify dump-stream packets → ('ok', event_bytes) | ('eof'|'err',
    payload). The event bytes have the 1-byte OK marker stripped, as the
    reference's pump does (slave_conn.go:83-110)."""
    for pkt in iter_packets(blob, start_sequence):
        if not pkt:
            continue
        marker = pkt[0]
        if marker == PKT_OK:
            yield "ok", pkt[1:]
        elif marker == PKT_EOF:
            yield "eof", pkt[1:]
        elif marker == PKT_ERR:
            yield "err", pkt[1:]
        else:  # not a dump stream marker: raw packet (e.g. handshake)
            yield "raw", pkt


def frames_from_dump_blobs(spark, blobs_df, out_schema="blob_id string, "
                           "seq int, status string, frame binary"):
    """Distributed framing: DataFrame(blob_id string, blob binary) →
    one row per dump packet. Each blob is framed independently (framing
    state never crosses blobs), so this is a stateless, shuffle-free
    ``mapInPandas`` stage like the main decode."""
    import pandas as pd

    def _frame(batches):
        for pdf in batches:
            ids, seqs, statuses, frames = [], [], [], []
            for blob_id, blob in zip(pdf["blob_id"], pdf["blob"]):
                for i, (status, payload) in enumerate(iter_dump_events(blob)):
                    ids.append(blob_id)
                    seqs.append(i)
                    statuses.append(status)
                    frames.append(bytes(payload))
            yield pd.DataFrame({"blob_id": ids, "seq": seqs,
                                "status": statuses, "frame": frames})

    return blobs_df.select("blob_id", "blob").mapInPandas(
        _frame, schema=out_schema)
