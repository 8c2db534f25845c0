"""MySQL binary JSON (JSONB) document decoder.

MySQL 5.7+ stores JSON columns in row events as a binary document (the
public ``json_binary`` format: a 1-byte type then the payload; objects
and arrays are offset tables over inline-or-pointed values). The
reference explicitly does NOT support the JSON column type
(`/root/reference/replication/binlog_event.go:4-5` "Not supported now:
the JSON type"); this module is a deliberate superset, built from the
published format only, so JSON columns decode to their canonical text
instead of dead-lettering.

Layout (all integers little-endian):

* type 0x00/0x01 object (small/large), 0x02/0x03 array (small/large):
  payload = count, total-size (2 bytes each small / 4 large), then for
  objects ``count`` key entries (key-offset small 2 / large 4 + key-len
  2), then ``count`` value entries (1-byte type + inlined-value-or-offset
  small 2 / large 4), then the key bytes, then the non-inlined values.
  Offsets are relative to the start of the payload.
* inlinable in a value entry: literal / int16 / uint16 (small format),
  plus int32 / uint32 (large format).
* 0x04 literal: one byte — 0x00 null, 0x01 true, 0x02 false.
* 0x05-0x0a int16/uint16/int32/uint32/int64/uint64; 0x0b double.
* 0x0c string: varint length (base-128, low 7 bits first, high bit =
  continuation) + utf8mb4 bytes.
* 0x0f opaque: SQL scalars stored verbatim with a field-type byte +
  varint length. DECIMAL decodes through the engine's packed-decimal
  reader to an exact unquoted number; DATE/TIME/DATETIME/TIMESTAMP
  unpack the public in-memory packed longlong (my_time.h) and render as
  quoted text with 6-digit microseconds, matching the server's JSON
  output. Other opaque field types raise ValueError (dead-letter
  upstream).

Text rendering matches MySQL's (``", "`` / ``": "`` separators, keys in
stored order, shortest-round-trip doubles via Python repr).
"""

from __future__ import annotations

import json

T_SMALL_OBJECT = 0x00
T_LARGE_OBJECT = 0x01
T_SMALL_ARRAY = 0x02
T_LARGE_ARRAY = 0x03
T_LITERAL = 0x04
T_INT16 = 0x05
T_UINT16 = 0x06
T_INT32 = 0x07
T_UINT32 = 0x08
T_INT64 = 0x09
T_UINT64 = 0x0A
T_DOUBLE = 0x0B
T_STRING = 0x0C
T_OPAQUE = 0x0F

LIT_NULL, LIT_TRUE, LIT_FALSE = 0x00, 0x01, 0x02

_INLINE_SMALL = (T_LITERAL, T_INT16, T_UINT16)
_INLINE_LARGE = _INLINE_SMALL + (T_INT32, T_UINT32)


def _read_varint(data, pos: int):
    """Base-128 length (strings/opaques) → (value, new_pos); max 5 bytes
    like the server's reader."""
    v = shift = 0
    for i in range(5):
        b = data[pos + i]
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos + i + 1
        shift += 7
    raise ValueError("jsonb: varint longer than 5 bytes")


def _int(data, pos: int, width: int, signed: bool) -> int:
    return int.from_bytes(data[pos : pos + width], "little", signed=signed)


def _inlined(t: int, data, pos: int, large: bool):
    """Value inlined in an object/array entry (2 bytes small, 4 large)."""
    if t == T_LITERAL:
        return _literal(data[pos])
    if t == T_INT16:
        return _int(data, pos, 2, True)
    if t == T_UINT16:
        return _int(data, pos, 2, False)
    if large and t == T_INT32:
        return _int(data, pos, 4, True)
    if large and t == T_UINT32:
        return _int(data, pos, 4, False)
    raise ValueError(f"jsonb: type {t:#x} is not inlinable")


def _literal(b: int):
    if b == LIT_NULL:
        return None
    if b == LIT_TRUE:
        return True
    if b == LIT_FALSE:
        return False
    raise ValueError(f"jsonb: bad literal {b:#x}")


def _value(t: int, data, pos: int):
    """One typed value whose payload starts at ``pos`` → Python object."""
    if t in (T_SMALL_OBJECT, T_LARGE_OBJECT):
        return _container(data, pos, large=t == T_LARGE_OBJECT,
                          is_object=True)
    if t in (T_SMALL_ARRAY, T_LARGE_ARRAY):
        return _container(data, pos, large=t == T_LARGE_ARRAY,
                          is_object=False)
    if t == T_LITERAL:
        return _literal(data[pos])
    if t == T_INT16:
        return _int(data, pos, 2, True)
    if t == T_UINT16:
        return _int(data, pos, 2, False)
    if t == T_INT32:
        return _int(data, pos, 4, True)
    if t == T_UINT32:
        return _int(data, pos, 4, False)
    if t == T_INT64:
        return _int(data, pos, 8, True)
    if t == T_UINT64:
        return _int(data, pos, 8, False)
    if t == T_DOUBLE:
        import struct

        return struct.unpack_from("<d", data, pos)[0]
    if t == T_STRING:
        ln, p = _read_varint(data, pos)
        return bytes(data[p : p + ln]).decode("utf-8")
    if t == T_OPAQUE:
        return _opaque(data, pos)
    raise ValueError(f"jsonb: unknown type byte {t:#x}")


def _opaque(data, pos: int):
    """Opaque scalar: SQL values stored verbatim inside a JSON document
    (field-type byte + varint length + the value's packed bytes). The
    server renders DECIMAL as an exact unquoted number and DATE/TIME/
    DATETIME/TIMESTAMP as quoted text with 6-digit microseconds; the
    packed layouts are the public in-memory forms (my_time.h
    TIME_to_longlong_*_packed, the same 17/5/12/6/24-bit fields as the
    DATETIME2 wire format)."""
    from decimal import Decimal

    from . import constants as C

    ftype = data[pos]
    ln, p = _read_varint(data, pos + 1)
    if ftype in (C.TYPE_DECIMAL, C.TYPE_NEWDECIMAL):
        from . import codec

        precision, scale = data[p], data[p + 1]
        digits, _ = codec._decode_new_decimal(
            data, p + 2, (precision << 8) | scale)
        return Decimal(digits.decode())
    if ln != 8:
        raise ValueError(f"jsonb: opaque field {ftype:#x} length {ln}")
    packed = _int(data, p, 8, True)
    if ftype == C.TYPE_TIME:
        neg = packed < 0
        if neg:
            packed = -packed
        frac = packed & 0xFFFFFF
        hms = packed >> 24
        h, m, s = hms >> 12, (hms >> 6) & 63, hms & 63
        return f"{'-' if neg else ''}{h:02d}:{m:02d}:{s:02d}.{frac:06d}"
    if ftype in (C.TYPE_DATE, C.TYPE_NEWDATE, C.TYPE_DATETIME,
                 C.TYPE_TIMESTAMP):
        frac = packed & 0xFFFFFF
        ymdhms = packed >> 24
        hms = ymdhms & 0x1FFFF
        ymd = ymdhms >> 17
        day = ymd & 31
        year, month = divmod(ymd >> 5, 13)
        if ftype in (C.TYPE_DATE, C.TYPE_NEWDATE):
            return f"{year:04d}-{month:02d}-{day:02d}"
        h, m, s = hms >> 12, (hms >> 6) & 63, hms & 63
        return (f"{year:04d}-{month:02d}-{day:02d} "
                f"{h:02d}:{m:02d}:{s:02d}.{frac:06d}")
    raise ValueError(f"jsonb: opaque field type {ftype:#x} unsupported")


def _container(data, base: int, large: bool, is_object: bool):
    w = 4 if large else 2
    count = _int(data, base, w, False)
    size = _int(data, base + w, w, False)
    if base + size > len(data):
        raise ValueError("jsonb: container size exceeds document")
    inline_ok = _INLINE_LARGE if large else _INLINE_SMALL
    entries_at = base + 2 * w + (count * (w + 2) if is_object else 0)
    keys = []
    if is_object:
        kpos = base + 2 * w
        for i in range(count):
            koff = _int(data, kpos, w, False)
            klen = _int(data, kpos + w, 2, False)
            keys.append(bytes(
                data[base + koff : base + koff + klen]).decode("utf-8"))
            kpos += w + 2
    values = []
    epos = entries_at
    for i in range(count):
        t = data[epos]
        if t in inline_ok:
            values.append(_inlined(t, data, epos + 1, large))
        else:
            voff = _int(data, epos + 1, w, False)
            values.append(_value(t, data, base + voff))
        epos += 1 + w
    return dict(zip(keys, values)) if is_object else values


def decode_value(payload: bytes):
    """Whole JSONB document (type byte + payload) → Python object.
    An empty payload is SQL's literal JSON ``null`` (the server writes
    zero bytes for it in row images)."""
    if not payload:
        return None
    return _value(payload[0], payload, 1)


def _dump(v) -> str:
    """MySQL-style JSON text: ``", "``/``": "`` separators, stored key
    order, repr doubles, and exact unquoted Decimals (opaque DECIMAL
    scalars keep their scale — json.dumps cannot express that)."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_dump(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(
            f"{json.dumps(k, ensure_ascii=False)}: {_dump(x)}"
            for k, x in v.items()) + "}"
    return str(v)  # int, float (repr == shortest round trip), Decimal


def to_text(payload: bytes) -> str:
    """JSONB document → canonical JSON text (MySQL rendering)."""
    return _dump(decode_value(payload))


# ---------------------------------------------------------------------------
# encoder — the test/generator factory side (the engine only decodes;
# this is the analogue of the reference's binlog_event_make.go: produce
# server-faithful bytes so the decoder is tested against real layouts)
# ---------------------------------------------------------------------------


def _write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _scalar(obj):
    """Python scalar → (type, standalone payload). Int width selection
    mirrors the server: smallest signed, then unsigned, 16→32→64."""
    if obj is None:
        return T_LITERAL, bytes([LIT_NULL])
    if obj is True:
        return T_LITERAL, bytes([LIT_TRUE])
    if obj is False:
        return T_LITERAL, bytes([LIT_FALSE])
    if isinstance(obj, int):
        if -(1 << 15) <= obj < 1 << 15:
            return T_INT16, obj.to_bytes(2, "little", signed=True)
        if 0 <= obj < 1 << 16:
            return T_UINT16, obj.to_bytes(2, "little")
        if -(1 << 31) <= obj < 1 << 31:
            return T_INT32, obj.to_bytes(4, "little", signed=True)
        if 0 <= obj < 1 << 32:
            return T_UINT32, obj.to_bytes(4, "little")
        if -(1 << 63) <= obj < 1 << 63:
            return T_INT64, obj.to_bytes(8, "little", signed=True)
        if 0 <= obj < 1 << 64:
            return T_UINT64, obj.to_bytes(8, "little")
        raise ValueError(f"jsonb: integer out of 64-bit range: {obj}")
    if isinstance(obj, float):
        import struct

        return T_DOUBLE, struct.pack("<d", obj)
    if isinstance(obj, str):
        raw = obj.encode("utf-8")
        return T_STRING, _write_varint(len(raw)) + raw
    raise TypeError(f"jsonb: cannot encode {type(obj).__name__}")


def _encode(obj):
    """Any supported Python object → (type, standalone payload)."""
    if isinstance(obj, dict):
        # server stores keys sorted by (length, bytes), duplicates dropped
        items = sorted(((str(k).encode("utf-8"), v)
                        for k, v in obj.items()),
                       key=lambda kv: (len(kv[0]), kv[0]))
        return _encode_container([(k, _encode(v)) for k, v in items],
                                 is_object=True)
    if isinstance(obj, (list, tuple)):
        return _encode_container([(None, _encode(v)) for v in obj],
                                 is_object=False)
    return _scalar(obj)


def _encode_container(items, is_object: bool):
    for large in (False, True):
        w = 4 if large else 2
        inline_ok = _INLINE_LARGE if large else _INLINE_SMALL
        count = len(items)
        header_len = 2 * w + (count * (w + 2) if is_object else 0) \
            + count * (1 + w)
        keys = b"".join(k for k, _ in items) if is_object else b""
        # lay out the non-inlined value payloads after header + keys
        voff = header_len + len(keys)
        entries = []
        values = bytearray()
        for _k, (t, payload) in items:
            if t in inline_ok:
                entries.append((t, payload.ljust(w, b"\x00"), None))
            else:
                entries.append((t, None, voff + len(values)))
                values += payload
        size = header_len + len(keys) + len(values)
        if not large and size > 0xFFFF:
            continue  # retry with 4-byte offsets
        out = bytearray()
        out += count.to_bytes(w, "little") + size.to_bytes(w, "little")
        if is_object:
            koff = header_len
            for k, _ in items:
                out += koff.to_bytes(w, "little")
                out += len(k).to_bytes(2, "little")
                koff += len(k)
        for t, inline, off in entries:
            out += bytes([t])
            out += inline if inline is not None \
                else off.to_bytes(w, "little")
        out += keys + values
        t_container = (
            (T_LARGE_OBJECT if large else T_SMALL_OBJECT) if is_object
            else (T_LARGE_ARRAY if large else T_SMALL_ARRAY))
        return t_container, bytes(out)
    raise AssertionError("unreachable: large format always fits")


def encode_value(obj) -> bytes:
    """Python object → whole JSONB document (type byte + payload)."""
    t, payload = _encode(obj)
    return bytes([t]) + payload
