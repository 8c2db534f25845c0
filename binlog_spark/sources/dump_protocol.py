"""MySQL dump-protocol client: the live source boundary (P1/P2/P4/P5/P6).

The reference opens a raw client connection, authenticates, issues
``COM_BINLOG_DUMP`` and pumps the event stream
(`/root/reference/dump/connection.go:32-114`, `dump/packets.go:161-356`,
`dump/packets.go:991-1007`, `slave_conn.go:66-113`). This module is the
same surface re-built from the public MySQL client/server protocol:

* ``parse_dsn`` — ``user:pass@tcp(host:port)/db?params`` (P1,
  `dump/dsn.go:260-358` format);
* ``parse_handshake`` / ``native_password_scramble`` /
  ``make_handshake_response`` — HandshakeV10 decode + the
  mysql_native_password scramble (SHA1(pwd) XOR SHA1(salt+SHA1(SHA1(pwd))))
  (P2, `dump/packets.go:245-356`);
* ``make_com_query`` — session setup commands like
  ``SET @master_binlog_checksum=…`` (P4, `dump/connection.go:204-241`);
* ``make_com_binlog_dump`` — the dump request (P5,
  `dump/packets.go:991-1007`, opcode `dump/const.go:75`);
* ``DumpClient`` — a blocking socket client composing the above, yielding
  raw binlog event frames (P6's pump, minus the goroutine: in Spark the
  consumer is the microbatch loop);
* ``frames_with_positions`` — ROTATE/header position bookkeeping (P11)
  turning the frame stream into the engine's ``(file, pos, etype, frame)``
  rows, ready for ``genlog.write_frames_parquet`` landing or direct
  ``spark.createDataFrame``.

There is no MySQL server in this sandbox; the protocol path is gated by
an in-process fake server in tests (tests/test_dump_protocol.py) that
speaks handshake + OK + a packetized dump stream — the same mocked-
connection strategy the reference uses (`slave_conn_test.go:15-186`).
Auth support matches the reference: mysql_native_password first, with a
single AuthSwitch retry into old-password (DSN ``allowOldPasswords=1``),
cleartext (``allowCleartextPasswords=1``) or a re-saulted native round
(`dump/connection.go:265-307`). TLS: DSN ``tls=true`` (verified) or
``tls=skip-verify`` upgrades via SSLRequest before the handshake
response, mirroring `dump/connection.go`'s ErrNoTLS capability check.
"""

from __future__ import annotations

import hashlib
import re
import socket
import struct
from dataclasses import dataclass, field
from urllib.parse import parse_qsl

from ..wire import constants as C
from ..wire import events as E
from ..wire.collations import DEFAULT_COLLATION, collation_id
from .packets import MAX_PACKET_SIZE, PKT_EOF, PKT_ERR, PKT_OK

# capability flags (public protocol constants)
CLIENT_LONG_PASSWORD = 0x00000001
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SSL = 0x00000800
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000
CLIENT_CONNECT_WITH_DB = 0x00000008

COM_QUERY = 0x03
COM_BINLOG_DUMP = 0x12  # dump/const.go:75
COM_STMT_PREPARE = 0x16  # dump/const.go:79
COM_STMT_EXECUTE = 0x17  # dump/const.go:80
COM_STMT_CLOSE = 0x19

BINLOG_DUMP_NON_BLOCK = 0x01

FLAG_UNSIGNED = 0x20  # column-definition field flag (dump/const.go fieldFlag)


_DSN_RE = re.compile(
    r"^(?:(?P<user>[^:@]*)(?::(?P<password>[^@]*))?@)?"
    r"(?:(?P<net>tcp|unix)\((?P<addr>[^)]*)\))?"
    r"/(?P<db>[^?]*)(?:\?(?P<params>.*))?$")


@dataclass
class DsnConfig:
    user: str = ""
    password: str = ""
    net: str = "tcp"
    addr: str = "127.0.0.1:3306"
    db: str = ""
    params: dict = field(default_factory=dict)

    @property
    def host(self) -> str:
        return self.addr.rsplit(":", 1)[0]

    @property
    def port(self) -> int:
        parts = self.addr.rsplit(":", 1)
        return int(parts[1]) if len(parts) == 2 else 3306


# ---- named TLS configs + SQL escaping (reference dump/utils.go:41-61,
# 603-731) -------------------------------------------------------------------

_TLS_CONFIGS: dict = {}


def _read_bool(v: str):
    """(value, valid) bool parse — `dump/utils.go readBool` table."""
    if v in ("1", "true", "TRUE", "True"):
        return True, True
    if v in ("0", "false", "FALSE", "False"):
        return False, True
    return False, False


def register_tls_config(key: str, ctx) -> None:
    """Register an ``ssl.SSLContext`` under ``key`` for DSNs using
    ``?tls=<key>`` — the reference's per-DSN named-config registry
    (`dump/utils.go:41-52 RegisterTLSConfig`): bool-ish keys and
    ``skip-verify`` are reserved for the built-in modes."""
    _, is_bool = _read_bool(key)
    if is_bool or key.lower() == "skip-verify":
        raise ValueError(f"key {key!r} is reserved")
    _TLS_CONFIGS[key] = ctx


def deregister_tls_config(key: str) -> None:
    _TLS_CONFIGS.pop(key, None)


def escape_string_backslash(v: str) -> str:
    """Backslash-escape a SQL string literal body — byte-for-byte the
    reference table (`dump/utils.go:603-668`: NUL, \\n, \\r, ^Z, quotes,
    backslash)."""
    out = []
    for c in v:
        if c == "\x00":
            out.append("\\0")
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        elif c == "\x1a":
            out.append("\\Z")
        elif c == "'":
            out.append("\\'")
        elif c == '"':
            out.append('\\"')
        elif c == "\\":
            out.append("\\\\")
        else:
            out.append(c)
    return "".join(out)


def escape_string_quotes(v: str) -> str:
    """Quote-doubling escape for NO_BACKSLASH_ESCAPES servers
    (`dump/utils.go:693-731`)."""
    return v.replace("'", "''")


def quote_identifier(name: str) -> str:
    """Backtick-quote a schema object name; embedded backticks double
    (MySQL quoted-identifier rule — the reference interpolates
    ``desc `db`.`tbl``` for its table mapper)."""
    return "`" + name.replace("`", "``") + "`"


def parse_dsn(dsn: str) -> DsnConfig:
    """P1: ``user:pass@tcp(host:port)/db?param=value`` → config."""
    m = _DSN_RE.match(dsn)
    if not m:
        raise ValueError(f"invalid DSN: {dsn!r}")
    g = m.groupdict()
    return DsnConfig(
        user=g["user"] or "",
        password=g["password"] or "",
        net=g["net"] or "tcp",
        addr=g["addr"] or "127.0.0.1:3306",
        db=g["db"] or "",
        params=dict(parse_qsl(g["params"] or "")),
    )


@dataclass
class Handshake:
    protocol_version: int
    server_version: str
    connection_id: int
    auth_data: bytes  # scramble salt (8 + up to 12 bytes, NUL trimmed)
    capabilities: int
    charset: int
    status: int
    auth_plugin: str


def parse_handshake(payload: bytes) -> Handshake:
    """Decode the server's HandshakeV10 packet (public protocol layout)."""
    if payload and payload[0] == PKT_ERR:
        code = struct.unpack_from("<H", payload, 1)[0]
        raise ConnectionError(f"server refused connection: error {code}")
    proto = payload[0]
    if proto != 10:
        raise ValueError(f"unsupported handshake protocol {proto}")
    end = payload.index(b"\x00", 1)
    server_version = payload[1:end].decode()
    pos = end + 1
    conn_id = struct.unpack_from("<I", payload, pos)[0]
    pos += 4
    auth1 = payload[pos : pos + 8]
    pos += 8 + 1  # 8 bytes + filler
    cap_low = struct.unpack_from("<H", payload, pos)[0]
    pos += 2
    charset = status = 0
    cap = cap_low
    auth2 = b""
    plugin = ""
    if pos < len(payload):
        charset = payload[pos]
        status = struct.unpack_from("<H", payload, pos + 1)[0]
        cap_high = struct.unpack_from("<H", payload, pos + 3)[0]
        cap = cap_low | cap_high << 16
        auth_len = payload[pos + 5]
        pos += 6 + 10  # skip reserved
        if cap & CLIENT_SECURE_CONNECTION:
            # part-2 field is max(13, auth_len-8) bytes, of which the salt
            # is exactly max(12, auth_len-9): strip only the single NUL
            # terminator, never legitimate trailing 0x00 salt bytes
            n = max(13, auth_len - 8)
            auth2 = payload[pos : pos + max(12, auth_len - 9)]
            pos += n
        if cap & CLIENT_PLUGIN_AUTH and pos < len(payload):
            zero = payload.find(b"\x00", pos)
            plugin = payload[pos : zero if zero >= 0 else len(payload)].decode()
    return Handshake(proto, server_version, conn_id, auth1 + auth2, cap,
                     charset, status, plugin)


def native_password_scramble(password: str, salt: bytes) -> bytes:
    """mysql_native_password: SHA1(pwd) XOR SHA1(salt + SHA1(SHA1(pwd)))."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(salt + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


_RND_MAX = 0x3FFFFFFF


def _pw_hash(data: bytes):
    """Pre-4.1 MySQL password hash (public algorithm; spaces/tabs in the
    password are skipped, results masked to 31 bits)."""
    nr, nr2, add = 1345345333, 0x12345671, 7
    for c in data:
        if c in (0x20, 0x09):
            continue
        nr ^= ((((nr & 63) + add) * c) + (nr << 8)) & 0xFFFFFFFF
        nr &= 0xFFFFFFFF
        nr2 = (nr2 + ((nr2 << 8) ^ nr)) & 0xFFFFFFFF
        add = (add + c) & 0xFFFFFFFF
    return nr & 0x7FFFFFFF, nr2 & 0x7FFFFFFF


def old_password_scramble(password: str, salt: bytes) -> bytes:
    """mysql_old_password: the classic 8-byte scramble — two 31-bit
    hashes seed the MariaDB-compatible PRNG, 8 bytes + XOR mask
    (reference parity: `dump/utils.go` scrambleOldPassword/pwHash/myRnd,
    itself the public pre-4.1 protocol)."""
    if not password:
        return b""
    hp = _pw_hash(password.encode())
    hs = _pw_hash(salt[:8])
    seed1 = (hp[0] ^ hs[0]) % _RND_MAX
    seed2 = (hp[1] ^ hs[1]) % _RND_MAX

    def next_byte():
        nonlocal seed1, seed2
        seed1 = (seed1 * 3 + seed2) % _RND_MAX
        seed2 = (seed1 + seed2 + 33) % _RND_MAX
        return (seed1 * 31) // _RND_MAX

    out = bytearray(next_byte() + 64 for _ in range(8))
    mask = next_byte()
    for i in range(8):
        out[i] ^= mask
    return bytes(out)


def _client_caps(cfg: DsnConfig, extra: int = 0) -> int:
    caps = (CLIENT_LONG_PASSWORD | CLIENT_PROTOCOL_41
            | CLIENT_SECURE_CONNECTION | CLIENT_PLUGIN_AUTH | extra)
    if cfg.db:
        caps |= CLIENT_CONNECT_WITH_DB
    return caps


def _collation_byte(cfg: DsnConfig) -> int:
    """DSN ``collation=`` → handshake charset byte; unknown names error
    exactly like the reference (`dump/packets.go:300-308`)."""
    return collation_id(cfg.params.get("collation", DEFAULT_COLLATION))


def make_ssl_request(cfg: DsnConfig) -> bytes:
    """SSLRequest: the 32-byte HandshakeResponse41 prefix with CLIENT_SSL
    set — sent before the TLS handshake upgrades the socket."""
    out = bytearray()
    out += struct.pack("<I", _client_caps(cfg, CLIENT_SSL))
    out += struct.pack("<I", 1 << 24)
    out += bytes([_collation_byte(cfg)])
    out += b"\x00" * 23
    return bytes(out)


def make_handshake_response(cfg: DsnConfig, hs: Handshake,
                            extra_caps: int = 0) -> bytes:
    """Client HandshakeResponse41 payload (P2's auth reply)."""
    token = native_password_scramble(cfg.password, hs.auth_data[:20])
    out = bytearray()
    out += struct.pack("<I", _client_caps(cfg, extra_caps))
    out += struct.pack("<I", 1 << 24)  # max packet size
    out += bytes([_collation_byte(cfg)])  # default utf8_general_ci (33)
    out += b"\x00" * 23
    out += cfg.user.encode() + b"\x00"
    out += bytes([len(token)]) + token
    if cfg.db:
        out += cfg.db.encode() + b"\x00"
    out += b"mysql_native_password\x00"
    return bytes(out)


def make_com_query(sql: str) -> bytes:
    """P4: COM_QUERY command payload."""
    return bytes([COM_QUERY]) + sql.encode()


# ---------------------------------------------------------------------------
# text-protocol result sets
# ---------------------------------------------------------------------------

_NULL_CELL = 0xFB


def read_lenenc(data: bytes, pos: int):
    """MySQL length-encoded integer → (value, new_pos)."""
    first = data[pos]
    if first == 0xFC:
        return data[pos + 1] | data[pos + 2] << 8, pos + 3
    if first == 0xFD:
        return (data[pos + 1] | data[pos + 2] << 8
                | data[pos + 3] << 16), pos + 4
    if first == 0xFE:
        return int.from_bytes(data[pos + 1 : pos + 9], "little"), pos + 9
    return first, pos + 1


def read_lenenc_str(data: bytes, pos: int):
    """Length-encoded string → (bytes | None, new_pos); 0xFB is SQL NULL
    (text-protocol row cells only)."""
    if data[pos] == _NULL_CELL:
        return None, pos + 1
    ln, pos = read_lenenc(data, pos)
    return data[pos : pos + ln], pos + ln


def write_lenenc(v: int) -> bytes:
    if v < 0xFB:
        return bytes([v])
    if v < 1 << 16:
        return b"\xfc" + v.to_bytes(2, "little")
    if v < 1 << 24:
        return b"\xfd" + v.to_bytes(3, "little")
    return b"\xfe" + v.to_bytes(8, "little")


def write_lenenc_str(raw: bytes) -> bytes:
    return write_lenenc(len(raw)) + raw


def parse_column_name(payload: bytes) -> str:
    """ColumnDefinition41 → column name (catalog, schema, table,
    org_table skipped; the reference keeps only name/table the same way,
    `dump/packets.go:599-777`)."""
    pos = 0
    for _ in range(4):  # catalog, schema, table, org_table
        s, pos = read_lenenc_str(payload, pos)
    name, pos = read_lenenc_str(payload, pos)
    return (name or b"").decode()


def parse_text_row(payload: bytes, ncols: int) -> tuple:
    """One text-protocol row → tuple of ``str | None`` per column."""
    out = []
    pos = 0
    for _ in range(ncols):
        cell, pos = read_lenenc_str(payload, pos)
        out.append(None if cell is None else cell.decode())
    return tuple(out)


class ResultSet:
    """Parsed text-protocol result set: ``columns`` (names) and ``rows``
    (tuples of ``str | None``)."""

    def __init__(self, columns, rows):
        self.columns = list(columns)
        self.rows = rows

    def dicts(self):
        return [dict(zip(self.columns, r)) for r in self.rows]

    def __iter__(self):
        return iter(self.rows)

    def __len__(self):
        return len(self.rows)


# ---------------------------------------------------------------------------
# binary-protocol result sets (prepared statements)
#
# The reference vendors the go-sql-driver binary row reader
# (`dump/packets.go:806-985` readRow on binaryRows, column definitions at
# `:599-688`, temporal formatting `dump/utils.go:269-420`) but never
# exercises it from its own dump path — it only defines the
# comStmtPrepare/comStmtExecute opcodes (`dump/const.go:79-80`). Here the
# reader is live: DumpClient.exec_prepared drives COM_STMT_PREPARE /
# COM_STMT_EXECUTE end-to-end, so schema probes can run through server-side
# prepared statements when a deployment disables the text protocol for the
# replication user.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ColumnDef:
    """Full ColumnDefinition41 (name + the three fields the binary row
    reader needs: wire type, flags for signedness, decimals for temporal
    fractional width) — the same subset the reference keeps in
    ``mysqlField`` (`dump/packets.go:668-681`)."""

    name: str
    field_type: int
    flags: int = 0
    decimals: int = 0

    @property
    def unsigned(self) -> bool:
        return bool(self.flags & FLAG_UNSIGNED)


def parse_column_def(payload: bytes) -> ColumnDef:
    """ColumnDefinition41 → :class:`ColumnDef` (catalog, schema, table,
    org_table skipped; after org_name: lenenc filler length 0x0C, charset
    u16, column length u32, then type u8, flags u16, decimals u8 —
    `dump/packets.go:599-688`)."""
    pos = 0
    for _ in range(4):  # catalog, schema, table, org_table
        _s, pos = read_lenenc_str(payload, pos)
    name, pos = read_lenenc_str(payload, pos)
    _org, pos = read_lenenc_str(payload, pos)  # org_name
    pos += 1 + 2 + 4  # filler byte (0x0C lenenc), charset u16, length u32
    ftype = payload[pos]
    flags = struct.unpack_from("<H", payload, pos + 1)[0]
    decimals = payload[pos + 3]
    return ColumnDef((name or b"").decode(), ftype, flags, decimals)


_ZERO_DATETIME = "0000-00-00 00:00:00.000000"

# binary temporal wire types → text formatting route (packets.go:923-926)
_BINARY_TEMPORAL = (C.TYPE_DATE, C.TYPE_NEWDATE, C.TYPE_TIME,
                    C.TYPE_TIMESTAMP, C.TYPE_DATETIME)

# lenenc-string-coded binary cell types (packets.go:911-915)
_BINARY_LENENC = (C.TYPE_DECIMAL, C.TYPE_NEWDECIMAL, C.TYPE_VARCHAR,
                  C.TYPE_BIT, C.TYPE_ENUM, C.TYPE_SET, C.TYPE_TINYBLOB,
                  C.TYPE_MEDIUMBLOB, C.TYPE_LONGBLOB, C.TYPE_BLOB,
                  C.TYPE_VARSTRING, C.TYPE_STRING, C.TYPE_GEOMETRY,
                  C.TYPE_JSON)


def format_binary_datetime(src: bytes, length: int, just_time: bool) -> str:
    """Binary DATE/DATETIME/TIME payload → display text, matching the
    reference's ``formatBinaryDateTime`` (`dump/utils.go:316-420`,
    goldens `utils_test.go:116-144`): ``length`` is the width of the zero
    value (10 date, 19 datetime, 8 time, +1+decimals with fraction);
    an empty payload renders the zero value; negative times and 100+
    hours widen past ``length``."""
    if not src:
        return _ZERO_DATETIME[11 : 11 + length] if just_time \
            else _ZERO_DATETIME[:length]
    out = []
    if just_time:
        if length not in (8, 10, 11, 12, 13, 14, 15):
            raise ValueError(f"illegal TIME length {length}")
        if len(src) not in (8, 12):
            raise ValueError(f"invalid TIME packet length {len(src)}")
        if src[0] == 1:
            out.append("-")
        days = src[1] | src[2] << 8 | src[3] << 16 | src[4] << 24
        hour = days * 24 + src[5]
        out.append(f"{hour:02d}:{src[6]:02d}:{src[7]:02d}")
        frac_width = length - 9  # zero-value "HH:MM:SS" is 8 + '.'
        rest = src[8:]
    else:
        if length not in (10, 19, 21, 22, 23, 24, 25, 26):
            kind = "DATETIME" if length > 10 else "DATE"
            raise ValueError(f"illegal {kind} length {length}")
        if len(src) not in (4, 7, 11):
            kind = "DATETIME" if length > 10 else "DATE"
            raise ValueError(f"illegal {kind} packet length {len(src)}")
        year = src[0] | src[1] << 8
        out.append(f"{year:04d}-{src[2]:02d}-{src[3]:02d}")
        if length == 10:
            return "".join(out)
        if len(src) == 4:
            return "".join(out) + _ZERO_DATETIME[10:length]
        out.append(f" {src[4]:02d}:{src[5]:02d}:{src[6]:02d}")
        frac_width = length - 20  # zero value "...:SS" is 19 + '.'
        rest = src[7:]
    if frac_width <= 0:
        return "".join(out)
    if not rest:
        return "".join(out) + _ZERO_DATETIME[19 : 20 + frac_width]
    micros = struct.unpack("<I", rest[:4])[0]
    return "".join(out) + "." + f"{micros:06d}"[:frac_width]


def parse_binary_row(payload: bytes, cols: list) -> tuple:
    """One binary-protocol row → tuple of decoded cells, one per
    :class:`ColumnDef` (`dump/packets.go:806-985`): 0x00 header, NULL
    bitmap of ``(ncols + 7 + 2) // 8`` bytes with a 2-bit offset, then
    type-directed fixed-width numerics, lenenc strings (decoded utf-8 to
    match the text-row API), and length-prefixed temporals formatted per
    the column's ``decimals``."""
    if payload[0] != PKT_OK:
        raise ValueError(f"not a binary row packet (header {payload[0]})")
    ncols = len(cols)
    pos = 1 + (ncols + 7 + 2) // 8
    null_mask = payload[1:pos]
    out = []
    for i, col in enumerate(cols):
        if (null_mask[(i + 2) >> 3] >> ((i + 2) & 7)) & 1:
            out.append(None)
            continue
        t = col.field_type
        if t == C.TYPE_NULL:
            out.append(None)
        elif t == C.TYPE_TINY:
            v = payload[pos]
            out.append(v if col.unsigned else struct.unpack_from(
                "<b", payload, pos)[0])
            pos += 1
        elif t in (C.TYPE_SHORT, C.TYPE_YEAR):
            out.append(struct.unpack_from(
                "<H" if col.unsigned else "<h", payload, pos)[0])
            pos += 2
        elif t in (C.TYPE_INT24, C.TYPE_LONG):
            out.append(struct.unpack_from(
                "<I" if col.unsigned else "<i", payload, pos)[0])
            pos += 4
        elif t == C.TYPE_LONGLONG:
            out.append(struct.unpack_from(
                "<Q" if col.unsigned else "<q", payload, pos)[0])
            pos += 8
        elif t == C.TYPE_FLOAT:
            out.append(struct.unpack_from("<f", payload, pos)[0])
            pos += 4
        elif t == C.TYPE_DOUBLE:
            out.append(struct.unpack_from("<d", payload, pos)[0])
            pos += 8
        elif t in _BINARY_LENENC:
            cell, pos = read_lenenc_str(payload, pos)
            out.append(None if cell is None else cell.decode())
        elif t in _BINARY_TEMPORAL:
            n, pos = read_lenenc(payload, pos)
            src = payload[pos : pos + n]
            pos += n
            if t == C.TYPE_TIME:
                width = 8 if col.decimals in (0x00, 0x1F) \
                    else 8 + 1 + col.decimals
                out.append(format_binary_datetime(src, width, True))
            elif t in (C.TYPE_DATE, C.TYPE_NEWDATE):
                out.append(format_binary_datetime(src, 10, False))
            else:
                width = 19 if col.decimals in (0x00, 0x1F) \
                    else 19 + 1 + col.decimals
                out.append(format_binary_datetime(src, width, False))
        else:
            raise ValueError(f"unknown binary field type {t}")
    return tuple(out)


def encode_stmt_params(params: tuple) -> bytes:
    """COM_STMT_EXECUTE parameter block: NULL bitmap (no offset),
    new-params-bound flag, per-param wire types, then values. Supported
    Python types: None, bool/int (LONGLONG), float (DOUBLE), str/bytes
    (VAR_STRING lenenc) — the set a schema probe needs."""
    n = len(params)
    null_mask = bytearray((n + 7) // 8)
    types = bytearray()
    values = bytearray()
    for i, p in enumerate(params):
        if p is None:
            null_mask[i >> 3] |= 1 << (i & 7)
            types += bytes([C.TYPE_NULL, 0])
        elif isinstance(p, bool) or isinstance(p, int):
            types += bytes([C.TYPE_LONGLONG, 0])
            values += struct.pack("<q", int(p))
        elif isinstance(p, float):
            types += bytes([C.TYPE_DOUBLE, 0])
            values += struct.pack("<d", p)
        else:
            raw = p if isinstance(p, bytes) else str(p).encode()
            types += bytes([C.TYPE_VARSTRING, 0])
            values += write_lenenc_str(raw)
    return bytes(null_mask) + b"\x01" + bytes(types) + bytes(values)


def make_com_binlog_dump(server_id: int, offset: int, filename: str,
                         flags: int = 0) -> bytes:
    """P5: COM_BINLOG_DUMP — opcode + pos(4 LE) + flags(2) + server_id(4)
    + filename (dump/packets.go:991-1007)."""
    return (bytes([COM_BINLOG_DUMP])
            + struct.pack("<IHI", offset & 0xFFFFFFFF, flags,
                          server_id & 0xFFFFFFFF)
            + filename.encode())


# ---------------------------------------------------------------------------
# socket client
# ---------------------------------------------------------------------------


def _read_packet(rf) -> tuple[int, bytes]:
    """One logical packet from a socket file → (last_sequence_id, payload).

    Reassembles payloads split at the 16 MiB−1 wire boundary exactly like
    the reference's ``readPacket`` (`dump/packets.go:32-102`): a payload
    of exactly 2^24−1 bytes continues into the next wire packet; a
    zero-length packet terminates an exact-multiple chain."""
    parts = []
    while True:
        hdr = rf.read(4)
        if len(hdr) < 4:
            raise ConnectionError("connection closed mid-packet")
        ln = hdr[0] | hdr[1] << 8 | hdr[2] << 16
        payload = rf.read(ln)
        if len(payload) < ln:
            raise ConnectionError("connection closed mid-payload")
        parts.append(payload)
        if ln < MAX_PACKET_SIZE:
            return hdr[3], b"".join(parts)


def _write_packet(wf, seq: int, payload: bytes):
    """Write one logical packet, splitting at the 16 MiB−1 wire boundary
    (an exact-multiple payload gets a zero-length terminator packet)."""
    pos = 0
    while True:
        chunk = payload[pos : pos + MAX_PACKET_SIZE]
        wf.write(len(chunk).to_bytes(3, "little") + bytes([seq & 0xFF])
                 + chunk)
        seq += 1
        pos += len(chunk)
        if len(chunk) < MAX_PACKET_SIZE:
            break
    wf.flush()


class DumpClient:
    """Minimal blocking dump-protocol client (P2/P4/P5/P6 composed).

    Usage::

        client = DumpClient(parse_dsn("repl:pw@tcp(host:3306)/"))
        client.connect()
        client.exec("SET @master_binlog_checksum='CRC32'")
        for frame in client.start_dump(server_id=1234,
                                       filename="binlog.000001", offset=4):
            ...  # raw binlog event frames

    The stream ends at EOF (bounded dump / NON_BLOCK) or raises on ERR —
    the reference's OK/EOF/ERR classification (slave_conn.go:83-110).
    """

    def __init__(self, cfg: DsnConfig, timeout: float = 30.0):
        self.cfg = cfg
        self.timeout = timeout
        self._sock = None
        self._rf = None
        self._wf = None

    def connect(self):
        self._sock = socket.create_connection(
            (self.cfg.host, self.cfg.port), timeout=self.timeout)
        self._rf = self._sock.makefile("rb")
        self._wf = self._sock.makefile("wb")
        _, payload = _read_packet(self._rf)
        hs = parse_handshake(payload)
        tls_param = self.cfg.params.get("tls", "")
        tls_mode = tls_param.lower()
        if tls_param in _TLS_CONFIGS:
            use_tls = True
        elif tls_mode in ("1", "true", "skip-verify"):
            use_tls = True
        elif tls_mode in ("", "0", "false"):
            use_tls = False
        else:
            raise ValueError(
                f"unregistered TLS config {tls_param!r}; call "
                "register_tls_config() first (reference RegisterTLSConfig)")
        if use_tls:
            # TLS upgrade (reference `dump/connection.go` ErrNoTLS check +
            # SSLRequest flow, public protocol): SSLRequest, wrap socket,
            # then the full HandshakeResponse rides the TLS channel
            import ssl

            if not hs.capabilities & CLIENT_SSL:
                raise ConnectionError(
                    "TLS requested but server lacks CLIENT_SSL")
            _write_packet(self._wf, 1, make_ssl_request(self.cfg))
            if tls_param in _TLS_CONFIGS:  # per-DSN named config
                ctx = _TLS_CONFIGS[tls_param]
            elif tls_mode == "skip-verify":
                ctx = ssl._create_unverified_context()
            else:
                ctx = ssl.create_default_context()
            self._sock = ctx.wrap_socket(
                self._sock, server_hostname=self.cfg.host)
            self._rf = self._sock.makefile("rb")
            self._wf = self._sock.makefile("wb")
            _write_packet(self._wf, 2,
                          make_handshake_response(self.cfg, hs, CLIENT_SSL))
        else:
            _write_packet(self._wf, 1,
                          make_handshake_response(self.cfg, hs))
        seq, reply = _read_packet(self._rf)
        if reply and reply[0] == PKT_EOF:
            # AuthSwitchRequest: retry once with the requested method
            # (reference `handleAuthResult`, dump/connection.go:265-307 —
            # old-password / cleartext are DSN-gated exactly like the
            # reference's AllowOldPasswords / AllowCleartextPasswords)
            reply = self._auth_switch(hs, seq, reply)
        if reply and reply[0] == PKT_ERR:
            code = struct.unpack_from("<H", reply, 1)[0]
            raise ConnectionError(f"auth failed: error {code}")
        self._set_names()
        return hs

    def _set_names(self):
        """DSN ``charset=a,b`` → post-auth ``SET NAMES`` with fallbacks:
        first accepted name wins, all-refused raises the last error
        (reference `dump/connection.go:119-135` semantics)."""
        charsets = self.cfg.params.get("charset", "")
        if not charsets:
            return
        last_err = None
        for cs in charsets.split(","):
            try:
                self.exec("SET NAMES " + cs)
                return
            except RuntimeError as e:  # charset may not exist server-side
                last_err = e
        raise last_err

    def _allow(self, param: str) -> bool:
        return self.cfg.params.get(param, "").lower() in ("1", "true")

    def _auth_switch(self, hs: Handshake, seq: int, req: bytes) -> bytes:
        if len(req) == 1:
            # bare 0xFE: OldAuthSwitchRequest (pre-4.1 server), original
            # 8-byte salt
            plugin, cipher = "mysql_old_password", hs.auth_data[:8]
        else:
            zero = req.index(b"\x00", 1)
            plugin = req[1:zero].decode()
            cipher = req[zero + 1 :]
            if cipher.endswith(b"\x00"):  # exactly one NUL terminator
                cipher = cipher[:-1]
            cipher = cipher or hs.auth_data
        if plugin == "mysql_old_password":
            if not self._allow("allowOldPasswords"):
                raise ConnectionError(
                    "server requires old password authentication; add "
                    "allowOldPasswords=1 to the DSN to permit it")
            token = old_password_scramble(self.cfg.password, cipher) + b"\x00"
        elif plugin == "mysql_clear_password":
            if not self._allow("allowCleartextPasswords"):
                raise ConnectionError(
                    "server requires cleartext authentication; add "
                    "allowCleartextPasswords=1 to the DSN to permit it")
            token = self.cfg.password.encode() + b"\x00"
        elif plugin == "mysql_native_password":
            token = native_password_scramble(self.cfg.password, cipher[:20])
        else:
            raise ConnectionError(f"unknown auth plugin {plugin!r}")
        _write_packet(self._wf, seq + 1, token)
        _, reply = _read_packet(self._rf)
        return reply

    def exec(self, sql: str):
        """P4: send COM_QUERY; returns ``None`` for an OK reply or a fully
        parsed text-protocol :class:`ResultSet` (column count, column
        definitions, EOF, rows, EOF — the reference's
        ``readColumns``/``textRows`` flow, `dump/packets.go:599-777`,
        `dump/rows.go:1-91`, re-built from the public protocol)."""
        _write_packet(self._wf, 0, make_com_query(sql))
        _, reply = _read_packet(self._rf)
        if reply and reply[0] == PKT_ERR:
            code = struct.unpack_from("<H", reply, 1)[0]
            raise RuntimeError(f"query failed: error {code}")
        if reply and reply[0] == PKT_OK:
            return None
        ncols, _ = read_lenenc(reply, 0)
        columns = []
        while True:  # column definitions until EOF
            _, p = _read_packet(self._rf)
            if p and p[0] == PKT_EOF and len(p) < 9:
                break
            columns.append(parse_column_name(p))
        rows = []
        while True:  # text rows until EOF
            _, p = _read_packet(self._rf)
            if p and p[0] == PKT_EOF and len(p) < 9:
                break
            rows.append(parse_text_row(p, len(columns)))
        if len(columns) != ncols:
            raise ValueError(
                f"column count mismatch: {ncols} vs {len(columns)}")
        return ResultSet(columns, rows)

    def exec_prepared(self, sql: str, params: tuple = ()):
        """Prepared-statement round trip: COM_STMT_PREPARE → COM_STMT_EXECUTE
        → binary result set → COM_STMT_CLOSE. Returns ``None`` for an OK
        (no-result) reply or a :class:`ResultSet` whose rows were decoded
        by :func:`parse_binary_row` — the binary-protocol reader the
        reference vendors but never drives (`dump/packets.go:806-985`).

        ``?`` placeholders in ``sql`` bind ``params`` positionally
        (None/int/float/str/bytes — :func:`encode_stmt_params`)."""
        _write_packet(self._wf, 0, bytes([COM_STMT_PREPARE]) + sql.encode())
        _, reply = _read_packet(self._rf)
        if reply and reply[0] == PKT_ERR:
            code = struct.unpack_from("<H", reply, 1)[0]
            raise RuntimeError(f"prepare failed: error {code}")
        # COM_STMT_PREPARE_OK: 00, stmt_id u32, num_columns u16,
        # num_params u16, filler, warning_count u16
        stmt_id, n_cols, n_params = struct.unpack_from("<IHH", reply, 1)
        for _ in range(n_params):  # param definitions
            _read_packet(self._rf)
        if n_params:
            _read_packet(self._rf)  # EOF after param defs
        for _ in range(n_cols):  # column definitions (repeated at execute)
            _read_packet(self._rf)
        if n_cols:
            _read_packet(self._rf)  # EOF after column defs
        if n_params != len(params):
            raise ValueError(
                f"statement wants {n_params} params, got {len(params)}")
        exe = bytearray([COM_STMT_EXECUTE])
        exe += struct.pack("<IBI", stmt_id, 0, 1)  # flags=0, iterations=1
        if n_params:
            exe += encode_stmt_params(tuple(params))
        _write_packet(self._wf, 0, bytes(exe))
        _, reply = _read_packet(self._rf)
        try:
            if reply and reply[0] == PKT_ERR:
                code = struct.unpack_from("<H", reply, 1)[0]
                raise RuntimeError(f"execute failed: error {code}")
            if reply and reply[0] == PKT_OK:
                return None
            ncols, _ = read_lenenc(reply, 0)
            cols = []
            while True:  # column definitions until EOF
                _, p = _read_packet(self._rf)
                if p and p[0] == PKT_EOF and len(p) < 9:
                    break
                cols.append(parse_column_def(p))
            if len(cols) != ncols:
                raise ValueError(
                    f"column count mismatch: {ncols} vs {len(cols)}")
            rows = []
            while True:  # binary rows until EOF
                _, p = _read_packet(self._rf)
                if p and p[0] == PKT_EOF and len(p) < 9:
                    break
                rows.append(parse_binary_row(p, cols))
            return ResultSet([c.name for c in cols], rows)
        finally:
            # COM_STMT_CLOSE: fire-and-forget, no server reply
            _write_packet(self._wf, 0,
                          bytes([COM_STMT_CLOSE]) + struct.pack("<I", stmt_id))

    def start_dump(self, server_id: int, filename: str, offset: int,
                   flags: int = 0):
        """P5+P6: request the dump, yield raw event frames until EOF."""
        _write_packet(self._wf, 0, make_com_binlog_dump(
            server_id, offset, filename, flags))
        while True:
            _, payload = _read_packet(self._rf)
            if not payload:
                raise ConnectionError("empty dump packet")
            marker = payload[0]
            if marker == PKT_OK:
                yield payload[1:]
            elif marker == PKT_EOF:
                return
            elif marker == PKT_ERR:
                code = struct.unpack_from("<H", payload, 1)[0]
                raise RuntimeError(f"dump stream error {code}")
            else:
                raise ValueError(f"unexpected dump packet marker {marker}")

    def close(self):
        for f in (self._rf, self._wf, self._sock):
            if f is not None:
                f.close()


def master_status(client: "DumpClient") -> tuple:
    """``SHOW MASTER STATUS`` → (binlog file, position): the canonical way
    a consumer picks its dump start point (reference flow:
    `example_test.go:62-74`, doc.go's SetStartBinlogPosition note)."""
    rs = client.exec("SHOW MASTER STATUS")
    if rs is None or not rs.rows:
        raise RuntimeError("SHOW MASTER STATUS returned no rows")
    row = rs.dicts()[0]
    return row["File"], int(row["Position"])


class DescTableMapper:
    """Schema provider resolving column names/signedness over the wire
    with ``desc db.tbl`` — the reference's canonical consumer mapper
    (`example_test.go:76-98`: one Query per table, Field/Type/Null/Key/
    Default/Extra rows, unsigned-ness = 'unsigned' in the Type string).

    Implements the engine's pluggable ``mysql_table`` protocol
    (operators/decode.py ``as_table_mapper``): picklable — only the DSN
    rides the broadcast; each executor opens its own connection lazily on
    first lookup and caches per (db, tbl). A TABLE_MAP whose column count
    disagrees with the DESC result returns None (dead-letter upstream,
    the `row_streamer.go:236-241` consistency check)."""

    def __init__(self, dsn: str):
        self.dsn = dsn
        self._client = None
        self._cache: dict = {}

    def __getstate__(self):
        return {"dsn": self.dsn}

    def __setstate__(self, state):
        self.dsn = state["dsn"]
        self._client = None
        self._cache = {}

    def _conn(self) -> "DumpClient":
        if self._client is None:
            client = DumpClient(parse_dsn(self.dsn))
            client.connect()
            self._client = client
        return self._client

    def _describe(self, db: str, tbl: str):
        key = (db, tbl)
        if key not in self._cache:
            try:
                # SHOW FULL COLUMNS = DESC + the per-column Collation —
                # known non-UTF-8 text columns then decode at source
                # (wire/codec make_cell_str_decoder codec arm) instead
                # of post-hoc re-interpretation (r4 ADVICE)
                rs = self._conn().exec(
                    "show full columns from "
                    f"{quote_identifier(db)}.{quote_identifier(tbl)}")
                self._cache[key] = (
                    [(r["Field"], "unsigned" in (r["Type"] or ""),
                      self._collation_id(r.get("Collation")))
                     for r in rs.dicts()] if rs is not None else None)
            except RuntimeError:  # server error: unknown table
                self._cache[key] = None
        return self._cache[key]

    @staticmethod
    def _collation_id(name):
        if not name or name == "NULL":
            return None
        from ..wire.collations import COLLATION_TO_ID

        return COLLATION_TO_ID.get(name)

    def mysql_table(self, db: str, tbl: str, ncols: int):
        cols = self._describe(db, tbl)
        if cols is None or len(cols) != ncols:
            return None
        return cols

    def knows(self, db: str, tbl: str) -> bool:
        return self._describe(db, tbl) is not None

    def close(self):
        if self._client is not None:
            self._client.close()
            self._client = None


def frames_with_positions(frames, start_file: str, start_offset: int = 4):
    """P11 bookkeeping: raw event frames → ``(file, pos, etype, frame)``.

    ROTATE advances the current file/offset *for subsequent events*
    (binlog_event_common.go:198-206 applied at row_streamer.go:176-184) —
    the rotate frame itself is recorded at its own (old_file, pos), like
    every other event (and like the generator's stream), keeping the
    dedupe-by-(file, pos) contract collision-free: the new file's first
    frame is its FORMAT_DESCRIPTION at pos 4. Every event's position is
    ``next_position - length`` from its own v4 header (master-sent
    artificial rotates carry log_pos=0 and fall back to the running
    cursor). The output rows are exactly the engine's FRAME_SCHEMA tuple
    layout, ready to land as parquet
    (``genlog.write_frames_parquet``-compatible) or to feed
    ``spark.createDataFrame``."""
    fmt = E.BinlogFormat()
    cur_file, cur_pos = start_file, start_offset
    for frame in frames:
        ts, etype, _sid, length, next_pos, _fl = E.parse_header(frame)
        pos = next_pos - length if next_pos >= length > 0 else cur_pos
        yield (cur_file, int(pos), etype, frame)
        if etype == C.E_ROTATE:
            body = E.strip_checksum(fmt, etype, frame)
            cur_file, cur_pos = E.parse_rotate(fmt, body)
        elif next_pos > 0:
            cur_pos = next_pos
