"""MySQL binlog wire-format constants.

Public-knowledge values (MySQL ``include/mysql/mysql_com.h`` and the binlog
event-type table, http://dev.mysql.com/doc/internals/en/binlog-event-type.html).
Parity with the reference CDC library's constant set
(``/root/reference/replication/const.go:7-187``).
"""

# ---- column wire type codes ------------------------------------------------
TYPE_DECIMAL = 0
TYPE_TINY = 1
TYPE_SHORT = 2
TYPE_LONG = 3
TYPE_FLOAT = 4
TYPE_DOUBLE = 5
TYPE_NULL = 6
TYPE_TIMESTAMP = 7
TYPE_LONGLONG = 8
TYPE_INT24 = 9
TYPE_DATE = 10
TYPE_TIME = 11
TYPE_DATETIME = 12
TYPE_YEAR = 13
TYPE_NEWDATE = 14
TYPE_VARCHAR = 15
TYPE_BIT = 16
TYPE_TIMESTAMP2 = 17
TYPE_DATETIME2 = 18
TYPE_TIME2 = 19
TYPE_JSON = 245  # explicitly unsupported, like the reference
TYPE_NEWDECIMAL = 246
TYPE_ENUM = 247
TYPE_SET = 248
TYPE_TINYBLOB = 249
TYPE_MEDIUMBLOB = 250
TYPE_LONGBLOB = 251
TYPE_BLOB = 252
TYPE_VARSTRING = 253
TYPE_STRING = 254
TYPE_GEOMETRY = 255

# ---- event type codes (v4 header byte 4) -----------------------------------
E_UNKNOWN = 0
E_START_V3 = 1
E_QUERY = 2
E_STOP = 3
E_ROTATE = 4
E_INTVAR = 5
E_RAND = 13
E_FORMAT_DESCRIPTION = 15
E_XID = 16
E_TABLE_MAP = 19
E_WRITE_ROWS_V1 = 23
E_UPDATE_ROWS_V1 = 24
E_DELETE_ROWS_V1 = 25
E_ROWS_QUERY = 29
E_WRITE_ROWS_V2 = 30
E_UPDATE_ROWS_V2 = 31
E_DELETE_ROWS_V2 = 32
E_GTID = 33
E_ANONYMOUS_GTID = 34
E_PREVIOUS_GTIDS = 35
# MariaDB flavor (reference: replication/binlog_event_mariadb.go:16-18) —
# GTID is (sequence uint64 LE, domain uint32 LE, flags byte)
E_GTID_MARIADB = 162
E_GTID_LIST_MARIADB = 163

ROWS_EVENT_TYPES = frozenset(
    {
        E_WRITE_ROWS_V1,
        E_UPDATE_ROWS_V1,
        E_DELETE_ROWS_V1,
        E_WRITE_ROWS_V2,
        E_UPDATE_ROWS_V2,
        E_DELETE_ROWS_V2,
    }
)
WRITE_ROWS_TYPES = frozenset({E_WRITE_ROWS_V1, E_WRITE_ROWS_V2})
UPDATE_ROWS_TYPES = frozenset({E_UPDATE_ROWS_V1, E_UPDATE_ROWS_V2})
DELETE_ROWS_TYPES = frozenset({E_DELETE_ROWS_V1, E_DELETE_ROWS_V2})
ROWS_V2_TYPES = frozenset({E_WRITE_ROWS_V2, E_UPDATE_ROWS_V2, E_DELETE_ROWS_V2})

# ---- checksum algorithms ----------------------------------------------------
CHECKSUM_ALG_OFF = 0
CHECKSUM_ALG_CRC32 = 1
CHECKSUM_ALG_UNDEF = 255

# ---- INTVAR subtypes ----------------------------------------------------------
INTVAR_INVALID = 0
INTVAR_LAST_INSERT_ID = 1
INTVAR_INSERT_ID = 2

# ---- QUERY status-var codes ---------------------------------------------------
Q_FLAGS2 = 0
Q_SQL_MODE = 1
Q_CATALOG = 2
Q_AUTO_INCREMENT = 3
Q_CHARSET = 4
Q_TIME_ZONE = 5
Q_CATALOG_NZ = 6

# v4 header layout: timestamp(4) type(1) server_id(4) length(4) next_pos(4) flags(2)
HEADER_LEN = 19

# Typical MySQL 5.6 per-event-type post-header sizes (index = event type - 1).
MYSQL56_HEADER_SIZES = bytes(
    [
        56, 13, 0, 8, 0, 18, 0, 4, 4, 4,
        4, 18, 0, 0, 92, 0, 4, 26, 8, 0,
        0, 0, 8, 8, 8, 2, 0, 0, 0, 10,
        10, 10, 25, 25, 0,
    ]
)
MYSQL56_SERVER_VERSION = "5.6.33-0ubuntu0.14.04.1-log"

# Statement categories (subset used by the pipeline; reference mysql_types.go:13-27)
ST_BEGIN = "BEGIN"
ST_COMMIT = "COMMIT"
ST_ROLLBACK = "ROLLBACK"
ST_INSERT = "INSERT"
ST_UPDATE = "UPDATE"
ST_DELETE = "DELETE"
ST_CREATE = "CREATE"
ST_ALTER = "ALTER"
ST_DROP = "DROP"
ST_TRUNCATE = "TRUNCATE"
ST_RENAME = "RENAME"
ST_SET = "SET"
ST_UNKNOWN = "UNKNOWN"

DDL_STATEMENTS = frozenset({ST_CREATE, ST_ALTER, ST_DROP, ST_TRUNCATE, ST_RENAME})

_PREFIX_TO_STATEMENT = {
    "begin": ST_BEGIN,
    "commit": ST_COMMIT,
    "rollback": ST_ROLLBACK,
    "insert": ST_INSERT,
    "update": ST_UPDATE,
    "delete": ST_DELETE,
    "create": ST_CREATE,
    "alter": ST_ALTER,
    "drop": ST_DROP,
    "truncate": ST_TRUNCATE,
    "rename": ST_RENAME,
    "set": ST_SET,
}


def statement_category(sql: str) -> str:
    """First-token prefix classifier (parity: mysql_types.go:80-88)."""
    token = sql.strip().split(None, 1)[0].lower() if sql.strip() else ""
    return _PREFIX_TO_STATEMENT.get(token, ST_UNKNOWN)


def is_ddl(category: str) -> bool:
    return category in DDL_STATEMENTS
