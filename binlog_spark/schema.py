"""Canonical Spark schemas for the CDC engine.

The change-row schema mirrors the reference's decoded event model
(``StreamEvent``/``Transaction``, `/root/reference/transaction.go:9-51`)
flattened to one row per changed table row, plus the GTID ordering the
north rule requires. Before/after images are ``map<string,string>`` of the
*present* columns (canonical byte-string values, SQL NULL as a null map
value); a column absent from the map models the minimal row image
(``IsEmpty``, `/root/reference/transaction.go:114-119`).
"""

from pyspark.sql import types as T

# raw binlog frames at rest (generator output / streaming source)
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("etype", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)

# decoded logical change rows (output of the Arrow decode stage)
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("gtid_seq", T.LongType(), True),
        T.StructField("txn_id", T.LongType(), True),
        T.StructField("seq_in_txn", T.IntegerType(), True),
        T.StructField("file", T.StringType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("next_pos", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("tbl", T.StringType(), True),
        T.StructField("before", T.MapType(T.StringType(), T.StringType(), True), True),
        T.StructField("after", T.MapType(T.StringType(), T.StringType(), True), True),
    ]
)

# DDL side-channel rows (QUERY events classified as DDL; row_streamer.go:204-207
# logs and skips these — we route them to the schema-evolution branch instead)
DDL_SCHEMA = T.StructType(
    [
        T.StructField("gtid_seq", T.LongType(), True),
        T.StructField("file", T.StringType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("db", T.StringType(), True),
        T.StructField("sql", T.StringType(), False),
        T.StructField("category", T.StringType(), False),
    ]
)

# dead-letter rows (events the rows pipeline rejects, e.g. INTVAR/RAND —
# parity: row_streamer.go:331-339 treats them as errors; we quarantine)
DEADLETTER_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("etype", T.IntegerType(), False),
        T.StructField("reason", T.StringType(), False),
    ]
)

# the lake table being maintained (BASELINE.json input_hint)
REPO_CONTENT_FIELDS = ["repo", "path", "commit", "lang", "content"]
REPO_CONTENT_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType(), True) for f in REPO_CONTENT_FIELDS]
)
REPO_CONTENT_KEY = ("repo", "path")

# decode-stage output: change rows plus marker/side-channel rows, before
# transaction assembly fills gtid_seq/txn_id/seq_in_txn for change rows.
# kind: change | gtid | begin | commit | rollback | ddl | deadletter
DECODE_OUTPUT_SCHEMA = T.StructType(
    list(CHANGE_SCHEMA.fields)
    + [
        T.StructField("seq_in_event", T.IntegerType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("sql", T.StringType(), True),
        T.StructField("reason", T.StringType(), True),
    ]
)
