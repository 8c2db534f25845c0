"""Deterministic synthetic CDC world generator.

Produces, from a single seed and with no wall-clock dependence:

* wire-format binlog frames (the engine's *input*) — the Python analogue of
  the reference's synthetic event factory used by its own pipeline tests
  (`/root/reference/replication/binlog_event_make.go:57-97`,
  `row_streamer_test.go:140-152`),
* the logical change rows those frames decode to (decode-parity oracle),
* the expected final state of the repo-content lake table after in-order
  replay (merge-parity oracle; reference consumer semantics: apply events
  in (file, pos) order, minimal-row-image updates patch only present
  columns).

The simulated workload matches FIXTURES.md F1/F2: Zipf-hot repos, ~50/40/10
insert/update/delete mix, re-inserts after delete, multi-update of one key
inside a transaction, multi-row events, periodic file rotation, optional
ALTER-driven schema evolution (adds a `stars` column mid-stream).
"""

from __future__ import annotations

import os
import random
import struct
from dataclasses import dataclass, field

from .wire import constants as C
from .wire import events as E

DB = "codehub"
TABLE = "repo_content"
TABLE_ID = 4242

LANGS = ["python", "go", "rust", "java", "cpp", "js", "sql", "md"]

BASE_COLUMNS = [
    ("repo", C.TYPE_VARCHAR, 512, False),
    ("path", C.TYPE_VARCHAR, 1024, False),
    ("commit", C.TYPE_VARCHAR, 80, False),
    ("lang", C.TYPE_VARCHAR, 40, False),
    ("content", C.TYPE_BLOB, 2, False),
]
EVOLVED_COLUMNS = BASE_COLUMNS + [("stars", C.TYPE_LONG, 0, False)]

KEY_COLS = ("repo", "path")


def table_spec(evolved: bool = False) -> E.TableMapSpec:
    return E.TableMapSpec(
        database=DB,
        name=TABLE,
        columns=EVOLVED_COLUMNS if evolved else BASE_COLUMNS,
        key_cols=KEY_COLS,
    )


def table_registry() -> dict:
    """(db, table) -> list of schema versions, each a list of
    (col_name, unsigned). Column names/signedness are externally supplied,
    mirroring the reference's MysqlTableMapper (row_streamer.go:19-21);
    the decode stage picks the version whose width matches TABLE_MAP's
    column count (count-mismatch check: row_streamer.go:236-241)."""
    return {
        (DB, TABLE): [
            [(n, u) for n, _, _, u in BASE_COLUMNS],
            [(n, u) for n, _, _, u in EVOLVED_COLUMNS],
        ]
    }


@dataclass
class GenResult:
    frames: list  # (file, pos, etype, frame_bytes)
    changes: list  # logical change-row dicts (decode-parity oracle)
    ddls: list  # logical ddl dicts
    final_state: dict  # (repo, path) -> {col: value}
    n_row_events: int = 0


class CdcWorldGenerator:
    def __init__(self, seed: int = 42, n_repos: int = 40,
                 paths_per_repo: int = 60, hot_repos: int = 3,
                 rows_per_event_max: int = 20, txns_per_file: int = 200,
                 evolve_at_txn: int | None = None, base_ts: int = 1700000000):
        self.rng = random.Random(seed)
        self.n_repos = n_repos
        self.paths_per_repo = paths_per_repo
        self.hot_repos = hot_repos
        self.rows_per_event_max = rows_per_event_max
        self.txns_per_file = txns_per_file
        self.evolve_at_txn = evolve_at_txn
        self.base_ts = base_ts
        self.fmt = E.BinlogFormat()
        self._word_pool = ["tok%x" % self.rng.getrandbits(24)
                           for _ in range(4096)]

    # -- workload helpers ---------------------------------------------------

    def _repo(self) -> str:
        # Zipf-ish: hot repos absorb ~60% of traffic (exercises salting)
        if self.rng.random() < 0.6:
            i = self.rng.randrange(self.hot_repos)
        else:
            i = self.rng.randrange(self.n_repos)
        return f"org{i % 7}/repo-{i:04d}"

    def _path(self) -> str:
        d = self.rng.randrange(8)
        f = self.rng.randrange(self.paths_per_repo)
        ext = self.rng.choice(["py", "go", "rs", "java", "cc", "js", "sql", "md"])
        return f"src/mod{d}/file_{f:05d}.{ext}"

    def _commit(self) -> str:
        return "%040x" % self.rng.getrandbits(160)

    def _content(self) -> str:
        # sample from a seeded per-generator word pool: two RNG draws per
        # document instead of one per word (the per-word getrandbits +
        # %x formatting loop dominated generation profiles)
        n = self.rng.randint(10, 600)
        words = self.rng.choices(self._word_pool, k=max(2, n // 9))
        if self.rng.random() < 0.05:
            words = words + ["código↦测试"]  # UTF-8 exercise
        return " ".join(words)

    # -- generation ---------------------------------------------------------

    def generate(self, n_txns: int) -> GenResult:
        rng = self.rng
        frames, changes, ddls = [], [], []
        state: dict = {}
        # live-key sampling structures: O(1) pick / insert / swap-remove
        # (a per-event `list(state.keys())` copy is quadratic in stream
        # length — at 10^5 txns it dominates generation)
        live_keys: list = []
        live_pos: dict = {}

        def live_add(key):
            if key not in live_pos:
                live_pos[key] = len(live_keys)
                live_keys.append(key)

        def live_remove(key):
            i = live_pos.pop(key)
            last = live_keys.pop()
            if i < len(live_keys):
                live_keys[i] = last
                live_pos[last] = i

        evolved = False
        spec = table_spec(False)

        file_idx = 0
        file_name = f"binlog.{file_idx:06d}"
        pos = 4
        gtid = 0
        n_row_events = 0

        def emit(etype: int, payload: bytes, ts: int):
            nonlocal pos
            frame = E.packetize(self.fmt, etype, 0, payload, timestamp=ts,
                                server_id=1, log_position=pos + 0)
            # header next_position = end offset of this event in the file
            next_pos = pos + len(frame)
            frame = bytearray(frame)
            struct.pack_into("<I", frame, 13, next_pos & 0xFFFFFFFF)
            # real CRC32 last (it covers the patched header) — generated
            # streams are integrity-checkable like a server's
            frames.append((file_name, pos, etype,
                           E.apply_crc32(bytes(frame))))
            start = pos
            pos = next_pos
            return start, next_pos

        emit(C.E_FORMAT_DESCRIPTION, E.make_format_description(self.fmt),
             self.base_ts)

        for txn_i in range(n_txns):
            ts = self.base_ts + txn_i

            # rotate to a new file periodically
            if txn_i > 0 and txn_i % self.txns_per_file == 0:
                emit(C.E_ROTATE, E.make_rotate(4, f"binlog.{file_idx + 1:06d}"), 0)
                file_idx += 1
                file_name = f"binlog.{file_idx:06d}"
                pos = 4
                emit(C.E_FORMAT_DESCRIPTION,
                     E.make_format_description(self.fmt), ts)

            # schema evolution: one ALTER txn
            if self.evolve_at_txn is not None and txn_i == self.evolve_at_txn:
                gtid += 1
                emit(C.E_GTID, E.make_gtid(gtid), ts)
                sql = f"ALTER TABLE {TABLE} ADD COLUMN stars INT"
                start, _ = emit(C.E_QUERY, E.make_query(DB, sql), ts)
                ddls.append({"gtid_seq": gtid, "file": file_name, "pos": start,
                             "ts": ts, "db": DB, "sql": sql,
                             "category": C.ST_ALTER})
                evolved = True
                spec = table_spec(True)
                for row in state.values():
                    row.setdefault("stars", None)
                continue

            gtid += 1
            autocommit = rng.random() < 0.1
            emit(C.E_GTID, E.make_gtid(gtid), ts)
            if not autocommit:
                emit(C.E_QUERY, E.make_query(DB, "BEGIN"), ts)

            n_events = 1 if autocommit else rng.randint(1, 3)
            seq_in_txn = 0
            for _ in range(n_events):
                op = rng.choices("IUD", weights=[50, 40, 10])[0]
                n_rows = rng.randint(1, self.rows_per_event_max)
                rows_logical = []
                if op == "I":
                    for _ in range(n_rows):
                        key = (self._repo(), self._path())
                        row = {
                            "repo": key[0], "path": key[1],
                            "commit": self._commit(),
                            "lang": rng.choice(LANGS),
                            "content": self._content(),
                        }
                        if evolved:
                            row["stars"] = str(rng.randrange(10000))
                        rows_logical.append((None, row))
                        state[key] = dict(row)
                        live_add(key)
                    etype = C.E_WRITE_ROWS_V2
                elif op == "U":
                    if not live_keys:
                        continue
                    minimal = rng.random() < 0.5
                    for _ in range(min(n_rows, len(live_keys))):
                        key = live_keys[rng.randrange(len(live_keys))]
                        after = {"repo": key[0], "path": key[1],
                                 "commit": self._commit(),
                                 "content": self._content()}
                        if not minimal:
                            after["lang"] = rng.choice(LANGS)
                            if evolved:
                                after["stars"] = str(rng.randrange(10000))
                        before = {"repo": key[0], "path": key[1]}
                        rows_logical.append((before, after))
                        cur = state.get(key)
                        if cur is not None:
                            cur.update(after)
                    etype = C.E_UPDATE_ROWS_V2
                else:
                    if not live_keys:
                        continue
                    for _ in range(min(n_rows, len(live_keys), 5)):
                        key = live_keys[rng.randrange(len(live_keys))]
                        rows_logical.append(
                            (({"repo": key[0], "path": key[1]}), None))
                        del state[key]
                        live_remove(key)
                    etype = C.E_DELETE_ROWS_V2
                if not rows_logical:
                    continue

                emit(C.E_TABLE_MAP, E.make_table_map(spec, TABLE_ID), ts)
                payload = E.make_rows_event(spec, TABLE_ID, etype, rows_logical)
                start, nxt = emit(etype, payload, ts)
                n_row_events += 1

                for ident, after in rows_logical:
                    changes.append({
                        "gtid_seq": gtid, "txn_id": gtid,
                        "seq_in_txn": seq_in_txn,
                        "file": file_name, "pos": start, "next_pos": nxt,
                        "ts": ts, "op": op, "db": DB, "tbl": TABLE,
                        "before": ident, "after": after,
                    })
                    seq_in_txn += 1

            if not autocommit:
                emit(C.E_XID, E.make_xid(gtid), ts)

        return GenResult(frames=frames, changes=changes, ddls=ddls,
                         final_state=state, n_row_events=n_row_events)


def write_frames_parquet(result: GenResult, out_dir: str,
                         files_per_parquet: int = 1) -> str:
    """Write frames as parquet, one file per binlog file (the natural
    distribution unit at scale: each binlog file is an independent decode
    partition)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    by_file: dict = {}
    for f, p, et, fr in result.frames:
        by_file.setdefault(f, []).append((p, et, fr))
    for fname, rows in by_file.items():
        table = pa.table({
            "file": pa.array([fname] * len(rows), pa.string()),
            "pos": pa.array([r[0] for r in rows], pa.int64()),
            "etype": pa.array([r[1] for r in rows], pa.int32()),
            "frame": pa.array([r[2] for r in rows], pa.binary()),
        })
        # several row groups per file so a scan can split WITHIN a binlog
        # file (at production scale a 1 GiB file in one row group would
        # pin decode parallelism to the file count)
        pq.write_table(table, os.path.join(out_dir, f"{fname}.parquet"),
                       row_group_size=4096)
    return out_dir


def expected_state_with_sha(result: GenResult) -> list:
    """Final-state rows + sha256(content) — the parity oracle."""
    import hashlib

    rows = []
    for (repo, path), r in sorted(result.final_state.items()):
        content = r.get("content")
        sha = hashlib.sha256(content.encode()).hexdigest() if content is not None else None
        rows.append({**r, "content_sha256": sha})
    return rows
