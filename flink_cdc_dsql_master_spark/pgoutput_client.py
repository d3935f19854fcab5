"""PostgreSQL logical-replication client: startup + START_REPLICATION.

The Postgres twin of :mod:`.binlog_client` — the last untested seam of
the Postgres CDC source was the replication CONNECTION; the pgoutput
message bytes themselves are handled by :mod:`.pgoutput`. This module
speaks the public frontend/backend protocol v3:

- StartupMessage (len-prefixed, no tag): protocol 3.0 + the parameter
  pairs a walsender needs (``user``, ``database``,
  ``replication=database``);
- Authentication ('R'): OK (0), cleartext (3) and md5 (5 — the salted
  double-md5 response ``"md5" + md5hex(md5hex(pw+user)+salt)``);
- ParameterStatus ('S') / BackendKeyData ('K') absorbed until
  ReadyForQuery ('Z');
- simple Query ('Q'): ``START_REPLICATION SLOT s LOGICAL lsn
  (proto_version '1', publication_names 'pub')``;
- CopyBothResponse ('W'), then CopyData ('d') frames: 'w' XLogData
  (start/end LSN u64be, clock u64be, pgoutput payload) yielded to the
  decoder; 'k' keepalives answered with a Standby Status Update ('r')
  when the server requests a reply; CopyDone ('c') ends the stream.

Proven end-to-end against an in-process fake walsender
(tests/test_pgoutput_client.py) that verifies the md5 auth response and
streams real pgoutput bytes. A live server adds TLS/SCRAM variants —
documented, not silently stubbed.
"""

from __future__ import annotations

import hashlib
import struct

from .pgoutput import WireFormatError

PROTOCOL_V3 = 196608  # 3 << 16


# -- framing ------------------------------------------------------------------

def _recv_exact(sock, n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        if not chunk:
            raise WireFormatError(
                f"connection closed mid-message ({len(out)}/{n} bytes)")
        out += chunk
    return out


def read_message(sock) -> tuple[bytes, bytes]:
    """One backend message: (tag, body)."""
    tag = _recv_exact(sock, 1)
    (ln,) = struct.unpack(">i", _recv_exact(sock, 4))
    return tag, _recv_exact(sock, ln - 4)


def send_message(sock, tag: bytes, body: bytes) -> None:
    sock.sendall(tag + struct.pack(">i", len(body) + 4) + body)


def build_startup(user: str, database: str) -> bytes:
    params = (b"user\x00" + user.encode() + b"\x00"
              + b"database\x00" + database.encode() + b"\x00"
              + b"replication\x00database\x00" + b"\x00")
    body = struct.pack(">i", PROTOCOL_V3) + params
    return struct.pack(">i", len(body) + 4) + body


def md5_auth_response(user: str, password: str, salt: bytes) -> bytes:
    inner = hashlib.md5(password.encode() + user.encode()).hexdigest()
    outer = hashlib.md5(inner.encode() + salt).hexdigest()
    return b"md5" + outer.encode() + b"\x00"


def lsn_str(lsn: int) -> str:
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


class PgReplicationClient:
    """Minimal walsender client: connect → authenticate →
    START_REPLICATION → iterate (wal_lsn, pgoutput-message bytes)."""

    def __init__(self, sock_factory, user: str, password: str = "",
                 database: str = "postgres"):
        self.sock_factory = sock_factory
        self.user = user
        self.password = password
        self.database = database
        self.sock = None
        self.parameters: dict[str, str] = {}

    def connect(self) -> dict:
        self.sock = self.sock_factory()
        self.sock.sendall(build_startup(self.user, self.database))
        while True:
            tag, body = read_message(self.sock)
            if tag == b"R":
                (code,) = struct.unpack(">i", body[:4])
                if code == 0:
                    continue  # AuthenticationOk
                if code == 3:  # cleartext
                    send_message(self.sock, b"p",
                                 self.password.encode() + b"\x00")
                elif code == 5:  # md5 + 4-byte salt
                    send_message(self.sock, b"p", md5_auth_response(
                        self.user, self.password, body[4:8]))
                else:
                    raise WireFormatError(
                        f"unsupported auth method {code} (SCRAM/TLS "
                        "need a real driver)")
            elif tag == b"S":
                k, _, v = body.rstrip(b"\x00").partition(b"\x00")
                self.parameters[k.decode()] = v.decode()
            elif tag == b"K":
                pass  # BackendKeyData
            elif tag == b"Z":
                return self.parameters  # ReadyForQuery
            elif tag == b"E":
                raise WireFormatError(
                    f"server error during startup: "
                    f"{body.decode('utf-8', 'replace')}")
            else:
                raise WireFormatError(
                    f"unexpected startup message {tag!r}")

    def start_replication(self, slot: str, publication: str,
                          start_lsn: int = 0):
        """Yield (wal_lsn, pgoutput message bytes) from the COPY-BOTH
        stream, answering keepalives that request a reply."""
        q = (f"START_REPLICATION SLOT {slot} LOGICAL "
             f"{lsn_str(start_lsn)} (proto_version '1', "
             f"publication_names '{publication}')")
        send_message(self.sock, b"Q", q.encode() + b"\x00")
        tag, body = read_message(self.sock)
        if tag == b"E":
            raise WireFormatError(
                f"START_REPLICATION rejected: "
                f"{body.decode('utf-8', 'replace')}")
        if tag != b"W":
            raise WireFormatError(
                f"expected CopyBothResponse, got {tag!r}")
        while True:
            tag, body = read_message(self.sock)
            if tag == b"c":  # CopyDone — bounded test streams end here
                return
            if tag == b"E":
                raise WireFormatError(
                    f"stream error: {body.decode('utf-8', 'replace')}")
            if tag != b"d":
                raise WireFormatError(f"unexpected stream tag {tag!r}")
            kind = body[:1]
            if kind == b"w":
                start, _end, _clock = struct.unpack(">qqq", body[1:25])
                yield start, body[25:]
            elif kind == b"k":
                _end, _clock = struct.unpack(">qq", body[1:17])
                if body[17:18] == b"\x01":
                    # Standby Status Update: written/flushed/applied
                    # LSNs + clock + no-reply
                    pos = struct.pack(">q", _end)
                    send_message(self.sock, b"d",
                                 b"r" + pos * 3 + struct.pack(">q", 0)
                                 + b"\x00")
            else:
                raise WireFormatError(
                    f"unexpected CopyData kind {kind!r}")

    def close(self) -> None:
        if self.sock is not None:
            self.sock.close()
            self.sock = None
