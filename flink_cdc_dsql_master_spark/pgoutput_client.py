"""PostgreSQL logical-replication client: startup + START_REPLICATION.

The Postgres twin of :mod:`.binlog_client` — the last untested seam of
the Postgres CDC source was the replication CONNECTION; the pgoutput
message bytes themselves are handled by :mod:`.pgoutput`. This module
speaks the public frontend/backend protocol v3:

- StartupMessage (len-prefixed, no tag): protocol 3.0 + the parameter
  pairs a walsender needs (``user``, ``database``,
  ``replication=database``);
- Authentication ('R'): OK (0), cleartext (3), md5 (5 — the salted
  double-md5 response ``"md5" + md5hex(md5hex(pw+user)+salt)``) and
  SASL SCRAM-SHA-256 (10/11/12 — RFC 5802/7677: PBKDF2-salted client
  proof, server-signature verification; the Postgres ≥ 10 default with
  ``password_encryption = scram-sha-256``);
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
SSL_REQUEST_CODE = 80877103  # magic "SSLRequest" protocol version


def default_tls_context():
    """Client TLS context equivalent to libpq ``sslmode=require``:
    encrypt, no CA verification (use :func:`verifying_tls_context` for
    the verify-ca / verify-full analogs)."""
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    return ctx


def verifying_tls_context(ca_file: str, check_hostname: bool = True):
    """Client TLS context that VALIDATES the server's certificate chain
    against ``ca_file`` — libpq ``sslmode=verify-full`` (or MySQL
    ``--ssl-mode=VERIFY_IDENTITY``) when ``check_hostname`` is true,
    ``verify-ca`` / ``VERIFY_CA`` when false. Pass the result as either
    client's ``ssl_context`` together with ``tls_hostname`` set to the
    name on the server's certificate; an untrusted chain or a hostname
    mismatch fails the handshake loudly (``ssl.SSLCertVerificationError``)
    — never a silent downgrade. This closes the "CA trust chains"
    environment residue: with a real CA bundle the full stock-deployment
    chains (TLS + SCRAM / caching_sha2 + CRC32) run verified
    end-to-end."""
    import ssl

    ctx = ssl.create_default_context(cafile=ca_file)
    ctx.check_hostname = check_hostname
    ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx


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


# -- SCRAM-SHA-256 (RFC 5802 / RFC 7677) ---------------------------------------

def scram_salted_password(password: str, salt: bytes,
                          iterations: int) -> bytes:
    return hashlib.pbkdf2_hmac("sha256", password.encode("utf-8"),
                               salt, iterations)


def _hmac(key: bytes, msg: str | bytes) -> bytes:
    import hmac as _hmaclib

    if isinstance(msg, str):
        msg = msg.encode("utf-8")
    return _hmaclib.new(key, msg, hashlib.sha256).digest()


def scram_client_proof(password: str, salt: bytes, iterations: int,
                       auth_message: str) -> tuple[bytes, bytes]:
    """(ClientProof, ServerSignature) per RFC 5802 §3:
    ClientProof = ClientKey XOR HMAC(SHA256(ClientKey), AuthMessage)."""
    salted = scram_salted_password(password, salt, iterations)
    client_key = _hmac(salted, "Client Key")
    stored_key = hashlib.sha256(client_key).digest()
    client_sig = _hmac(stored_key, auth_message)
    proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
    server_key = _hmac(salted, "Server Key")
    server_sig = _hmac(server_key, auth_message)
    return proof, server_sig


def scram_verify_client_proof(password: str, salt: bytes,
                              iterations: int, auth_message: str,
                              proof: bytes) -> bool:
    """Server-side verification: recover ClientKey = proof XOR
    ClientSignature and check SHA256(ClientKey) == StoredKey — the exact
    check a real Postgres performs (it never needs the cleartext)."""
    salted = scram_salted_password(password, salt, iterations)
    client_key = _hmac(salted, "Client Key")
    stored_key = hashlib.sha256(client_key).digest()
    client_sig = _hmac(stored_key, auth_message)
    recovered = bytes(a ^ b for a, b in zip(proof, client_sig))
    return hashlib.sha256(recovered).digest() == stored_key


def _parse_scram_attrs(msg: str) -> dict[str, str]:
    return dict(part.split("=", 1) for part in msg.split(","))


def lsn_str(lsn: int) -> str:
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


class PgReplicationClient:
    """Minimal walsender client: connect → authenticate →
    START_REPLICATION → iterate (wal_lsn, pgoutput-message bytes)."""

    def __init__(self, sock_factory, user: str, password: str = "",
                 database: str = "postgres", tls: bool = False,
                 ssl_context=None, tls_hostname: str = "localhost"):
        self.sock_factory = sock_factory
        self.user = user
        self.password = password
        self.database = database
        self.tls = tls
        self.ssl_context = ssl_context
        # pass the REAL server hostname when supplying a verifying
        # context — certificate verification checks the name against it
        self.tls_hostname = tls_hostname
        self.sock = None
        self.parameters: dict[str, str] = {}

    def _tls_upgrade(self) -> None:
        """The protocol's SSLRequest dance (docs "SSL Session
        Encryption"): Int32(8) + Int32(80877103); 'S' → TLS handshake
        on the same connection, 'N' → the server refuses encryption
        (fail loudly: the caller asked for TLS)."""
        self.sock.sendall(struct.pack(">ii", 8, SSL_REQUEST_CODE))
        answer = _recv_exact(self.sock, 1)
        if answer != b"S":
            raise WireFormatError(
                f"server refused SSLRequest (got {answer!r}) — "
                "ssl = off on the server?")
        ctx = self.ssl_context or default_tls_context()
        self.sock = ctx.wrap_socket(self.sock,
                                    server_hostname=self.tls_hostname)

    def connect(self) -> dict:
        self.sock = self.sock_factory()
        if self.tls:
            self._tls_upgrade()
        self.sock.sendall(build_startup(self.user, self.database))
        scram_state: dict | None = None
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
                elif code == 10:  # AuthenticationSASL: mechanism list
                    mechs = [m.decode() for m in
                             body[4:].split(b"\x00") if m]
                    if "SCRAM-SHA-256" not in mechs:
                        raise WireFormatError(
                            f"no supported SASL mechanism in {mechs} "
                            "(SCRAM-SHA-256-PLUS needs TLS channel "
                            "binding — a real endpoint)")
                    scram_state = self._scram_first()
                elif code == 11:  # AuthenticationSASLContinue
                    if scram_state is None:
                        raise WireFormatError(
                            "SASLContinue before SASL start")
                    self._scram_final(scram_state, body[4:].decode())
                elif code == 12:  # AuthenticationSASLFinal
                    if scram_state is None:
                        raise WireFormatError(
                            "SASLFinal before SASL start")
                    attrs = _parse_scram_attrs(body[4:].decode())
                    import base64

                    if base64.b64decode(attrs["v"]) != \
                            scram_state["server_sig"]:
                        raise WireFormatError(
                            "SCRAM server signature mismatch — the "
                            "server does not know the password")
                else:
                    raise WireFormatError(
                        f"unsupported auth method {code} (TLS-bound "
                        "variants need a real endpoint)")
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

    def _scram_first(self) -> dict:
        """Send SASLInitialResponse with the client-first-message;
        returns the exchange state carried to the later steps."""
        import base64
        import secrets

        nonce = base64.b64encode(secrets.token_bytes(18)).decode()
        bare = f"n=,r={nonce}"  # Postgres takes the user from startup
        initial = "n,," + bare
        body = (b"SCRAM-SHA-256\x00"
                + struct.pack(">i", len(initial))
                + initial.encode("utf-8"))
        send_message(self.sock, b"p", body)
        return {"nonce": nonce, "bare": bare}

    def _scram_final(self, state: dict, server_first: str) -> None:
        """Compute and send the client-final-message (proof) per
        RFC 5802 §3; stores the expected ServerSignature for the
        SASLFinal check."""
        import base64

        attrs = _parse_scram_attrs(server_first)
        full_nonce = attrs["r"]
        if not full_nonce.startswith(state["nonce"]):
            raise WireFormatError(
                "SCRAM server nonce does not extend the client nonce")
        salt = base64.b64decode(attrs["s"])
        iterations = int(attrs["i"])
        without_proof = f"c=biws,r={full_nonce}"  # biws = b64("n,,")
        auth_message = ",".join([state["bare"], server_first,
                                 without_proof])
        proof, server_sig = scram_client_proof(
            self.password, salt, iterations, auth_message)
        state["server_sig"] = server_sig
        final = (without_proof
                 + ",p=" + base64.b64encode(proof).decode())
        send_message(self.sock, b"p", final.encode("utf-8"))

    def start_replication(self, slot: str, publication: str,
                          start_lsn: int = 0,
                          proto_version: int = 1,
                          streaming: bool = False,
                          binary: bool = False):
        """Yield (wal_lsn, pgoutput message bytes) from the COPY-BOTH
        stream, answering keepalives that request a reply.
        ``proto_version=2`` + ``streaming=True`` requests streamed
        in-progress transactions (PG ≥ 14); ``binary=True`` requests
        binary-format TupleData — both decoded by :mod:`.pgoutput`."""
        opts = [f"proto_version '{proto_version}'",
                f"publication_names '{publication}'"]
        if streaming:
            opts.append("streaming 'on'")
        if binary:
            opts.append("binary 'true'")
        q = (f"START_REPLICATION SLOT {slot} LOGICAL "
             f"{lsn_str(start_lsn)} ({', '.join(opts)})")
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
