"""Values-style fixture source + collect sink (the test backbone).

Reference counterparts:
- ``ValuesDataSourceHelper.java:52-70`` — scripted event sets
  (SINGLE_SPLIT_SINGLE_TABLE, TRANSFORM_TABLE, ...) that every mini-cluster
  golden test consumes.
- ``ValuesDataSink`` / ``ValuesDatabase.java`` — collects events as strings
  like ``DataChangeEvent{tableId=..., before=[], after=[1, Alice], op=INSERT}``
  and maintains an in-memory table applying schema changes; the golden
  oracle of ``FlinkPipelineTransformITCase`` (:155-211).

Spark design: an event script is a plain Python list of SchemaChangeEvents
and (op, row) tuples; ``to_changelog_df`` turns the data events of one table
into a changelog DataFrame (``__op``, ``__seq`` columns), and
``CollectSink`` renders golden strings from a result DataFrame so ported
conformance cases can assert on stable text.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .events import (
    OP_COLUMN,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    SEQ_COLUMN,
    CreateTableEvent,
    SchemaChangeEvent,
)
from .schema import Schema, TableId

_OP_NAME = {OP_INSERT: "INSERT", OP_UPDATE_BEFORE: "UPDATE_BEFORE",
            OP_UPDATE_AFTER: "UPDATE_AFTER", OP_DELETE: "DELETE"}


@dataclass
class DataEvent:
    table_id: TableId
    op: str  # +I / -U / +U / -D
    row: tuple


@dataclass
class EventScript:
    """An ordered script of schema + data events (one source 'split')."""

    events: list = field(default_factory=list)

    def create_table(self, table_id: str | TableId, schema: Schema) -> "EventScript":
        tid = TableId.parse(table_id) if isinstance(table_id, str) else table_id
        self.events.append(CreateTableEvent(tid, schema))
        return self

    def schema_change(self, event: SchemaChangeEvent) -> "EventScript":
        """Append any schema-change event mid-script (the CUSTOM_SOURCE_EVENTS
        shape of ValuesDataSourceHelper — data events after it must match the
        changed upstream schema)."""
        self.events.append(event)
        return self

    def insert(self, table_id: str | TableId, *rows: tuple) -> "EventScript":
        return self._data(table_id, OP_INSERT, rows)

    def update(self, table_id: str | TableId, before: tuple,
               after: tuple) -> "EventScript":
        tid = TableId.parse(table_id) if isinstance(table_id, str) else table_id
        self.events.append(DataEvent(tid, OP_UPDATE_BEFORE, before))
        self.events.append(DataEvent(tid, OP_UPDATE_AFTER, after))
        return self

    def delete(self, table_id: str | TableId, *rows: tuple) -> "EventScript":
        return self._data(table_id, OP_DELETE, rows)

    def _data(self, table_id, op, rows) -> "EventScript":
        tid = TableId.parse(table_id) if isinstance(table_id, str) else table_id
        for r in rows:
            self.events.append(DataEvent(tid, op, r))
        return self

    # -- materialization ----------------------------------------------------

    def table_ids(self) -> list[TableId]:
        out = []
        for e in self.events:
            if e.table_id not in out:
                out.append(e.table_id)
        return out

    def schema_events(self) -> list[SchemaChangeEvent]:
        return [e for e in self.events if isinstance(e, SchemaChangeEvent)]

    def schema_of(self, tid: TableId) -> Schema:
        for e in self.events:
            if isinstance(e, CreateTableEvent) and e.table_id == tid:
                return e.schema
        raise KeyError(f"no CreateTableEvent for {tid}")

    def to_changelog_df(self, spark: SparkSession,
                        tid: TableId) -> DataFrame:
        """Data events of one table → changelog DataFrame with __op/__seq.

        __seq is the script position — the binlog-position analog that
        downstream last-write-wins relies on.
        """
        from pyspark.sql import types as T

        schema = self.schema_of(tid)
        rows = []
        for seq, e in enumerate(self.events):
            if isinstance(e, DataEvent) and e.table_id == tid:
                rows.append(tuple(e.row) + (e.op, seq))
        # build a FRESH struct — StructType.add mutates in place, which
        # would corrupt a Schema object shared across scripts/splits
        struct = T.StructType(
            list(schema.struct.fields)
            + [T.StructField(OP_COLUMN, T.StringType(), False),
               T.StructField(SEQ_COLUMN, T.LongType(), False)])
        return spark.createDataFrame(rows, struct)


def single_split_single_table(
        table: str = "default_namespace.default_schema.table1") -> EventScript:
    """SINGLE_SPLIT_SINGLE_TABLE parity (ValuesDataSourceHelper.java:173-265):
    CreateTable, 3 inserts, add more rows, an update and a delete."""
    schema = Schema.of([("col1", "STRING"), ("col2", "STRING")],
                       primary_keys=["col1"])
    s = EventScript()
    s.create_table(table, schema)
    s.insert(table, ("1", "1"), ("2", "2"), ("3", "3"))
    s.update(table, ("2", "2"), ("2", "x"))
    s.delete(table, ("3", "3"))
    return s


def transform_table(
        table: str = "default_namespace.default_schema.table1") -> EventScript:
    """TRANSFORM_TABLE parity (ValuesDataSourceHelper.java:574+): id/name/age
    shape used across FlinkPipelineTransformITCase."""
    schema = Schema.of(
        [("id", "INT NOT NULL"), ("name", "STRING"), ("age", "INT")],
        primary_keys=["id"])
    s = EventScript()
    s.create_table(table, schema)
    s.insert(table, (1, "Alice", 18), (2, "Bob", 20))
    s.update(table, (2, "Bob", 20), (2, "Bob", 30))
    return s


def multi_transform_tables(
        ns: str = "default_namespace.default_schema") -> EventScript:
    """The mytable1/mytable2 pair used across FlinkPipelineTransformITCase
    (FIXTURES.md §1): inserts, an update with both images, and a delete."""
    t1, t2 = f"{ns}.mytable1", f"{ns}.mytable2"
    s1 = Schema.of(
        [("id", "INT NOT NULL"), ("name", "STRING"), ("age", "INT")],
        primary_keys=["id"])
    s2 = Schema.of(
        [("id", "BIGINT NOT NULL"), ("name", "VARCHAR(255)"),
         ("age", "TINYINT"), ("description", "STRING")],
        primary_keys=["id"])
    s = EventScript()
    s.create_table(t1, s1)
    s.insert(t1, (1, "Alice", 18), (2, "Bob", 20))
    s.update(t1, (2, "Bob", 20), (2, "Bob", 30))
    s.create_table(t2, s2)
    s.insert(t2, (3, "Carol", 15, "student"), (4, "Derrida", 25, "student"))
    s.delete(t2, (4, "Derrida", 25, "student"))
    return s


def single_split_single_table_with_default_value(
        table: str = "default_namespace.default_schema.table1") -> EventScript:
    """SINGLE_SPLIT_SINGLE_TABLE_WITH_DEFAULT_VALUE parity
    (ValuesDataSourceHelper.java:267-289): the base set plus an AddColumn
    carrying a default value and a rename of that column."""
    from .events import AddColumnEvent, RenameColumnEvent

    s = single_split_single_table(table)
    tid = TableId.parse(table)
    s.schema_change(AddColumnEvent(tid, "colWithDefault", "STRING",
                                   default="flink"))
    s.schema_change(RenameColumnEvent(tid, "colWithDefault",
                                      "newColWithDefault"))
    return s


def multi_splits_single_table(
        table: str = "default_namespace.default_schema.table1"
        ) -> list[EventScript]:
    """MULTI_SPLITS_SINGLE_TABLE parity (ValuesDataSourceHelper.java:416+):
    four parallel splits of one table — three insert splits (1,2|3,4|5,6)
    and a delete split (2,4,6). Returned as one script per split; union the
    changelogs to simulate the parallel source."""
    schema = Schema.of([("col1", "STRING"), ("col2", "STRING")],
                       primary_keys=["col1"])
    splits = []
    for rows in (["1", "2"], ["3", "4"], ["5", "6"]):
        s = EventScript().create_table(table, schema)
        s.insert(table, *[(r, r) for r in rows])
        splits.append(s)
    d = EventScript().create_table(table, schema)
    d.delete(table, ("2", "2"), ("4", "4"), ("6", "6"))
    splits.append(d)
    return splits


def complex_column_name_table(
        table: str = "default_namespace.default_schema.table1") -> EventScript:
    """COMPLEX_COLUMN_NAME_TABLE parity (ValuesDataSourceHelper.java:693+):
    hyphenated/keyword column names through create/insert/add/rename/drop."""
    from .events import AddColumnEvent, DropColumnEvent, RenameColumnEvent

    tid = TableId.parse(table)
    schema = Schema.of(
        [("class", "STRING"), ("foo-bar", "INT"), ("bar-foo", "INT")],
        primary_keys=["class"])
    s = EventScript()
    s.create_table(table, schema)
    s.insert(table, ("class0", 0, 0), ("class1", 1, 10), ("class2", 2, 100))
    s.schema_change(AddColumnEvent(tid, "import-package", "STRING"))
    s.schema_change(RenameColumnEvent(tid, "bar-foo", "bar-baz"))
    s.schema_change(DropColumnEvent(tid, "bar-baz"))
    s.delete(table, ("class1", 1, ""))
    s.update(table, ("class2", 2, ""), ("class2", 2, "new Value"))
    return s


def schema_evolution_events(
        table: str = "default_namespace.default_schema.mytable1"
        ) -> EventScript:
    """generateSchemaEvolutionEvents parity
    (FlinkPipelineTransformITCase.java:2846-3010): five stages — initial
    CRUD, AddColumn (rank FIRST, gender LAST), AlterColumnType (age→DOUBLE,
    gender→INT, name→VARCHAR(17)), RenameColumn (gender→biological_sex,
    age→toshi), DropColumn (biological_sex, toshi) — with inserts, an
    update and a delete inside every stage."""
    from .events import (
        AddColumnEvent,
        AlterColumnTypeEvent,
        ColumnPosition,
        DropColumnEvent,
        RenameColumnEvent,
    )

    tid = TableId.parse(table)
    s = EventScript()
    v1 = Schema.of([("id", "INT"), ("name", "STRING"), ("age", "INT")],
                   primary_keys=["id"])
    s.create_table(table, v1)
    s.insert(table, (1, "Alice", 21), (2, "Barcarolle", 22), (3, "Cecily", 23))
    s.update(table, (3, "Cecily", 23), (3, "Colin", 24))
    s.delete(table, (2, "Barcarolle", 22))

    s.schema_change(AddColumnEvent(tid, "rank", "STRING",
                                   ColumnPosition.FIRST))
    s.schema_change(AddColumnEvent(tid, "gender", "TINYINT"))
    s.insert(table, ("1st", 4, "Derrida", 24, 0), ("2nd", 5, "Eve", 25, 1))
    s.update(table, ("2nd", 5, "Eve", 25, 1), ("2nd", 5, "Eva", 20, 2))
    s.insert(table, ("3rd", 6, "Fiona", 26, 3))
    s.delete(table, ("3rd", 6, "Fiona", 26, 3))

    s.schema_change(AlterColumnTypeEvent(tid, "age", "DOUBLE"))
    s.schema_change(AlterColumnTypeEvent(tid, "gender", "INT"))
    s.schema_change(AlterColumnTypeEvent(tid, "name", "VARCHAR(17)"))
    s.insert(table, ("4th", 7, "Gem", 19.0, -1), ("5th", 8, "Helen", 18.0, -2))
    s.update(table, ("5th", 8, "Helen", 18.0, -2), ("5th", 8, "Harry", 18.0, -3))
    s.insert(table, ("6th", 9, "IINA", 17.0, 0))
    s.delete(table, ("6th", 9, "IINA", 17.0, 0))

    s.schema_change(RenameColumnEvent(tid, "gender", "biological_sex"))
    s.schema_change(RenameColumnEvent(tid, "age", "toshi"))
    s.insert(table, ("7th", 10, "Julia", 24.0, 1), ("8th", 11, "Kalle", 23.0, 0))
    s.update(table, ("8th", 11, "Kalle", 23.0, 0), ("8th", 11, "Kella", 18.0, 0))
    s.insert(table, ("9th", 12, "Lynx", 17.0, 0))
    s.delete(table, ("9th", 12, "Lynx", 17.0, 0))

    s.schema_change(DropColumnEvent(tid, "biological_sex"))
    s.schema_change(DropColumnEvent(tid, "toshi"))
    s.insert(table, ("10th", 13, "Munroe"), ("11th", 14, "Neko"))
    s.update(table, ("11th", 14, "Neko"), ("11th", 14, "Nein"))
    s.insert(table, ("12th", 15, "Oops"))
    s.delete(table, ("12th", 15, "Oops"))
    return s


class ValuesDatabase:
    """In-memory evolving table (ValuesDatabase.java parity): applies data
    events and evolved-schema transitions, and renders the reference-style
    golden event stream.

    Schema transitions are applied as a column diff between consecutive
    evolved schemas (add → default/NULL fill, drop → discard, type change →
    value cast); a RenameColumnEvent under an evolving behavior carries its
    values over. Data-event rows are interpreted against the *upstream
    original* schema of their stage, then projected into the evolved schema
    (extra columns dropped, missing columns NULL) — exactly what the
    coerce step does to the real frames.
    """

    def __init__(self) -> None:
        self.schema: Schema | None = None
        self.rows: dict[tuple, dict] = {}
        self.golden: list[str] = []
        self._pending_before: dict | None = None

    # -- schema side --------------------------------------------------------

    def apply_schema_transition(self, event: SchemaChangeEvent,
                                new: Schema | None) -> None:
        from .events import RenameColumnEvent

        if new is None:
            self.schema, self.rows = None, {}
            return
        old = self.schema
        if old is not None:
            if (isinstance(event, RenameColumnEvent)
                    and not new.has_column(event.old_name)
                    and new.has_column(event.new_name)):
                for r in self.rows.values():
                    if event.old_name in r:
                        r[event.new_name] = r.pop(event.old_name)
            default = getattr(event, "default", None)
            for r in self.rows.values():
                for f in new.struct.fields:
                    if f.name not in r:
                        r[f.name] = default if default is not None else None
                    else:
                        r[f.name] = _cast_py(r[f.name], f)
                for k in list(r):
                    if not new.has_column(k):
                        del r[k]
        self.schema = new
        self.golden.append(self._render_schema_event(event, new))

    # -- data side ----------------------------------------------------------

    def apply_data_event(self, event: DataEvent, upstream: Schema) -> None:
        assert self.schema is not None, "CreateTableEvent must come first"
        names = [f.name for f in upstream.struct.fields]
        raw = dict(zip(names, event.row))
        row = {f.name: _cast_py(raw.get(f.name), f)
               for f in self.schema.struct.fields}
        pk = tuple(row.get(k) for k in (self.schema.primary_keys
                                        or upstream.primary_keys))
        tid = event.table_id.identifier()
        vals = lambda r: ", ".join(_fmt(r[f.name])  # noqa: E731
                                   for f in self.schema.struct.fields)
        if event.op == OP_UPDATE_BEFORE:
            self._pending_before = row
            return
        if event.op == OP_DELETE:
            self.rows.pop(pk, None)
            self.golden.append(
                f"DataChangeEvent{{tableId={tid}, before=[{vals(row)}], "
                f"after=[], op=DELETE}}")
            return
        if event.op == OP_UPDATE_AFTER:
            before = self._pending_before or {}
            self._pending_before = None
            self.rows[pk] = row
            self.golden.append(
                f"DataChangeEvent{{tableId={tid}, before=[{vals(before)}], "
                f"after=[{vals(row)}], op=UPDATE}}")
            return
        self.rows[pk] = row  # +I
        self.golden.append(
            f"DataChangeEvent{{tableId={tid}, before=[], "
            f"after=[{vals(row)}], op=INSERT}}")

    # -- rendering ----------------------------------------------------------

    @staticmethod
    def _render_schema_event(event: SchemaChangeEvent, new: Schema) -> str:
        cols = ",".join(f"`{f.name}` {f.dataType.simpleString().upper()}"
                        for f in new.struct.fields)
        return (f"{type(event).__name__}{{tableId="
                f"{event.table_id.identifier()}, columns={{{cols}}}, "
                f"primaryKeys={','.join(new.primary_keys)}}}")

    def final_rows(self) -> list[tuple]:
        assert self.schema is not None
        names = [f.name for f in self.schema.struct.fields]
        return sorted(
            (tuple(r[n] for n in names) for r in self.rows.values()),
            key=lambda t: tuple((v is None, str(v)) for v in t))


def _cast_py(v, f):
    """Driver-side value cast mirroring coerce_dataframe's Catalyst casts."""
    import pyspark.sql.types as T

    if v is None:
        return None
    if isinstance(f.dataType, T.DoubleType) or isinstance(
            f.dataType, T.FloatType):
        return float(v)
    if isinstance(f.dataType, (T.IntegerType, T.LongType, T.ShortType,
                               T.ByteType)):
        return int(v)
    if isinstance(f.dataType, T.StringType):
        return str(v)
    return v


def replay_script(script: EventScript, behavior=None) -> ValuesDatabase:
    """Drive a mixed event script through SchemaEvolver + ValuesDatabase —
    the driver-side analog of the reference's mini-cluster
    source→SchemaOperator→ValuesDataSink loop, producing the golden event
    stream and the final in-memory table."""
    from .evolve import SchemaChangeBehavior, SchemaEvolver

    ev = SchemaEvolver(behavior=behavior or SchemaChangeBehavior.EVOLVE)
    db = ValuesDatabase()
    for event in script.events:
        if isinstance(event, SchemaChangeEvent):
            new = ev.on_event(event)
            db.apply_schema_transition(event, new)
        else:
            upstream = ev.manager.latest_original(event.table_id)
            db.apply_data_event(event, upstream)
    return db


class CollectSink:
    """Golden-string collector (ValuesDataSink parity)."""

    @staticmethod
    def render(df: DataFrame, table_id: TableId) -> list[str]:
        """Render a changelog DataFrame as reference-style event strings,
        in __seq order when present."""
        cols = [c for c in df.columns if c not in (OP_COLUMN, SEQ_COLUMN,
                                                   "__table_id")]
        has_seq = SEQ_COLUMN in df.columns
        rows = df.collect()
        if has_seq:
            rows = sorted(rows, key=lambda r: r[SEQ_COLUMN])
        out = []
        for r in rows:
            vals = ", ".join(_fmt(r[c]) for c in cols)
            op = _OP_NAME.get(r[OP_COLUMN], r[OP_COLUMN]) if OP_COLUMN in df.columns else "INSERT"
            out.append(
                f"DataChangeEvent{{tableId={table_id.identifier()}, "
                f"after=[{vals}], op={op}}}")
        return out


def _fmt(v) -> str:
    if v is None:
        return "null"
    return str(v)


_TLS_CERT_CACHE: dict = {}


def self_signed_server_context():
    """Server-side TLS context over a freshly generated self-signed
    cert (stdlib ssl + the cryptography package, both in-env) — what
    the fake servers use to prove the clients' TLS upgrade paths
    end-to-end. Cached per process: key generation is the slow part."""
    import ssl
    import tempfile

    if "ctx" in _TLS_CERT_CACHE:
        return _TLS_CERT_CACHE["ctx"]

    import datetime as _dt

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME,
                                         "localhost")])
    now = _dt.datetime.now(_dt.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - _dt.timedelta(days=1))
            .not_valid_after(now + _dt.timedelta(days=365))
            .add_extension(x509.SubjectAlternativeName(
                [x509.DNSName("localhost")]), critical=False)
            .sign(key, hashes.SHA256()))
    with tempfile.NamedTemporaryFile("wb", suffix=".pem",
                                     delete=False) as f:
        f.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption()))
        f.write(cert.public_bytes(serialization.Encoding.PEM))
        pem = f.name
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(pem)
    _TLS_CERT_CACHE["ctx"] = ctx
    return ctx


def ca_signed_server_context() -> tuple:
    """Server-side TLS context over a cert SIGNED BY A PRIVATE CA, plus
    the CA-certificate PEM path a verifying client trusts — the trust
    topology of a real deployment (the "CA trust chains" environment
    residue from the round-10 review). Returns ``(server_ctx,
    ca_pem_path)``. The server presents its leaf + the CA cert; a
    client built with :func:`.pgoutput_client.verifying_tls_context`
    over ``ca_pem_path`` validates the chain and (in verify-full mode)
    the hostname against the leaf's ``localhost`` SAN. Cached per
    process: two RSA keygens are the slow part."""
    import ssl
    import tempfile

    if "ca" in _TLS_CERT_CACHE:
        return _TLS_CERT_CACHE["ca"]

    import datetime as _dt

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    now = _dt.datetime.now(_dt.timezone.utc)

    def _name(cn):
        return x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])

    ca_key = rsa.generate_private_key(public_exponent=65537,
                                      key_size=2048)
    ca_cert = (x509.CertificateBuilder()
               .subject_name(_name("fake-cdc-test-ca"))
               .issuer_name(_name("fake-cdc-test-ca"))
               .public_key(ca_key.public_key())
               .serial_number(x509.random_serial_number())
               .not_valid_before(now - _dt.timedelta(days=1))
               .not_valid_after(now + _dt.timedelta(days=365))
               .add_extension(x509.BasicConstraints(
                   ca=True, path_length=0), critical=True)
               .sign(ca_key, hashes.SHA256()))

    srv_key = rsa.generate_private_key(public_exponent=65537,
                                       key_size=2048)
    srv_cert = (x509.CertificateBuilder()
                .subject_name(_name("localhost"))
                .issuer_name(ca_cert.subject)
                .public_key(srv_key.public_key())
                .serial_number(x509.random_serial_number())
                .not_valid_before(now - _dt.timedelta(days=1))
                .not_valid_after(now + _dt.timedelta(days=365))
                .add_extension(x509.BasicConstraints(
                    ca=False, path_length=None), critical=True)
                .add_extension(x509.SubjectAlternativeName(
                    [x509.DNSName("localhost")]), critical=False)
                .sign(ca_key, hashes.SHA256()))

    with tempfile.NamedTemporaryFile("wb", suffix=".pem",
                                     delete=False) as f:
        f.write(srv_key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption()))
        f.write(srv_cert.public_bytes(serialization.Encoding.PEM))
        # leaf + issuer: the chain a properly configured server sends
        f.write(ca_cert.public_bytes(serialization.Encoding.PEM))
        srv_pem = f.name
    with tempfile.NamedTemporaryFile("wb", suffix=".pem",
                                     delete=False) as f:
        f.write(ca_cert.public_bytes(serialization.Encoding.PEM))
        ca_pem = f.name

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(srv_pem)
    _TLS_CERT_CACHE["ca"] = (ctx, ca_pem)
    return ctx, ca_pem


_FAKE_RSA_KEYPAIR = None


def _gtid_members(gtid_set: str) -> set:
    """GTID-set string → {(uuid, gno)} membership (test-scale sets)."""
    out = set()
    for part in gtid_set.split(","):
        if not part.strip():
            continue
        toks = part.strip().split(":")
        sid = toks[0].lower()
        for t in toks[1:]:
            a, _, b = t.partition("-")
            for g in range(int(a), int(b or a) + 1):
                out.add((sid, g))
    return out


def _filter_gtid_events(events: list[bytes], gtid_set: str) -> list[bytes]:
    """Server-side GTID auto-positioning: skip every transaction whose
    GTID the client's set already contains (a transaction = its
    GTID_LOG_EVENT through the next one); preamble events before the
    first GTID — FDE, format state — always flow, like a real dump."""
    import struct as _struct

    done = _gtid_members(gtid_set)
    out: list[bytes] = []
    skipping = False
    for ev in events:
        if ev[4] == 33:  # GTID_LOG_EVENT
            sid = ev[19 + 1:19 + 17].hex()
            uuid_str = (f"{sid[0:8]}-{sid[8:12]}-{sid[12:16]}-"
                        f"{sid[16:20]}-{sid[20:32]}")
            (gno,) = _struct.unpack("<q", ev[19 + 17:19 + 25])
            skipping = (uuid_str, gno) in done
        if not skipping:
            out.append(ev)
    return out


class FakeMySQLReplicaServer:
    """In-process MySQL replication server speaking the real wire bytes
    (HandshakeV10 → mysql_native_password verification → COM_QUERY
    checksum negotiation → COM_REGISTER_SLAVE / COM_BINLOG_DUMP → one
    binlog event per packet) — the hermetic stand-in that lets
    :class:`.binlog_client.BinlogClient` be driven end-to-end in this
    sandbox. Serves ONE connection then closes; ``auth_ok`` records
    whether the client's scramble matched and ``checksum_query`` the
    SET @master_binlog_checksum statement the client sent.

    ``serve_checksummed=True`` makes the server behave like a stock
    MySQL ≥ 5.6.6 deployment (binlog_checksum=CRC32): it REFUSES the
    dump with the real server's error unless the client negotiated
    checksums first, and the supplied events are expected to carry their
    CRC32 trailers (build them with :func:`.binlog.checksum_stream`)."""

    SCRAMBLE = bytes(range(1, 21))

    def __init__(self, events: list[bytes], username: str = "repl",
                 password: str = "", serve_checksummed: bool = False,
                 auth_plugin: str = "mysql_native_password",
                 switch_to: str | None = None, tls: bool = False,
                 auth_cache_primed: bool = True,
                 server_ssl_context=None):
        import socket
        import threading

        self.events = events
        self.username = username
        self.password = password
        self.serve_checksummed = serve_checksummed
        self.auth_plugin = auth_plugin
        self.tls = tls
        self.tls_established = False
        # a CA-signed context (ca_signed_server_context()[0]) here puts
        # the fake behind a verifiable trust chain; default stays the
        # self-signed cert (sslmode=require-equivalent tests)
        self.server_ssl_context = server_ssl_context
        # auth_cache_primed=False models a caching_sha2_password account
        # whose hash cache is EMPTY (a freshly provisioned replica
        # user): the scramble alone cannot be verified, so the server
        # demands FULL authentication (AuthMoreData 0x04) — cleartext
        # password over the encrypted channel. full_auth_used records
        # that the client completed it.
        self.auth_cache_primed = auth_cache_primed
        self.full_auth_used = False
        self.rsa_exchange_used = False
        self.gtid_dump_set: str | None = None
        # when set, reply to the handshake response with an
        # AuthSwitchRequest to this plugin (fresh nonce) — the flow a
        # server takes when the ACCOUNT's plugin differs from the
        # handshake default
        self.switch_to = switch_to
        self.auth_ok = None
        self.checksum_query = None
        self.listener = socket.socket()
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(1)
        self.port = self.listener.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)

    def start(self) -> "FakeMySQLReplicaServer":
        self.thread.start()
        return self

    def join(self, timeout: float = 10.0) -> None:
        self.thread.join(timeout)

    SWITCH_NONCE = bytes(range(40, 60))

    @staticmethod
    def _rsa_keypair():
        """One lazily generated module-level RSA keypair (PEM, key) —
        the server's sha256_password key; 2048-bit generation once per
        process, not per connection."""
        global _FAKE_RSA_KEYPAIR
        if _FAKE_RSA_KEYPAIR is None:
            from cryptography.hazmat.primitives import serialization
            from cryptography.hazmat.primitives.asymmetric import rsa

            key = rsa.generate_private_key(public_exponent=65537,
                                           key_size=2048)
            pem = key.public_key().public_bytes(
                serialization.Encoding.PEM,
                serialization.PublicFormat.SubjectPublicKeyInfo)
            _FAKE_RSA_KEYPAIR = (pem, key)
        return _FAKE_RSA_KEYPAIR

    def _handshake_payload(self) -> bytes:
        import struct

        caps = 0x00000001 | 0x00000200 | 0x00008000 | 0x00080000
        if self.tls:
            caps |= 0x00000800  # CLIENT_SSL advertised
        out = bytes([10]) + b"8.0.0-fake\x00"
        out += struct.pack("<I", 99)
        out += self.SCRAMBLE[:8] + b"\x00"
        out += struct.pack("<H", caps & 0xFFFF)
        out += bytes([0x21]) + struct.pack("<H", 2)
        out += struct.pack("<H", caps >> 16)
        out += bytes([21]) + bytes(10)
        out += self.SCRAMBLE[8:] + b"\x00"
        out += self.auth_plugin.encode() + b"\x00"
        return out

    def _serve(self) -> None:
        import struct

        from .binlog_client import (auth_response_for, read_packet,
                                    write_packet)

        from .binlog import WireFormatError as _WFE

        conn, _ = self.listener.accept()
        try:
            write_packet(conn, self._handshake_payload(), 0)
            try:
                resp, _ = read_packet(conn)
            except _WFE:
                return  # client hung up mid-handshake (e.g. no-TLS test)
            if self.tls and len(resp) == 32 and resp[1] & 0x08:
                # 32-byte SSL Connection Request with CLIENT_SSL set →
                # TLS handshake on the same connection; the REAL
                # handshake response follows encrypted
                import ssl as _ssl
                srv_ctx = (self.server_ssl_context
                           or self_signed_server_context())
                try:
                    conn = srv_ctx.wrap_socket(conn, server_side=True)
                except _ssl.SSLError:
                    return  # client rejected our certificate
                self.tls_established = True
                resp, _ = read_packet(conn)
            body = resp[32:]
            user, _, rest = body.partition(b"\x00")
            alen = rest[0]
            auth = rest[1:1 + alen]
            seq = 3
            if self.switch_to is not None:
                # AuthSwitchRequest: 0xFE + plugin cstr + nonce + NUL
                write_packet(conn, b"\xfe" + self.switch_to.encode()
                             + b"\x00" + self.SWITCH_NONCE + b"\x00",
                             seq)
                auth, _ = read_packet(conn)
                plugin, nonce = self.switch_to, self.SWITCH_NONCE
                seq = 5
            else:
                plugin, nonce = self.auth_plugin, self.SCRAMBLE
            if (plugin == "caching_sha2_password"
                    and not self.auth_cache_primed):
                # cache miss: a real server cannot check the scramble
                # (it stores only the two-round SHA256 digest), so it
                # demands full auth — cleartext password + NUL over TLS,
                # or the RSA key exchange on a cleartext channel
                seq = write_packet(conn, b"\x01\x04", seq)
                pw, _ = read_packet(conn)
                self.full_auth_used = True
                if pw == b"\x02" and not self.tls_established:
                    # public-key request → AuthMoreData(0x01 + PEM),
                    # then decrypt the OAEP blob and un-XOR the nonce
                    pem, private_key = self._rsa_keypair()
                    seq = write_packet(conn, b"\x01" + pem, seq + 1)
                    blob, _ = read_packet(conn)
                    from cryptography.hazmat.primitives import hashes
                    from cryptography.hazmat.primitives.asymmetric import (
                        padding)

                    xored = private_key.decrypt(blob, padding.OAEP(
                        mgf=padding.MGF1(algorithm=hashes.SHA1()),
                        algorithm=hashes.SHA1(), label=None))
                    # un-XOR with the nonce THIS flow issued — after an
                    # AuthSwitchRequest that is the fresh switch nonce,
                    # not the handshake scramble (a real server reads
                    # back what it last sent; round-11 review #9)
                    xn = nonce[:20]
                    pw = bytes(b ^ xn[i % len(xn)]
                               for i, b in enumerate(xored))
                    self.rsa_exchange_used = True
                self.auth_ok = (user.decode() == self.username and
                                pw == self.password.encode() + b"\x00")
                seq += 1
            else:
                expect = auth_response_for(plugin, self.password, nonce)
                self.auth_ok = (user.decode() == self.username
                                and auth == expect)
            if not self.auth_ok:
                write_packet(conn, b"\xff" + struct.pack("<H", 1045)
                             + b"Access denied", seq)
                return
            if (plugin == "caching_sha2_password"
                    and self.auth_cache_primed):
                # fast-auth success marker, then the OK packet — the
                # cached-entry path a real server takes
                seq = write_packet(conn, b"\x01\x03", seq)
            write_packet(conn, b"\x00\x00\x00\x02\x00\x00\x00", seq)
            while True:                          # command phase
                cmd, _ = read_packet(conn)
                if cmd[0] == 0x03:               # COM_QUERY
                    q = cmd[1:].decode("utf-8")
                    if q.upper().startswith("SELECT"):
                        # @@global.binlog_checksum readback — classic
                        # text-protocol resultset
                        val = (b"CRC32" if self.serve_checksummed
                               else b"NONE")
                        seq = write_packet(conn, b"\x01", 1)
                        seq = write_packet(conn, b"\x03defXXXX", seq)
                        seq = write_packet(conn, b"\xfe\x00\x00\x02\x00",
                                           seq)
                        seq = write_packet(conn, bytes([len(val)]) + val,
                                           seq)
                        write_packet(conn, b"\xfe\x00\x00\x02\x00", seq)
                    else:
                        self.checksum_query = q
                        write_packet(conn,
                                     b"\x00\x00\x00\x02\x00\x00\x00", 1)
                elif cmd[0] == 0x15:             # COM_REGISTER_SLAVE
                    write_packet(conn, b"\x00\x00\x00\x02\x00\x00\x00", 1)
                elif cmd[0] == 0x12:             # COM_BINLOG_DUMP
                    break
                elif cmd[0] == 0x1E:             # COM_BINLOG_DUMP_GTID
                    import io as _io

                    from .binlog_client import decode_gtid_set

                    b = _io.BytesIO(cmd[1:])
                    b.read(6)                    # flags u16 + server_id
                    (nlen,) = struct.unpack("<I", b.read(4))
                    b.read(nlen + 8)             # name + pos u64
                    (dlen,) = struct.unpack("<I", b.read(4))
                    self.gtid_dump_set = decode_gtid_set(b.read(dlen))
                    break
                else:
                    write_packet(conn, b"\xff" + struct.pack("<H", 1047)
                                 + b"Unknown command", 1)
                    return
            if self.serve_checksummed and not (
                    self.checksum_query
                    and "master_binlog_checksum" in self.checksum_query):
                # the stock server's behavior when a pre-5.6 client asks
                # for a checksummed stream (ER_SLAVE_CAN_NOT_HANDLE...)
                write_packet(conn, b"\xff" + struct.pack("<H", 1236)
                             + b"Replica can not handle replication "
                               b"events with the checksum that source "
                               b"is configured to log", 1)
                return
            # a real server's FIRST dump event is ALWAYS an artificial
            # ROTATE (timestamp 0), sent BEFORE any FDE — and trailed
            # with a CRC when the server checksums (the case that
            # breaks parsers seeded with checksum off)
            from .binlog import crc32_frame, encode_rotate

            rot = encode_rotate(4, "binlog.000001")
            if self.serve_checksummed:
                rot = crc32_frame(rot)
            body_events = list(self.events)
            if self.gtid_dump_set is not None:
                # GTID auto-positioning: skip transactions the client's
                # executed set already contains
                body_events = _filter_gtid_events(body_events,
                                                  self.gtid_dump_set)
            stream = [rot] + body_events
            seq = 1
            for ev in stream:
                seq = write_packet(conn, b"\x00" + ev, seq)
            write_packet(conn, b"\xfe\x00\x00\x02\x00", seq)
        finally:
            conn.close()
            self.listener.close()


class FakeWalsenderServer:
    """In-process Postgres walsender speaking protocol-v3 bytes (md5 or
    SCRAM-SHA-256 auth verified server-side, START_REPLICATION
    COPY-BOTH, keepalive requiring a standby-status reply, XLogData
    stream) — the hermetic stand-in driving
    :class:`.pgoutput_client.PgReplicationClient`. Serves one
    connection; ``auth_ok`` / ``saw_keepalive_reply`` record the
    client's conformance.

    ``auth="scram"`` runs the RFC 5802/7677 exchange exactly as a
    Postgres ≥ 10 with ``password_encryption = scram-sha-256`` would:
    mechanism negotiation, salted server-first, client-proof
    verification against the STORED key (never the cleartext), and a
    server-signature final the client must verify."""

    SALT = b"\x01\x02\x03\x04"
    SCRAM_SALT = b"\x0a\x0b\x0c\x0d\x0e\x0f\x10\x11"
    SCRAM_ITERATIONS = 4096

    def __init__(self, msgs: list[tuple[int, bytes]],
                 username: str = "repl", password: str = "",
                 auth: str = "md5", tls: bool = False,
                 server_ssl_context=None):
        import socket
        import threading

        self.msgs = msgs
        self.username = username
        self.password = password
        self.auth = auth
        self.tls = tls
        self.tls_established = False
        # see FakeMySQLReplicaServer: CA-signed context for verifying-
        # client tests, self-signed default otherwise
        self.server_ssl_context = server_ssl_context
        self.auth_ok = None
        self.saw_keepalive_reply = False
        self.query = None
        self.listener = socket.socket()
        self.listener.bind(("127.0.0.1", 0))
        self.listener.listen(1)
        self.port = self.listener.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)

    def start(self) -> "FakeWalsenderServer":
        self.thread.start()
        return self

    def join(self, timeout: float = 10.0) -> None:
        self.thread.join(timeout)

    def _serve(self) -> None:
        import struct

        from .pgoutput_client import (md5_auth_response, read_message,
                                      send_message)

        conn, _ = self.listener.accept()
        try:
            (ln,) = struct.unpack(">i", conn.recv(4))
            body = b""
            while len(body) < ln - 4:
                body += conn.recv(ln - 4 - len(body))
            if self.tls:
                (code,) = struct.unpack(">i", body[:4])
                if code != 80877103:  # SSLRequest magic
                    send_err = b"FATAL: server requires SSL\x00"
                    conn.sendall(b"E" + struct.pack(
                        ">i", len(send_err) + 4) + send_err)
                    return
                conn.sendall(b"S")
                import ssl as _ssl
                srv_ctx = (self.server_ssl_context
                           or self_signed_server_context())
                try:
                    conn = srv_ctx.wrap_socket(conn, server_side=True)
                except _ssl.SSLError:
                    return  # client rejected our certificate
                self.tls_established = True
                # the real StartupMessage follows over TLS
                (ln,) = struct.unpack(">i", conn.recv(4))
                body = b""
                while len(body) < ln - 4:
                    body += conn.recv(ln - 4 - len(body))
            self._serve_authenticated(conn, body)
        finally:
            conn.close()
            self.listener.close()

    def _scram_exchange(self, conn) -> bool:
        """RFC 5802 server side over the protocol-v3 SASL envelope."""
        import base64
        import secrets
        import struct

        from .pgoutput_client import (read_message, scram_client_proof,
                                      scram_verify_client_proof,
                                      send_message)

        send_message(conn, b"R",
                     struct.pack(">i", 10) + b"SCRAM-SHA-256\x00\x00")
        tag, resp = read_message(conn)
        assert tag == b"p"
        mech, _, rest = resp.partition(b"\x00")
        assert mech == b"SCRAM-SHA-256"
        (ilen,) = struct.unpack(">i", rest[:4])
        initial = rest[4:4 + ilen].decode("utf-8")
        assert initial.startswith("n,,")
        bare = initial[3:]
        client_nonce = dict(p.split("=", 1)
                            for p in bare.split(","))["r"]
        full_nonce = client_nonce + base64.b64encode(
            secrets.token_bytes(12)).decode()
        server_first = (f"r={full_nonce},"
                        f"s={base64.b64encode(self.SCRAM_SALT).decode()},"
                        f"i={self.SCRAM_ITERATIONS}")
        send_message(conn, b"R",
                     struct.pack(">i", 11) + server_first.encode())
        tag, final = read_message(conn)
        assert tag == b"p"
        final_s = final.decode("utf-8")
        without_proof, _, proof_b64 = final_s.rpartition(",p=")
        auth_message = ",".join([bare, server_first, without_proof])
        proof = base64.b64decode(proof_b64)
        self.auth_ok = scram_verify_client_proof(
            self.password, self.SCRAM_SALT, self.SCRAM_ITERATIONS,
            auth_message, proof)
        if not self.auth_ok:
            send_message(conn, b"E",
                         b"FATAL: SCRAM authentication failed\x00")
            return False
        _, server_sig = scram_client_proof(
            self.password, self.SCRAM_SALT, self.SCRAM_ITERATIONS,
            auth_message)
        send_message(conn, b"R", struct.pack(">i", 12) + b"v="
                     + base64.b64encode(server_sig))
        return True

    def _serve_authenticated(self, conn, body: bytes) -> None:
        import struct

        from .pgoutput_client import (md5_auth_response, read_message,
                                      send_message)

        (proto,) = struct.unpack(">i", body[:4])
        assert proto == 196608
        assert b"replication\x00database\x00" in body
        if self.auth == "scram":
            if not self._scram_exchange(conn):
                return
        else:
            send_message(conn, b"R", struct.pack(">i", 5) + self.SALT)
            tag, resp = read_message(conn)
            assert tag == b"p"
            expect = md5_auth_response(self.username, self.password,
                                       self.SALT)
            self.auth_ok = resp == expect
            if not self.auth_ok:
                send_message(conn, b"E", b"FATAL: password failed\x00")
                return
        send_message(conn, b"R", struct.pack(">i", 0))
        send_message(conn, b"S", b"server_version\x0016.0\x00")
        send_message(conn, b"K", struct.pack(">ii", 7, 42))
        send_message(conn, b"Z", b"I")
        tag, q = read_message(conn)
        assert tag == b"Q"
        self.query = q.rstrip(b"\x00").decode()
        send_message(conn, b"W", b"\x00\x00\x00")
        send_message(conn, b"d",
                     b"k" + struct.pack(">qq", 100, 0) + b"\x01")
        tag, reply = read_message(conn)
        self.saw_keepalive_reply = (tag == b"d" and reply[:1] == b"r")
        for lsn, m in self.msgs:
            send_message(conn, b"d", b"w"
                         + struct.pack(">qqq", lsn, lsn, 0) + m)
        send_message(conn, b"c", b"")


class FakeDsqlTokenGate:
    """Fake DSQL front door for IAM-auth tests (the fake-server
    discipline of :class:`FakeMySQLReplicaServer` applied to the DSQL
    sink, reference ``DsqlAuthenticator.java``): VERIFIES a presented
    DbConnect token the way the service would — recomputes its SigV4
    signature from the known secret over the token's own parameters,
    checks the hostname, and enforces the X-Amz-Date + X-Amz-Expires
    window against an injected clock. ``connect(user, password)``
    raises a token-expiration-shaped error on any failure, so
    :func:`..iam_auth.iam_conn_factory`'s refresh-and-retry path is
    exercised for real."""

    def __init__(self, clock, secret: str, host: str, region: str):
        self.clock = clock
        self.secret = secret
        self.host = host
        self.region = region
        self.attempts = 0
        self.accepted = 0

    def check(self, user: str, password: str) -> None:
        from datetime import datetime, timezone
        from urllib.parse import parse_qsl, urlsplit

        from .iam_auth import Credentials, generate_db_connect_auth_token

        self.attempts += 1
        host, _, _ = password.partition("/?")
        params = dict(parse_qsl(urlsplit("https://" + password).query,
                                keep_blank_values=True))
        sig = params.pop("X-Amz-Signature", "")
        issued_dt = datetime.strptime(
            params["X-Amz-Date"], "%Y%m%dT%H%M%SZ").replace(
            tzinfo=timezone.utc)
        expect = generate_db_connect_auth_token(
            host, self.region,
            Credentials(params["X-Amz-Credential"].split("/")[0],
                        self.secret,
                        params.get("X-Amz-Security-Token")),
            admin=params["Action"] == "DbConnectAdmin",
            expires_in=int(params["X-Amz-Expires"]), now=issued_dt)
        if host != self.host or not sig or not expect.endswith(sig):
            raise ConnectionError("access denied: bad signature")
        if self.clock() > issued_dt.timestamp() + int(
                params["X-Amz-Expires"]):
            raise ConnectionError("access denied: signature expired")
        self.accepted += 1
