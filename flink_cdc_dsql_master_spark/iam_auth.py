"""DSQL IAM authentication: SigV4-presigned DbConnect tokens.

Reference counterparts (behavioral spec only — implementation is a
clean-room SigV4 presigner over the published AWS Signature Version 4
algorithm):

- ``DsqlAuthenticator.java:47-60`` — token cache + 20-minute scheduled
  refresh, 25-minute entry validity, cache key ``host:region:role``,
  ``DsqlUtilities.generateDbConnectAdminAuthToken`` for the bytes,
  3-attempt exponential-backoff generation, ``forceTokenRefresh`` /
  ``clearTokenCache`` maintenance entry points.
- ``DsqlSinkOptions.java`` — ``use-iam-auth`` (default true!), ``region``,
  ``iam-role``, ``host``; password auth is the explicit fallback.
- ``DsqlBatchSinkFunction.java:574-660`` — connection acquisition retries
  on token-expiration-shaped SQL errors by forcing a refresh and
  recreating the pool (2s·attempt backoff); non-token errors fail fast.

Token format (public — the same shape ``aws dsql generate-db-connect-
admin-auth-token`` and the SDKs emit): the cluster hostname followed by
a SigV4 *query-presigned* ``/`` request for service ``dsql`` with an
``Action=DbConnect`` / ``Action=DbConnectAdmin`` parameter — no scheme
prefix; the whole string is passed as the SQL password. The SigV4 chain
(canonical request → string-to-sign → ``AWS4`` HMAC key derivation) is
the published algorithm; byte shapes are pinned in
``tests/test_iam_auth.py`` against AWS-SDK-generated golden vectors
under a fixed clock.

Spark deployment notes:

- The authenticator performs *cooperative* refresh: every token access
  checks the 20-minute refresh deadline instead of hosting a daemon
  scheduler thread (the reference's ScheduledExecutorService). Executor
  processes acquire connections per partition/micro-batch, which gives a
  natural refresh point at least once per batch; a background thread in
  a forked Python worker would not survive executor recycling anyway.
- Everything here is picklable with plain callables, so an
  ``iam_conn_factory`` ships to executors inside ``foreachPartition``
  closures exactly like any other ``conn_factory``.
"""

from __future__ import annotations

import hashlib
import hmac
import threading
import time as _time
from dataclasses import dataclass
from datetime import datetime, timezone
from urllib.parse import quote

__all__ = [
    "Credentials",
    "generate_db_connect_auth_token",
    "default_credentials_provider",
    "DsqlAuthenticator",
    "authenticator_from_config",
    "PostgresConnect",
    "iam_conn_factory",
    "is_token_expiration_error",
    "RotatingConnectionPool",
]

_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()
_ALGORITHM = "AWS4-HMAC-SHA256"
_SERVICE = "dsql"

# DsqlAuthenticator.java:56 — refresh cadence; TokenCacheEntry:25-minute
# validity backstop (":More conservative token validity").
TOKEN_REFRESH_INTERVAL_S = 20 * 60
TOKEN_VALIDITY_S = 25 * 60
# AWS default presign lifetime for DbConnect tokens (15 minutes is the
# SDK default; the reference relies on the SDK default too). The cache
# refreshes well before a 1h+ expiry; keep the SDK's 900s default so
# tokens match the CLI/SDK byte-for-byte under the same inputs.
DEFAULT_EXPIRES_IN_S = 900


@dataclass(frozen=True)
class Credentials:
    """A static AWS credential triple (the resolved output of the
    reference's ``DefaultCredentialsProvider``)."""

    access_key_id: str
    secret_access_key: str
    session_token: str | None = None


def _uri_encode(value: str) -> str:
    """SigV4 URI encoding: unreserved chars only (RFC 3986 strict)."""
    return quote(value, safe="-_.~")


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _signing_key(secret: str, date: str, region: str, service: str) -> bytes:
    """The published AWS4 key-derivation chain."""
    k_date = _hmac(("AWS4" + secret).encode("utf-8"), date)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    return _hmac(k_service, "aws4_request")


def generate_db_connect_auth_token(
        hostname: str, region: str, credentials: Credentials, *,
        admin: bool = False, expires_in: int = DEFAULT_EXPIRES_IN_S,
        now: datetime | None = None) -> str:
    """SigV4 query-presigned DbConnect token for an Amazon-DSQL-shaped
    endpoint — the byte format ``DsqlUtilities.generateDbConnect[Admin]
    AuthToken`` returns (reference ``DsqlAuthenticator.java:214-222``),
    reimplemented from the public SigV4 spec and pinned against
    SDK-generated golden vectors. ``now`` injects the signing clock for
    tests; production callers leave it None (UTC wall clock)."""
    if now is None:
        now = datetime.now(timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    scope = f"{datestamp}/{region}/{_SERVICE}/aws4_request"

    # Parameter order mirrors the SDK's presigner output: the operation
    # param first, then the X-Amz-* auth params, signature appended
    # last. The CANONICAL query string (signed bytes) is the same set
    # sorted by key.
    params: list[tuple[str, str]] = [
        ("Action", "DbConnectAdmin" if admin else "DbConnect"),
        ("X-Amz-Algorithm", _ALGORITHM),
        ("X-Amz-Credential", f"{credentials.access_key_id}/{scope}"),
        ("X-Amz-Date", amz_date),
        ("X-Amz-Expires", str(int(expires_in))),
        ("X-Amz-SignedHeaders", "host"),
    ]
    if credentials.session_token:
        params.append(("X-Amz-Security-Token", credentials.session_token))

    canonical_query = "&".join(
        f"{_uri_encode(k)}={_uri_encode(v)}" for k, v in sorted(params))
    canonical_request = "\n".join([
        "GET",
        "/",
        canonical_query,
        f"host:{hostname}\n",
        "host",
        _EMPTY_SHA256,
    ])
    string_to_sign = "\n".join([
        _ALGORITHM,
        amz_date,
        scope,
        hashlib.sha256(canonical_request.encode("utf-8")).hexdigest(),
    ])
    key = _signing_key(credentials.secret_access_key, datestamp, region,
                       _SERVICE)
    signature = hmac.new(key, string_to_sign.encode("utf-8"),
                         hashlib.sha256).hexdigest()
    query = "&".join(f"{_uri_encode(k)}={_uri_encode(v)}"
                     for k, v in params)
    return f"{hostname}/?{query}&X-Amz-Signature={signature}"


def default_credentials_provider() -> Credentials:
    """Resolve AWS credentials the standard public way — the analog of
    the reference's ``DefaultCredentialsProvider``: the
    ``AWS_ACCESS_KEY_ID``/``AWS_SECRET_ACCESS_KEY``/``AWS_SESSION_TOKEN``
    environment variables first, then botocore's full resolver chain
    (profile / instance metadata) when that package is importable."""
    import os

    ak = os.environ.get("AWS_ACCESS_KEY_ID")
    sk = os.environ.get("AWS_SECRET_ACCESS_KEY")
    if ak and sk:
        return Credentials(ak, sk, os.environ.get("AWS_SESSION_TOKEN"))
    try:
        import botocore.session
        resolved = botocore.session.get_session().get_credentials()
        if resolved is not None:
            frozen = resolved.get_frozen_credentials()
            return Credentials(frozen.access_key, frozen.secret_key,
                               frozen.token)
    except Exception:  # noqa: BLE001 — fall through to the error below
        pass
    raise ValueError(
        "no AWS credentials found: set AWS_ACCESS_KEY_ID/"
        "AWS_SECRET_ACCESS_KEY or supply a credentials_provider")


def is_token_expiration_error(exc: BaseException) -> bool:
    """Message-shape parity with
    ``DsqlBatchSinkFunction.isTokenExpirationError`` (:638-651): the
    substrings DSQL/libpq emit when a presigned token lapses."""
    message = str(exc).lower()
    return any(s in message for s in (
        "signature expired",
        "access denied",
        "authentication failed",
        "token expired",
        "invalid token",
        "unable to accept connection",
        "connection attempt failed",
        "password authentication failed",
    ))


@dataclass
class _TokenCacheEntry:
    token: str
    created_at: float
    generation: int

    def age_s(self, now: float) -> float:
        return now - self.created_at

    def is_expired(self, now: float) -> bool:
        return self.age_s(now) >= TOKEN_VALIDITY_S

    def refresh_due(self, now: float) -> bool:
        return self.age_s(now) >= TOKEN_REFRESH_INTERVAL_S


class DsqlAuthenticator:
    """IAM-or-password authentication for DSQL-shaped connections
    (``DsqlAuthenticator.java`` parity).

    ``credentials_provider`` is a zero-arg callable returning
    :class:`Credentials` — the injectable analog of the reference's
    ``DefaultCredentialsProvider`` (resolution order env → profile →
    instance metadata is a deployment concern, not engine logic).
    ``clock``/``sleep`` inject time for deterministic tests.
    """

    # process-wide cache like the reference's static ConcurrentHashMap
    _TOKEN_CACHE: dict[str, _TokenCacheEntry] = {}
    _CACHE_LOCK = threading.Lock()

    def __init__(self, *, host: str | None = None,
                 region: str | None = None,
                 iam_role: str | None = None,
                 use_iam_auth: bool = True,
                 username: str | None = None,
                 password: str | None = None,
                 admin: bool = True,
                 expires_in: int = DEFAULT_EXPIRES_IN_S,
                 credentials_provider=None,
                 clock=_time.time, sleep=_time.sleep,
                 metrics=None):
        self.host = host
        self.region = region
        self.iam_role = iam_role
        self.use_iam_auth = use_iam_auth
        self.username = username
        self.password = password
        self.admin = admin
        self.expires_in = expires_in
        self.credentials_provider = credentials_provider
        self.clock = clock
        self.sleep = sleep
        # metrics face (dsql.md "Authentication Metrics"): token refresh
        # count + authentication failures. Either a driver-side
        # MetricsRegistry or the picklable ExecutorMetrics handle —
        # anything with .inc(metric, value).
        self.metrics = metrics

    # -- public surface (configureAuthentication parity) -----------------

    def configure_authentication(self, properties: dict) -> dict:
        """Fill ``user``/``password`` connection properties
        (``configureAuthentication``): IAM mode presents the token as
        the password for the ``admin`` user; password mode requires both
        username and password (fail-fast parity :99-104)."""
        if self.use_iam_auth:
            if not (self.region and self.region.strip()):
                raise ValueError("Region is required for IAM authentication")
            if not (self.host and self.host.strip()):
                raise ValueError("Host is required for IAM authentication")
            properties["user"] = self.username or "admin"
            properties["password"] = self.get_or_generate_auth_token()
        else:
            if self.username is None or self.password is None:
                raise ValueError(
                    "Username and password are required when IAM "
                    "authentication is disabled")
            properties["user"] = self.username
            properties["password"] = self.password
        return properties

    @property
    def cache_key(self) -> str:
        return f"{self.host}:{self.region}:{self.iam_role or 'default'}"

    def get_or_generate_auth_token(self) -> str:
        """Cached token if fresh; regenerate at the 20-minute refresh
        deadline (cooperative analog of the reference's scheduled
        refresh) or on hard 25-minute expiry."""
        now = self.clock()
        with self._CACHE_LOCK:
            entry = self._TOKEN_CACHE.get(self.cache_key)
        if entry is not None and not entry.refresh_due(now) \
                and not entry.is_expired(now):
            return entry.token
        return self._generate_and_cache(prev=entry)

    def force_token_refresh(self) -> str:
        """Drop the cached token and mint a new one — called when a
        token-expiration error is detected downstream
        (``forceTokenRefresh``)."""
        with self._CACHE_LOCK:
            prev = self._TOKEN_CACHE.pop(self.cache_key, None)
        return self._generate_and_cache(prev=prev)

    def token_generation(self) -> int:
        """Monotone counter bumped on every (re)generation — pools use
        it to retire connections opened under a stale credential."""
        with self._CACHE_LOCK:
            entry = self._TOKEN_CACHE.get(self.cache_key)
        return entry.generation if entry else 0

    @classmethod
    def clear_token_cache(cls) -> None:
        with cls._CACHE_LOCK:
            cls._TOKEN_CACHE.clear()

    @classmethod
    def get_cache_stats(cls, now: float | None = None) -> dict:
        """``getCacheStats`` parity — entry ages + generations for
        monitoring."""
        if now is None:
            now = _time.time()
        with cls._CACHE_LOCK:
            return {k: {"age_s": e.age_s(now), "generation": e.generation,
                        "expired": e.is_expired(now)}
                    for k, e in cls._TOKEN_CACHE.items()}

    # -- internals --------------------------------------------------------

    def _generate_and_cache(self, prev: _TokenCacheEntry | None) -> str:
        token = self._generate_with_retry()
        entry = _TokenCacheEntry(
            token, self.clock(),
            generation=(prev.generation if prev else 0) + 1)
        with self._CACHE_LOCK:
            self._TOKEN_CACHE[self.cache_key] = entry
        if self.metrics is not None:
            from .metrics import TOKEN_REFRESH_COUNT
            self.metrics.inc(TOKEN_REFRESH_COUNT)
        return token

    def _generate_with_retry(self, max_retries: int = 3) -> str:
        """3 attempts, 1s/2s exponential backoff
        (``generateAuthTokenWithRetry`` :178-205)."""
        last = None
        for attempt in range(1, max_retries + 1):
            try:
                return self._generate()
            except Exception as e:  # noqa: BLE001 — parity: retry any
                last = e
                if self.metrics is not None:
                    from .metrics import AUTH_FAILURES
                    self.metrics.inc(AUTH_FAILURES)
                if attempt < max_retries:
                    self.sleep(1.0 * (1 << (attempt - 1)))
        raise RuntimeError(
            f"Failed to generate DSQL authentication token after "
            f"{max_retries} attempts") from last

    def _generate(self) -> str:
        if self.credentials_provider is None:
            raise ValueError(
                "IAM authentication requires a credentials_provider "
                "(zero-arg callable returning Credentials)")
        creds = self.credentials_provider()
        return generate_db_connect_auth_token(
            self.host, self.region, creds, admin=self.admin,
            expires_in=self.expires_in,
            now=datetime.fromtimestamp(self.clock(), tz=timezone.utc))


def authenticator_from_config(config: dict, *, credentials_provider=None,
                              clock=_time.time,
                              sleep=_time.sleep,
                              metrics=None) -> DsqlAuthenticator:
    """YAML sink options → authenticator (``DsqlSinkOptions.java``
    parity: ``use-iam-auth`` defaults to TRUE — IAM is the recommended
    DSQL auth mode, password the explicit fallback)."""
    use_iam = config.get("use-iam-auth", True)
    if isinstance(use_iam, str):
        use_iam = use_iam.strip().lower() not in ("false", "0", "no")
    username = config.get("username")
    # the admin user presents DbConnectAdmin tokens (the reference's
    # hardcoded mode); any other IAM database user needs the plain
    # DbConnect action per the public DSQL auth contract
    admin = username in (None, "admin")
    return DsqlAuthenticator(
        admin=admin,
        host=config.get("host"),
        region=config.get("region"),
        iam_role=config.get("iam-role"),
        use_iam_auth=use_iam,
        username=config.get("username"),
        password=config.get("password"),
        credentials_provider=(credentials_provider
                              or config.get("credentials-provider")
                              or default_credentials_provider),
        clock=clock, sleep=sleep,
        metrics=metrics or config.get("metrics"))


@dataclass
class PostgresConnect:
    """Picklable ``connect(user=..., password=...)`` for a
    Postgres-wire DSQL endpoint via any importable Postgres DB-API
    driver (psycopg 3, then psycopg2). DSQL requires TLS, hence
    ``sslmode=require`` (verify-full when a CA bundle is configured)."""

    host: str
    port: int = 5432
    database: str = "postgres"
    sslrootcert: str | None = None

    def __call__(self, *, user: str, password: str):
        try:
            import psycopg as _pg
        except ImportError:
            try:
                import psycopg2 as _pg  # noqa: N813
            except ImportError as e:
                raise ImportError(
                    "connecting to a live DSQL endpoint needs psycopg "
                    "or psycopg2; inject a `connect` callable in the "
                    "sink config otherwise") from e
        kwargs = dict(host=self.host, port=self.port, dbname=self.database,
                      user=user, password=password,
                      sslmode="verify-full" if self.sslrootcert
                      else "require")
        if self.sslrootcert:
            kwargs["sslrootcert"] = self.sslrootcert
        return _pg.connect(**kwargs)


@dataclass
class iam_conn_factory:  # noqa: N801 — callable factory, lower-case like a fn
    """Zero-arg picklable conn factory wrapping ``base_connect(user=...,
    password=...)`` with IAM token auth and expiration-aware retry —
    ``DsqlBatchSinkFunction.getConnectionWithRetry`` (:574-634): a
    token-expiration-shaped failure forces a refresh and retries with
    2s·attempt backoff; any other error raises immediately."""

    base_connect: object
    authenticator: DsqlAuthenticator
    max_retries: int = 3

    def __call__(self):
        metrics = self.authenticator.metrics
        last = None
        for attempt in range(1, self.max_retries + 1):
            props: dict = {}
            self.authenticator.configure_authentication(props)
            try:
                return self.base_connect(user=props["user"],
                                         password=props["password"])
            except Exception as e:  # noqa: BLE001 — classified below
                last = e
                # a static-password failure is permanent — refreshing
                # cannot help and the password authenticator has no
                # token generator to refresh with
                retriable = (self.authenticator.use_iam_auth
                             and is_token_expiration_error(e))
                if metrics is not None:
                    # retried only when another attempt actually follows:
                    # the final retriable failure exhausts the budget and
                    # propagates, so it is not a retry ATTEMPT
                    metrics.record_error(
                        e, retried=retriable and attempt < self.max_retries)
                if not retriable:
                    raise
                self.authenticator.force_token_refresh()
                if attempt < self.max_retries:
                    self.authenticator.sleep(2.0 * attempt)
        raise RuntimeError(
            f"Failed to get database connection after "
            f"{self.max_retries} retries") from last


class RotatingConnectionPool:
    """A small per-process connection pool whose members are retired
    when the authenticator's token generation advances or their
    ``max_lifetime_s`` lapses — the analog of the reference recreating
    its HikariCP pool on refresh (``refreshConnectionPoolWithNewToken``
    :678-706; ``connection-max-lifetime-ms`` default 59 min in
    ``DsqlSinkOptions``). One pool per executor process; acquisition is
    thread-safe for the multi-threaded local master."""

    def __init__(self, conn_factory, authenticator: DsqlAuthenticator,
                 max_size: int = 10,
                 max_lifetime_s: float = 3540.0):
        self.conn_factory = conn_factory
        self.authenticator = authenticator
        self.max_size = max_size
        self.max_lifetime_s = max_lifetime_s
        self._idle: list[tuple[object, float, int]] = []
        self._active = 0  # outstanding acquires (gauge source)
        self._lock = threading.Lock()

    def acquire(self):
        metrics = self.authenticator.metrics
        t0 = _time.monotonic()
        gen = self.authenticator.token_generation()
        now = self.authenticator.clock()
        with self._lock:
            while self._idle:
                conn, born, conn_gen = self._idle.pop()
                if conn_gen == gen and now - born < self.max_lifetime_s:
                    self._active += 1
                    self._note_acquire(metrics, t0)
                    return conn, born, conn_gen
                self._retire(conn, metrics)
        conn = self.conn_factory()
        if metrics is not None:
            from .metrics import POOL_CREATED
            metrics.inc(POOL_CREATED)
        with self._lock:
            self._active += 1
        self._note_acquire(metrics, t0)
        return conn, now, self.authenticator.token_generation()

    def release(self, handle) -> None:
        conn, born, conn_gen = handle
        gen = self.authenticator.token_generation()
        now = self.authenticator.clock()
        with self._lock:
            self._active = max(0, self._active - 1)
            fresh = (conn_gen == gen
                     and now - born < self.max_lifetime_s
                     and len(self._idle) < self.max_size)
            if fresh:
                self._idle.append((conn, born, conn_gen))
                self._set_gauges(self.authenticator.metrics)
                return
        self._retire(conn, self.authenticator.metrics)
        self._set_gauges(self.authenticator.metrics)

    def _note_acquire(self, metrics, t0: float) -> None:
        if metrics is not None:
            from .metrics import POOL_ACQUIRE_LATENCY
            metrics.observe(POOL_ACQUIRE_LATENCY,
                            _time.monotonic() - t0)
        self._set_gauges(metrics)

    def _set_gauges(self, metrics) -> None:
        # active/idle gauges (dsql.md "Connection Pool Metrics") —
        # driver registries only; the picklable executor handle is
        # additive-merge and carries no gauge face
        if metrics is not None and hasattr(metrics, "set_gauge"):
            from .metrics import POOL_ACTIVE
            metrics.set_gauge(POOL_ACTIVE, self._active)
            metrics.set_gauge("pool.connections.idle", len(self._idle))

    def _retire(self, conn, metrics) -> None:
        if metrics is not None:
            from .metrics import POOL_RETIRED
            metrics.inc(POOL_RETIRED)
        self._close_quietly(conn)

    def close(self) -> None:
        with self._lock:
            idle, self._idle = self._idle, []
        for conn, _, _ in idle:
            self._close_quietly(conn)

    @property
    def idle_count(self) -> int:
        with self._lock:
            return len(self._idle)

    @staticmethod
    def _close_quietly(conn) -> None:
        try:
            conn.close()
        except Exception:  # noqa: BLE001 — retirement is best-effort
            pass
