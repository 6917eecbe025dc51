"""libpq DSN handling → Spark JDBC options.

The reference takes libpq key=value connection strings
(reference: README.md ATTACH examples, src/postgres_connection.cpp).
Spark's native Postgres access is the JDBC source, so we parse the
same DSN surface and emit `spark.read.format("jdbc")` options. No
live Postgres exists in the test container, so everything here is
pure and unit-tested; `scan.py` uses it to build reader options.
"""

from __future__ import annotations

import shlex
from dataclasses import dataclass, field


@dataclass
class ConnectionInfo:
    host: str = "localhost"
    port: int = 5432
    dbname: str = ""
    user: str | None = None
    password: str | None = None
    options: dict[str, str] = field(default_factory=dict)

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.host}:{self.port}/{self.dbname}"

    def jdbc_properties(self) -> dict[str, str]:
        props = {"driver": "org.postgresql.Driver"}
        if self.user:
            props["user"] = self.user
        if self.password:
            props["password"] = self.password
        for k in ("connect_timeout", "sslmode", "application_name"):
            if k in self.options:
                jk = {"connect_timeout": "connectTimeout",
                      "sslmode": "sslmode",
                      "application_name": "ApplicationName"}[k]
                props[jk] = self.options[k]
        return props


def parse_dsn(dsn: str) -> ConnectionInfo:
    """Parse a libpq 'key=value key=value' DSN (single-quoted values
    supported, per libpq rules). Unknown keys are preserved in
    .options, matching libpq's permissive parameter list."""
    info = ConnectionInfo()
    if dsn.startswith(("postgres:", "postgresql:")) and "://" not in dsn:
        # bare 'postgres:' prefix selects the engine type without a
        # URI (reference: attach_prefix.test / postgres_storage.cpp)
        dsn = dsn.split(":", 1)[1]
    if dsn.startswith("postgres://") or dsn.startswith("postgresql://"):
        rest = dsn.split("://", 1)[1]
        auth, _, hostpart = rest.rpartition("@")
        if auth:
            user, _, pw = auth.partition(":")
            info.user = user or None
            info.password = pw or None
        hostport, _, db = hostpart.partition("/")
        db = db.split("?", 1)[0]
        host, _, port = hostport.partition(":")
        info.host = host or info.host
        if port:
            info.port = int(port)
        info.dbname = db
        if "?" in hostpart:
            for pair in hostpart.split("?", 1)[1].split("&"):
                k, _, v = pair.partition("=")
                info.options[k] = v
        return info
    for token in shlex.split(dsn):
        key, _, value = token.partition("=")
        key = key.strip().lower()
        value = value.strip()
        if key == "host":
            info.host = value
        elif key == "hostaddr":
            info.host = value
        elif key == "port":
            info.port = int(value)
        elif key in ("dbname", "database"):
            info.dbname = value
        elif key == "user":
            info.user = value
        elif key == "password":
            info.password = value
        else:
            info.options[key] = value
    return info


# ---- secrets (reference: test/sql/scanner/attach_secret.test;
# DuckDB CREATE SECRET (TYPE postgres, HOST ..., ...) + ATTACH '' with
# SECRET name). A process-level registry: attach() resolves
# "secret:name" (or an explicit secret= kwarg) to a full DSN so
# credentials never appear in the attach string.
_SECRETS: dict[str, ConnectionInfo] = {}


def create_secret(name: str, *, host: str = "localhost", port: int = 5432,
                  database: str = "", user: str | None = None,
                  password: str | None = None,
                  replace: bool = False, **options: str) -> None:
    if name in _SECRETS and not replace:
        raise ValueError(f"secret {name!r} already exists")
    _SECRETS[name] = ConnectionInfo(
        host=host, port=port, dbname=database, user=user,
        password=password, options=dict(options))


def drop_secret(name: str, *, if_exists: bool = False) -> None:
    if name not in _SECRETS:
        if if_exists:
            return
        raise ValueError(f"no such secret {name!r}")
    del _SECRETS[name]


def list_secrets() -> list[str]:
    return sorted(_SECRETS)


def resolve_secret(name: str) -> ConnectionInfo:
    if name not in _SECRETS:
        raise KeyError(f"no such secret {name!r}")
    return _SECRETS[name]
