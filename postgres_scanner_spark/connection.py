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
