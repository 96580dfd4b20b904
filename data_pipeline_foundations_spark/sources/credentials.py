"""Credential resolution for source connections (SURVEY.md §2.1 S12).

The reference loads DB credentials from a ``.env`` file via python-dotenv
and builds a read-only SQL Server engine URL from them
(db_connection.py:20-44). The Spark twin keeps the same precedence and
shape without adding a dependency:

  explicit overrides  >  process environment  >  dotenv-style file

and emits a JDBC URL (Spark reads through JDBC, not SQLAlchemy) carrying
the same connection discipline the reference encodes: encrypted
transport, certificate validation, read-only application intent. No real
endpoint, account, or secret appears anywhere — resolution is pure
plumbing over caller-provided names.
"""

from __future__ import annotations

import os


def parse_dotenv(path: str) -> dict[str, str]:
    """Minimal KEY=VALUE parser: blank lines and ``#`` comments skipped,
    optional ``export`` prefix, single/double quotes stripped."""
    out: dict[str, str] = {}
    if not os.path.exists(path):
        return out
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            k, v = line.split("=", 1)
            v = v.strip()
            if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
                v = v[1:-1]
            out[k.strip()] = v
    return out


def resolve_credentials(keys: list[str], *,
                        overrides: dict[str, str] | None = None,
                        env: dict[str, str] | None = None,
                        dotenv_path: str | None = None) -> dict[str, str]:
    """Resolve each key by precedence overrides > env > dotenv file.

    Raises ``KeyError`` naming every unresolved key at once (a partial
    credential set fails the connection later with a worse message).
    """
    overrides = overrides or {}
    env = os.environ if env is None else env
    dotenv = parse_dotenv(dotenv_path) if dotenv_path else {}
    out, missing = {}, []
    for k in keys:
        if k in overrides:
            out[k] = overrides[k]
        elif k in env:
            out[k] = env[k]
        elif k in dotenv:
            out[k] = dotenv[k]
        else:
            missing.append(k)
    if missing:
        raise KeyError(f"unresolved credentials: {missing}")
    return out


def resolve_service_account(env_var: str = "GOOGLE_SHEETS_CREDENTIALS", *,
                            env: dict[str, str] | None = None,
                            base_dir: str | None = None) -> dict:
    """Resolve a service-account credential blob the reference's three
    ways (utils/gsheets_utils.py:81-112): the env value is tried as an
    absolute path, then as a path relative to ``base_dir``, then — if it
    starts with ``{`` — parsed as inline JSON (cloud deployments).
    Returns the parsed credential dict; raises ``RuntimeError`` with the
    reference's two failure messages (unset/empty; neither path nor
    JSON). The OAuth exchange itself lives in the connector's
    ``token_provider`` — this helper is only the resolution step, so it
    stays dependency-free and fully testable."""
    import json as _json

    env = os.environ if env is None else env
    raw = (env.get(env_var) or "").strip()
    if not raw:
        raise RuntimeError(f"{env_var} is not set or is empty")
    candidates = [raw]
    if base_dir:
        candidates.append(os.path.join(base_dir, raw))
    for path in candidates:
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                return _json.load(f)
    if raw.startswith("{"):
        return _json.loads(raw)
    raise RuntimeError(
        f"{env_var} is neither a valid path nor JSON. Got: {raw!r}")


def sqlserver_jdbc_url(server: str, database: str, *,
                       encrypt: bool = True,
                       trust_server_certificate: bool = False,
                       readonly: bool = True) -> str:
    """JDBC twin of the reference's SQLAlchemy URL (db_connection.py:38-41):
    encrypted, certificate-validated, read-only-intent SQL Server
    connection string for ``spark.read.jdbc``. Credentials do NOT go in
    the URL — pass them as reader options so they never land in logs or
    plan strings."""
    props = {
        "encrypt": "true" if encrypt else "false",
        "trustServerCertificate":
            "true" if trust_server_certificate else "false",
    }
    if readonly:
        props["applicationIntent"] = "ReadOnly"
    opts = ";".join(f"{k}={v}" for k, v in sorted(props.items()))
    return f"jdbc:sqlserver://{server};databaseName={database};{opts}"
