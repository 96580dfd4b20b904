"""Metabase schema-sync trigger (SURVEY.md §2.1 S13).

After a warehouse rebuild the reference pokes Metabase so the BI layer
re-reads table/column metadata (sync_metabase_schema.py:20-43): POST
``/api/session`` with username/password for a session token, then POST
``/api/database/{id}/sync_schema`` with the ``X-Metabase-Session``
header, swallowing request failures with a diagnostic (the rebuild must
not fail because BI metadata refresh did). Same two-call protocol here
over stdlib HTTP — the connector module's REST discipline — tested
against a local fake server.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request


class MetabaseClient:
    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    def _post(self, path: str, body: dict | None,
              headers: dict | None = None) -> dict:
        req = urllib.request.Request(
            f"{self.base}{path}",
            data=json.dumps(body or {}).encode(),
            method="POST",
            headers={"Content-Type": "application/json", **(headers or {})})
        with urllib.request.urlopen(req) as resp:
            raw = resp.read()
        return json.loads(raw) if raw else {}

    def sync_schema(self, username: str, password: str,
                    database_id: str | int) -> bool:
        """Trigger a schema sync; True on success, False on any request/
        auth failure (reference behavior: log-and-continue — a BI
        metadata refresh must never fail the warehouse build)."""
        try:
            session = self._post("/api/session",
                                 {"username": username, "password": password})
            token = session["id"]
            self._post(f"/api/database/{database_id}/sync_schema", None,
                       headers={"X-Metabase-Session": token})
            return True
        except (urllib.error.URLError, urllib.error.HTTPError,
                KeyError, json.JSONDecodeError, OSError):
            return False
