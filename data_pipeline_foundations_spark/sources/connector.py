"""Folder-feed connector: the Drive surface behind an injectable backend.

The reference's Google Drive/Sheets connectors (SURVEY.md §2.1 S3/S4/
S10/S11, utils/gsheets_utils.py) are driver-side REST glue: list a
folder, download a file into a DataFrame, upload a DataFrame as a report.
The engine keeps that exact surface but splits it into:

  - a tiny **backend protocol** (list/fetch/put bytes) — the only part
    that touches a remote API;
  - the **connector** that turns backend files into Spark DataFrames
    (dispatch on extension, explicit schema support) and DataFrames into
    report files.

``LocalFolderBackend`` implements the protocol over a directory tree.
``DriveRestBackend`` implements it against the Google Drive REST v3 API
with stdlib HTTP only (the API is plain REST — no SDK required): listing
is the documented ``files.list`` query with pagination, download is
``alt=media``, upload is multipart. Credentials stay out of scope
(SURVEY.md §7.5): the backend takes an injected bearer-token provider.
The base URL is injectable, so tests drive the full HTTP path against a
local fake Drive server (tests/test_sources.py) — the only untested span
is Google's TLS endpoint itself.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .readers import read_csv, read_json, read_parquet


class LocalFolderBackend:
    """Filesystem implementation of the folder-feed protocol."""

    def __init__(self, root: str):
        self.root = root

    def list_files(self, folder: str) -> list[dict]:
        """S3 analog (utils/gsheets_utils.py:127-148): id, name, mimeType
        become path, name, extension."""
        d = os.path.join(self.root, folder) if folder else self.root
        out = []
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if os.path.isfile(p):
                out.append({"path": p, "name": name,
                            "ext": os.path.splitext(name)[1].lstrip(".").lower()})
        return out

    def put_bytes(self, folder: str, name: str, payload: bytes) -> str:
        d = os.path.join(self.root, folder) if folder else self.root
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, name)
        with open(p, "wb") as fh:
            fh.write(payload)
        return p


_MIME_EXT = {
    "text/csv": "csv",
    "application/json": "json",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "xlsx",
    "application/vnd.ms-excel": "xls",
    "application/octet-stream": "",
}


class _RestClient:
    """Shared bearer-token HTTP plumbing for the Google REST backends."""

    def __init__(self, token_provider, base_url: str):
        self.token = token_provider
        self.base = base_url.rstrip("/")

    def _call(self, url: str, data: bytes | None = None,
              headers: dict | None = None, method: str | None = None) -> bytes:
        req = urllib.request.Request(url, data=data, method=method, headers={
            "Authorization": f"Bearer {self.token()}", **(headers or {})})
        with urllib.request.urlopen(req) as resp:
            return resp.read()


class SheetsRestBackend(_RestClient):
    """Google Sheets REST v4 sink (S11, reference utils/gsheets_utils.py:
    64-78: clear the tab, then write the DataFrame with a header row).

    The reference uses gspread; the underlying API is two REST calls —
    ``values:clear`` then ``values:update?valueInputOption=RAW`` — so
    stdlib HTTP covers it. Sheets are small report outputs by contract
    (never data-scale); rows pass driver-side.
    """

    def __init__(self, token_provider, *,
                 base_url: str = "https://sheets.googleapis.com"):
        super().__init__(token_provider, base_url)

    def write_values(self, spreadsheet_id: str, tab: str,
                     header: list[str], rows: list[list], *,
                     clear: bool = True) -> None:
        rng = urllib.parse.quote(tab)
        base = f"{self.base}/v4/spreadsheets/{urllib.parse.quote(spreadsheet_id)}"
        if clear:
            self._call(f"{base}/values/{rng}:clear", data=b"{}",
                       headers={"Content-Type": "application/json"})
        body = json.dumps({"values": [header] + [
            [v if v is None or isinstance(v, (int, float, bool)) else str(v)
             for v in row] for row in rows]}).encode()
        self._call(f"{base}/values/{rng}?valueInputOption=RAW",
                   data=body, method="PUT",
                   headers={"Content-Type": "application/json"})

    def export_dataframe(self, df: DataFrame, spreadsheet_id: str,
                         tab: str, *, clear: bool = True) -> None:
        pdf = df.toPandas()
        self.write_values(spreadsheet_id, tab, list(pdf.columns),
                          pdf.values.tolist(), clear=clear)


class DriveRestBackend(_RestClient):
    """Google Drive REST v3 backend (reference utils/gsheets_utils.py:
    114-186) over stdlib HTTP.

    - ``list_files`` = ``GET {base}/drive/v3/files`` with the reference's
      exact query (``'<folder>' in parents and trashed = false``,
      gsheets_utils.py:131-136), paginated via nextPageToken.
    - Downloads (``alt=media``) stage into ``staging_dir``; the connector
      reads the staged path with Spark — Drive is a feed, not a
      distributed filesystem, exactly as in the reference.
    - ``put_bytes`` = multipart upload (S10/S11 report direction).

    ``token_provider`` is any zero-arg callable returning a bearer token —
    OAuth/refresh flows stay driver-side deployment glue (SURVEY.md §7.5).
    """

    def __init__(self, token_provider, staging_dir: str, *,
                 base_url: str = "https://www.googleapis.com",
                 page_size: int = 100):
        super().__init__(token_provider, base_url)
        self.staging_dir = staging_dir
        self.page_size = page_size

    def list_files(self, folder: str) -> list[dict]:
        out, token = [], None
        while True:
            params = {
                "q": f"'{folder}' in parents and trashed = false",
                "pageSize": str(self.page_size),
                "fields": "nextPageToken, files(id, name, mimeType)",
            }
            if token:
                params["pageToken"] = token
            url = f"{self.base}/drive/v3/files?{urllib.parse.urlencode(params)}"
            page = json.loads(self._call(url))
            for f in page.get("files", []):
                ext = os.path.splitext(f["name"])[1].lstrip(".").lower()
                out.append({"id": f["id"], "name": f["name"],
                            "ext": ext or _MIME_EXT.get(f.get("mimeType", ""), "")})
            token = page.get("nextPageToken")
            if not token:
                return out

    def localize(self, file: dict) -> str:
        """Download ``alt=media`` into the staging dir, return local path."""
        os.makedirs(self.staging_dir, exist_ok=True)
        path = os.path.join(self.staging_dir, f"{file['id']}_{file['name']}")
        payload = self._call(
            f"{self.base}/drive/v3/files/{urllib.parse.quote(file['id'])}?alt=media")
        with open(path, "wb") as fh:
            fh.write(payload)
        return path

    def put_bytes(self, folder: str, name: str, payload: bytes) -> str:
        boundary = f"b{uuid.uuid4().hex}"
        meta = json.dumps({"name": name, "parents": [folder]})
        body = (
            f"--{boundary}\r\nContent-Type: application/json; charset=UTF-8"
            f"\r\n\r\n{meta}\r\n--{boundary}\r\n"
            f"Content-Type: application/octet-stream\r\n\r\n"
        ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
        resp = json.loads(self._call(
            f"{self.base}/upload/drive/v3/files?uploadType=multipart",
            data=body,
            headers={"Content-Type": f"multipart/related; boundary={boundary}"}))
        return resp["id"]


class FolderConnector:
    """S4 dispatch + S10/S11 report export over any backend."""

    def __init__(self, spark: SparkSession, backend):
        self.spark = spark
        self.backend = backend

    def load_file_as_dataframe(self, file: dict,
                               schema: T.StructType | None = None) -> DataFrame:
        """S4 (utils/gsheets_utils.py:150-186): dispatch on extension to
        the CSV / JSON / parquet parser. Excel routes via the pandas
        bridge (readers.read_excel_bridge), import-gated."""
        # Remote backends (Drive) list metadata only and stage the bytes
        # on access; local backends list real paths directly.
        path = file.get("path") or self.backend.localize(file)
        ext = file["ext"]
        if ext == "csv":
            return read_csv(self.spark, path, schema)
        if ext in ("json", "jsonl", "ndjson"):
            return read_json(self.spark, path, schema)
        if ext == "parquet":
            return read_parquet(self.spark, path)
        if ext in ("xlsx", "xls"):
            from .readers import read_excel_bridge
            return read_excel_bridge(self.spark, path)
        raise ValueError(f"unsupported extension: {ext!r} ({path})")

    def export_dataframe(self, df: DataFrame, folder: str, filename: str) -> str:
        """S10/S11 analog (utils/gsheets_utils.py:39-78): reports are
        small driver-side artifacts (the reference writes Excel/Sheets
        tabs); CSV bytes keep it dependency-free."""
        pdf = df.toPandas()
        payload = pdf.to_csv(index=False).encode()
        return self.backend.put_bytes(folder, filename, payload)
