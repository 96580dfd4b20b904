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

``LocalFolderBackend`` implements the protocol over a directory tree and
is what tests exercise. A Drive REST backend would implement the same
three methods with googleapiclient (absent from this container — stubbed
by design, raising NotImplementedError with the reference citation).
"""

from __future__ import annotations

import os

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


class DriveBackend:  # pragma: no cover - stub by design
    """Google Drive REST backend (utils/gsheets_utils.py:114-186).

    Not implemented here: the container has no googleapiclient/gspread,
    and OAuth flows are out of scope (SURVEY.md §7.5). The protocol is
    the contract a real deployment fills in.
    """

    def list_files(self, folder: str) -> list[dict]:
        raise NotImplementedError("Drive REST backend requires googleapiclient")

    def put_bytes(self, folder: str, name: str, payload: bytes) -> str:
        raise NotImplementedError("Drive REST backend requires googleapiclient")


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
        ext, path = file["ext"], file["path"]
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
