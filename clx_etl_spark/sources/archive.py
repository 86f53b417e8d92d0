"""Archive restore source (SURVEY S11): verified tar.gz snapshots of
SQLite databases -> DataFrame.

The reference restores missing market-snapshot hours by downloading a
tar.gz from S3, verifying its SHA-256, extracting the SQLite file inside,
and predicate-scanning it (reference:
src/system_utils/restore_market_snapshot_from_s3.py:126-181). Re-expressed
for Spark: verification + extraction are driver-side (archives are
hour-sized, not data-lake-sized); rows enter the cluster via
``spark.createDataFrame`` in batches, after which the normal partitioned
writers take over. The S3 download is the deployment's concern (boto isn't
in this container); the interface takes a local path.
"""

from __future__ import annotations

import hashlib
import sqlite3
import tarfile
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class ArchiveIntegrityError(RuntimeError):
    pass


def verify_sha256(path: str, expected_hex: str) -> None:
    """Stream-hash the archive and compare digests (restore_…_s3.py:126-137)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    if h.hexdigest() != expected_hex:
        raise ArchiveIntegrityError(
            f"sha256 mismatch for {path}: got {h.hexdigest()}, want {expected_hex}"
        )


def extract_sqlite(archive_path: str, member_suffix: str = ".db") -> str:
    """Extract the first ``member_suffix`` member to a temp dir; returns
    the extracted file path."""
    tmp = tempfile.mkdtemp(prefix="clx_restore_")
    with tarfile.open(archive_path, "r:gz") as tar:
        for m in tar.getmembers():
            if m.name.endswith(member_suffix) and m.isfile():
                tar.extract(m, tmp, filter="data")
                return str(Path(tmp) / m.name)
    raise ArchiveIntegrityError(f"no {member_suffix} member in {archive_path}")


def read_sqlite_table(
    spark: SparkSession,
    db_path: str,
    table: str,
    where: str | None = None,
    params: tuple = (),
    batch_size: int = 50_000,
) -> DataFrame:
    """Predicate scan of a SQLite table -> DataFrame. The WHERE clause is
    pushed into SQLite (the reference pushes symbol/exchange/hour
    predicates, restore_…_s3.py:161-169); rows stream driver-side in
    batches and land as one DataFrame with SQLite's column names."""
    con = sqlite3.connect(db_path)
    try:
        cur = con.execute(
            f"SELECT * FROM {table}" + (f" WHERE {where}" if where else ""), params
        )
        cols = [d[0] for d in cur.description]
        rows: list[tuple] = []
        while True:
            chunk = cur.fetchmany(batch_size)
            if not chunk:
                break
            rows.extend(chunk)
    finally:
        con.close()
    return spark.createDataFrame(rows, cols)


def restore_archive(
    spark: SparkSession,
    archive_path: str,
    sha256_hex: str,
    table: str,
    where: str | None = None,
    params: tuple = (),
) -> DataFrame:
    """Full S11 path: verify -> extract -> predicate scan."""
    verify_sha256(archive_path, sha256_hex)
    db = extract_sqlite(archive_path)
    return read_sqlite_table(spark, db, table, where=where, params=params)
