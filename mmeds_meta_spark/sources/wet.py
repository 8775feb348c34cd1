"""Common Crawl WET (WARC conversion) files as a Spark data source
(PySpark 4 Python DataSource API): ``spark.read.format("wet").load(path)``
→ one row per ``conversion`` record — the standard raw-text input of
every web-scale LLM curation pipeline (C4, CCNet, RefinedWeb, Gopher all
start from WET or its WARC parent).

Format (public ISO 28500 WARC 1.0, as emitted by Common Crawl's WET
conversion): each record is a ``WARC/1.0`` version line, a header block
of ``Key: Value`` lines terminated by one empty line, then exactly
``Content-Length`` bytes of UTF-8 plain text, then two empty lines.
``.wet.gz`` files are a concatenation of per-record gzip members, which
Python's ``gzip`` module decompresses transparently as one stream.

Scale shape: partitioning is FILE-granular — a Common Crawl dump is
~64 000 WET files of ~150 MB, so file-level parallelism saturates any
cluster without byte-range splitting (which gzip members would defeat
anyway: a mid-file split cannot find a member boundary without reading
from the start).  Each partition streams its file record-by-record in
constant memory — never loads a whole file.

Malformed-input contract (mirrors documents_jsonl's quarantine stance):
a record with a non-integer or missing Content-Length, or a truncated
payload, ends that FILE's iteration (framing is unrecoverable past a bad
length) but never fails the job; records of other WARC-Types (warcinfo,
request, metadata) are skipped, not errors.
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

WET_SCHEMA = (
    "file string, record_id bigint, target_uri string, warc_date string, "
    "content_length bigint, text string, n_chars bigint"
)


class WetFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _open_stream(path: str) -> io.BufferedReader:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return open(path, "rb")


def iter_wet_records(fh) -> Iterator[dict]:
    """Stream (headers, payload) for each WARC record in an open binary
    stream.  Stops at EOF or at the first unrecoverable framing error."""
    while True:
        # skip inter-record blank lines; find the version line
        line = fh.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            return  # lost framing — stop this file, never guess
        headers: dict[str, str] = {}
        while True:
            line = fh.readline()
            if not line:
                return  # truncated header block
            if line.strip() == b"":
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            n = int(headers.get("content-length", ""))
        except ValueError:
            return  # cannot frame the payload — stop this file
        payload = fh.read(n)
        if len(payload) < n:
            return  # truncated payload
        yield {"headers": headers, "payload": payload}


def _list_crawl_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".wet", ".wet.gz", ".warc", ".warc.gz"))
        )
    return [path]


def wet_file_rows(path: str) -> Iterator[tuple]:
    """WET_SCHEMA rows of one file — shared by the batch partitions
    and the streaming micro-batch reader."""
    rid = 0
    with _open_stream(path) as fh:
        for rec in iter_wet_records(fh):
            h = rec["headers"]
            if h.get("warc-type") != "conversion":
                continue  # warcinfo / request / metadata records
            text = rec["payload"].decode("utf-8", "replace")
            yield (
                path,
                rid,
                h.get("warc-target-uri"),
                h.get("warc-date"),
                len(rec["payload"]),
                text,
                len(text),
            )
            rid += 1


class WetReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wet source requires a path")

    def partitions(self) -> Sequence[WetFilePartition]:
        files = _list_crawl_files(self.path)
        if not files:
            raise ValueError(f"no .wet/.wet.gz files under {self.path}")
        return [WetFilePartition(f) for f in files]

    def read(self, partition: WetFilePartition) -> Iterator[tuple]:
        yield from wet_file_rows(partition.path)


WARC_SCHEMA = (
    "file string, record_id bigint, target_uri string, warc_date string, "
    "http_status int, content_type string, content_length bigint, "
    "html string, n_bytes bigint"
)


def split_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from a WARC ``response`` record's
    HTTP message.  A payload without an HTTP header block (no CRLFCRLF,
    or no HTTP/ status line) is returned whole with NULL status — the
    curation operators downstream decide whether to keep it."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, body = payload[:sep], payload[sep + 4 :]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in lines[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            if k.strip().lower() == b"content-type":
                ctype = v.strip().decode("ascii", "replace")
    return status, ctype, body


def warc_file_rows(path: str) -> Iterator[tuple]:
    """WARC_SCHEMA rows of one file — shared by the batch partitions
    and the streaming micro-batch reader."""
    rid = 0
    with _open_stream(path) as fh:
        for rec in iter_wet_records(fh):
            h = rec["headers"]
            if h.get("warc-type") != "response":
                continue  # warcinfo / request / metadata / conversion
            status, ctype, body = split_http_payload(rec["payload"])
            yield (
                path,
                rid,
                h.get("warc-target-uri"),
                h.get("warc-date"),
                status,
                ctype,
                len(rec["payload"]),
                body.decode("utf-8", "replace"),
                len(body),
            )
            rid += 1


class WarcReader(WetReader):
    """WARC ``response`` records (the WET reader's parent format — raw
    crawl HTTP captures).  Same file-granular partitioning and framing
    (iter_wet_records parses ISO 28500 records for both formats); the
    response path additionally strips the HTTP header block so ``html``
    is the decoded entity body, ready for text_html_extract."""

    def read(self, partition: WetFilePartition) -> Iterator[tuple]:
        yield from warc_file_rows(partition.path)


class CrawlStreamReader(DataSourceStreamReader):
    """Incremental crawl ingest: each micro-batch reads the dump files
    that arrived since the last offset, one executor-side partition per
    file (the same file-granular parallelism as the batch readers).

    Offsets are a lexicographic FILENAME WATERMARK ``{"upto": name}`` —
    a file is consumed when its path sorts ≤ the watermark.  The
    contract this rides on: crawl segments are named monotonically
    (Common Crawl's ``...-NNNNN.warc.gz`` numbering), so a new segment
    always sorts after every consumed one.  The watermark (not a file
    count) makes replay exact: ``partitions(start, end)`` re-lists the
    directory and re-derives exactly the files in ``(start, end]``, so
    a micro-batch replayed from the checkpoint re-reads precisely its
    own files — no store-side dedup needed for exactly-once sinks.
    """

    def __init__(self, path: str, rows_fn):
        if not path:
            raise ValueError("streaming crawl source requires a path")
        self.path = path
        self._rows_fn = rows_fn

    def _files(self) -> list[str]:
        return _list_crawl_files(self.path)

    def initialOffset(self) -> dict:
        return {"upto": ""}

    def latestOffset(self) -> dict:
        files = self._files()
        return {"upto": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict) -> Sequence[WetFilePartition]:
        lo, hi = start.get("upto", ""), end.get("upto", "")
        return [WetFilePartition(f) for f in self._files() if lo < f <= hi]

    def read(self, partition: WetFilePartition) -> Iterator[tuple]:
        yield from self._rows_fn(partition.path)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the directory is the log


class WetDataSource(DataSource):
    """``spark.dataSource.register(WetDataSource)`` then
    ``spark.read.format("wet").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "wet"

    def schema(self) -> str:
        return WET_SCHEMA

    def reader(self, schema) -> WetReader:
        return WetReader(self.options)

    def streamReader(self, schema) -> CrawlStreamReader:
        return CrawlStreamReader(self.options.get("path"), wet_file_rows)


class WarcDataSource(DataSource):
    """``spark.dataSource.register(WarcDataSource)`` then
    ``spark.read.format("warc").load(path)`` — one row per ``response``
    record (the RefinedWeb-class front door: raw HTML in, extraction
    and curation downstream)."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> CrawlStreamReader:
        return CrawlStreamReader(self.options.get("path"), warc_file_rows)


def register_wet_source(spark) -> None:
    """Idempotent registration of the wet format for this session."""
    spark.dataSource.register(WetDataSource)


def register_warc_source(spark) -> None:
    """Idempotent registration of the warc format for this session."""
    spark.dataSource.register(WarcDataSource)


def write_wet(records: list[dict], path: str) -> None:
    """Test/fixture helper: serialize conversion records to a WET file
    (gzipped per-record members when path ends '.gz', matching how
    Common Crawl writes them)."""

    def one(rec: dict) -> bytes:
        payload = rec["text"].encode("utf-8")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {rec['uri']}\r\n"
            f"WARC-Date: {rec.get('date', '2026-01-01T00:00:00Z')}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "Content-Type: text/plain\r\n"
            "\r\n"
        ).encode("ascii")
        return head + payload + b"\r\n\r\n"

    info_payload = b"software: mmeds-testgen\r\n"
    info = (
        (
            "WARC/1.0\r\n"
            "WARC-Type: warcinfo\r\n"
            f"Content-Length: {len(info_payload)}\r\n"
            "\r\n"
        ).encode("ascii")
        + info_payload
        + b"\r\n\r\n"
    )
    if path.endswith(".gz"):
        with open(path, "wb") as out:
            out.write(gzip.compress(info))
            for rec in records:
                out.write(gzip.compress(one(rec)))
    else:
        with open(path, "wb") as out:
            out.write(info)
            for rec in records:
                out.write(one(rec))


def write_warc(records: list[dict], path: str) -> None:
    """Test/fixture helper: serialize ``response`` records (each dict:
    uri, html, optional date/status/ctype) to a WARC file with full
    HTTP message payloads, gzip-per-member when path ends '.gz'."""

    def one(rec: dict) -> bytes:
        body = rec["html"].encode("utf-8")
        http = (
            f"HTTP/1.1 {rec.get('status', 200)} OK\r\n"
            f"Content-Type: {rec.get('ctype', 'text/html; charset=utf-8')}\r\n"
            f"Content-Length: {len(body)}\r\n"
            "\r\n"
        ).encode("ascii") + body
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {rec['uri']}\r\n"
            f"WARC-Date: {rec.get('date', '2026-01-01T00:00:00Z')}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode("ascii")
        return head + http + b"\r\n\r\n"

    info_payload = b"software: mmeds-testgen\r\n"
    info = (
        (
            "WARC/1.0\r\n"
            "WARC-Type: warcinfo\r\n"
            f"Content-Length: {len(info_payload)}\r\n"
            "\r\n"
        ).encode("ascii")
        + info_payload
        + b"\r\n\r\n"
    )
    if path.endswith(".gz"):
        with open(path, "wb") as out:
            out.write(gzip.compress(info))
            for rec in records:
                out.write(gzip.compress(one(rec)))
    else:
        with open(path, "wb") as out:
            out.write(info)
            for rec in records:
                out.write(one(rec))
