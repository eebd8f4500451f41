"""WARC (ISO 28500 / WARC/1.0) ingestion and export — the archive
format a web-scale crawl pipeline exchanges with Common-Crawl-style
storage. Public format, implemented from the published spec; no
third-party WARC library.

Scale shape: one WARC file is one task. ``read_warc`` scans with
Spark's ``binaryFile`` source (each ~1 GB archive file becomes one row,
the Common Crawl sizing convention exists exactly so that per-file
parallelism is enough) and splits records inside ``mapInPandas`` —
pure-Python framing walk over Arrow-delivered bytes, no per-record
Python UDF calls, no driver-side file listing beyond the catalog scan
Spark already does. Gzip archives use the per-record-member convention
(each record its own gzip member, concatenated), so a member walk
yields records without decompressing the whole file into one buffer
twice.

``write_warc`` is the export twin: one ``.warc.gz`` per partition,
written task-side (shared filesystem contract, like the image sink).

Framing (WARC/1.0):

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length payload bytes>
    \\r\\n\\r\\n
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame

WARC_VERSION = b"WARC/1.0"

# the record schema read_warc produces
WARC_DDL = (
    "warc_file string, record_offset long, warc_type string, "
    "record_id string, warc_date string, target_uri string, "
    "content_type string, payload binary"
)


# ---------------------------------------------------------------------------
# pure framing (no Spark) — unit-testable, runs inside the Arrow batch task
# ---------------------------------------------------------------------------


def build_record(
    warc_type: str,
    payload: bytes,
    record_id: str,
    warc_date: str = "2000-01-01T00:00:00Z",
    target_uri: str | None = None,
    content_type: str = "application/octet-stream",
    extra_headers: dict | None = None,
) -> bytes:
    """One framed WARC record. Header order is fixed so output is
    byte-deterministic (the record-id and date are caller-supplied:
    scripts must not mint wall-clock values, same rule as the engine's
    deterministic snapshots)."""
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", warc_date),
    ]
    if target_uri is not None:
        headers.append(("WARC-Target-URI", target_uri))
    headers.append(("Content-Type", content_type))
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    headers.append(("Content-Length", str(len(payload))))
    head = b"\r\n".join(
        [WARC_VERSION] + [f"{k}: {v}".encode() for k, v in headers]
    )
    return head + b"\r\n\r\n" + payload + b"\r\n\r\n"


def build_warc(records: list[dict], gzipped: bool = False) -> bytes:
    """A whole archive from record dicts (keys = build_record kwargs).
    ``gzipped=True`` emits one gzip MEMBER per record (the Common Crawl
    .warc.gz convention — members concatenate into a valid stream and
    stay individually seekable)."""
    out = io.BytesIO()
    for r in records:
        raw = build_record(**r)
        if gzipped:
            # mtime=0 pins the gzip header so archives are byte-stable
            out.write(gzip.compress(raw, mtime=0))
        else:
            out.write(raw)
    return out.getvalue()


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Walk concatenated gzip members (zlib with gzip wrapping exposes
    unused_data at each member boundary).

    Each decompressor is fed bounded memoryview chunks: handing it the
    whole remaining archive would make zlib materialize ``unused_data``
    — a bytes COPY of everything past the member boundary — at every
    member, turning a 1 GB archive with tens of thousands of members
    (the Common Crawl shape) into O(members × archive_size) memcpy
    (round-5 ADVICE). With chunked feeding the per-member overshoot is
    bounded by one chunk, so the walk is genuinely linear."""
    mv = memoryview(data)
    n = len(data)
    pos = 0
    chunk = 1 << 20
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        start = pos
        parts = []
        while pos < n and not d.eof:
            parts.append(d.decompress(mv[pos:pos + chunk]))
            pos += min(chunk, n - pos)
        if d.eof:
            # rewind the (≤ one chunk) overshoot past the member end
            pos -= len(d.unused_data)
        yield b"".join(parts)
        if pos <= start:  # corrupt tail: stop rather than spin
            return


def parse_warc(data: bytes, gzipped: bool | None = None) -> Iterator[dict]:
    """Yield record dicts (headers lower-cased, ``payload`` bytes,
    ``record_offset`` = framing offset of the record in the DECOMPRESSED
    stream) from archive bytes. ``gzipped=None`` sniffs the magic.

    Gzipped archives are parsed PER MEMBER: with the one-record-per-
    member convention, a member whose framing is corrupt (bad
    Content-Length, mangled header block) loses only itself — the walk
    re-syncs at the next member boundary instead of silently dropping
    the rest of a 50k-record archive. A whole-archive single member
    degrades to the plain behavior (stop at the first corrupt frame)."""
    if gzipped is None:
        gzipped = data[:2] == b"\x1f\x8b"
    if gzipped:
        base = 0
        for member in _gzip_members(data):
            for rec in _parse_frames(member):
                rec["record_offset"] += base
                yield rec
            base += len(member)
        return
    yield from _parse_frames(data)


def _parse_frames(buf: bytes) -> Iterator[dict]:
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record padding
        while pos < n and buf[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0 or not buf[pos : pos + 5] == b"WARC/":
            return  # trailing garbage: stop at the last whole record
        offset = pos
        headers: dict[str, str] = {}
        lines = buf[pos:head_end].split(b"\r\n")
        for line in lines[1:]:  # lines[0] is the version
            k, _, v = line.partition(b":")
            # header bytes are untrusted archive content: replace
            # (never raise) on non-UTF8 so one mangled header cannot
            # fail the task for the whole archive
            headers[k.strip().lower().decode(errors="replace")] = v.strip().decode(
                errors="replace"
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            return  # unframeable record: stop at the last whole one
        body_start = head_end + 4
        payload = buf[body_start : body_start + length]
        pos = body_start + length
        # reserved keys must WIN over untrusted archive headers: a record
        # carrying a header literally named "Payload" or "Record_Offset"
        # (keys are only lowercased) must not clobber the binary payload /
        # integer offset — parse_warc does arithmetic on record_offset and
        # read_warc ships payload into a binary Arrow column, so one
        # crafted record would otherwise fail the whole mapInPandas task
        rec = dict(headers)
        rec["record_offset"] = offset
        rec["payload"] = payload
        yield rec


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def read_warc(
    spark, path: str, warc_types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` source (one file per row →
    one split task per archive, Common-Crawl sizing) + a mapInPandas
    record splitter. ``warc_types`` prunes inside the task so only the
    wanted records (usually 'response') cross back as Arrow batches."""
    types = set(warc_types)

    def split(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, data in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(data)):
                    if rec.get("warc-type") not in types:
                        continue
                    rows.append(
                        (
                            fpath,
                            rec["record_offset"],
                            rec.get("warc-type"),
                            rec.get("warc-record-id", ""),
                            rec.get("warc-date", ""),
                            rec.get("warc-target-uri"),
                            rec.get("content-type", ""),
                            rec["payload"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file",
                    "record_offset",
                    "warc_type",
                    "record_id",
                    "warc_date",
                    "target_uri",
                    "content_type",
                    "payload",
                ],
            )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(split, WARC_DDL)


def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    id_col: str = "record_id",
    date_col: str | None = None,
    content_type: str = "application/octet-stream",
) -> None:
    """Export rows as per-partition ``.warc.gz`` archives under
    ``out_dir`` (shared filesystem on a cluster — the same contract as
    export_files / the python image sink). Record order within a
    partition follows the partition's row order; pin it upstream with a
    sortWithinPartitions if byte-stable archives matter."""
    import os

    from pyspark.sql import functions as F

    cols = [uri_col, payload_col, id_col] + ([date_col] if date_col else [])
    rows = df.select(F.spark_partition_id().alias("_pid"), *cols)

    def _dump(it):
        # stream one gzip member per record: task memory stays
        # O(record), not O(partition) — a partition of ~1 GB of bodies
        # must not buffer twice before hitting disk
        f = None
        try:
            for r in it:
                if f is None:
                    os.makedirs(out_dir, exist_ok=True)
                    f = open(f"{out_dir}/part-{r['_pid']:05d}.warc.gz", "wb")
                raw = build_record(
                    warc_type="response",
                    payload=bytes(r[payload_col]),
                    record_id=r[id_col],
                    target_uri=r[uri_col],
                    content_type=content_type,
                    **({"warc_date": r[date_col]} if date_col else {}),
                )
                f.write(gzip.compress(raw, mtime=0))
        finally:
            if f is not None:
                f.close()

    rows.foreachPartition(_dump)
