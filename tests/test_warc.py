"""WARC source (ISO 28500 framing, Common-Crawl .warc.gz member
convention): pure framing roundtrips + the distributed read/write
surface."""

import gzip

import pytest

from pholcus_spark.sources import warc


def _recs(n=3, typ="response"):
    return [
        dict(
            warc_type=typ,
            payload=f"payload {i}\r\n\r\nwith fake boundary".encode(),
            record_id=f"<urn:uuid:rec-{i}>",
            target_uri=f"http://h.test/p/{i}",
            content_type="text/plain",
        )
        for i in range(n)
    ]


def test_framing_roundtrip_plain_and_gzip():
    for gz in (False, True):
        data = warc.build_warc(_recs(), gzipped=gz)
        out = list(warc.parse_warc(data))
        assert [r["warc-target-uri"] for r in out] == [
            f"http://h.test/p/{i}" for i in range(3)
        ]
        # payload bytes survive even though they CONTAIN the \r\n\r\n
        # frame boundary — Content-Length framing, not delimiter split
        assert all(b"fake boundary" in r["payload"] for r in out)
        assert [r["warc-type"] for r in out] == ["response"] * 3
        assert all(r["warc-record-id"].startswith("<urn:uuid:") for r in out)


def test_gzip_members_are_individually_valid():
    """The CC convention: each record is its own gzip member, so a
    range-read of one member decompresses standalone."""
    data = warc.build_warc(_recs(2), gzipped=True)
    members = list(warc._gzip_members(data))
    assert len(members) == 2
    one = list(warc.parse_warc(members[1], gzipped=False))
    assert len(one) == 1 and one[0]["warc-target-uri"].endswith("/1")
    # and the archive bytes are stable (mtime pinned)
    assert warc.build_warc(_recs(2), gzipped=True) == data


def test_parse_stops_at_trailing_garbage():
    data = warc.build_warc(_recs(2)) + b"NOT A RECORD"
    assert len(list(warc.parse_warc(data))) == 2


def test_build_is_deterministic():
    assert warc.build_warc(_recs()) == warc.build_warc(_recs())


def test_parse_tolerates_non_utf8_header_bytes():
    """Archive headers are untrusted content: a latin-1 byte in a header
    value must not raise — the record still parses (value replaced)."""
    data = warc.build_warc(_recs(1))
    # corrupt the target-uri value with a raw 0xE9 byte
    data = data.replace(b"http://h.test/p/0", b"http://h.t\xe9st/p/0")
    out = list(warc.parse_warc(data))
    assert len(out) == 1
    assert out[0]["payload"].endswith(b"fake boundary")


def test_parse_stops_at_malformed_content_length():
    """A record whose Content-Length is not an integer ends the walk at
    the last whole record instead of failing the task."""
    good = warc.build_warc(_recs(1))
    bad = good.replace(b"Content-Length: ", b"Content-Length: x")
    assert len(list(warc.parse_warc(good + bad))) == 1


def test_reserved_keys_survive_hostile_headers():
    """A record carrying headers literally named Payload / Record_Offset
    (lowercased they collide with the reserved dict keys) must not
    clobber the binary payload or the integer framing offset — round-4
    advice: one such record would otherwise TypeError the arithmetic in
    parse_warc or ship a str into read_warc's binary Arrow column,
    failing the whole task."""
    recs = _recs(2)
    recs[0]["extra_headers"] = {
        "Payload": "evil", "Record_Offset": "evil", "Content_Length": "9"
    }
    for gz in (False, True):
        out = list(warc.parse_warc(warc.build_warc(recs, gzipped=gz)))
        assert len(out) == 2
        for r in out:
            assert isinstance(r["payload"], bytes)
            assert isinstance(r["record_offset"], int)
            assert r["payload"].endswith(b"fake boundary")
        # the hostile values remain visible under their header names
        assert out[0]["payload"] != b"evil"
        # offsets are the real framing offsets (record 2 starts after 1)
        assert out[1]["record_offset"] > out[0]["record_offset"]


def test_gzip_member_walk_resyncs_past_corrupt_record():
    """Per-member gzip parsing: a corrupt frame loses only its own
    member — the walk re-syncs at the next member boundary instead of
    discarding the rest of the archive."""
    recs = _recs(4)
    members = []
    for i, r in enumerate(recs):
        raw = warc.build_record(**r)
        if i == 1:
            raw = raw.replace(b"Content-Length: ", b"Content-Length: x")
        members.append(gzip.compress(raw, mtime=0))
    out = list(warc.parse_warc(b"".join(members)))
    assert [r["warc-target-uri"] for r in out] == [
        "http://h.test/p/0", "http://h.test/p/2", "http://h.test/p/3"
    ]


def test_read_warc_distributed(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(
        warc.build_warc(_recs(3), gzipped=True)
    )
    # a second, PLAIN archive with a warcinfo record to be type-pruned
    plain = warc.build_warc(
        [
            dict(
                warc_type="warcinfo",
                payload=b"software: test",
                record_id="<urn:uuid:info>",
            )
        ]
        + _recs(2),
    )
    (tmp_path / "b.warc").write_bytes(plain)
    df = warc.read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 5  # warcinfo pruned task-side
    assert {r.warc_type for r in rows} == {"response"}
    by_file = {}
    for r in rows:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    assert len(by_file["a.warc.gz"]) == 3
    assert len(by_file["b.warc"]) == 2
    assert all(b"fake boundary" in bytes(r.payload) for r in rows)
    # offsets are the framing offsets in the decompressed stream
    offs = sorted(r.record_offset for r in by_file["a.warc.gz"])
    assert offs[0] == 0 and offs == sorted(set(offs))


def test_write_then_read_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [
            (f"http://h.test/d/{i}", f"body {i}".encode(), f"<urn:uuid:w-{i}>")
            for i in range(10)
        ],
        "target_uri string, payload binary, record_id string",
    ).repartition(3)
    out = str(tmp_path / "export")
    warc.write_warc(src, out, content_type="text/plain")
    import glob

    files = glob.glob(f"{out}/part-*.warc.gz")
    assert 1 <= len(files) <= 3
    # every produced file is a valid gzip stream
    for f in files:
        gzip.decompress(open(f, "rb").read())
    back = warc.read_warc(spark, out)
    got = {(r.target_uri, bytes(r.payload)) for r in back.collect()}
    assert got == {
        (f"http://h.test/d/{i}", f"body {i}".encode()) for i in range(10)
    }
    assert {r.content_type for r in back.collect()} == {"text/plain"}


def test_gzip_member_walk_chunked_boundaries():
    """The chunked member walk (round-6: bounded-chunk feeding replaces
    whole-tail unused_data copies) must reproduce members exactly when
    a member spans multiple feed chunks and when many small members
    share one chunk."""
    big = b"A" * (3 * (1 << 20) + 12345)  # spans >3 of the 1 MiB chunks
    smalls = [f"rec-{i}".encode() * 10 for i in range(50)]
    members = [big] + smalls + [big[: 1 << 20]]
    blob = b"".join(gzip.compress(m, mtime=0) for m in members)
    walked = list(warc._gzip_members(blob))
    assert walked == members


def test_gzip_member_walk_truncated_tail():
    """A truncated final member yields its partial output and stops —
    the pre-chunking behavior, preserved."""
    good = gzip.compress(b"complete record", mtime=0)
    cut = gzip.compress(b"B" * 100000, mtime=0)[:200]  # header + partial
    walked = list(warc._gzip_members(good + cut))
    assert walked[0] == b"complete record"
    assert len(walked) == 2  # the partial member still surfaces
