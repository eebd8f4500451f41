"""Minimal beanstalkd producer client (pure stdlib, no deps).

The reference's beanstalkd sink (`app/pipeline/collector/
output_beanstalkd.go:19-55`) pushes one job per item into a single
configured tube via `common/beanstalkd/beanstalkd.go:50-64`:
``tube.Put(body, pri=1, delay=0, ttr=0)`` where ``body`` is the
``url.Values{createtime, type, content}.Encode()`` string (the payload
half lives JVM-side in :func:`pholcus_spark.sinks.beanstalk_items_payload`
/ :func:`pholcus_spark.sinks.beanstalk_job_body`).

This client speaks just the producer subset of the beanstalkd text
protocol (https://raw.githubusercontent.com/beanstalkd/beanstalkd/master/doc/protocol.txt):

* ``use <tube>\r\n`` → ``USING <tube>\r\n``
* ``put <pri> <delay> <ttr> <bytes>\r\n<data>\r\n`` → ``INSERTED <id>\r\n``

One client per task partition (see ``sinks.write_beanstalkd``) — the
executor-side analog of the reference's one client per output batch.
"""

from __future__ import annotations

import socket


class BeanstalkError(RuntimeError):
    """Server replied with anything other than the expected OK line."""


class BeanstalkClient:
    def __init__(self, host: str, port: int = 11300, timeout_s: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        self._buf = b""

    def _send(self, data: bytes) -> None:
        self._sock.sendall(data)

    def _read_line(self) -> str:
        while b"\r\n" not in self._buf:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise BeanstalkError("connection closed by server")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line.decode("ascii", "replace")

    def use(self, tube: str) -> None:
        """Select the tube subsequent puts go to (`beanstalkd.go:57`
        pins the tube per Put via kr/beanstalk's Tube wrapper — one
        ``use`` up front is the wire-level equivalent for a
        single-tube producer)."""
        self._send(f"use {tube}\r\n".encode("utf-8"))
        line = self._read_line()
        if not line.startswith("USING "):
            raise BeanstalkError(f"use {tube!r}: {line}")

    def put(
        self, body: bytes, pri: int = 1, delay: int = 0, ttr: int = 0
    ) -> int:
        """``tube.Put([]byte(data), 1, 0, 0)`` (`beanstalkd.go:59`).
        Returns the job id. beanstalkd itself clamps ttr 0 → 1; the
        reference passes 0 and so do we."""
        hdr = f"put {pri} {delay} {ttr} {len(body)}\r\n".encode("ascii")
        self._send(hdr + body + b"\r\n")
        line = self._read_line()
        if line.startswith("INSERTED "):
            return int(line.split(" ", 1)[1])
        # BURIED <id> means the server ran out of memory growing the
        # priority queue but DID store the job — still an id.
        if line.startswith("BURIED "):
            return int(line.split(" ", 1)[1])
        raise BeanstalkError(f"put: {line}")

    def close(self) -> None:
        try:
            self._send(b"quit\r\n")
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
