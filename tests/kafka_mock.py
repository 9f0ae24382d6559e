"""In-process mock Kafka broker speaking the exact protocol slice the
consumer uses (Metadata v1 / ListOffsets v1 / Fetch v4, RecordBatch v2).

Gives the KafkaInput tests a real TCP round-trip without any external
broker: `MockBroker` serves the in-memory logs appended via
`broker.produce(topic, partition, value)`.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Dict, List, Optional, Tuple

from easyrec_tpu.data.kafka_client import (
    API_FETCH, API_LIST_OFFSETS, API_METADATA, API_PRODUCE, _Reader,
    _Writer, build_record_batch, parse_record_batches)


class MockBroker:
  def __init__(self):
    # logs[(topic, partition)] = list of (key, value) in offset order
    self.logs: Dict[Tuple[str, int], List[Tuple[Optional[bytes],
                                                bytes]]] = {}
    self.lock = threading.Lock()
    self._srv = None
    self._thread = None
    self.port = None

  # -- data ----------------------------------------------------------
  def create_topic(self, topic: str, partitions: int):
    with self.lock:
      for p in range(partitions):
        self.logs.setdefault((topic, p), [])

  def produce(self, topic: str, partition: int, value: bytes,
              key: Optional[bytes] = None):
    with self.lock:
      self.logs.setdefault((topic, partition), []).append((key, value))

  # -- server --------------------------------------------------------
  def start(self) -> str:
    broker = self

    class Handler(socketserver.BaseRequestHandler):
      def handle(self):
        try:
          while True:
            raw = self._read_exact(4)
            if raw is None:
              return
            size = struct.unpack('>i', raw)[0]
            body = self._read_exact(size)
            if body is None:
              return
            self._dispatch(_Reader(body))
        except (ConnectionError, OSError):
          return

      def _read_exact(self, n):
        chunks = []
        while n > 0:
          try:
            b = self.request.recv(min(n, 1 << 20))
          except OSError:
            return None
          if not b:
            return None
          chunks.append(b)
          n -= len(b)
        return b''.join(chunks)

      def _dispatch(self, r: _Reader):
        api_key = r.i16()
        api_version = r.i16()
        corr = r.i32()
        r.string()                             # client id
        w = _Writer()
        w.i32(corr)
        if api_key == API_METADATA and api_version == 1:
          self._metadata(r, w)
        elif api_key == API_LIST_OFFSETS and api_version == 1:
          self._list_offsets(r, w)
        elif api_key == API_FETCH and api_version == 4:
          self._fetch(r, w)
        elif api_key == API_PRODUCE and api_version == 3:
          self._produce(r, w)
        else:
          raise AssertionError('mock broker: unsupported api %d v%d'
                               % (api_key, api_version))
        out = w.getvalue()
        self.request.sendall(struct.pack('>i', len(out)) + out)

      def _metadata(self, r: _Reader, w: _Writer):
        n = r.i32()
        topics = [r.string() for _ in range(n)]
        host, port = broker._srv.server_address
        w.i32(1)                               # brokers
        w.i32(0)
        w.string('127.0.0.1')
        w.i32(port)
        w.string(None)                         # rack
        w.i32(0)                               # controller id
        with broker.lock:
          if not topics:
            topics = sorted({t for t, _ in broker.logs})
          w.i32(len(topics))
          for t in topics:
            parts = sorted(p for tt, p in broker.logs if tt == t)
            w.i16(0 if parts else 3)           # 3: unknown topic
            w.string(t)
            w.i8(0)                            # internal
            w.i32(len(parts))
            for p in parts:
              w.i16(0)
              w.i32(p)
              w.i32(0)                         # leader
              w.i32(1)
              w.i32(0)                         # replicas [0]
              w.i32(1)
              w.i32(0)                         # isr [0]

      def _produce(self, r: _Reader, w: _Writer):
        r.string()                             # transactional id
        r.i16()                                # acks
        r.i32()                                # timeout
        n_topics = r.i32()
        results = []                           # (topic, pid, base_offset)
        with broker.lock:
          for _ in range(n_topics):
            t = r.string()
            for _ in range(r.i32()):
              pid = r.i32()
              record_set = r.bytes_() or b''
              # auto-create topic-partition on produce (the broker
              # default the incr-update channel relies on)
              log = broker.logs.setdefault((t, pid), [])
              base = len(log)
              for _off, key, value in parse_record_batches(record_set):
                log.append((key, value))
              results.append((t, pid, base))
        w.i32(len(results))
        for t, pid, base in results:
          w.string(t)
          w.i32(1)
          w.i32(pid)
          w.i16(0)                             # error
          w.i64(base)
          w.i64(-1)                            # log append time
        w.i32(0)                               # throttle ms

      def _list_offsets(self, r: _Reader, w: _Writer):
        r.i32()                                # replica id
        n_topics = r.i32()
        reqs = []
        for _ in range(n_topics):
          t = r.string()
          parts = []
          for _ in range(r.i32()):
            parts.append((r.i32(), r.i64()))
          reqs.append((t, parts))
        w.i32(len(reqs))
        with broker.lock:
          for t, parts in reqs:
            w.string(t)
            w.i32(len(parts))
            for p, ts in parts:
              log = broker.logs.get((t, p))
              w.i32(p)
              if log is None:
                w.i16(3)
                w.i64(-1)
                w.i64(-1)
              else:
                w.i16(0)
                w.i64(-1)                      # timestamp
                w.i64(0 if ts == -2 else len(log))

      def _fetch(self, r: _Reader, w: _Writer):
        r.i32()                                # replica
        r.i32()                                # max wait
        r.i32()                                # min bytes
        r.i32()                                # max bytes
        r.i8()                                 # isolation
        n_topics = r.i32()
        reqs = []
        for _ in range(n_topics):
          t = r.string()
          parts = []
          for _ in range(r.i32()):
            pid = r.i32()
            off = r.i64()
            r.i32()                            # partition max bytes
            parts.append((pid, off))
          reqs.append((t, parts))
        w.i32(0)                               # throttle
        w.i32(len(reqs))
        with broker.lock:
          for t, parts in reqs:
            w.string(t)
            w.i32(len(parts))
            for pid, off in parts:
              log = broker.logs.get((t, pid), [])
              w.i32(pid)
              w.i16(0)
              w.i64(len(log))                  # high watermark
              w.i64(len(log))                  # last stable offset
              w.i32(0)                         # aborted txns
              if off < len(log):
                chunk = log[off:off + 500]
                w.bytes_(build_record_batch(off, chunk))
              else:
                w.bytes_(b'')

    srv = socketserver.ThreadingTCPServer(('127.0.0.1', 0), Handler)
    srv.daemon_threads = True
    srv.allow_reuse_address = True
    self._srv = srv
    self.port = srv.server_address[1]
    self._thread = threading.Thread(target=srv.serve_forever, daemon=True)
    self._thread.start()
    return '127.0.0.1:%d' % self.port

  def stop(self):
    if self._srv is not None:
      self._srv.shutdown()
      self._srv.server_close()
      self._srv = None
