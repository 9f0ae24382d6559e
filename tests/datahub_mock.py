"""In-process mock DataHub service speaking the JSON REST slice the
client uses (GetTopic / ListShards / GetCursor / GetRecords — see
easyrec_tpu/data/datahub_client.py for the pinned protocol).

`MockDataHub` serves in-memory TUPLE topics appended via
`dh.put(project, topic, shard_id, [field, ...])`. Signatures are not
verified (the client sends them; a real service checks)."""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Tuple


class MockDataHub:

  def __init__(self):
    # topics[(project, topic)] = {'schema': [(name, type)],
    #                             'shards': {shard_id: [record, ...]}}
    self.topics: Dict[Tuple[str, str], dict] = {}
    self.lock = threading.Lock()
    self._srv = None
    self.port = None

  # -- data ------------------------------------------------------------
  def create_topic(self, project: str, topic: str,
                   schema: List[Tuple[str, str]], shards: int = 2):
    with self.lock:
      self.topics[(project, topic)] = {
          'schema': list(schema),
          'shards': {str(i): [] for i in range(shards)},
      }

  def put(self, project: str, topic: str, shard_id, data: List):
    with self.lock:
      self.topics[(project, topic)]['shards'][str(shard_id)].append(
          [None if v is None else str(v) for v in data])

  # -- server ----------------------------------------------------------
  def start(self) -> str:
    dh = self

    class Handler(BaseHTTPRequestHandler):
      protocol_version = 'HTTP/1.1'

      def log_message(self, *a):
        pass

      def _reply(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header('Content-Type', 'application/json')
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

      def do_GET(self):
        m = re.fullmatch(r'/projects/([^/]+)/topics/([^/]+)', self.path)
        if m:
          with dh.lock:
            t = dh.topics.get((m.group(1), m.group(2)))
            if t is None:
              return self._reply(404, {'ErrorCode': 'NoSuchTopic'})
            schema = {'fields': [{'name': n, 'type': ty}
                                 for n, ty in t['schema']]}
          return self._reply(200, {'RecordType': 'TUPLE',
                                   'RecordSchema': json.dumps(schema)})
        m = re.fullmatch(r'/projects/([^/]+)/topics/([^/]+)/shards',
                         self.path)
        if m:
          with dh.lock:
            t = dh.topics.get((m.group(1), m.group(2)))
            if t is None:
              return self._reply(404, {'ErrorCode': 'NoSuchTopic'})
            shards = [{'ShardId': s, 'State': 'ACTIVE'}
                      for s in sorted(t['shards'], key=int)]
          return self._reply(200, {'Shards': shards})
        return self._reply(404, {'ErrorCode': 'NoSuchPath'})

      def do_POST(self):
        n = int(self.headers.get('Content-Length', 0))
        body = json.loads(self.rfile.read(n) or b'{}')
        mp = re.fullmatch(r'/projects/([^/]+)/topics/([^/]+)/shards',
                          self.path)
        if mp and body.get('Action') == 'pub':
          with dh.lock:
            t = dh.topics.get((mp.group(1), mp.group(2)))
            if t is None:
              return self._reply(404, {'ErrorCode': 'NoSuchTopic'})
            for rec in body.get('Records', []):
              sid = rec.get('ShardId', '0')
              if sid not in t['shards']:
                return self._reply(404, {'ErrorCode': 'NoSuchShard'})
              t['shards'][sid].append([None if v is None else str(v)
                                       for v in rec['Data']])
          return self._reply(200, {'FailedRecordCount': 0})
        m = re.fullmatch(
            r'/projects/([^/]+)/topics/([^/]+)/shards/([^/]+)', self.path)
        if not m:
          return self._reply(404, {'ErrorCode': 'NoSuchPath'})
        with dh.lock:
          t = dh.topics.get((m.group(1), m.group(2)))
          if t is None or m.group(3) not in t['shards']:
            return self._reply(404, {'ErrorCode': 'NoSuchShard'})
          log = t['shards'][m.group(3)]
          action = body.get('Action')
          if action == 'cursor':
            ctype = body.get('Type')
            if ctype == 'OLDEST':
              seq = 0
            elif ctype == 'LATEST':   # past-the-end (see client module doc)
              seq = len(log)
            elif ctype == 'SEQUENCE':
              seq = int(body['Sequence'])
            else:
              return self._reply(400, {'ErrorCode': 'InvalidCursorType'})
            return self._reply(200, {'Cursor': '%020d' % seq,
                                     'Sequence': seq, 'RecordTime': 0})
          if action == 'sub':
            seq = int(body['Cursor'])
            limit = int(body.get('Limit', 1000))
            recs = [{'Sequence': i, 'SystemTime': 0, 'Data': log[i]}
                    for i in range(seq, min(seq + limit, len(log)))]
            nxt = recs[-1]['Sequence'] + 1 if recs else seq
            return self._reply(200, {'NextCursor': '%020d' % nxt,
                                     'RecordCount': len(recs),
                                     'Records': recs})
        return self._reply(400, {'ErrorCode': 'InvalidAction'})

    srv = ThreadingHTTPServer(('127.0.0.1', 0), Handler)
    srv.daemon_threads = True
    self._srv = srv
    self.port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return '127.0.0.1:%d' % self.port

  def stop(self):
    if self._srv is not None:
      self._srv.shutdown()
      self._srv.server_close()
      self._srv = None
