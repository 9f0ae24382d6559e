"""Fixture-driven DataHub REST payloads (VERDICT r3 next-step 7).

tests/datahub_mock.py shares this repo's understanding of the protocol
with the client; these tests instead serve LITERAL response bodies
shaped per the public DataHub REST documentation (GetTopic /
ListShard / GetCursor / GetRecords / PutRecords result JSON) from a
canned one-shot HTTP server, so a misreading of the documented shapes
cannot cancel out."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from easyrec_tpu.data.datahub_client import DataHubClient, DataHubError

# literal response bodies per the documented API result shapes
FIXTURES = {
    ('GET', '/projects/p1/topics/t1'): '''{
      "Comment": "ctr stream",
      "CreateTime": 1525763481,
      "LastModifyTime": 1525763481,
      "Lifecycle": 1,
      "RecordSchema": "{\\"fields\\":[{\\"name\\":\\"label\\",\\"type\\":\\"DOUBLE\\"},{\\"name\\":\\"uid\\",\\"type\\":\\"STRING\\"},{\\"name\\":\\"iid\\",\\"type\\":\\"STRING\\"}]}",
      "RecordType": "TUPLE",
      "ShardCount": 2
    }''',
    ('GET', '/projects/p1/topics/t1/shards'): '''{
      "Protocol": "http1.1",
      "Shards": [
        {"BeginHashKey": "00000", "BeginKey": "0", "EndHashKey": "7FFFF",
         "ShardId": "1", "State": "ACTIVE"},
        {"BeginHashKey": "80000", "BeginKey": "8", "EndHashKey": "FFFFF",
         "ShardId": "0", "State": "ACTIVE"},
        {"ShardId": "2", "State": "CLOSED"}
      ]
    }''',
    ('POST', '/projects/p1/topics/t1/shards/0'): None,  # per-Action below
}

CURSOR_RESP = ('{"Cursor": "30005af19b3800000000000000000000", '
               '"RecordTime": 1525783352873, "Sequence": 1}')
SUB_RESP = '''{
  "NextCursor": "30005af19b38000000000000000100000",
  "RecordCount": 2,
  "StartSeq": 1,
  "Records": [
    {"Cursor": "30005af19b3800000000000000000000", "Sequence": 1,
     "SystemTime": 1525783352873, "Data": ["1.0", "u1", "i9"]},
    {"Cursor": "30005af19b3800000000000000010000", "Sequence": 2,
     "SystemTime": 1525783353873, "Data": ["0.0", "u2", null]}
  ]
}'''
PUB_RESP = '{"FailedRecordCount": 0, "FailedRecords": []}'
PUB_FAIL_RESP = '''{
  "FailedRecordCount": 1,
  "FailedRecords": [{"ErrorCode": "MalformedRecord",
                     "ErrorMessage": "Record field size not match",
                     "Index": 0}]
}'''
ERROR_RESP = ('{"ErrorCode": "NoSuchTopic", '
              '"ErrorMessage": "The specified topic does not exist."}')


class _Handler(BaseHTTPRequestHandler):
  fail_pub = False

  def log_message(self, *a):
    pass

  def _reply(self, code, body):
    data = body.encode()
    self.send_response(code)
    self.send_header('Content-Type', 'application/json')
    self.send_header('Content-Length', str(len(data)))
    self.end_headers()
    self.wfile.write(data)

  def do_GET(self):
    body = FIXTURES.get(('GET', self.path))
    if body is None:
      return self._reply(404, ERROR_RESP)
    self._reply(200, body)

  def do_POST(self):
    n = int(self.headers.get('Content-Length', 0))
    req = json.loads(self.rfile.read(n) or b'{}')
    action = req.get('Action')
    if self.path.endswith('/shards/0') or self.path.endswith('/shards/1'):
      if action == 'cursor':
        return self._reply(200, CURSOR_RESP)
      if action == 'sub':
        return self._reply(200, SUB_RESP)
    if self.path.endswith('/shards') and action == 'pub':
      return self._reply(200,
                         PUB_FAIL_RESP if _Handler.fail_pub else PUB_RESP)
    self._reply(404, ERROR_RESP)


@pytest.fixture()
def server():
  httpd = HTTPServer(('127.0.0.1', 0), _Handler)
  t = threading.Thread(target=httpd.serve_forever, daemon=True)
  t.start()
  yield 'http://127.0.0.1:%d' % httpd.server_port
  httpd.shutdown()


def _client(endpoint):
  return DataHubClient(endpoint, 'test_id', 'test_key')


def test_get_topic_schema(server):
  c = _client(server)
  assert c.get_topic('p1', 't1') == [('label', 'DOUBLE'),
                                     ('uid', 'STRING'),
                                     ('iid', 'STRING')]


def test_list_shards_active_sorted(server):
  # CLOSED shards excluded; ids sorted numerically
  assert _client(server).list_shards('p1', 't1') == ['0', '1']


def test_get_cursor(server):
  cursor, seq = _client(server).get_cursor('p1', 't1', '0')
  assert cursor == '30005af19b3800000000000000000000'
  assert seq == 1


def test_get_records_with_null_field(server):
  recs, nxt = _client(server).get_records(
      'p1', 't1', '0', '30005af19b3800000000000000000000')
  assert recs == [(1, ['1.0', 'u1', 'i9']), (2, ['0.0', 'u2', None])]
  assert nxt == '30005af19b38000000000000000100000'


def test_put_records_ok_and_failed(server):
  c = _client(server)
  assert c.put_records('p1', 't1', '0', [['1', 'u', 'i']]) == 1
  _Handler.fail_pub = True
  try:
    with pytest.raises(DataHubError, match='MalformedRecord'):
      c.put_records('p1', 't1', '0', [['bad']])
  finally:
    _Handler.fail_pub = False


def test_error_payload_surfaces(server):
  with pytest.raises(DataHubError, match='NoSuchTopic'):
    _client(server).get_topic('p1', 'missing')
