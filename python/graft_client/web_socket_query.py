"""WebSocket query consumption, mirroring the reference Python client's
WebSocket query surface (reference: python/src/sleeper/web_socket_query.py
— connect, send the query, fold `rows`/`completed`/`error` messages).

graft's executors PUSH result batches to a WebSocket endpoint (the
engine's WebSocketResultsQueue, at-least-once with a `+` ack per
message), so the Python side IS the endpoint: a small stdlib RFC 6455
server receives the batches while `graft.query.QueryRunner --ws=<url>`
runs, and the processor folds them idempotently on the
`(queryId, partitionId, batchSeq)` dedup key — the same consumer fold
as the engine's own SocketResultsConsumer.
"""

import base64
import hashlib
import json
import socket
import struct
import threading

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class WebSocketResultsServer:
    """Threaded stdlib RFC 6455 server half: HTTP upgrade, masked-frame
    decode with continuation support, `+` text ack AFTER each message is
    recorded (the at-least-once contract), pong for ping. Test-grade by
    design, like the engine's own WebSocketResultsServer — a deployment
    terminates WS in a managed gateway.
    """

    def __init__(self):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self.url = f"ws://127.0.0.1:{self.port}/results"
        self.messages = []
        self._lock = threading.Lock()
        self._running = True
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()

    def _accept_loop(self):
        while self._running:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._handle, args=(conn,), daemon=True).start()

    def _handle(self, conn):
        try:
            conn.settimeout(30)
            f = conn.makefile("rb")
            # ---- HTTP upgrade ----
            key = None
            while True:
                line = f.readline().decode("latin1").rstrip("\r\n")
                if not line:
                    break
                if line.lower().startswith("sec-websocket-key:"):
                    key = line.split(":", 1)[1].strip()
            if key is None:
                return
            accept = base64.b64encode(
                hashlib.sha1((key + _WS_GUID).encode()).digest()).decode()
            conn.sendall((
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept}\r\n\r\n").encode())
            # ---- frame loop ----
            buf = bytearray()
            while True:
                hdr = f.read(2)
                if len(hdr) < 2:
                    return
                fin = bool(hdr[0] & 0x80)
                opcode = hdr[0] & 0x0F
                masked = bool(hdr[1] & 0x80)
                ln = hdr[1] & 0x7F
                if ln == 126:
                    ln = struct.unpack(">H", f.read(2))[0]
                elif ln == 127:
                    ln = struct.unpack(">Q", f.read(8))[0]
                if ln > 64 * 1024 * 1024:
                    return
                mask = f.read(4) if masked else b""
                payload = bytearray(f.read(ln))
                if masked:
                    for i in range(len(payload)):
                        payload[i] ^= mask[i % 4]
                if opcode in (0x1, 0x0):  # text / continuation
                    buf.extend(payload)
                    if fin:
                        with self._lock:
                            self.messages.append(buf.decode("utf-8"))
                        buf = bytearray()
                        self._send_frame(conn, 0x1, b"+")  # ack AFTER recording
                elif opcode == 0x8:  # close: echo and finish
                    self._send_frame(conn, 0x8, bytes(payload))
                    return
                elif opcode == 0x9:  # ping -> pong
                    self._send_frame(conn, 0xA, bytes(payload))
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    @staticmethod
    def _send_frame(conn, opcode, payload):
        # server frames are unmasked per RFC 6455
        hdr = bytearray([0x80 | opcode])
        n = len(payload)
        if n < 126:
            hdr.append(n)
        elif n < 65536:
            hdr.append(126)
            hdr += struct.pack(">H", n)
        else:
            hdr.append(127)
            hdr += struct.pack(">Q", n)
        conn.sendall(bytes(hdr) + payload)

    def raw_messages(self):
        """Every message seen on the wire, duplicates included."""
        with self._lock:
            return list(self.messages)

    def close(self):
        self._running = False
        try:
            self._srv.close()
        except OSError:
            pass


def fold_batches(messages, query_id):
    """Idempotent consumer fold: batches dedup on
    (queryId, partitionId, batchSeq) — retried partitions re-send the
    identical triple — and rows concatenate in (partition, seq) order.
    """
    seen = {}
    for m in messages:
        try:
            b = json.loads(m)
        except json.JSONDecodeError:
            continue
        if b.get("queryId") != query_id:
            continue
        seen.setdefault((b.get("partitionId"), b.get("batchSeq")), b.get("rows", []))
    rows = []
    for k in sorted(seen, key=lambda t: (t[0] if t[0] is not None else -1,
                                         t[1] if t[1] is not None else -1)):
        rows.extend(seen[k])
    return rows


class WebSocketQueryProcessor:
    """Runs a query with WebSocket result delivery and returns the folded
    rows (reference: WebSocketQueryProcessor — there connecting out to
    API Gateway, here hosting the endpoint the executors push to).
    """

    def __init__(self, client):
        self.client = client

    def run(self, query, out_dir=None):
        """Returns (QueryResult, rows): the tracked status plus the rows
        received over the WebSocket."""
        import tempfile
        from .client import QueryResult

        out_dir = out_dir or tempfile.mkdtemp(prefix="graft-wsquery-")
        server = WebSocketResultsServer()
        try:
            qfile = f"{out_dir}/.{query.query_id}.query.json"
            with open(qfile, "w") as f:
                f.write(query.to_json())
            args = [self.client.table_dir, "@" + qfile, out_dir]
            if self.client.tracker_dir:
                args.append(self.client.tracker_dir)
            args.append(f"--ws={server.url}")
            proc = self.client._submit("graft.query.QueryRunner", args)
            status_file = f"{out_dir}/{query.query_id}.status.json"
            import os
            if os.path.exists(status_file):
                with open(status_file) as f:
                    status = json.load(f)
            else:
                status = {"queryId": query.query_id, "state": "FAILED",
                          "rowCount": 0, "locations": [],
                          "error": (proc.stderr or "")[-2000:]}
            rows = fold_batches(server.raw_messages(), query.query_id)
            return QueryResult(status, f"{out_dir}/{query.query_id}"), rows
        finally:
            server.close()
