"""In-process mock ClickHouse HTTP endpoint for writer/staging/lifecycle
tests: records every statement it receives, answers canned queries, and
can simulate failures. One port == one 'host'."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class MockClickHouse:
    def __init__(self, fail_first: int = 0, fail_substring: str | None = None):
        self.statements: list[str] = []
        self.applied: list[str] = []      # statements answered 200 (a 500
        #                                   simulates fail-before-apply)
        self.auth_users: list[str] = []   # ?user= of every POST, in order
        self.fail_first = fail_first
        self.fail_substring = fail_substring  # only fail matching stmts
        self._failures = 0
        self.canned: dict[str, str] = {}  # substring → TSV response
        self._lock = threading.Lock()

        mock = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def do_GET(self):
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"Ok.\n")

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode("utf-8")
                qs = parse_qs(urlparse(self.path).query)
                with mock._lock:
                    mock.statements.append(body)
                    mock.auth_users.append(qs.get("user", [""])[0])
                    if ((mock.fail_substring is None
                         or mock.fail_substring in body)
                            and mock._failures < mock.fail_first):
                        mock._failures += 1
                        self.send_response(500)
                        self.end_headers()
                        self.wfile.write(b"simulated failure")
                        return
                    mock.applied.append(body)
                reply = ""
                for key, resp in mock.canned.items():
                    if key in body:
                        reply = resp
                        break
                self.send_response(200)
                self.end_headers()
                self.wfile.write(reply.encode("utf-8"))

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    @property
    def host(self) -> str:
        return "127.0.0.1"

    def inserts(self) -> list[str]:
        return [s for s in self.statements if s.upper().startswith("INSERT")]

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()
