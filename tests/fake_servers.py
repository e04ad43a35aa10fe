"""In-process fake HTTP servers for hermetic parse/ask tests.

Closes the reference's biggest test gap (SURVEY.md §4: its HTTP client,
cache, retry logic, and agent loop are entirely untested because it has no
fake backends).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional


class _Handler(BaseHTTPRequestHandler):
    server_version = "FakeServer/1.0"

    def log_message(self, *args):  # silence
        pass

    def _dispatch(self, method: str):
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length) if length else b""
        status, payload = self.server.app.handle(method, self.path, self.headers, body)
        data = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        self._dispatch("GET")

    def do_POST(self):
        self._dispatch("POST")


class FakeApp:
    """Base: route (method, path-prefix) -> handler; records all requests."""

    def __init__(self):
        self.requests: List[Dict] = []

    def handle(self, method, path, headers, body):
        raise NotImplementedError


class FakeServer:
    def __init__(self, app: FakeApp):
        self.app = app
        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self.httpd.app = app
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    @property
    def url(self) -> str:
        host, port = self.httpd.server_address
        return f"http://{host}:{port}"

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.httpd.shutdown()
        self.httpd.server_close()


class FakeLlamaParse(FakeApp):
    """Emulates the upload/poll/result protocol of the parse API.

    Configurable failure injection: fail the first ``fail_uploads`` upload
    attempts with 500s; serve ``pending_polls`` PENDING statuses before
    COMPLETED; optionally fail one page.
    """

    def __init__(
        self,
        markdown_pages: Optional[List[str]] = None,
        fail_uploads: int = 0,
        pending_polls: int = 0,
        failed_page: bool = False,
        job_status: str = "COMPLETED",
    ):
        super().__init__()
        self.markdown_pages = markdown_pages or ["# Parsed\n\ncontent"]
        self.fail_uploads = fail_uploads
        self.pending_polls = pending_polls
        self.failed_page = failed_page
        self.job_status = job_status
        self.upload_attempts = 0
        self.poll_counts: Dict[str, int] = {}
        self.next_job = 0
        self.configurations: List[Dict] = []  # parsed `configuration` form fields

    @staticmethod
    def _multipart_field(body: bytes, name: str) -> Optional[bytes]:
        """Value of a form field in a multipart body (None if absent)."""
        marker = f'name="{name}"'.encode()
        at = body.find(marker)
        if at < 0:
            return None
        start = body.find(b"\r\n\r\n", at)
        if start < 0:
            return None
        end = body.find(b"\r\n--", start)
        return body[start + 4 : end if end >= 0 else len(body)]

    def handle(self, method, path, headers, body):
        self.requests.append({"method": method, "path": path})
        if method == "POST" and path == "/api/v2/parse/upload":
            self.upload_attempts += 1
            if self.upload_attempts <= self.fail_uploads:
                return 500, {"error": "transient"}
            raw = self._multipart_field(body, "configuration")
            if raw is not None:
                try:
                    self.configurations.append(json.loads(raw))
                except ValueError:
                    pass
            self.next_job += 1
            job_id = f"job-{self.next_job}"
            self.poll_counts[job_id] = 0
            return 200, {"id": job_id}

        if method == "GET" and path.startswith("/api/v2/parse/"):
            job_id = path.split("/")[4].split("?")[0]
            if "expand=" in path:
                pages = []
                for i, md in enumerate(self.markdown_pages):
                    if self.failed_page and i == 0:
                        pages.append({"error": "ocr exploded", "page_number": i + 1})
                    else:
                        pages.append({"markdown": md, "page_number": i + 1})
                return 200, {"markdown": {"pages": pages}, "text": None}
            self.poll_counts[job_id] = self.poll_counts.get(job_id, 0) + 1
            if self.poll_counts[job_id] <= self.pending_polls:
                return 200, {"job": {"status": "PENDING"}}
            return 200, {"job": {"status": self.job_status}}

        return 404, {"error": f"no route {method} {path}"}


class FakeOpenAI(FakeApp):
    """Scripted OpenAI-compatible server for both API modes.

    ``script`` is a list of response bodies returned in order; each call
    pops the next one. Chat requests hit /chat/completions, Responses hit
    /responses; requests are recorded with parsed JSON bodies.
    """

    def __init__(self, script: List[Dict]):
        super().__init__()
        self.script = list(script)

    def handle(self, method, path, headers, body):
        parsed = json.loads(body) if body else {}
        self.requests.append({"method": method, "path": path, "body": parsed})
        if not self.script:
            return 500, {"error": "script exhausted"}
        return 200, self.script.pop(0)


def chat_tool_call_response(name: str, arguments: Dict, call_id: str = "call_1") -> Dict:
    return {
        "choices": [
            {
                "message": {
                    "role": "assistant",
                    "content": None,
                    "tool_calls": [
                        {
                            "id": call_id,
                            "type": "function",
                            "function": {
                                "name": name,
                                "arguments": json.dumps(arguments),
                            },
                        }
                    ],
                }
            }
        ]
    }


def chat_text_response(text: str) -> Dict:
    return {"choices": [{"message": {"role": "assistant", "content": text}}]}


def responses_tool_call(name: str, arguments: Dict, call_id: str = "call_1") -> Dict:
    return {
        "output": [
            {
                "type": "function_call",
                "name": name,
                "arguments": json.dumps(arguments),
                "call_id": call_id,
                "id": "fc_1",
            }
        ]
    }


def responses_text(text: str) -> Dict:
    return {
        "output": [
            {
                "type": "message",
                "role": "assistant",
                "content": [{"type": "output_text", "text": text}],
            }
        ]
    }
