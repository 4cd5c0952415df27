"""HTTP API: async generation tasks + status polling.

Mirrors the reference server surface (SURVEY.md §3 EP2;
cli/commands/serve/handlers.go:20-264):

* ``POST /generate``        — body = generation config JSON; output dir
  forced to ``{output_root}/{task_id}``; returns the task UUID (text).
* ``GET  /status/<taskID>`` — per-model progress percentages; finished
  tasks are evicted 5 minutes after completion.
* ``POST /validate-config`` — 200 on valid, 400 + error details.
* ``POST /generate-config`` — config synthesis (sql/sample/description).

Stdlib ``ThreadingHTTPServer`` driving one long-lived SparkSession —
Spark schedules concurrent jobs from multiple driver threads fine (FAIR
scheduler recommended for many concurrent tasks). Body limit 1 MB, as
the reference enforces.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

MAX_BODY = 1 << 20
TASK_TTL_SECONDS = 300.0


class TaskRegistry:
    """In-memory task map with completion TTL (reference task.go:23,138)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._tasks: dict[str, dict[str, Any]] = {}

    def create(self) -> str:
        task_id = str(uuid.uuid4())
        with self._lock:
            self._tasks[task_id] = {
                "status": "running",
                "progress": {},
                "error": None,
                "finished_at": None,
            }
        return task_id

    def update(self, task_id: str, **kw: Any) -> None:
        with self._lock:
            if task_id in self._tasks:
                self._tasks[task_id].update(kw)

    def set_progress(self, task_id: str, model: str, frac: float) -> None:
        with self._lock:
            t = self._tasks.get(task_id)
            if t is not None:
                t["progress"][model] = frac

    def get(self, task_id: str) -> dict[str, Any] | None:
        self._evict()
        with self._lock:
            t = self._tasks.get(task_id)
            return dict(t) if t is not None else None

    def _evict(self) -> None:
        now = time.monotonic()
        with self._lock:
            dead = [
                k
                for k, t in self._tasks.items()
                if t["finished_at"] is not None
                and now - t["finished_at"] > TASK_TTL_SECONDS
            ]
            for k in dead:
                del self._tasks[k]


def _make_handler(registry: TaskRegistry, output_root: str, spark_factory):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a) -> None:  # quiet
            pass

        def _send(self, code: int, payload: Any, as_text: bool = False) -> None:
            body = (
                str(payload).encode()
                if as_text
                else json.dumps(payload, default=str).encode()
            )
            self.send_response(code)
            self.send_header(
                "Content-Type", "text/plain" if as_text else "application/json"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes | None:
            n = int(self.headers.get("Content-Length") or 0)
            if n <= 0:
                self._send(411, {"message": "missing request body"})
                return None
            if n > MAX_BODY:
                self._send(413, {"message": "body too large (limit 1MB)"})
                return None
            return self.rfile.read(n)

        def do_GET(self) -> None:
            if self.path.startswith("/status/"):
                task_id = self.path[len("/status/") :]
                t = registry.get(task_id)
                if t is None:
                    self._send(404, {"message": "task not found"})
                    return
                self._send(
                    200,
                    {
                        "status": t["status"],
                        "progress": {
                            m: round(100.0 * f, 1) for m, f in t["progress"].items()
                        },
                        **({"error": t["error"]} if t["error"] else {}),
                    },
                )
                return
            self._send(404, {"message": "not found"})

        def do_POST(self) -> None:
            body = self._body()
            if body is None:
                return
            try:
                if self.path == "/generate":
                    self._generate(body)
                elif self.path == "/validate-config":
                    self._validate(body)
                elif self.path == "/generate-config":
                    self._generate_config(body)
                else:
                    self._send(404, {"message": "not found"})
            except Exception as e:  # defensive: never kill the server
                self._send(500, {"message": "internal error", "error": str(e)})

        def _validate(self, body: bytes) -> None:
            from sdvg_spark.config.model import ConfigError, parse_config

            try:
                parse_config(json.loads(body))
            except (ConfigError, ValueError) as e:
                self._send(
                    400, {"message": "Generation config is not valid", "error": str(e)}
                )
                return
            self._send(200, {"message": "ok"})

        def _generate(self, body: bytes) -> None:
            from sdvg_spark.config.model import ConfigError, parse_config

            try:
                raw = json.loads(body)
                parse_config(raw)
            except (ConfigError, ValueError) as e:
                self._send(
                    400, {"message": "Generation config is not valid", "error": str(e)}
                )
                return
            task_id = registry.create()
            raw.setdefault("output", {})
            raw["output"]["dir"] = os.path.join(output_root, task_id)

            def work() -> None:
                from sdvg_spark.jobs import run_generate

                try:
                    run_generate(
                        raw,
                        spark=spark_factory(),
                        on_progress=lambda m, f: registry.set_progress(task_id, m, f),
                    )
                    registry.update(
                        task_id, status="done", finished_at=time.monotonic()
                    )
                except Exception as e:
                    registry.update(
                        task_id,
                        status="failed",
                        error=str(e),
                        finished_at=time.monotonic(),
                    )

            threading.Thread(target=work, daemon=True).start()
            self._send(200, task_id, as_text=True)

        def _generate_config(self, body: bytes) -> None:
            from sdvg_spark import config_synth

            req = json.loads(body)
            mode = req.get("mode", "description")
            text = req.get("input", "")
            try:
                if mode == "sql-query":
                    raw = config_synth.ddl_to_config(text)
                elif mode == "data-sample":
                    raw = config_synth.sample_to_config(text)
                else:
                    raw = config_synth.describe_to_config(text)
            except Exception as e:
                self._send(
                    400, {"message": "config generation failed", "error": str(e)}
                )
                return
            self._send(200, raw)

    return Handler


def make_server(
    host: str = "127.0.0.1",
    port: int = 0,
    output_root: str = "output",
    spark_factory=None,
) -> ThreadingHTTPServer:
    if spark_factory is None:

        def spark_factory():
            from sdvg_spark.session import get_spark

            return get_spark(app_name="sdvg-serve")

    registry = TaskRegistry()
    return ThreadingHTTPServer(
        (host, port), _make_handler(registry, output_root, spark_factory)
    )


def serve(host: str = "127.0.0.1", port: int = 8080, output_root: str = "output") -> None:
    srv = make_server(host, port, output_root)
    print(f"sdvg-spark serving on http://{host}:{srv.server_port}")
    srv.serve_forever()
