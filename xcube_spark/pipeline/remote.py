"""Remote cube-generator client.

Parity with the reference's ``xcube/core/gen2/remote/generator.py:36``
(``RemoteCubeGenerator``) and ``remote/config.py`` (``ServiceConfig``):
submit a gen2 request to an HTTP generator service, then poll the job
until it succeeds or fails, reporting progress through
:mod:`xcube_spark.util.progress`.

The transport is stdlib ``urllib`` (the sandbox has no ``requests``);
the service contract is this repo's ``server.py`` /cubegens routes —
PUT /cubegens -> ``{"cubegenId", "status"}``, GET /cubegens/{id} ->
``{"cubegenId", "status": {"active", "succeeded", "failed"},
"progress": [...], "result": {...}}``.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from typing import Any


class CubeGeneratorError(RuntimeError):
    """Raised by :meth:`RemoteCubeGenerator.generate_cube` on job
    failure when ``raise_on_error`` is set (remote/generator.py:45)."""

    def __init__(self, message: str, remote_traceback: str | None = None):
        super().__init__(message)
        self.remote_traceback = remote_traceback


@dataclass
class ServiceConfig:
    """Where the generator service lives (remote/config.py shape,
    minus the OAuth client-credentials flow — pass a ready
    ``access_token`` for authenticated services)."""

    endpoint_url: str
    access_token: str | None = None

    def __post_init__(self):
        if not self.endpoint_url.endswith("/"):
            self.endpoint_url += "/"


class RemoteCubeGenerator:
    """Submit-and-poll client for the /cubegens service."""

    def __init__(
        self,
        service_config: ServiceConfig,
        progress_period: float = 1.0,
        raise_on_error: bool = False,
        timeout: float = 600.0,
    ):
        self._config = service_config
        self._progress_period = float(progress_period)
        self._raise_on_error = raise_on_error
        self._timeout = float(timeout)

    # -- transport -----------------------------------------------------

    def _headers(self) -> dict[str, str]:
        h = {"Accept": "application/json",
             "Content-Type": "application/json"}
        if self._config.access_token:
            h["Authorization"] = f"Bearer {self._config.access_token}"
        return h

    def _call(self, method: str, path: str,
              body: dict | None = None) -> dict:
        req = urllib.request.Request(
            self._config.endpoint_url + path,
            data=(json.dumps(body).encode() if body is not None else None),
            headers=self._headers(),
            method=method,
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            try:
                detail = json.loads(e.read()).get("error", {})
            except Exception:
                detail = {}
            raise CubeGeneratorError(
                f"{method} /{path} failed with HTTP {e.code}: "
                f"{detail.get('message', e.reason)}")

    # -- API -----------------------------------------------------------

    def generate_cube(self, request: dict[str, Any]) -> dict[str, Any]:
        """Submit ``request`` and poll to completion.

        Returns the final job document (``status``, ``result``,
        ``progress``).  Progress is re-emitted locally through
        ``observe_progress("Generating cube", 100)`` — each poll's
        innermost remote frame advances the local one by its delta,
        the reference client's reporting loop
        (remote/generator.py:121-150).
        """
        from xcube_spark.util.progress import observe_progress

        submitted = self._call("PUT", "cubegens", request)
        gid = submitted["cubegenId"]
        deadline = time.monotonic() + self._timeout
        last_worked = 0.0
        with observe_progress("Generating cube", 100) as cm:
            while True:
                job = self._call("GET", f"cubegens/{gid}")
                status = job.get("status", {})
                if status.get("succeeded"):
                    if last_worked < 100:
                        cm.worked(100 - last_worked)
                    return job
                if status.get("failed"):
                    if self._raise_on_error:
                        result = job.get("result") or {}
                        raise CubeGeneratorError(
                            result.get("message", "cube generation failed"),
                            remote_traceback=result.get("traceback"))
                    return job
                progress = job.get("progress") or []
                if progress:
                    state = progress[0].get("state", {})
                    worked = 100.0 * float(state.get("progress", 0.0))
                    if worked > last_worked:
                        cm.worked(worked - last_worked)
                        last_worked = worked
                if time.monotonic() > deadline:
                    raise CubeGeneratorError(
                        f"cubegen {gid} did not finish within "
                        f"{self._timeout}s")
                time.sleep(self._progress_period)
