"""Viser web-GUI frontend (ZMQ REQ client).

Parity target: reference `frontend_viser.py` — viser server on :8081 with
prompt box / threshold slider / heatmap toggle / resolution divisor, a
100 Hz camera-poll loop that forwards {c2w, width, height, fov_y, prompt,
threshold, show_heatmap} to the backend and paints the returned JPEG as the
background image.

Import-gated: viser is not installed in this environment; constructing
ViserFrontend raises ImportError with a clear message if missing.
"""
from __future__ import annotations

import json
import time

import numpy as np


def wxyz_to_rotmat(wxyz: np.ndarray) -> np.ndarray:
    """Quaternion (w,x,y,z) -> rotation matrix (reference
    frontend_viser.py:104-117)."""
    w, x, y, z = wxyz
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
    ])


class PipelinedClient:
    """DEALER client for BackendRenderer.run_pipelined: keeps up to
    `depth` requests in flight so the server can overlap frame N+1's
    dispatch with frame N's device compute + readback. `submit` enqueues;
    `collect` returns the oldest reply (bytes) when one is due."""

    def __init__(self, backend_addr: str = "tcp://localhost:5555",
                 depth: int = 2):
        import zmq

        self._ctx = zmq.Context()
        self.socket = self._ctx.socket(zmq.DEALER)
        self.socket.connect(backend_addr)
        self.depth = depth
        self.inflight = 0

    def submit(self, request: dict):
        self.socket.send_multipart([b"", json.dumps(request).encode()])
        self.inflight += 1

    def _recv(self) -> bytes:
        _empty, reply = self.socket.recv_multipart()
        self.inflight -= 1
        return reply

    def collect(self, block: bool = False) -> bytes | None:
        """Oldest outstanding reply; None when the pipeline isn't full yet
        (or, with block=False, when no reply is ready)."""
        if self.inflight > self.depth or (block and self.inflight):
            return self._recv()
        if self.inflight and self.socket.poll(0):
            return self._recv()
        return None

    def drain(self):
        while self.inflight:
            yield self._recv()


class ViserFrontend:
    def __init__(self, backend_addr: str = "tcp://localhost:5555",
                 port: int = 8081, base_height: int = 720,
                 fov_y: float = 1.0):
        import viser  # gated optional dependency
        import zmq

        self.server = viser.ViserServer(port=port)
        ctx = zmq.Context()
        self.socket = ctx.socket(zmq.REQ)
        self.socket.connect(backend_addr)
        self.base_height = base_height
        self.fov_y = fov_y

        self.gui_prompt = self.server.gui.add_text("Prompt", initial_value="")
        self.gui_threshold = self.server.gui.add_slider(
            "Threshold", min=0.0, max=1.0, step=0.01, initial_value=0.22)
        self.gui_heatmap = self.server.gui.add_checkbox(
            "Show heatmap", initial_value=False)
        self.gui_res = self.server.gui.add_slider(
            "Resolution divisor", min=1, max=8, step=1, initial_value=2)

    def _request_for_camera(self, camera) -> dict:
        R = wxyz_to_rotmat(np.asarray(camera.wxyz))
        c2w = np.eye(4)
        c2w[:3, :3] = R
        c2w[:3, 3] = np.asarray(camera.position)
        div = int(self.gui_res.value)
        height = self.base_height // div
        width = int(height * camera.aspect)
        return {
            "c2w": c2w.tolist(),
            "width": width,
            "height": height,
            "fov_y": float(camera.fov),
            "prompt": self.gui_prompt.value,
            "threshold": float(self.gui_threshold.value),
            "show_heatmap": bool(self.gui_heatmap.value),
        }

    def run(self, poll_hz: float = 100.0):
        import cv2

        while True:
            clients = self.server.get_clients()
            for client in clients.values():
                req = self._request_for_camera(client.camera)
                self.socket.send(json.dumps(req).encode())
                reply = self.socket.recv()
                if reply == b"ERROR":
                    continue
                img = cv2.imdecode(
                    np.frombuffer(reply, np.uint8), cv2.IMREAD_COLOR)
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                client.scene.set_background_image(img)
            time.sleep(1.0 / poll_hz)
