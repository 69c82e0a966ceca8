"""Legacy SIBR remote-viewer bridge (non-blocking TCP).

Parity target: reference `gaussian_renderer/network_gui.py:43-86` — a
listener speaking the 3DGS SIBR wire protocol: each request is a 4-byte
little-endian length followed by a UTF-8 JSON object carrying
resolution_x/y, train, fov_y/x, z_near/far, shs_python, rot_scale_python,
keep_alive, scaling_modifier, and the flattened view / view-projection
matrices (whose 2nd and 3rd COLUMNS the receiver negates, matching the
SIBR viewer's convention). The reply is the raw H*W*3 u8 RGB frame
followed by the length-prefixed verification string (the scene source
path). The training loops poll this non-blocking via `poll()`
(reference train.py:115-128).
"""
from __future__ import annotations

import json
import socket

import numpy as np

from ..scene.cameras import MiniCam

host = "127.0.0.1"
port = 55557
conn = None
addr = None
listener = None


def init(wish_host: str, wish_port: int) -> None:
    global host, port, listener
    host, port = wish_host, wish_port
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect() -> None:
    global conn, addr
    try:
        conn, addr = listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def _recv_exact(n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = conn.recv(n - len(buf))
        if not part:
            raise ConnectionError("SIBR client closed the connection")
        buf += part
    return buf


def read() -> dict:
    message_length = int.from_bytes(_recv_exact(4), "little")
    return json.loads(_recv_exact(message_length).decode("utf-8"))


def send(message_bytes: bytes | None, verify: str) -> None:
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive():
    """Returns (custom_camera | None, do_training, convert_shs_python,
    compute_cov3d_python, keep_alive, scaling_modifier)."""
    message = read()
    width = int(message["resolution_x"])
    height = int(message["resolution_y"])
    do_training = bool(message["train"])
    fovy = float(message["fov_y"])
    fovx = float(message["fov_x"])
    znear = float(message["z_near"])
    zfar = float(message["z_far"])
    do_shs_python = bool(message["shs_python"])
    do_rot_scale_python = bool(message["rot_scale_python"])
    keep_alive = bool(message["keep_alive"])
    scaling_modifier = float(message["scaling_modifier"])
    if width == 0 or height == 0:
        # Zero-resolution request (e.g. minimized viewer window): no camera
        # to render, but the train/keep_alive flags must still be honored or
        # poll()'s break condition can never fire and training stalls
        # (reference parses the flags regardless of resolution).
        return (None, do_training, do_shs_python, do_rot_scale_python,
                keep_alive, scaling_modifier)
    world_view = np.asarray(message["view_matrix"],
                            np.float32).reshape(4, 4)
    world_view[:, 1] = -world_view[:, 1]
    world_view[:, 2] = -world_view[:, 2]
    full_proj = np.asarray(message["view_projection_matrix"],
                           np.float32).reshape(4, 4)
    full_proj[:, 1] = -full_proj[:, 1]
    custom_cam = MiniCam(
        width, height, fovy, fovx, znear, zfar, world_view, full_proj)
    return (custom_cam, do_training, do_shs_python, do_rot_scale_python,
            keep_alive, scaling_modifier)


def poll(render_fn, source_path: str, iteration: int, max_iterations: int):
    """One train-loop poll (reference train.py:115-128): accept a pending
    client, serve render requests until the client allows training to
    proceed, drop the connection on error. `render_fn(MiniCam,
    convert_shs_python, compute_cov3d_python, scaling_modifier) ->
    np.uint8 [H, W, 3]`. Never raises; never blocks when no client."""
    global conn
    if listener is None:
        return
    if conn is None:
        try_connect()
    while conn is not None:
        try:
            net_image_bytes = None
            (custom_cam, do_training, shs_py, cov_py, keep_alive,
             scaling_mod) = receive()
            if custom_cam is not None:
                img = render_fn(custom_cam, shs_py, cov_py, scaling_mod)
                net_image_bytes = memoryview(np.ascontiguousarray(img))
            send(net_image_bytes, source_path)
            if do_training and (iteration < max_iterations or not keep_alive):
                break
        except Exception:
            conn = None
