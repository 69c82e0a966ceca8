"""Legacy SIBR remote-viewer bridge (non-blocking TCP).

Parity target: reference `gaussian_renderer/network_gui.py` — a listener on
:55557 speaking the 3DGS SIBR protocol: a length-prefixed JSON header
{resolution_x/y, fov_y/x, z_near/far, do/keep_alive/scaling_modifier + flags}
followed by a 4x4 view matrix and a 4x4 view-projection matrix (f32), to
which we reply with raw RGB bytes + the verification string.
"""
from __future__ import annotations

import json
import socket
import struct
import traceback

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


def read() -> bytes:
    messageLength = conn.recv(4)
    messageLength = int.from_bytes(messageLength, "little")
    return conn.recv(messageLength)


def send(message_bytes: bytes | None, verify: str) -> None:
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive():
    """Returns (custom_camera | None, do_training, convert_shs_python,
    compute_cov3d_python, keep_alive, scaling_modifier)."""
    message = read()
    width = int.from_bytes(message[0:4], "little")
    height = int.from_bytes(message[4:8], "little")
    fovy = struct.unpack("f", message[8:12])[0]
    fovx = struct.unpack("f", message[12:16])[0]
    znear = struct.unpack("f", message[16:20])[0]
    zfar = struct.unpack("f", message[20:24])[0]
    do_training = bool(message[24])
    do_shs_python = bool(message[25])
    do_rot_scale_python = bool(message[26])
    keep_alive = bool(message[27])
    scaling_modifier = struct.unpack("f", message[28:32])[0]
    world_view = np.frombuffer(message[32:96], np.float32).reshape(4, 4).copy()
    world_view[:, 1] = -world_view[:, 1]
    world_view[:, 2] = -world_view[:, 2]
    full_proj = np.frombuffer(message[96:160], np.float32).reshape(4, 4).copy()
    full_proj[:, 1] = -full_proj[:, 1]

    custom_cam = None
    if width != 0 and height != 0:
        custom_cam = MiniCam(
            width, height, fovy, fovx, znear, zfar, world_view, full_proj)
    return (custom_cam, do_training, do_shs_python, do_rot_scale_python,
            keep_alive, scaling_modifier)
