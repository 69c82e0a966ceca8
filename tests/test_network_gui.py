"""Loopback test for the SIBR remote-viewer bridge: a fake client speaks
the reference protocol bytes exactly (gaussian_renderer/network_gui.py:43-78
— 4-byte little-endian length + JSON header; raw u8 RGB + length-prefixed
verify string back) and must get the frame."""
import json
import socket
import threading

import numpy as np

from langsplatv2_tpu.serve import network_gui


def _client(port, w, h, result):
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        view = np.eye(4, dtype=np.float32)
        msg = {
            "resolution_x": w, "resolution_y": h, "train": True,
            "fov_y": 0.8, "fov_x": 1.1, "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": False, "scaling_modifier": 1.0,
            "view_matrix": view.reshape(-1).tolist(),
            "view_projection_matrix": view.reshape(-1).tolist(),
        }
        payload = json.dumps(msg).encode("utf-8")
        s.sendall(len(payload).to_bytes(4, "little"))
        s.sendall(payload)

        def recv_exact(n):
            buf = b""
            while len(buf) < n:
                part = s.recv(n - len(buf))
                assert part, "server closed early"
                buf += part
            return buf

        img = np.frombuffer(recv_exact(w * h * 3), np.uint8).reshape(h, w, 3)
        vlen = int.from_bytes(recv_exact(4), "little")
        verify = recv_exact(vlen).decode("ascii")
        result["img"] = img
        result["verify"] = verify
        s.close()
    except Exception as e:  # surface in the main thread
        result["error"] = repr(e)


def test_loopback_frame():
    w, h = 32, 16
    network_gui.init("127.0.0.1", 0)
    port = network_gui.listener.getsockname()[1]
    result = {}
    t = threading.Thread(target=_client, args=(port, w, h, result))
    t.start()

    served = {}

    def render_fn(cam, shs_py, cov_py, scaling_mod):
        served["cam"] = cam
        img = np.zeros((cam.image_height, cam.image_width, 3), np.uint8)
        img[:, :, 1] = 200  # green frame
        return img

    # Poll until the client's single request is served (do_training=True
    # with iteration < max breaks the inner loop).
    for _ in range(200):
        network_gui.poll(render_fn, "/data/scene", iteration=1,
                         max_iterations=100)
        if "img" in result or "error" in result:
            break
        t.join(timeout=0.05)
    t.join(timeout=10)

    assert "error" not in result, result.get("error")
    assert result["img"].shape == (h, w, 3)
    assert (result["img"][:, :, 1] == 200).all()
    assert result["verify"] == "/data/scene"
    cam = served["cam"]
    assert (cam.image_width, cam.image_height) == (w, h)
    # The receiver negates view-matrix columns 1 and 2 (SIBR convention).
    expect = np.eye(4, dtype=np.float32)
    expect[:, 1] *= -1
    expect[:, 2] *= -1
    np.testing.assert_array_equal(cam.world_view_transform, expect)
    network_gui.listener.close()
    network_gui.listener = None
    network_gui.conn = None
