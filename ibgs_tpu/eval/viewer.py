"""Live network viewer bridge (SIBR-compatible protocol).

TPU-native equivalent of reference gaussian_renderer/network_gui.py: a
non-blocking TCP socket accepting JSON camera messages and replying with
rendered RGB bytes followed by a length-prefixed verify string, so the
standard SIBR remote viewer can inspect a training run.  Unlike the
reference (which leaves the GUI unwired), `serve_once` is hooked into the
training loop: a no-op costing one non-blocking accept when no viewer is
attached.
"""
from __future__ import annotations

import json
import math
import socket
import struct
import traceback

import numpy as np

_listener = None
_conn = None


def init(host="127.0.0.1", port=6009):
    global _listener
    _listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    _listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    _listener.bind((host, port))
    _listener.listen()
    _listener.settimeout(0)
    return _listener.getsockname()[1]


def shutdown():
    global _listener, _conn
    for s in (_conn, _listener):
        try:
            if s is not None:
                s.close()
        except OSError:
            pass
    _listener = _conn = None


def try_connect():
    global _conn
    if _listener is None or _conn is not None:
        return
    try:
        _conn, _addr = _listener.accept()
        _conn.settimeout(None)
    except (BlockingIOError, OSError):
        pass


def _read_bytes(n):
    data = b""
    while len(data) < n:
        chunk = _conn.recv(n - len(data))
        if not chunk:
            raise ConnectionError("viewer disconnected")
        data += chunk
    return data


def receive_camera():
    """Read one viewer message (network_gui.py:46-75): returns
    (camera|None, payload dict).  The view matrix arrives transposed with
    flipped y/z columns (the reference's CUDA convention); it is converted
    to our COLMAP-style (R cam→world, t w2c) Camera."""
    (nbytes,) = struct.unpack("<i", _read_bytes(4))
    msg = json.loads(_read_bytes(nbytes).decode("utf-8"))
    width, height = msg["resolution_x"], msg["resolution_y"]
    if width == 0 or height == 0:
        return None, msg
    wvt = np.array(msg["view_matrix"], np.float64).reshape(4, 4)
    wvt[:, 1] *= -1.0
    wvt[:, 2] *= -1.0
    V = wvt.T                      # reference stores V transposed
    from ibgs_tpu.core.camera import make_camera
    cam = make_camera(V[:3, :3].T, V[:3, 3], msg["fov_x"], msg["fov_y"],
                      width, height)
    return cam, msg


def send_image(img, verify="1"):
    """Reply: raw RGB bytes, then len-prefixed verify string
    (network_gui.py:38-43)."""
    global _conn
    if _conn is None:
        return
    if img is not None:
        arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        _conn.sendall(arr.tobytes())
    _conn.sendall(struct.pack("<i", len(verify)))
    _conn.sendall(verify.encode("ascii"))


def serve_once(render_fn, verify="1"):
    """Process at most one pending viewer message.  `render_fn(cam, msg)`
    returns an (H, W, 3) float image.  Returns False if the viewer asked to
    stop training, True otherwise.  Safe to call every iteration."""
    global _conn
    if _listener is None:
        return True
    try_connect()
    if _conn is None:
        return True
    import select
    r, _, _ = select.select([_conn], [], [], 0)
    if not r:
        return True
    try:
        cam, msg = receive_camera()
        img = render_fn(cam, msg) if cam is not None else None
        send_image(img, verify)
        if msg.get("train") is False and not msg.get("keep_alive", True):
            return False
    except (ConnectionError, OSError):
        traceback.print_exc()
        try:
            _conn.close()
        except OSError:
            pass
        _conn = None
    return True
