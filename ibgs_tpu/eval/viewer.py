"""Live network viewer bridge (SIBR-compatible protocol).

Port of reference gaussian_renderer/network_gui.py: a TCP socket accepting
JSON camera messages and replying with rendered RGB bytes, so the standard
SIBR remote viewer can inspect a training run.  The reference keeps this
unwired from train.py; here `serve_once` can be called from the training
loop between iterations.
"""
from __future__ import annotations

import json
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


def try_connect():
    global _conn
    if _listener is None:
        return
    try:
        _conn, _addr = _listener.accept()
        _conn.settimeout(None)
    except Exception:
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
    """Read one viewer message → dict with resolution + matrices, or None."""
    if _conn is None:
        return None
    try:
        (nbytes,) = struct.unpack("<i", _read_bytes(4))
        payload = json.loads(_read_bytes(nbytes).decode())
        return payload
    except Exception:
        traceback.print_exc()
        return None


def send_image(img):
    """img: (H, W, 3) float in [0,1] → raw bytes to the viewer."""
    if _conn is None:
        return
    arr = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    _conn.sendall(arr.tobytes())
