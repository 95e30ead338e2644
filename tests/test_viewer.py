"""Network viewer: SIBR-protocol loopback round trip (reference
gaussian_renderer/network_gui.py — here wired into the train loop)."""
import json
import socket
import struct
import threading

import numpy as np

from ibgs_tpu.eval import viewer


def _client_roundtrip(port, msg, H, W, out):
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    payload = json.dumps(msg).encode()
    s.sendall(struct.pack("<i", len(payload)) + payload)
    img = b""
    want = H * W * 3
    while len(img) < want:
        img += s.recv(want - len(img))
    (n,) = struct.unpack("<i", s.recv(4))
    out["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
    out["verify"] = s.recv(n).decode()
    s.close()


def test_viewer_roundtrip():
    H, W = 16, 32
    port = viewer.init(port=0)           # ephemeral
    try:
        view = np.eye(4)
        view[:, 1] *= -1                  # client sends flipped columns
        view[:, 2] *= -1
        msg = {"resolution_x": W, "resolution_y": H, "train": True,
               "fov_x": 1.0, "fov_y": 0.6, "z_near": 0.01, "z_far": 100.0,
               "shs_python": False, "rot_scale_python": False,
               "keep_alive": True, "scaling_modifier": 1.0,
               "view_matrix": view.T.reshape(-1).tolist(),
               "view_projection_matrix": np.eye(4).reshape(-1).tolist()}
        out = {}
        t = threading.Thread(target=_client_roundtrip,
                             args=(port, msg, H, W, out))
        t.start()

        got = {}

        def render_fn(cam, m):
            got["cam"] = cam
            assert cam.width == W and cam.height == H
            img = np.zeros((H, W, 3), np.float32)
            img[..., 0] = 0.5
            return img

        # poll until the message arrives and is served.  serve_once is
        # non-blocking, so back off between polls: under heavy machine
        # load the client thread may not be scheduled for seconds, and
        # 200 immediate polls would finish before it even connects
        # (observed as a flake during parallel suite + TPU runs).
        import time
        for _ in range(500):
            viewer.serve_once(render_fn, verify="ok")
            if "cam" in got:
                break
            time.sleep(0.02)
        t.join(timeout=10)
        assert not t.is_alive()
        assert out["verify"] == "ok"
        assert out["img"].shape == (H, W, 3)
        assert int(out["img"][0, 0, 0]) == 127    # 0.5 * 255
        # identity view (after unflip) → camera at origin
        np.testing.assert_allclose(np.asarray(got["cam"].cam_pos),
                                   np.zeros(3), atol=1e-6)
    finally:
        viewer.shutdown()
