"""Wire-protocol tests for the network viewer (reference network_gui.py parity).

Checks the SIBR binary layout byte-for-byte — 4-byte LE length + JSON request with
the reference's exact field names and matrix conventions (network_gui.py:57-85),
raw-image + length-prefixed-verify response (network_gui.py:47-52) — plus the
simple JSON protocol, against a live socket pair. No renderer involved: these
exercise the framing and camera-convention normalization only.
"""

import json
import socket
import struct
import time

import numpy as np

from relightable3dgaussians_w_tpu.viewer import ViewerServer, _normalize_sibr


def _sibr_wire_from_ours(viewmat):
    """Encode OUR math-convention view matrix as SIBR sends it: transpose to the
    row-vector convention, then negate columns 1 and 2 (the inverse of the flips
    network_gui.receive applies)."""
    wire = viewmat.T.copy()
    wire[:, 1] *= -1.0
    wire[:, 2] *= -1.0
    return wire


def _look_at_viewmat():
    # A nontrivial rigid view matrix (rotation about y + translation).
    c, s = np.cos(0.3), np.sin(0.3)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t = np.array([0.1, -0.2, 3.0], np.float32)
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = R
    M[:3, 3] = t
    return M


def test_normalize_sibr_conventions():
    ours = _look_at_viewmat()
    proj = np.diag([1.2, 1.5, 1.01, 1.0]).astype(np.float32) @ ours
    msg = {
        "resolution_x": 64, "resolution_y": 48,
        "train": True, "fov_y": 0.8, "fov_x": 1.0,
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": True, "scaling_modifier": 0.7,
        "view_matrix": _sibr_wire_from_ours(ours).reshape(-1).tolist(),
        "view_projection_matrix": proj.T.reshape(-1).tolist(),
    }
    req = _normalize_sibr(msg)
    assert req["width"] == 64 and req["height"] == 48
    np.testing.assert_allclose(req["viewmat"], ours, atol=1e-6)
    np.testing.assert_allclose(req["projmat"], proj, atol=1e-6)
    assert req["fovx"] == 1.0 and req["fovy"] == 0.8
    assert req["scaling_modifier"] == np.float32(0.7)


def test_normalize_sibr_heartbeat():
    req = _normalize_sibr({"resolution_x": 0, "resolution_y": 0, "train": False})
    assert req["width"] == 0 and req["train"] is False


def _connect(server):
    client = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    client.connect(("127.0.0.1", server.port))
    for _ in range(100):
        if server.try_connect():
            return client
        time.sleep(0.01)
    raise TimeoutError("server never accepted")


def _recv_exact(sock, n):
    buf = b""
    sock.settimeout(5.0)
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed early"
        buf += chunk
    return buf


def _poll_receive(server):
    for _ in range(100):
        req = server.receive()
        if req is not None:
            return req
        time.sleep(0.01)
    raise TimeoutError("no request received")


def test_sibr_socket_roundtrip():
    server = ViewerServer(port=0, protocol="sibr", verify="/data/scene")
    try:
        client = _connect(server)
        ours = _look_at_viewmat()
        msg = {
            "resolution_x": 8, "resolution_y": 4,
            "train": True, "fov_y": 0.8, "fov_x": 1.0,
            "z_near": 0.01, "z_far": 100.0,
            "shs_python": False, "rot_scale_python": False,
            "keep_alive": True, "scaling_modifier": 1.0,
            "view_matrix": _sibr_wire_from_ours(ours).reshape(-1).tolist(),
            "view_projection_matrix": ours.T.reshape(-1).tolist(),
        }
        payload = json.dumps(msg).encode()
        client.sendall(struct.pack("<I", len(payload)) + payload)

        req = _poll_receive(server)
        assert req["width"] == 8 and req["height"] == 4
        np.testing.assert_allclose(req["viewmat"], ours, atol=1e-6)

        img = np.linspace(0, 1, 4 * 8 * 3, dtype=np.float32).reshape(4, 8, 3)
        server.send_image(img)
        raw = _recv_exact(client, 4 * 8 * 3)
        expect = (np.clip(img, 0, 1) * 255).astype(np.uint8).tobytes()
        assert raw == expect
        (vlen,) = struct.unpack("<I", _recv_exact(client, 4))
        assert _recv_exact(client, vlen) == b"/data/scene"

        # Heartbeat: zero resolution -> verify-only reply, connection stays open.
        hb = json.dumps({"resolution_x": 0, "resolution_y": 0}).encode()
        client.sendall(struct.pack("<I", len(hb)) + hb)
        req = _poll_receive(server)
        assert req["width"] == 0
        server.send_image(None)
        (vlen,) = struct.unpack("<I", _recv_exact(client, 4))
        assert _recv_exact(client, vlen) == b"/data/scene"
        client.close()
    finally:
        server.close_conn()
        server.listener.close()


def test_json_socket_roundtrip():
    server = ViewerServer(port=0, protocol="json")
    try:
        client = _connect(server)
        msg = {"viewmat": np.eye(4).tolist(), "fovx": 1.0, "fovy": 0.8,
               "width": 8, "height": 4}
        payload = json.dumps(msg).encode()
        client.sendall(struct.pack("<I", len(payload)) + payload)
        req = _poll_receive(server)
        assert req["width"] == 8

        img = np.zeros((4, 8, 3), np.float32)
        server.send_image(img)
        (n,) = struct.unpack("<I", _recv_exact(client, 4))
        assert n == 4 * 8 * 3
        assert _recv_exact(client, n) == bytes(n)
        client.close()
    finally:
        server.close_conn()
        server.listener.close()
