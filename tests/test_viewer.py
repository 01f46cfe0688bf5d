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


def _reference_receive_transform(msg):
    """Behavioral transliteration of the REFERENCE's network_gui.receive() matrix
    handling (network_gui.py:72-77): reshape row-major; negate view-matrix columns
    1 and 2; negate view-projection column 1. The results are the reference's
    row-vector-convention MiniCam matrices — the ground truth any decoder of this
    wire format must agree with."""
    view = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4).copy()
    view[:, 1] = -view[:, 1]
    view[:, 2] = -view[:, 2]
    proj = np.asarray(msg["view_projection_matrix"], np.float32).reshape(4, 4).copy()
    proj[:, 1] = -proj[:, 1]
    return view, proj


def _sibr_wire_from_ours(viewmat):
    """Encode OUR math-convention view matrix as SIBR sends it: transpose to the
    row-vector convention, then negate columns 1 and 2 (the inverse of the flips
    network_gui.receive applies)."""
    wire = viewmat.T.copy()
    wire[:, 1] *= -1.0
    wire[:, 2] *= -1.0
    return wire


def _sibr_wire_proj_from_ours(projmat):
    """Encode OUR math-convention view-projection matrix as SIBR sends it:
    transpose, then negate column 1 (inverse of network_gui.py:76-77's flip)."""
    wire = projmat.T.copy()
    wire[:, 1] *= -1.0
    return wire


def test_normalize_sibr_matches_reference_transform():
    """_normalize_sibr must agree with the reference receive() on ARBITRARY wire
    bytes (not just ones produced by our own encoder): our canonical matrices are
    the transposes of the reference's row-vector MiniCam matrices."""
    rng = np.random.RandomState(7)
    msg = {
        "resolution_x": 32, "resolution_y": 16,
        "train": True, "fov_y": 0.7, "fov_x": 0.9,
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": rng.randn(16).astype(np.float32).tolist(),
        "view_projection_matrix": rng.randn(16).astype(np.float32).tolist(),
    }
    ref_view, ref_proj = _reference_receive_transform(msg)
    req = _normalize_sibr(msg)
    np.testing.assert_allclose(req["viewmat"], ref_view.T, atol=1e-6)
    np.testing.assert_allclose(req["projmat"], ref_proj.T, atol=1e-6)


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
        "view_projection_matrix": _sibr_wire_proj_from_ours(proj).reshape(-1).tolist(),
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
            "view_projection_matrix": _sibr_wire_proj_from_ours(ours).reshape(-1).tolist(),
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


def test_disconnect_frees_listener():
    """A client that closes its socket must not wedge the viewer: receive() sees
    the orderly-shutdown empty read, drops the connection, and a NEW client can
    connect (regression: conn stayed set, try_connect() returned True forever)."""
    server = ViewerServer(port=0, protocol="sibr")
    try:
        client = _connect(server)
        client.close()
        for _ in range(100):
            assert server.receive() is None
            if server.conn is None:
                break
            time.sleep(0.01)
        assert server.conn is None, "closed client connection never dropped"
        client2 = _connect(server)
        assert server.conn is not None
        client2.close()
    finally:
        server.close_conn()
        server.listener.close()


def test_pause_loop_serves_until_train_resumes():
    """train=False requests pause training inside handle_viewer_request (stock
    3DGS GUI-loop semantics); a train=True request returns control."""
    import threading

    from relightable3dgaussians_w_tpu.viewer import handle_viewer_request

    server = ViewerServer(port=0, protocol="sibr", verify="v")
    try:
        client = _connect(server)

        def hb(train):
            m = json.dumps({"resolution_x": 0, "resolution_y": 0,
                            "train": train, "keep_alive": True}).encode()
            client.sendall(struct.pack("<I", len(m)) + m)

        hb(False)
        done = threading.Event()
        # Heartbeats never render, so trainer=None is safe here.
        t = threading.Thread(
            target=lambda: (handle_viewer_request(server, None), done.set()))
        t.start()
        # Paused: two verify-only replies must arrive (one per heartbeat) while
        # the handler stays in its loop.
        (n,) = struct.unpack("<I", _recv_exact(client, 4))
        _recv_exact(client, n)
        assert not done.is_set()
        hb(False)
        (n,) = struct.unpack("<I", _recv_exact(client, 4))
        _recv_exact(client, n)
        assert not done.is_set()
        hb(True)                         # resume training
        assert done.wait(5.0), "handler never returned after train=True"
        t.join()
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


def test_serve_frame_wire_bytes_match_host_conversion():
    """End-to-end _serve_frame on a tiny scene: the in-graph uint8 quantization
    (viewer._jitted_frame_fn) must produce wire bytes bitwise-identical to the
    host-side (np.clip(rgb,0,1)*255).astype(uint8) of the f32 render_rgb output
    (truncating cast, NOT round), and a repeat request at the same settings must
    hit the jit cache instead of retracing."""
    import threading

    import jax
    import jax.numpy as jnp

    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.models.nets import (
        MLPNet, init_embeddings, init_mlp)
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.renderer import render_rgb
    from relightable3dgaussians_w_tpu.train_step import TrainState
    from relightable3dgaussians_w_tpu.viewer import (
        _jitted_frame_fn, handle_viewer_request)
    import __graft_entry__ as ge

    W = H = 64
    cfg = Config()
    params_g, gstate = ge._synthetic_scene(n=200, n_sky=32, cap=512)
    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    key = jax.random.PRNGKey(0)

    class Shim:
        pass

    shim = Shim()
    shim.W, shim.H = W, H
    shim.cfg = cfg
    shim.mlp = mlp
    shim.bg_color = jnp.zeros(3, jnp.float32)
    shim.rcfg = RasterizerConfig(width=W, height=H, max_dup=1 << 12,
                                 max_tiles_per_gauss=16, lmax_per_tile=128,
                                 tile_chunk=2)
    shim.state = TrainState(
        {"gaussians": params_g, "mlp": init_mlp(key, mlp),
         "embeddings": init_embeddings(jax.random.fold_in(key, 1), 2)},
        gstate, None, jnp.asarray(0))

    cam = ge._camera(W, H)
    req = {"viewmat": np.asarray(cam.viewmat).tolist(),
           "fovx": 2 * float(np.arctan(float(cam.tan_fovx))),
           "fovy": 2 * float(np.arctan(float(cam.tan_fovy))),
           "width": W, "height": H, "train": True, "fix_sky": False,
           "embedding_index": 0}

    server = ViewerServer(port=0, protocol="json")
    try:
        client = _connect(server)
        payload = json.dumps(req).encode()
        frames = []
        _jitted_frame_fn.cache_clear()
        for _ in range(2):
            client.sendall(struct.pack("<I", len(payload)) + payload)
            t = threading.Thread(
                target=lambda: handle_viewer_request(server, shim))
            t.start()
            (n,) = struct.unpack("<I", _recv_exact(client, 4))
            frames.append(_recv_exact(client, n))
            t.join(30)
        client.close()
    finally:
        server.close_conn()
        server.listener.close()

    info = _jitted_frame_fn.cache_info()
    assert info.misses == 1 and info.hits >= 1, info

    # Host-side reference conversion of the f32 serving render.
    e = shim.state.params["embeddings"][0][None]
    envl, sky_sh = mlp.apply({"params": shim.state.params["mlp"]}, e,
                             deterministic=True)
    rcfg_srv = shim.rcfg._replace(
        scale_modifier=1.0, skip_alpha=cfg.runtime.serve_skip_alpha,
        row_intervals=False)
    rgb, _ = render_rgb(params_g, gstate, envl[0], sky_sh, cam, rcfg_srv,
                        shim.bg_color,
                        envlight_sh_degree=cfg.model.envlight_sh_degree,
                        sky_sh_degree=cfg.model.sky_sh_degree,
                        specular=cfg.model.specular, fix_sky=False)
    expect = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8).tobytes()
    assert frames[0] == expect
    assert frames[1] == expect
