"""Network viewer server: live rendering over a TCP socket.

TPU-native equivalent of the reference's `gaussian_renderer/network_gui.py:26-85`
(SIBR remote-viewer protocol: non-blocking accept, receive camera + settings, send
rendered bytes). The reference's binary protocol is SIBR-specific; this server speaks
a simple length-prefixed JSON protocol any client can drive:

    request:  4-byte LE length + JSON {
        "viewmat": [[...4x4...]], "fovx": f, "fovy": f,
        "width": int, "height": int, "fix_sky": bool, "embedding_index": int }
    response: 4-byte LE length + raw RGB uint8 bytes (height*width*3)

Like the reference, `try_connect`/`receive`/`send` are non-blocking so the training
loop can poll between iterations.
"""

from __future__ import annotations

import json
import socket
import struct

import numpy as np
import jax
import jax.numpy as jnp


class ViewerServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen(1)
        self.listener.settimeout(0)
        self.conn: socket.socket | None = None

    def try_connect(self) -> bool:
        if self.conn is not None:
            return True
        try:
            self.conn, _ = self.listener.accept()
            self.conn.settimeout(0)
            return True
        except (BlockingIOError, socket.timeout):
            return False

    def receive(self) -> dict | None:
        if self.conn is None:
            return None
        try:
            header = self.conn.recv(4, socket.MSG_PEEK)
            if len(header) < 4:
                return None
            (n,) = struct.unpack("<I", self.conn.recv(4))
            buf = b""
            self.conn.settimeout(1.0)
            while len(buf) < n:
                chunk = self.conn.recv(n - len(buf))
                if not chunk:
                    raise ConnectionError("client closed")
                buf += chunk
            self.conn.settimeout(0)
            return json.loads(buf)
        except (BlockingIOError, socket.timeout):
            return None
        except (ConnectionError, OSError):
            self.close_conn()
            return None

    def send_image(self, image: np.ndarray):
        """image: [H, W, 3] float in [0,1]."""
        if self.conn is None:
            return
        data = (np.clip(image, 0, 1) * 255).astype(np.uint8).tobytes()
        try:
            self.conn.sendall(struct.pack("<I", len(data)) + data)
        except (ConnectionError, OSError):
            self.close_conn()

    def close_conn(self):
        if self.conn is not None:
            try:
                self.conn.close()
            finally:
                self.conn = None


def handle_viewer_request(server: ViewerServer, trainer) -> bool:
    """Poll once: if a request is pending, render it and reply. Returns True if a
    frame was served. Call between training iterations (train.py GUI loop analog)."""
    if not server.try_connect():
        return False
    req = server.receive()
    if req is None:
        return False

    from .renderer import render as render_fn
    from .ops.rasterize import CameraMatrices, RasterizerConfig
    from .utils.graphics import projection_matrix

    W = int(req.get("width", trainer.W))
    H = int(req.get("height", trainer.H))
    viewmat = np.asarray(req["viewmat"], np.float32)
    fovx = float(req["fovx"])
    fovy = float(req["fovy"])
    proj = projection_matrix(0.01, 100.0, fovx, fovy)
    cam = CameraMatrices(
        viewmat=jnp.asarray(viewmat),
        projmat=jnp.asarray((proj @ viewmat).astype(np.float32)),
        campos=jnp.asarray(np.linalg.inv(viewmat)[:3, 3]),
        tan_fovx=jnp.float32(np.tan(fovx / 2)),
        tan_fovy=jnp.float32(np.tan(fovy / 2)),
    )
    rcfg = trainer.rcfg._replace(width=W, height=H)
    idx = int(req.get("embedding_index", 0))
    e = trainer.state.params["embeddings"][idx][None]
    envl, sky_sh = trainer.mlp.apply({"params": trainer.state.params["mlp"]}, e,
                                     deterministic=True)
    out = render_fn(
        trainer.state.params["gaussians"], trainer.state.gauss_state, envl[0], sky_sh,
        cam, rcfg, trainer.bg_color, jnp.ones((H, W)),
        envlight_sh_degree=trainer.cfg.model.envlight_sh_degree,
        sky_sh_degree=trainer.cfg.model.sky_sh_degree,
        specular=trainer.cfg.model.specular,
        fix_sky=bool(req.get("fix_sky", trainer.cfg.model.fix_sky)), debug=False,
    )
    server.send_image(np.asarray(out.render))
    return True
