"""Network viewer server: live rendering over a TCP socket.

TPU-native equivalent of the reference's `gaussian_renderer/network_gui.py:26-85`
(SIBR remote-viewer protocol: non-blocking accept, receive camera + settings, send
rendered bytes). Two wire protocols are supported:

* ``protocol="sibr"`` — the reference's exact binary layout, so the stock SIBR
  remote viewer connects unmodified: request = 4-byte LE length + JSON with
  ``resolution_x/y, train, fov_y, fov_x, z_near, z_far, shs_python,
  rot_scale_python, keep_alive, scaling_modifier, view_matrix,
  view_projection_matrix`` (both matrices 16 floats, row-major, SIBR's row-vector
  convention with columns 1 and 2 sign-flipped — network_gui.py:60-75); response =
  raw RGB uint8 bytes (height*width*3, no length prefix) followed by a 4-byte LE
  length + ASCII "verify" string (the dataset source path — train.py sends
  ``network_gui.send(net_image_bytes, dataset.source_path)``).
* ``protocol="json"`` — a simple symmetric length-prefixed JSON protocol any
  client can drive:

    request:  4-byte LE length + JSON {
        "viewmat": [[...4x4...]], "fovx": f, "fovy": f,
        "width": int, "height": int, "fix_sky": bool, "embedding_index": int }
    response: 4-byte LE length + raw RGB uint8 bytes (height*width*3)

Like the reference, `try_connect`/`receive`/`send` are non-blocking so the training
loop can poll between iterations.
"""

from __future__ import annotations

import functools
import json
import socket
import struct

import numpy as np
import jax
import jax.numpy as jnp


def _to_u8(image: np.ndarray) -> np.ndarray:
    if image.dtype == np.uint8:
        return image
    return (np.clip(image, 0, 1) * 255).astype(np.uint8)


def _normalize_sibr(msg: dict) -> dict:
    """Reference SIBR message -> the canonical request dict.

    Mirrors network_gui.receive() exactly (network_gui.py:72-77): reshape
    row-major, negate view-matrix columns 1 and 2, negate view-PROJECTION
    column 1. SIBR matrices are in the reference's row-vector convention
    (p_row @ M), i.e. the TRANSPOSE of this framework's math convention
    (M @ [p, 1]) — transpose both here.
    """
    w = int(msg.get("resolution_x", 0))
    h = int(msg.get("resolution_y", 0))
    if w == 0 or h == 0:
        return {"width": 0, "height": 0, "keep_alive": bool(msg.get("keep_alive", True)),
                "train": bool(msg.get("train", True))}
    view = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
    view[:, 1] *= -1.0
    view[:, 2] *= -1.0
    proj = np.asarray(msg["view_projection_matrix"], np.float32).reshape(4, 4)
    proj[:, 1] *= -1.0
    return {
        "width": w,
        "height": h,
        "fovx": float(msg["fov_x"]),
        "fovy": float(msg["fov_y"]),
        "znear": float(msg.get("z_near", 0.01)),
        "zfar": float(msg.get("z_far", 100.0)),
        "viewmat": view.T,               # math convention
        "projmat": proj.T,               # full view-projection, math convention
        "scaling_modifier": float(msg.get("scaling_modifier", 1.0)),
        "train": bool(msg.get("train", True)),
        "keep_alive": bool(msg.get("keep_alive", True)),
    }


class ViewerServer:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009,
                 protocol: str = "json", verify: str = ""):
        assert protocol in ("json", "sibr")
        self.protocol = protocol
        self.verify = verify             # SIBR handshake string (source path)
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.port = self.listener.getsockname()[1]   # resolves port=0
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
            if len(header) == 0:
                # recv() == b'' on a non-blocking socket means orderly shutdown:
                # drop the connection so the listener can accept a new client
                # (otherwise try_connect() returns True forever and the viewer
                # is wedged for the rest of training).
                self.close_conn()
                return None
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
            msg = json.loads(buf)
            return _normalize_sibr(msg) if self.protocol == "sibr" else msg
        except (BlockingIOError, socket.timeout):
            return None
        except (ConnectionError, OSError):
            self.close_conn()
            return None

    def send_image(self, image: np.ndarray | None):
        """image: [H, W, 3] float in [0,1] — or uint8, passed through as-is (the
        serving path quantizes ON DEVICE so only 3 bytes/px cross the host
        transfer; an f32 pull is 4x the bytes for the same wire payload)."""
        if self.conn is None:
            return
        try:
            if self.protocol == "sibr":
                # Reference network_gui.send(): raw image bytes (if any), then the
                # length-prefixed verify string.
                if image is not None:
                    self.conn.sendall(_to_u8(image).tobytes())
                v = self.verify.encode("ascii")
                self.conn.sendall(struct.pack("<I", len(v)) + v)
            else:
                if image is None:
                    return
                data = _to_u8(image).tobytes()
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
    """Serve pending viewer requests between training iterations. Returns True if
    at least one frame was served.

    Mirrors the stock 3DGS in-loop GUI block semantics (network_gui receive/send +
    the `do_training` flag): while the client sends requests with train=False,
    training PAUSES here and frames keep being served; a train=True request (or no
    pending request while unpaused) returns control to the training loop.
    """
    import time as _time

    if not server.try_connect():
        return False
    served = False
    paused = False
    while server.conn is not None:
        req = server.receive()
        if req is None:
            if paused:
                _time.sleep(0.005)       # client paused training: keep serving
                continue
            break
        paused = not req.get("train", True)
        if req.get("width", 0) == 0 or req.get("height", 0) == 0:
            server.send_image(None)      # heartbeat: keep-alive reply, no frame
            continue
        _serve_frame(server, trainer, req)
        served = True
        if not paused:
            break
    return served


def _serve_frame(server: ViewerServer, trainer, req: dict):
    from .ops.rasterize import CameraMatrices
    from .utils.graphics import projection_matrix

    W = int(req.get("width", trainer.W))
    H = int(req.get("height", trainer.H))
    viewmat = np.asarray(req["viewmat"], np.float32)
    fovx = float(req["fovx"])
    fovy = float(req["fovy"])
    if "projmat" in req:
        proj_full = np.asarray(req["projmat"], np.float32)
    else:
        proj_full = projection_matrix(
            float(req.get("znear", 0.01)), float(req.get("zfar", 100.0)),
            fovx, fovy) @ viewmat
    cam = CameraMatrices(
        viewmat=jnp.asarray(viewmat),
        projmat=jnp.asarray(proj_full.astype(np.float32)),
        campos=jnp.asarray(np.linalg.inv(viewmat)[:3, 3]),
        tan_fovx=jnp.float32(np.tan(fovx / 2)),
        tan_fovy=jnp.float32(np.tan(fovy / 2)),
    )
    rcfg = trainer.rcfg._replace(
        width=W, height=H,
        scale_modifier=float(req.get("scaling_modifier", 1.0)),
        # Serving LOD: drop entries whose peak in-tile alpha is below the
        # threshold (default 1/255 = exact; runtime.serve_skip_alpha trades
        # bounded image deviation for frame rate — see RasterizerConfig).
        skip_alpha=trainer.cfg.runtime.serve_skip_alpha,
        packed_rgb=trainer.cfg.runtime.serve_packed_rgb,
        # Viewer frames never train: intervals pay only in fwd+bwd (exp_r5a
        # measured them a net cost on forward-only).
        row_intervals=False)
    idx = int(req.get("embedding_index", 0))
    e = trainer.state.params["embeddings"][idx][None]
    envl, sky_sh = trainer.mlp.apply({"params": trainer.state.params["mlp"]}, e,
                                     deterministic=True)
    # 3-channel serving path: the 13-AOV fused render is a training construct;
    # a viewer frame composites rgb only (renderer.render_rgb), through a
    # per-(rcfg, flags) jit cache — eager per-op dispatch would otherwise
    # dominate the frame time (~1000-op graph).
    fn = _jitted_frame_fn(
        rcfg, trainer.cfg.model.envlight_sh_degree,
        trainer.cfg.model.sky_sh_degree, trainer.cfg.model.specular,
        bool(req.get("fix_sky", trainer.cfg.model.fix_sky)))
    rgb_u8 = fn(trainer.state.params["gaussians"],
                trainer.state.gauss_state, envl[0], sky_sh, cam,
                trainer.bg_color)
    server.send_image(np.asarray(rgb_u8))


@functools.lru_cache(maxsize=16)
def _jitted_frame_fn(rcfg, envl_deg: int, sky_deg: int, specular: bool,
                     fix_sky: bool):
    """Compiled viewer-frame closure, cached on the static render settings.

    Repeat requests at the same resolution/LOD hit the jit cache and run at the
    rasterizer's forward-only rate; a resolution change or pool growth retraces
    once. (RasterizerConfig is a NamedTuple of hashables, so it is a valid
    lru_cache key.) The frame is quantized to uint8 IN-GRAPH: the wire format is
    3 bytes/px anyway, and pulling f32 would move 4x the bytes off-device.
    """
    from .renderer import render_rgb

    def f(gparams, gstate, envl, sky_sh, cam, bg):
        rgb, _alpha = render_rgb(gparams, gstate, envl, sky_sh, cam, rcfg, bg,
                                 envlight_sh_degree=envl_deg,
                                 sky_sh_degree=sky_deg,
                                 specular=specular, fix_sky=fix_sky)
        # Truncating cast, NOT round: bitwise-identical to the host-side
        # (np.clip(x,0,1)*255).astype(uint8) the wire protocol promises.
        return (jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    return jax.jit(f)
