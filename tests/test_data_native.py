"""Data-layer tests: COLMAP binary parsers (python + native twin), PLY round trip,
native knn vs exact."""

import struct

import numpy as np
import pytest

from relightable3dgaussians_w_tpu.data import colmap
from relightable3dgaussians_w_tpu.data.ply import read_ply, write_ply


def write_synthetic_points3d(path, n=50, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.normal(size=(n, 3))
    rgb = rng.randint(0, 256, (n, 3)).astype(np.uint8)
    err = rng.uniform(size=n)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *xyz[i]))
            f.write(struct.pack("<BBB", *rgb[i]))
            f.write(struct.pack("<d", err[i]))
            track = rng.randint(0, 5)
            f.write(struct.pack("<Q", track))
            f.write(b"\x00" * (track * 8))
    return xyz, rgb, err


def test_points3d_binary_python_and_native(tmp_path):
    p = str(tmp_path / "points3D.bin")
    xyz, rgb, err = write_synthetic_points3d(p)

    # Python parser (bypass native).
    import relightable3dgaussians_w_tpu.native as native_mod

    got = colmap.read_points3d_binary(p)
    np.testing.assert_allclose(got[0], xyz)
    np.testing.assert_array_equal(got[1], rgb)
    np.testing.assert_allclose(got[2], err)

    nat = native_mod.read_points3d_binary_native(p)
    if nat is not None:
        np.testing.assert_allclose(nat[0], xyz)
        np.testing.assert_array_equal(nat[1], rgb)
        np.testing.assert_allclose(nat[2], err)


def test_cameras_images_binary(tmp_path):
    cam_p = str(tmp_path / "cameras.bin")
    with open(cam_p, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))  # PINHOLE
        f.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
    cams = colmap.read_cameras_binary(cam_p)
    assert cams[1].model == "PINHOLE"
    assert cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])

    img_p = str(tmp_path / "images.bin")
    q = np.array([0.9, 0.1, 0.2, 0.38])
    q = q / np.linalg.norm(q)
    with open(img_p, "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<dddd", *q))
        f.write(struct.pack("<ddd", 1.0, 2.0, 3.0))
        f.write(struct.pack("<i", 1))
        f.write(b"img_001.jpg\x00")
        f.write(struct.pack("<Q", 2))
        f.write(b"\x00" * 48)
    imgs = colmap.read_images_binary(img_p)
    assert imgs[7].name == "img_001.jpg"
    assert imgs[7].camera_id == 1
    np.testing.assert_allclose(imgs[7].tvec, [1, 2, 3])
    R = colmap.qvec2rotmat(imgs[7].qvec)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-7)


def test_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    fields = {k: rng.normal(size=20).astype(np.float32) for k in ("x", "y", "z", "opacity")}
    p = str(tmp_path / "t.ply")
    write_ply(p, fields)
    back = read_ply(p)
    for k in fields:
        np.testing.assert_allclose(back[k], fields[k])


def test_native_knn_exact():
    from relightable3dgaussians_w_tpu.native import knn_mean_dist2_native

    rng = np.random.RandomState(1)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    out = knn_mean_dist2_native(pts)
    if out is None:
        pytest.skip("native library not built")
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    ref = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)
