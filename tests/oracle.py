"""Brute-force per-pixel splatting oracle, numpy only.

An independent re-derivation of the reference CUDA semantics
(cuda_rasterizer/forward.cu:156-374) with none of the framework's binning/compositing
machinery: global depth sort, per-pixel sequential front-to-back loop over every
Gaussian whose tile rect covers the pixel's tile. Deliberately slow and simple — the
ground truth for pipeline tests.
"""

import math

import numpy as np

ALPHA_MIN = 1.0 / 255.0


def quat_to_rot(q):
    r, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def splat_oracle(means3d, scales, quats, opacities, colors, bg, viewmat, projmat,
                 tan_fovx, tan_fovy, W, H, tile=16):
    """Returns (image [H, W, C], radii [N], T_final [H, W])."""
    N = means3d.shape[0]
    C = colors.shape[1]
    fx = W / (2 * tan_fovx)
    fy = H / (2 * tan_fovy)
    gx = (W + tile - 1) // tile
    gy = (H + tile - 1) // tile

    mean2d = np.zeros((N, 2))
    conic = np.zeros((N, 3))
    depth = np.zeros(N)
    radii = np.zeros(N, dtype=np.int64)
    rects = np.zeros((N, 4), dtype=np.int64)

    for i in range(N):
        p = means3d[i]
        p_view = viewmat[:3, :3] @ p + viewmat[:3, 3]
        if p_view[2] <= 0.2:
            continue
        p_hom = projmat @ np.append(p, 1.0)
        p_w = 1.0 / (p_hom[3] + 1e-7)
        ndc = p_hom[:3] * p_w
        pix = np.array([((ndc[0] + 1) * W - 1) * 0.5, ((ndc[1] + 1) * H - 1) * 0.5])

        R = quat_to_rot(quats[i])
        M = R * scales[i][None, :]
        cov3 = M @ M.T

        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        t = p_view.copy()
        txtz, tytz = t[0] / t[2], t[1] / t[2]
        t[0] = min(limx, max(-limx, txtz)) * t[2]
        t[1] = min(limy, max(-limy, tytz)) * t[2]
        J = np.array(
            [[fx / t[2], 0, -fx * t[0] / t[2] ** 2], [0, fy / t[2], -fy * t[1] / t[2] ** 2]]
        )
        Wm = viewmat[:3, :3]
        cov2 = J @ Wm @ cov3 @ Wm.T @ J.T
        cov2[0, 0] += 0.3
        cov2[1, 1] += 0.3
        det = cov2[0, 0] * cov2[1, 1] - cov2[0, 1] ** 2
        if det == 0:
            continue
        con = np.array([cov2[1, 1], -cov2[0, 1], cov2[0, 0]]) / det
        mid = 0.5 * (cov2[0, 0] + cov2[1, 1])
        l1 = mid + math.sqrt(max(0.1, mid * mid - det))
        l2 = mid - math.sqrt(max(0.1, mid * mid - det))
        r = math.ceil(3 * math.sqrt(max(l1, l2)))
        x0 = min(gx, max(0, int((pix[0] - r) / tile)))
        y0 = min(gy, max(0, int((pix[1] - r) / tile)))
        x1 = min(gx, max(0, int((pix[0] + r + tile - 1) / tile)))
        y1 = min(gy, max(0, int((pix[1] + r + tile - 1) / tile)))
        if (x1 - x0) * (y1 - y0) == 0:
            continue
        mean2d[i] = pix
        conic[i] = con
        depth[i] = p_view[2]
        radii[i] = r
        rects[i] = (x0, y0, x1, y1)

    order = np.argsort(depth, kind="stable")
    order = [i for i in order if radii[i] > 0]

    img = np.zeros((H, W, C))
    Tfin = np.ones((H, W))
    for py in range(H):
        for px in range(W):
            tx, ty = px // tile, py // tile
            T = 1.0
            acc = np.zeros(C)
            for i in order:
                x0, y0, x1, y1 = rects[i]
                if not (x0 <= tx < x1 and y0 <= ty < y1):
                    continue
                d = mean2d[i] - np.array([px, py])
                power = -0.5 * (conic[i][0] * d[0] ** 2 + conic[i][2] * d[1] ** 2) - conic[i][1] * d[0] * d[1]
                if power > 0:
                    continue
                alpha = min(0.99, opacities[i] * math.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                test_T = T * (1 - alpha)
                if test_T < 1e-4:
                    break
                acc += colors[i] * alpha * T
                T = test_T
            img[py, px] = acc + T * bg
            Tfin[py, px] = T
    return img, radii, Tfin
