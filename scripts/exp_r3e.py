"""r3 experiment batch E: bisect the ~70 ms train-step regression caused by the
f32 precision pins (200 vs 128.7 ms/iter at 500k/800^2). Each pin's FLOPs are
negligible — the suspicion is an XLA fusion/schedule break. Toggles each pin
group back to DEFAULT and re-times the 3-dispatch train step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build_step(variant: str):
    from relightable3dgaussians_w_tpu.utils import losses as LO
    from relightable3dgaussians_w_tpu.utils import sh as SH
    from relightable3dgaussians_w_tpu.models import light as LI
    from relightable3dgaussians_w_tpu.models import nets as NE

    HI = jax.lax.Precision.HIGHEST
    # (the SSIM blur is shifted-add f32 now — no precision knob; the "blur"
    # token is kept for log continuity but has no effect)
    SH.EVAL_SH_PRECISION = None if "evalsh" in variant else HI
    LI.SPEC_PRECISION = None if "spec" in variant else HI
    NE.DENSE_PRECISION = None if "dense" in variant else HI


def main():
    import scripts.bench_train_step as TB

    n = int(os.environ.get("TRAIN_BENCH_N", 500_000))
    res = int(os.environ.get("TRAIN_BENCH_RES", 800))
    variants = os.environ.get(
        "EXP", "unpin_all,unpin_blur,unpin_evalsh,unpin_spec_dense,pins_all"
    ).split(",")

    name_map = {
        "pins_all": "",
        "unpin_blur": "blur",
        "unpin_evalsh": "evalsh",
        "unpin_spec_dense": "spec,dense",
        "unpin_all": "blur,evalsh,spec,dense",
    }
    for v in variants:
        build_step(name_map[v])
        dt = TB.main(n, res, iters=8)
        print(f"VARIANT {v:20s} {dt:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
