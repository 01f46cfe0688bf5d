"""Offline LPIPS weight converter — run on any NETWORKED machine with
torch + torchvision + the `lpips` pip package, then drop the npz into this repo:

    python scripts/convert_lpips_weights.py --out _lpips_vgg16.npz
    scp _lpips_vgg16.npz <here>:/root/repo/relightable3dgaussians_w_tpu/models/

This box has no egress and no torchvision (probed r2), so the LPIPS leg of the
reference's metrics protocol (lpipsPyTorch/modules/lpips.py:8-37,
metrics.py:180-189) cannot fetch weights itself; models/lpips.py implements the
exact LPIPS v0.1 computation and loads this npz. cli/metrics.py skips LPIPS
loudly until the file exists — no code changes needed once it does.

The same schema validation runs here at write time and in-repo at load time
(models.lpips.validate_weights), so a malformed npz fails loudly on either side.
"""

import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relightable3dgaussians_w_tpu.models.lpips import (  # noqa: E402
    EXPECTED_SCHEMA, validate_weights)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="_lpips_vgg16.npz")
    ap.add_argument("--print-schema", action="store_true",
                    help="print the expected npz schema and exit")
    args = ap.parse_args()

    if args.print_schema:
        for k, shape in EXPECTED_SCHEMA.items():
            print(f"{k}: float32 {shape}")
        return

    from relightable3dgaussians_w_tpu.models.lpips import convert_torch_weights

    convert_torch_weights(args.out)
    w = dict(np.load(args.out))
    validate_weights(w)
    digest = hashlib.sha256(open(args.out, "rb").read()).hexdigest()
    print(f"wrote {args.out} ({len(w)} arrays, schema ok)")
    print(f"sha256: {digest}")
    print("install: cp", args.out,
          "<repo>/relightable3dgaussians_w_tpu/models/_lpips_vgg16.npz")


if __name__ == "__main__":
    main()
