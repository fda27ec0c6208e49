"""On-chip validation of the fused Pallas dropout kernel.

Mosaic's PRNG has no CPU lowering, so the CPU suite can only test the
dispatch gating (`tests/test_ops.py`); this script checks the kernel
itself on the TPU:

  1. keep fraction ~= 1-rate and kept values scaled by 1/(1-rate),
  2. forward/backward mask identity: grad(sum(dropout(x))) must be
     (mask != 0) * 1/(1-rate) elementwise — the custom VJP regenerates
     the mask from the seed, so any partition/seeding drift shows here,
  3. different seeds -> different masks; same seed -> identical,
  4. per-block independence: drop rate inside every grid block is ~rate
     (a constant-per-block PRNG bug would show 0/1 rates per block).

Prints one JSON line; run under the heavy lock via results/run queues.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from bsarec_tpu.utils.heavylock import acquire

    acquire("validate_pallas_dropout.py")
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "TPU backend required"}))
        return 1

    from bsarec_tpu.ops.pallas_dropout import _block_rows, pallas_dropout

    out: dict = {}
    seed = jnp.array([1234, 5678], jnp.int32)
    for rate, shape in ((0.5, (256, 50, 64)), (0.2, (256, 1, 50, 50))):
        x = jnp.ones(shape, jnp.float32)
        f = jax.jit(lambda x, s, rate=rate: pallas_dropout(rate, x, s))
        y = np.asarray(f(x, seed))
        y2 = np.asarray(f(x, seed))
        ydiff = np.asarray(f(x, seed + 1))
        kept = y[y != 0]
        keep_frac = float((y != 0).mean())
        scale_ok = bool(np.allclose(kept, 1.0 / (1.0 - rate), rtol=1e-6))
        # fwd/bwd identity through the custom VJP
        g = np.asarray(
            jax.jit(jax.grad(lambda x, s, rate=rate: pallas_dropout(rate, x, s).sum()))(x, seed)
        )
        fwd_bwd_identical = bool(np.array_equal(g != 0, y != 0)) and bool(
            np.allclose(g[g != 0], 1.0 / (1.0 - rate), rtol=1e-6)
        )
        # per-block drop rate (grid blocks of the flat [rows, 128] view)
        rows = y.size // 128
        br = _block_rows(rows)
        blocks = (y.reshape(rows // br, br * 128) != 0).mean(axis=1)
        out[f"rate={rate}"] = {
            "keep_frac": round(keep_frac, 4),
            "scale_ok": scale_ok,
            "deterministic": bool(np.array_equal(y, y2)),
            "seed_sensitivity": bool(not np.array_equal(y, ydiff)),
            "fwd_bwd_mask_identical": fwd_bwd_identical,
            "block_keep_min": round(float(blocks.min()), 4),
            "block_keep_max": round(float(blocks.max()), 4),
        }
    ok = all(
        v["scale_ok"] and v["deterministic"] and v["seed_sensitivity"]
        and v["fwd_bwd_mask_identical"]
        and abs(v["keep_frac"] - (1 - r)) < 0.01
        and abs(v["block_keep_min"] - (1 - r)) < 0.05
        and abs(v["block_keep_max"] - (1 - r)) < 0.05
        for r, v in ((0.5, out["rate=0.5"]), (0.2, out["rate=0.2"]))
    )
    out["ok"] = bool(ok)
    print(json.dumps(out))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
