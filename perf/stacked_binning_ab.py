"""A/B: per-channel vs channel-stacked parity binning kernel (r4).

The per-channel parity loop issues ~17 small MXU dots per live CHANNEL
(~129 per live tile; the runtime channel skip saves little because live
tiles light up nearly all 8 parities — perf/preprocess_roofline.json
live_channel_tiles 91/96). The stacked variant issues 17 channel-BATCHED
dots per live tile. This measures both compiled on the TPU, and
bit-compares their outputs (they must be identical: same bf16 sub-dots,
same K order).

Usage (TPU): python perf/stacked_binning_ab.py
Writes perf/stacked_binning_ab.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/trackdlo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from trackdlo_tpu.config import CameraIntrinsics, live_params
    from trackdlo_tpu.io.sequence import SyntheticRope, render_frame
    from trackdlo_tpu.ops.preprocess import default_cell_px
    from trackdlo_tpu.ops.preprocess_kernel import cell_sums_pallas

    params = live_params()
    intr = CameraIntrinsics()
    rope = SyntheticRope()
    rgb, depth = render_frame(rope, 2 / 15.0, intr)
    occ = jnp.ones(depth.shape, bool)
    cell = params.downsample_cell_px or default_cell_px(
        params.downsample_leaf_size, intr.fx
    )
    args = (jnp.asarray(rgb), jnp.asarray(depth), occ)
    static = dict(
        fx=intr.fx, fy=intr.fy, cx=intr.cx, cy=intr.cy,
        hsv_lower=params.hsv_lower, hsv_upper=params.hsv_upper,
        multi_color_dlo=params.multi_color_dlo, cell_px=cell,
        parity_split=True, voxel_leaf=params.downsample_leaf_size,
    )

    def make(stacked):
        def f(r, d, o):
            return cell_sums_pallas(
                r, d, o, stacked_channels=stacked, **static
            )

        return f

    out = {}
    # Bit-compare compiled outputs first.
    c_old, n_old = map(np.asarray, make(False)(*args))
    c_new, n_new = map(np.asarray, make(True)(*args))
    out["bit_identical"] = bool(
        np.array_equal(c_old, c_new) and np.array_equal(n_old, n_new)
    )
    out["max_abs_dcell"] = float(np.abs(c_old - c_new).max())
    out["count_delta"] = int(np.abs(n_old - n_new).sum())

    from perf.preprocess_roofline import med3

    rgbj, depthj, occj = args

    def body_of(stacked):
        f = make(stacked)

        def build():
            def body(c):
                cells, cnt = f(rgbj, depthj + (c * 0).astype(depthj.dtype), occj)
                return jnp.sum(cnt) * 1e-12 + c * 0.5

            return body

        return build

    out["per_channel_ms"] = round(med3(body_of(False)), 4)
    out["stacked_ms"] = round(med3(body_of(True)), 4)

    print(json.dumps(out, indent=1))
    with open(
        os.path.join(os.path.dirname(__file__), "stacked_binning_ab.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
