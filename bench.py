"""End-to-end inference throughput benchmark.

Measures 1024x1024 DOTA-patch inference (RBBoxRCNN R50-FPN, bf16,
full post-processing: RPN + RoI heads + rotated decode + NMS) on the
available accelerator and prints ONE JSON line.

Baseline: BASELINE.json targets >=1000 patches/s on a v5e-8 (8 chips),
i.e. 125 patches/s/chip; vs_baseline is measured against the per-chip
share.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    img_size = 1024
    batch = 16
    model = _build_flagship(img_size)
    imgs = jnp.zeros((batch, img_size, img_size, 3), jnp.float32)
    shapes = jnp.tile(jnp.asarray([[img_size, img_size]], jnp.float32),
                      (batch, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)

    # thread a device-side accumulator through the calls: the N
    # dispatches chain on-device and only the final float() pays one
    # host round-trip (block_until_ready alone does not reliably
    # synchronize through remote-device tunnels, and a per-iteration
    # sync would bill the tunnel RTT to every batch)
    def _step(v, im, sh, acc):
        out = model.apply(v, im + acc * 0e-9, sh, method="predict")
        acc = acc + out["scores"].sum() + out["boxes"].sum()
        if "rboxes" in out:
            acc = acc + out["rboxes"].sum()
        return acc

    fn = jax.jit(_step)
    import jax.numpy as jnp2
    acc = jnp2.float32(0)
    acc = fn(variables, imgs, shapes, acc)      # compile + warm
    float(acc)

    n_iters = 20
    acc = jnp2.float32(0)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        acc = fn(variables, imgs, shapes, acc)  # chained on-device
    float(acc)                                  # one sync at the end
    dt = time.perf_counter() - t0

    patches_per_sec = n_iters * batch / dt
    per_chip_target = 1000.0 / 8.0
    print(json.dumps({
        "metric": "dota_1024_patch_inference_throughput",
        "value": round(patches_per_sec, 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(patches_per_sec / per_chip_target, 3),
    }))


if __name__ == "__main__":
    main()
