"""Streaming cross-correlation correctness + speed harness.

The TPU analogue of the reference's only executable check (reference:
onset_fingerprinting/c/test.py:1-48): stream sine+noise through the
streaming CC, compare every block's full CC against
``np.correlate(mode='full')``, and wall-clock both.  The TPU path batches
``--pairs`` independent sensor pairs through one jitted update — the batched
mode the C extension never had.

Run: python examples/cc_bench.py [--pairs 64] [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from onset_fingerprinting_tpu.ops.xcorr import (
    streaming_cc_init,
    streaming_cc_scan,
    streaming_cc_update,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--seconds-of-blocks", type=int, default=2000,
                    help="number of blocks to stream")
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    n, block = args.n, args.block
    n_blocks = args.seconds_of_blocks
    n_samples = block * n_blocks

    np.random.seed(0)
    t = np.linspace(0, 10, n_samples)
    a = (np.sin(2 * np.pi * t * 300) + 0.01 * np.random.rand(n_samples)
         ).astype(np.float32)
    b = (np.sin(2 * np.pi * t * 300 + 0.5) + 0.01 * np.random.rand(n_samples)
         ).astype(np.float32)

    # --- correctness vs np.correlate (single pair, every 50th block)
    state = streaming_cc_init(n)
    update = jax.jit(streaming_cc_update)
    max_err, checked = 0.0, 0
    for i in range(0, n_samples - block + 1, block):
        state, res = update(state, jnp.asarray(a[i : i + block]),
                            jnp.asarray(b[i : i + block]))
        if i >= n and (i // block) % 50 == 0:
            lo = i + block - n
            golden = np.correlate(a[lo : i + block], b[lo : i + block],
                                  "full")
            max_err = max(max_err, float(np.max(np.abs(np.asarray(res) -
                                                       golden))))
            checked += 1
    print(f"correctness: max |err| {max_err:.2e} over {checked} checked "
          f"blocks ({'OK' if max_err < 1e-3 else 'FAIL'} @ 1e-3, the "
          f"reference's bar)")

    # --- numpy dense recompute baseline (the reference harness's comparison)
    t0 = time.perf_counter()
    for i in range(n - block, n_samples - block + 1, block):
        np.correlate(a[i - (n - block) : i + block],
                     b[i - (n - block) : i + block], "full")
    t_np = time.perf_counter() - t0
    print(f"numpy dense recompute: {t_np:.3f}s for {n_blocks} blocks")

    # --- batched streaming CC on device
    p = args.pairs
    ab = np.stack([np.roll(a, k) for k in range(p)])
    bb = np.stack([np.roll(b, k) for k in range(p)])
    bstate = streaming_cc_init(n, (p,))
    bupdate = jax.jit(streaming_cc_update)
    s, r = bupdate(bstate, jnp.asarray(ab[:, :block]),
                   jnp.asarray(bb[:, :block]))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    s = bstate
    for i in range(0, n_samples - block + 1, block):
        s, r = bupdate(s, jnp.asarray(ab[:, i : i + block]),
                       jnp.asarray(bb[:, i : i + block]))
    _ = float(jnp.sum(r))
    t_dev = time.perf_counter() - t0
    print(f"device streaming CC (per-block dispatch): {t_dev:.3f}s for "
          f"{n_blocks} blocks × {p} pairs → "
          f"{n_blocks * p / t_dev:.0f} block-updates/s")

    # --- fused sweep: all blocks in ONE device program (offline mode)
    usable = (n_samples // block) * block
    blocks_a = jnp.asarray(
        ab[:, :usable].reshape(p, -1, block).swapaxes(0, 1)
    )
    blocks_b = jnp.asarray(
        bb[:, :usable].reshape(p, -1, block).swapaxes(0, 1)
    )
    s2, ccs = streaming_cc_scan(bstate, blocks_a, blocks_b)
    jax.block_until_ready(ccs)
    t0 = time.perf_counter()
    s2, ccs = streaming_cc_scan(bstate, blocks_a, blocks_b)
    _ = float(jnp.sum(ccs[-1]))
    t_scan = time.perf_counter() - t0
    print(f"device streaming CC (fused scan): {t_scan:.3f}s → "
          f"{n_blocks * p / t_scan:.0f} block-updates/s "
          f"({t_np / (t_scan / p):.1f}x numpy per pair)")
    sys.exit(0 if max_err < 1e-3 else 1)


if __name__ == "__main__":
    main()
