"""Microbenchmark: batched gather formulations on TPU.

Question (VERDICT r3 item 4): when the fused frontend step is vmapped over B
streams, do its gather sites (patch extraction, bilinear taps) hit a slow
XLA lowering because the OPERAND is batched — or is the per-element gather
transaction floor inherent, so B-linear time is physics?

Two formulations of the same work:
  vmapped: jax.vmap(lambda img, idx: take(img.ravel(), idx))   (batched operand)
  flat:    take(imgs.ravel(), idx + stream_offset)             (one global gather)

Run: python benchmarks/micro_gather_batched.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHAIN = 8


def timeit(fn, reps=7):
    fn(1)
    fn(CHAIN)
    t1, tk = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(1)
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn(CHAIN)
        tk.append(time.perf_counter() - t0)
    return (float(np.median(tk)) - float(np.median(t1))) / (CHAIN - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    H, W = 384, 512
    N = 24 * 32 * 4 * 64  # level-0 bucket-patch table: 196k elements

    rng = np.random.RandomState(0)
    print(f"{'case':>38} {'B=1':>8} {'B=8':>8}  x8")
    for kind in ("scalar take", "packed 4-tap rows"):
        rows = {}
        for B in (1, 8):
            imgs = jnp.asarray(rng.rand(B, H, W).astype(np.float32))
            idx = jnp.asarray(
                rng.randint(0, H * W - W - 1, (B, N)).astype(np.int32))

            if kind == "scalar take":
                @jax.jit
                def vmapped(imgs, idx, acc):
                    f = jax.vmap(
                        lambda im, ix: jnp.take(im.reshape(-1), ix))
                    return jnp.sum(f(imgs, idx + acc.astype(jnp.int32) * 0))

                @jax.jit
                def flat(imgs, idx, acc):
                    g = imgs.reshape(-1)
                    off = (jnp.arange(imgs.shape[0], dtype=jnp.int32)
                           * (H * W))[:, None]
                    return jnp.sum(jnp.take(
                        g, idx + off + acc.astype(jnp.int32) * 0))
            else:
                # the qpack formulation: gather ROWS of a (M, 4) tap table
                @jax.jit
                def vmapped(imgs, idx, acc):
                    def one(im, ix):
                        g = im.reshape(-1)
                        q = jnp.stack([g, jnp.roll(g, -1), jnp.roll(g, -W),
                                       jnp.roll(g, -W - 1)], -1)
                        return jnp.sum(q[ix])
                    return jnp.sum(jax.vmap(one)(
                        imgs, idx + acc.astype(jnp.int32) * 0))

                @jax.jit
                def flat(imgs, idx, acc):
                    g = imgs.reshape(-1)
                    q = jnp.stack([g, jnp.roll(g, -1), jnp.roll(g, -W),
                                   jnp.roll(g, -W - 1)], -1)
                    off = (jnp.arange(imgs.shape[0], dtype=jnp.int32)
                           * (H * W))[:, None]
                    return jnp.sum(q[idx + off + acc.astype(jnp.int32) * 0])

            def chained(prog):
                def run(k):
                    acc = jnp.float32(0.0)
                    for _ in range(k):
                        acc = prog(imgs, idx, acc) * 1e-12
                    return np.asarray(acc)
                return run

            rows[B] = (timeit(chained(vmapped), reps),
                       timeit(chained(flat), reps))
        for j, name in enumerate(("vmapped", "flat-global")):
            v1, v8 = rows[1][j], rows[8][j]
            print(f"{kind + ' / ' + name:>38} {v1:8.2f} {v8:8.2f}  "
                  f"{v8 / v1 if v1 > 0 else float('nan'):.2f}x")


if __name__ == "__main__":
    main()
