"""A/B the DPT head with gather-based jax.image.resize vs MXU matmul resize,
plus isolated resize timings. Iteration tool."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    rng = jax.random.PRNGKey(0)

    def fence(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def timeit(fn, x, iters=10):
        out = fn(x)
        fence(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(out)
        fence(out)
        return (time.time() - t0 - 0.030) / iters

    from vitslam_tpu.ops.resize import resize_bilinear_nhwc

    # isolated resize at the DPT sites (B*S=5, C=256ish)
    for (h, w, oh, ow, c) in [(37, 37, 74, 74, 256), (37, 37, 148, 148, 256),
                              (259, 259, 518, 518, 128), (296, 296, 518, 518, 128)]:
        x = jax.random.normal(rng, (5, h, w, c), jnp.bfloat16)

        def f_mat(x):
            y = resize_bilinear_nhwc(x, oh, ow)
            return x + 0 * jnp.mean(y)

        def f_img(x):
            y = jax.image.resize(x, (5, oh, ow, c), method="bilinear")
            return x + 0 * jnp.mean(y)

        tm = timeit(jax.jit(f_mat), x)
        ti = timeit(jax.jit(f_img), x)
        print(f"resize {h}->{oh} c={c}: matmul {tm*1e3:7.2f} ms  image {ti*1e3:7.2f} ms")

    # full DPT head A/B via the module-level _resize switch
    import vitslam_tpu.models.dpt_head as dh
    from vitslam_tpu.models.dpt_head import DPTHead

    head = DPTHead(dim_in=2048, output_dim=4)
    B, S, H, W = 1, 5, 518, 518
    toks = [jax.random.normal(rng, (B, S, 5 + 37 * 37, 2048), jnp.bfloat16)
            for _ in range(4)]
    imgs = jnp.zeros((B, S, 3, H, W), jnp.bfloat16)
    params = jax.jit(head.init, static_argnums=(3,))(rng, toks, imgs, 5)

    def run(label):
        # params passed as an ARGUMENT: closure-captured params become HLO
        # constants, which the tunneled backend re-ships per dispatch.
        def g(p, tl, im):
            out, _ = head.apply(p, tl, im, 5)
            return [tl[0] + 0 * out.mean()] + list(tl[1:])
        gj = jax.jit(g, static_argnums=())
        tl = list(toks)
        tl = gj(params, tl, imgs)
        fence(tl[0])
        t0 = time.time()
        for _ in range(10):
            tl = gj(params, tl, imgs)
        fence(tl[0])
        dt = (time.time() - t0 - 0.030) / 10
        print(f"dpt_head [{label}]: {dt*1e3:9.2f} ms")

    run("matmul")
    orig = dh._resize
    dh._resize = lambda x, h, w: jax.image.resize(
        x, (x.shape[0], h, w, x.shape[3]), method="bilinear")
    try:
        run("image")
    finally:
        dh._resize = orig


if __name__ == "__main__":
    main()
