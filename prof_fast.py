"""Stage-by-stage FAST profiling on the real TPU (scan-marginal method).

Decomposes fast_detect into: strengths+NMS kernel alone, + binary-search
cutoff, + selection mask, + pooling, + compaction, + placement — to find
where the 286 us/frame goes. One-off diagnostic, not part of the suite.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from compv_tpu.core.config import FastConfig
    from compv_tpu.features import fast as F
    from compv_tpu.kernels.fast_kernel import fast_strengths_vmappable

    h, w = 720, 1282
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    img = jnp.asarray(np.clip(96 + 80 * ((xx // 16 + yy // 16) % 2)
                      + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8))
    cfg = FastConfig(threshold=20, max_features=2000)

    def bench(fn, base, K1=2, K2=34, trials=5):
        def make(K):
            @jax.jit
            def run(b):
                def body(c, i):
                    v = jnp.roll(b, i * 7 + 1, axis=0) + i.astype(b.dtype)
                    out = fn(v)
                    acc = c
                    for leaf in jax.tree.leaves(out):
                        acc = acc + jnp.sum(leaf.astype(jnp.float32))
                    return acc, None
                o, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(K, dtype=jnp.int32))
                return o
            return run
        r1, r2 = make(K1), make(K2)
        float(r1(base)); float(r2(base))
        b1 = b2 = 1e9
        for t in range(trials):
            t0 = time.perf_counter(); float(r1(base))
            b1 = min(b1, time.perf_counter() - t0)
            t0 = time.perf_counter(); float(r2(base))
            b2 = min(b2, time.perf_counter() - t0)
            if t < trials - 1:
                time.sleep(0.5)
        return (b2 - b1) / (K2 - K1) * 1e3

    kern = fast_strengths_vmappable(20, 9, True)
    s0 = kern(img)

    stages = {}
    stages["strengths+nms (pallas)"] = bench(kern, img)
    stages["full fast_detect"] = bench(lambda x: F.fast_detect(x, cfg), img)
    stages["full select (cutoff_select)"] = bench(
        lambda s: F._cutoff_select(s, 2000, True), s0)
    stages["select batch8 (vmap)"] = bench(
        lambda s: jax.vmap(lambda m: F._cutoff_select(m, 2000, True))(s),
        jnp.stack([jnp.roll(s0, i, axis=1) for i in range(8)]))
    stages["lax.top_k reference"] = bench(
        lambda s: jax.lax.top_k(s.reshape(-1).astype(jnp.float32), 2000), s0)

    for k, v in stages.items():
        print(f"{k:<32}{v*1e3:>9.1f} us")

if __name__ == "__main__":
    main()
