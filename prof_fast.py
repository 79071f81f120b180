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

    def bench(fn, base, K1=2, K2=34, trials=5, roll_axis=0, extras=()):
        def make(K):
            @jax.jit
            def run(b, *ex):
                def body(c, i):
                    v = jnp.roll(b, i * 7 + 1, axis=roll_axis)
                    if jnp.issubdtype(b.dtype, jnp.unsignedinteger):
                        v = v + i.astype(b.dtype)
                    out = fn(v, *ex)
                    acc = c
                    for leaf in jax.tree.leaves(out):
                        acc = acc + jnp.sum(leaf.astype(jnp.float32))
                    return acc, None
                o, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(K, dtype=jnp.int32))
                return o
            return run
        def tmin(r):
            best = 1e9
            for t in range(trials):
                t0 = time.perf_counter()
                float(r(base, *extras))
                best = min(best, time.perf_counter() - t0)
                if t < trials - 1:
                    time.sleep(0.3)
            return best

        r1 = make(K1)
        float(r1(base, *extras))
        b1 = tmin(r1)
        while True:     # grow K2 until the marginal window clears 12 ms
            r2 = make(K2)
            float(r2(base, *extras))
            b2 = tmin(r2)
            if (b2 - b1) * 1e3 >= 12.0 or K2 >= 4096:
                break
            K2 *= 4
        return (b2 - b1) / (K2 - K1) * 1e3

    kern = fast_strengths_vmappable(20, 9, True)
    s0 = kern(img)
    s8 = jnp.stack([jnp.roll(s0, i, axis=1) for i in range(8)])
    img8 = jnp.stack([jnp.roll(img, i, axis=1) for i in range(8)])

    # ---- mirrors of the _cutoff_select stages (for isolation) ----
    from compv_tpu.features.fast import _SEG, _PAD_KEY, _pack_key
    from compv_tpu.ops import binsum
    k_sel = 2000
    span = 2 * _SEG
    wp = -(-w // span) * span
    hp = h + (h % 2)

    def pack_pool(strengths):
        su = jnp.pad(strengths, ((0, hp - h), (0, wp - w)))
        si = su.astype(jnp.int32)
        cols = jnp.arange(wp, dtype=jnp.int32)[None, :]
        flat_idx = jnp.arange(hp, dtype=jnp.int32)[:, None] * w + cols
        key_full = jnp.where(su > 0, _pack_key(si, flat_idx), _PAD_KEY)
        a = jnp.minimum(key_full[0::2], key_full[1::2])
        return jnp.minimum(a[:, 0::2], a[:, 1::2])

    def hist_bounds(key_p):
        sp = 255 - (key_p >> 22)
        hist = binsum.bincount(sp, 256)
        cum = jnp.cumsum(hist[::-1])[::-1]
        c = 1 + jnp.sum((cum[1:] > k_sel).astype(jnp.int32))
        bins = jnp.arange(256, dtype=jnp.int32)
        strict_n = jnp.sum(jnp.where(bins >= c, hist, 0))
        r = k_sel - strict_n
        strict_bound = (256 - c) << 22
        eq_bound = (257 - c) << 22
        return jnp.stack([strict_bound,
                          jnp.where(c > 1, eq_bound, strict_bound),
                          r]).astype(jnp.int32)

    kp0 = jax.vmap(pack_pool)(s8)

    class _P(dict):
        def __setitem__(self, k, v):
            print(f"[stage] {k:<28}{v:>9.4f} ms", flush=True)
            super().__setitem__(k, v)
    stages = _P()
    stages["strengths+nms b1"] = bench(kern, img)
    stages["strengths+nms b8 /f"] = bench(kern, img8) / 8
    stages["pack+pool b8 /f"] = bench(
        lambda s: jax.vmap(pack_pool)(s), s8) / 8
    stages["hist+bounds b8 /f"] = bench(
        lambda kp: jax.vmap(hist_bounds)(kp), kp0, roll_axis=2) / 8
    stages["select+place b8 /f"] = bench(
        lambda s: jax.vmap(lambda m: F._cutoff_select(m, k_sel, True))(s),
        s8) / 8
    stages["full detect b1"] = bench(lambda x: F.fast_detect(x, cfg), img)
    stages["full detect b8 /f"] = bench(
        lambda x: F.fast_detect_batch(x, cfg), img8, K2=18) / 8
    stages["full detect b16 /f"] = bench(
        lambda x: F.fast_detect_batch(x, cfg),
        jnp.concatenate([img8, jnp.roll(img8, 9, axis=2)]), K2=18) / 16

    for k, v in stages.items():
        print(f"{k:<32}{v*1e3:>9.1f} us")

if __name__ == "__main__":
    main()
