"""Stage-by-stage Hough SHT/KHT profiling on the real TPU (scan-marginal
method). Finds the dominant stage of the 6.5 ms hough_sht row and the
1.47 ms hough_kht row (round-4 verdict items 4-5). One-off diagnostic."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from compv_tpu.core.config import CannyConfig, HoughConfig
    from compv_tpu.features import canny as canny_mod
    from compv_tpu.features import hough_sht as sht
    from compv_tpu.features import hough_kht as kht

    h, w = 720, 1282
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    gray = jnp.asarray(np.clip(96 + 80 * ((xx // 16 + yy // 16) % 2)
                       + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8))
    edges = canny_mod.canny(gray, CannyConfig())
    print("edge px:", int(jnp.sum((edges > 0).astype(jnp.int32))))
    cfg = HoughConfig(threshold=120, max_lines=64)

    def bench(fn, base, K1=2, K2=10, trials=4, roll_axis=0):
        def make(K):
            @jax.jit
            def run(b):
                def body(c, i):
                    v = jnp.roll(b, i * 7 + 1, axis=roll_axis)
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
                time.sleep(0.4)
        return (b2 - b1) / (K2 - K1) * 1e3

    diag = float(np.hypot(h, w))
    n_rho = int(2 * np.ceil(diag / 1.0)) + 1
    n_theta = 180
    class _P(dict):
        def __setitem__(self, k, v):
            print(f"[stage] {k:<28}{v:>9.4f} ms", flush=True)
            super().__setitem__(k, v)
    stages = _P()

    # ---- SHT stages ----
    stages["sht full"] = bench(lambda e: sht.hough_lines_sht(e, cfg), edges)
    stages["sht edge_coords"] = bench(
        lambda e: sht.edge_coordinates(e, 16384), edges)
    xy, valid = sht.edge_coordinates(edges, 16384)
    thetas = np.arange(n_theta, dtype=np.float32) * (np.pi / n_theta)
    cos_np, sin_np = np.cos(thetas), np.sin(thetas)

    def vote(xyv):
        from compv_tpu.kernels.hough_vote import sht_vote_pallas
        return sht_vote_pallas(xyv, valid, jnp.asarray(cos_np),
                               jnp.asarray(sin_np), n_rho, 1.0)
    stages["sht vote kernel"] = bench(vote, xy)

    acc = vote(xy).astype(jnp.int32)

    def nms_sel(a):
        import functools
        pad = jnp.pad(a, 1)
        neigh = [jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx),
                                       (n_rho, n_theta))
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                 if (dy, dx) != (0, 0)]
        nmax = functools.reduce(jnp.maximum, neigh)
        a2 = jnp.where(a >= nmax, a, 0)
        return jnp.where(a2 >= 120, a2, 0)
    stages["sht nms"] = bench(nms_sel, acc)
    accn = nms_sel(acc)
    print("post-NMS nonzeros:", int(jnp.sum((accn > 0).astype(jnp.int32))),
          " >=255:", int(jnp.sum((accn >= 255).astype(jnp.int32))))
    stages["sht select_peaks"] = bench(
        lambda a: sht.select_peaks(a, 64), accn)

    # ---- KHT stages ----
    stages["kht full"] = bench(
        lambda e: kht.hough_lines_kht(e, cfg), edges)
    stages["kht tile_label"] = bench(
        lambda e: kht._tile_local_label(e, 16, h // 16, w // 16, 15), edges)
    stages["kht cluster_stats"] = bench(
        lambda e: kht.cluster_statistics(e, 256), edges)
    cs = kht.cluster_statistics(edges, 256)
    stages["kht merge"] = bench(
        lambda c: kht.merge_collinear_pieces(c, *cs[1:]), cs[0])

    for k, v in stages.items():
        print(f"{k:<22}{v:>9.4f} ms")


if __name__ == "__main__":
    main()
