"""Stage-by-stage CCL extraction profiling on the real TPU (scan-marginal
method, bench_all methodology). Decomposes extract_boxes/extract_components
into: label, run-table (compact kernel + sort), sort alone, segmented
scans, top-K, full extractions — the round-4 verdict's ccl_extract loss
worklist. One-off diagnostic, not part of the suite."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from compv_tpu.features import ccl
    from bench_all import text_image

    text = jnp.asarray(text_image())
    h, w = text.shape

    def bench(fn, base, K1=2, K2=18, trials=4, roll_axis=0):
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

    labels = ccl.label(text)
    bt = ccl.extract_boxes(labels, 32768)
    n_runs, n_comp = int(bt.run_count), int(bt.total_components)
    MR = min(-(-int(n_runs * 1.25) // 32768) * 32768, 262144)
    print(f"workload: {n_runs} runs, {n_comp} components, max_runs={MR}")

    class _P(dict):
        def __setitem__(self, k, v):
            print(f"[stage] {k:<28}{v:>9.4f} ms", flush=True)
            super().__setitem__(k, v)
    stages = _P()
    stages["label"] = bench(lambda x: ccl.label(x), text)
    stages["run_table(kern+sort)"] = bench(
        lambda l: ccl._sorted_run_table(l, MR)[:3], labels)

    # the sort alone, at the size run_table_compact feeds it
    from compv_tpu.kernels import run_compact as rc
    n = h * w
    wp = -(-(w + 1) // 128) * 128
    r_total = h * wp // 128
    n_chunks = -(-r_total // rc._CR)
    cap_rows = (-(-MR // 1024) + n_chunks) * 8
    rng = np.random.default_rng(0)
    root_f = jnp.asarray(
        rng.integers(0, n, cap_rows * 128, np.int64).astype(np.int32))
    pack_f = jnp.asarray(
        rng.integers(0, 2 ** 31, cap_rows * 128, np.int64).astype(np.int32))
    print(f"sort size = {cap_rows * 128}")
    stages["sort_only(2op)"] = bench(
        lambda r: jax.lax.sort((r, pack_f + r[0]), num_keys=1), root_f)

    g_root, g_s, g_e, _ = ccl._sorted_run_table(labels, MR)
    g_root = np.asarray(g_root)

    def seg5(gr):
        new = jnp.concatenate([jnp.ones((1,), bool), gr[1:] != gr[:-1]])
        z = gr.astype(jnp.float32)
        return ccl._seg_scan_multi(sums=(z,), mins=(z, z), maxs=(z, z),
                                   new=new)

    def seg10(gr):
        new = jnp.concatenate([jnp.ones((1,), bool), gr[1:] != gr[:-1]])
        z = gr.astype(jnp.float32)
        return ccl._seg_scan_multi(sums=(z,) * 6, mins=(z, z),
                                   maxs=(z, z), new=new)

    stages["seg_scan 5stat"] = bench(seg5, jnp.asarray(g_root))
    stages["seg_scan 10stat"] = bench(seg10, jnp.asarray(g_root))

    from compv_tpu.features.fast import cutoff_topk_flat
    ends = jnp.asarray((rng.random(MR) < 0.1).astype(np.uint8))
    stages["ends_firstK"] = bench(
        lambda e: cutoff_topk_flat(e, 32768), ends)

    stages["extract_boxes"] = bench(
        lambda l: ccl.extract_boxes(l, 32768, MR), labels)
    stages["extract_components"] = bench(
        lambda l: ccl.extract_components(l, 256, MR), labels)

    for k, v in stages.items():
        print(f"{k:<24}{v:>9.4f} ms")


if __name__ == "__main__":
    main()
