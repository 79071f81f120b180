"""Device capability reporting.

The reference prints a CPU capability report at init (compv_base.cxx:
193-260: vendor, SIMD flags, cores, cache line, RAM) and exposes
kill-switches on CompVCpu. TPU equivalent: report the JAX backend,
device inventory, memory, and the kernel-dispatch switches.
"""
from __future__ import annotations

import os
from typing import Dict, List

import jax


def device_info() -> List[Dict]:
    """One dict per device: id, platform, kind, memory stats when exposed."""
    out = []
    for d in jax.devices():
        info = {"id": d.id, "platform": d.platform,
                "kind": getattr(d, "device_kind", "?"),
                "process": d.process_index}
        try:
            stats = d.memory_stats() or {}
            if "bytes_limit" in stats:
                info["hbm_gb"] = round(stats["bytes_limit"] / 2 ** 30, 2)
            if "bytes_in_use" in stats:
                info["hbm_used_gb"] = round(stats["bytes_in_use"] / 2 ** 30,
                                            3)
        except Exception:  # noqa: BLE001 — backends without memory_stats
            pass
        out.append(info)
    return out


def capability_report() -> str:
    """Human-readable bring-up report (reference CompVBase::init prints the
    analogous CPU report)."""
    from ..kernels import dispatch
    lines = [
        f"backend: {jax.default_backend()}",
        f"devices: {len(jax.devices())} "
        f"({jax.local_device_count()} local, "
        f"{jax.process_count()} process(es))",
    ]
    for info in device_info():
        extra = "".join(f" {k}={v}" for k, v in info.items()
                        if k not in ("id", "platform", "kind"))
        lines.append(f"  [{info['id']}] {info['platform']} "
                     f"{info['kind']}{extra}")
    lines.append(
        f"pallas kernels: {'ENABLED' if dispatch.pallas_enabled() else 'off'}"
        f" (COMPV_TPU_PALLAS={os.environ.get('COMPV_TPU_PALLAS', 'auto')},"
        f" interpret={dispatch.interpret_mode()})")
    from ..runtime import available as native_available
    lines.append(f"native host runtime: "
                 f"{'loaded' if native_available() else 'unavailable'}")
    return "\n".join(lines)
