"""Startup environment checks (reference src/syscheck.rs re-derived for TPU).

Reports: jax backend + device inventory, HBM capacity per chip, host RAM,
CPU count, native-quantizer availability, and a model-fit check against
the budget model. The serving entry calls `run_startup_checks` before
loading (reference syscheck.rs:17 run_startup_checks / model.py:145
RAM-budget refusal)."""

from __future__ import annotations

import os
from typing import Dict, Optional


def _host_mem_gb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) / (1 << 20)
    except OSError:
        pass
    return 0.0


def host_report() -> Dict:
    """Host-side hardware summary (launcher hardware-detect screen)."""
    return {
        "cpus": os.cpu_count() or 0,
        "ram_gb": round(_host_mem_gb(), 1),
    }


def device_report() -> Dict:
    import jax

    devs = jax.devices()
    per_dev = []
    for d in devs:
        stats = {}
        try:
            ms = d.memory_stats() or {}
            stats = {
                "hbm_limit_gb": round(ms.get("bytes_limit", 0) / (1 << 30), 2),
                "hbm_in_use_gb": round(ms.get("bytes_in_use", 0) / (1 << 30), 2),
            }
        except Exception:
            pass
        per_dev.append({"id": d.id, "kind": getattr(d, "device_kind", "?"),
                        "platform": d.platform, **stats})
    return {
        "backend": jax.default_backend(),
        "n_devices": len(devs),
        "devices": per_dev,
        "host_ram_gb": round(_host_mem_gb(), 1),
        "cpus": os.cpu_count(),
    }


def run_startup_checks(cfg=None, quant=None, verbose: bool = True,
                       offload: bool = False) -> Dict:
    """Environment + (optional) model-fit check. Returns the report;
    raises RuntimeError if the model cannot fit (refuse-to-start,
    reference model.py:145). With `offload`, the fit check splits into
    HBM-without-experts vs device memory AND experts vs host RAM."""
    rep = device_report()
    try:
        from . import native

        rep["native_quantizer"] = native.available()
    except Exception:
        rep["native_quantizer"] = False

    if cfg is not None and quant is not None:
        from .budget import compute_budget

        b = compute_budget(cfg, quant)
        n = rep["n_devices"]
        hbm = 0
        for d in rep["devices"]:
            hbm = max(hbm, int(d.get("hbm_limit_gb", 0) * (1 << 30)))
        if hbm == 0:
            hbm = 16 << 30  # assume v5e
        rep["model_weight_gb"] = round(b.total_weight_bytes / (1 << 30), 2)
        if offload:
            from .models.params import pattern_info

            dev, host = b.offload_split(max(pattern_info(cfg).period, 1))
            rep["per_chip_gb"] = round(dev / (1 << 30), 2)
            rep["host_expert_gb"] = round(host / (1 << 30), 2)
            host_gb = _host_mem_gb()
            if dev > hbm * 0.92:
                raise RuntimeError(
                    f"offload mode still needs {dev / (1 << 30):.1f} GiB "
                    f"HBM (non-expert weights + stream buffers) but HBM "
                    f"is {hbm / (1 << 30):.1f} GiB — refusing to start"
                )
            if host / (1 << 30) > host_gb * 0.92:
                raise RuntimeError(
                    f"host experts need {host / (1 << 30):.1f} GiB RAM but "
                    f"host has {host_gb:.1f} GiB — refusing to start"
                )
            return _finish_report(rep, verbose)
        per_chip = b.per_chip(n)
        rep["per_chip_gb"] = round(per_chip / (1 << 30), 2)
        rep["max_context"] = b.max_context_tokens(n, hbm)
        if per_chip > hbm * 0.92:
            raise RuntimeError(
                f"model needs {per_chip / (1 << 30):.1f} GiB/chip but HBM is "
                f"{hbm / (1 << 30):.1f} GiB — refusing to start "
                f"(shard over more chips, lower expert_bits, or use "
                f"--offload experts)"
            )
    return _finish_report(rep, verbose)


def _finish_report(rep: Dict, verbose: bool) -> Dict:
    if verbose:
        import json

        print("[syscheck]", json.dumps(rep, indent=2))
    return rep


# ---------------------------------------------------------------------------
# RAM watchdog (reference python/krasis/model.py:1536 — a background thread
# that aborts the process cleanly before the kernel OOM-killer does it
# rudely; on this side it mainly guards the host-side weight-loading /
# quantization path, the only phase with large host allocations)
# ---------------------------------------------------------------------------

def mem_available_gb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) / (1 << 20)
    except OSError:
        pass
    return float("inf")


def start_ram_watchdog(
    min_free_gb: float = 2.0,
    interval_s: float = 5.0,
    on_low=None,
):
    """Background thread that fires `on_low(avail_gb)` (default: log +
    SIGTERM self) when host MemAvailable drops below `min_free_gb`.
    Returns a `stop()` callable."""
    import logging
    import signal
    import threading

    log = logging.getLogger("krasis_tpu.watchdog")
    stop_evt = threading.Event()

    def _default_on_low(avail):
        log.critical(
            "host RAM critically low: %.2f GiB available < %.2f GiB floor "
            "— terminating before the kernel OOM-killer does (reference "
            "model.py:1536 behavior)", avail, min_free_gb,
        )
        os.kill(os.getpid(), signal.SIGTERM)

    handler = on_low or _default_on_low

    def _run():
        while not stop_evt.wait(interval_s):
            avail = mem_available_gb()
            if avail < min_free_gb:
                handler(avail)
                return

    t = threading.Thread(target=_run, name="ram-watchdog", daemon=True)
    t.start()

    def stop():
        stop_evt.set()

    return stop
