"""Interactive launcher: model scan → config → budget preview → serve.

Parity with the reference's TUI launcher (reference python/krasis/launcher.py:
scan_models over a models dir, hardware detect, config editor with live
budget columns, saved config at ~/.krasis_tpu/config, non-interactive
mode, spawns the server). Plain stdin prompts instead of a curses UI —
same workflow, fewer moving parts.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from typing import Dict, List, Optional

CONFIG_PATH = os.path.join(
    os.environ.get("KRASIS_TPU_HOME", os.path.expanduser("~/.krasis_tpu")),
    "config",
)


def scan_models(roots: List[str]) -> List[str]:
    """Find checkpoint dirs (config.json + safetensors) AND standalone
    .gguf files under roots (reference launcher.py scan_models + its GGUF
    scan: both source formats are launchable, `--model x.gguf` routes
    through utils/gguf_source)."""
    found = []
    for root in roots:
        if not os.path.isdir(root):
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            if "config.json" in filenames and any(
                f.endswith(".safetensors") for f in filenames
            ):
                found.append(dirpath)
                dirnames.clear()  # don't descend into checkpoints
                continue
            for f in filenames:
                if f.endswith(".gguf"):
                    found.append(os.path.join(dirpath, f))
    return sorted(found)


def detect_hardware() -> Dict:
    """Hardware-detect screen (reference launcher.py hardware detect):
    accelerator backend/chips/HBM via syscheck, plus host RAM/cores/disk."""
    import shutil

    from .syscheck import device_report, host_report

    rep = {"accelerator": None, "host": None}
    try:
        rep["accelerator"] = device_report()
    except Exception as e:
        rep["accelerator"] = {"error": str(e)}
    try:
        rep["host"] = host_report()
    except Exception:
        rep["host"] = {}
    try:
        du = shutil.disk_usage(os.path.expanduser("~"))
        rep["disk_free_gb"] = round(du.free / (1 << 30), 1)
    except OSError:
        pass
    return rep


def print_hardware(rep: Dict):
    acc = rep.get("accelerator") or {}
    if "error" in acc:
        print(f"accelerator: unavailable ({acc['error']})")
    else:
        print(f"accelerator: {acc.get('backend')} x{acc.get('n_devices')}")
        for d in acc.get("devices", []):
            hbm = d.get("hbm_limit_gb")
            hbm_s = f", {hbm} GB HBM" if hbm else ""
            print(f"  [{d['id']}] {d.get('kind')}{hbm_s}")
    host = rep.get("host") or {}
    if host:
        print(f"host: {host.get('cpus', '?')} cpus, "
              f"{host.get('ram_gb', '?')} GB RAM"
              + (f", {rep['disk_free_gb']} GB disk free"
                 if "disk_free_gb" in rep else ""))


def load_saved_config() -> Dict[str, str]:
    cfg: Dict[str, str] = {}
    if os.path.exists(CONFIG_PATH):
        with open(CONFIG_PATH) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#") and "=" in line:
                    k, v = line.split("=", 1)
                    cfg[k.strip()] = v.strip()
    return cfg


def save_config(cfg: Dict[str, str]):
    os.makedirs(os.path.dirname(CONFIG_PATH), exist_ok=True)
    with open(CONFIG_PATH, "w") as f:
        for k, v in cfg.items():
            f.write(f"{k}={v}\n")


def _ask(prompt: str, default: str) -> str:
    resp = input(f"{prompt} [{default}]: ").strip()
    return resp or default


def show_budget(model_path: str, expert_bits: int, kv_dtype: str = "auto"):
    from .budget import format_budget
    from .config import ModelConfig, QuantConfig
    from .syscheck import device_report

    rep = device_report()
    n = rep["n_devices"]
    hbm = max(
        (int(d.get("hbm_limit_gb", 0) * (1 << 30)) for d in rep["devices"]),
        default=16 << 30,
    ) or (16 << 30)
    cfg = ModelConfig.from_model_path(model_path)
    print(format_budget(
        cfg, QuantConfig(expert_bits=expert_bits, kv_cache_dtype=kv_dtype),
        n, hbm))


# Editable settings: (key, prompt, default, server flag)
SETTINGS = [
    ("expert_bits", "expert bits (4/8)", "4", "--expert-bits"),
    ("kv_dtype", "kv cache dtype (auto/fp8/bf16)", "auto", "--kv-dtype"),
    ("attention_quant", "attention quant (bf16/int8/int4)", "bf16",
     "--attention-quant"),
    ("expert_activation", "expert activations (bf16/int8=W4A8)", "bf16",
     "--expert-activation"),
    ("offload", "expert offload (none/experts=host RAM)", "none",
     "--offload"),
    ("hot_experts", "offload: hot experts pinned in HBM", "0",
     "--hot-experts"),
    ("max_len", "max context length", "4096", "--max-len"),
    ("slots", "batching slots (0 = single)", "0", "--slots"),
    ("decode_block", "decode block (tokens/device call)", "8",
     "--decode-block"),
    ("server_backend", "server transport (auto/native/python)", "auto",
     "--server-backend"),
    ("port", "port", "8399", "--port"),
]


def edit_loop(model: str, cfg: Dict[str, str]):
    """Live config editor (reference launcher.py config columns): show all
    settings + the budget preview, re-render after every edit, until the
    user launches (l), saves-and-quits (q), or aborts (a)."""
    while True:
        print(f"\nmodel: {model}")
        for i, (key, prompt, default, _) in enumerate(SETTINGS):
            print(f"  [{i}] {prompt:<32} = {cfg.get(key, default)}")
        try:
            show_budget(model, int(cfg.get("expert_bits", "4")),
                        cfg.get("kv_dtype", "auto"))
        except Exception as e:
            print(f"(budget preview unavailable: {e})")
        sel = input("edit # / (l)aunch / (q)uit-save / (a)bort: ").strip()
        if sel == "l":
            return cfg, True
        if sel == "q":
            return cfg, False
        if sel == "a":
            raise KeyboardInterrupt
        if sel.isdigit() and int(sel) < len(SETTINGS):
            key, prompt, default, _ = SETTINGS[int(sel)]
            cfg[key] = _ask(prompt, cfg.get(key, default))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models-dir", action="append", default=[])
    ap.add_argument("--non-interactive", action="store_true")
    ap.add_argument("--plain", action="store_true",
                    help="stdin prompts instead of the curses TUI")
    ap.add_argument("--port", type=int, default=8399)
    args = ap.parse_args()

    saved = load_saved_config()
    roots = args.models_dir or [
        saved.get("models_dir", os.path.expanduser("~/models")),
        "/models", "/data/models",
    ]

    if args.non_interactive:
        model = saved.get("model")
        if not model:
            print("no saved config; run interactively first")
            return 1
        cfg = dict(saved)
    elif not args.plain and sys.stdin.isatty() and sys.stdout.isatty():
        # 4-screen curses TUI (launcher_tui.py); falls back to the plain
        # prompts below on any terminal trouble
        try:
            from .launcher_tui import run_tui

            model, values, action = run_tui(scan_models(roots), saved)
        except Exception as e:  # noqa: BLE001 — degraded terminal
            print(f"(curses TUI unavailable: {e}; using plain prompts)")
            return main_plain(roots, saved)
        if action is None:
            print("aborted")
            return 1
        cfg = dict(saved)
        cfg.update(values)
        cfg["model"] = model
        save_config(cfg)
        if action != "launch":
            print(f"saved config to {CONFIG_PATH}")
            return 0
        cmd = [sys.executable, "-m", "krasis_tpu.server", "--model", model]
        for key, _, default, flag in SETTINGS:
            cmd += [flag, cfg.get(key, default)]
        print("launching:", " ".join(cmd))
        return subprocess.call(cmd)
    else:
        return main_plain(roots, saved)

    cmd = [sys.executable, "-m", "krasis_tpu.server", "--model", model]
    for key, _, default, flag in SETTINGS:
        cmd += [flag, cfg.get(key, default)]
    print("launching:", " ".join(cmd))
    return subprocess.call(cmd)


def main_plain(roots: List[str], saved: Dict[str, str]) -> int:
    """The original stdin-prompt flow (zero-dependency fallback)."""
    if True:  # keep the historical indentation of the flow below
        print_hardware(detect_hardware())
        models = scan_models(roots)
        if models:
            print("found models:")
            for i, m in enumerate(models):
                kind = "gguf" if m.endswith(".gguf") else "safetensors"
                print(f"  [{i}] ({kind}) {m}")
            sel = _ask("select model #", saved.get("model_idx", "0"))
            model = models[int(sel)]
        else:
            model = _ask("model path", saved.get("model", ""))
            if not model:
                print("no model found — pass --models-dir or a path")
                return 1
        try:
            cfg, launch = edit_loop(model, dict(saved))
        except KeyboardInterrupt:
            print("\naborted")
            return 1
        cfg["model"] = model
        save_config(cfg)
        if not launch:
            print(f"saved config to {CONFIG_PATH}")
            return 0

    cmd = [sys.executable, "-m", "krasis_tpu.server", "--model", model]
    for key, _, default, flag in SETTINGS:
        cmd += [flag, cfg.get(key, default)]
    print("launching:", " ".join(cmd))
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
