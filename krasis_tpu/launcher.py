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
    """Find checkpoint dirs (config.json + safetensors) under roots
    (reference launcher.py:225 scan_models)."""
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
    return sorted(found)


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


def show_budget(model_path: str, expert_bits: int):
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
    print(format_budget(cfg, QuantConfig(expert_bits=expert_bits), n, hbm))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models-dir", action="append", default=[])
    ap.add_argument("--non-interactive", action="store_true")
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
        bits = saved.get("expert_bits", "4")
        port = saved.get("port", str(args.port))
    else:
        models = scan_models(roots)
        if models:
            print("found models:")
            for i, m in enumerate(models):
                print(f"  [{i}] {m}")
            sel = _ask("select model #", saved.get("model_idx", "0"))
            model = models[int(sel)]
        else:
            model = _ask("model path", saved.get("model", ""))
            if not model:
                print("no model found — pass --models-dir or a path")
                return 1
        bits = _ask("expert bits (4/8)", saved.get("expert_bits", "4"))
        port = _ask("port", saved.get("port", str(args.port)))
        try:
            show_budget(model, int(bits))
        except Exception as e:
            print(f"(budget preview unavailable: {e})")
        if _ask("start server? (y/n)", "y").lower() != "y":
            save_config({"model": model, "expert_bits": bits, "port": port})
            print(f"saved config to {CONFIG_PATH}")
            return 0

    save_config({"model": model, "expert_bits": bits, "port": port})
    cmd = [
        sys.executable, "-m", "krasis_tpu.server",
        "--model", model, "--expert-bits", bits, "--port", port,
    ]
    print("launching:", " ".join(cmd))
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
