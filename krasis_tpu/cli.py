"""Unified CLI: `krasis-tpu <command>` (reference `krasis` entry parity).

Commands: serve, chat, bench, benchmark, ppl, budget, check, launch.
"""

from __future__ import annotations

import sys


COMMANDS = {
    "serve": "OpenAI-compatible HTTP server (krasis_tpu.server)",
    "chat": "terminal streaming chat client (krasis_tpu.chat)",
    "benchmark": "standardized benchmark protocol (krasis_tpu.benchmark)",
    "ppl": "perplexity through the production path (krasis_tpu.perplexity)",
    "budget": "HBM budget calculator from config.json",
    "check": "environment / device report",
    "launch": "interactive launcher",
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: krasis-tpu <command> [args]\n\ncommands:")
        for name, desc in COMMANDS.items():
            print(f"  {name:<10} {desc}")
        return 0
    cmd, rest = argv[0], argv[1:]
    sys.argv = [f"krasis-tpu {cmd}"] + rest

    if cmd == "serve":
        from . import server

        server.main()
    elif cmd == "chat":
        from . import chat

        return chat.main() or 0
    elif cmd == "benchmark":
        from . import benchmark

        benchmark.main()
    elif cmd == "ppl":
        from . import perplexity

        perplexity.main()
    elif cmd == "budget":
        import argparse

        from .budget import format_budget
        from .config import ModelConfig, QuantConfig, preset_config

        ap = argparse.ArgumentParser()
        ap.add_argument("model", help="checkpoint path or preset name")
        ap.add_argument("--expert-bits", type=int, default=4)
        ap.add_argument("--chips", type=int, default=1)
        ap.add_argument("--hbm-gb", type=float, default=16.0)
        a = ap.parse_args(rest)
        try:
            cfg = preset_config(a.model)
        except KeyError:
            cfg = ModelConfig.from_model_path(a.model)
        print(format_budget(cfg, QuantConfig(expert_bits=a.expert_bits),
                            a.chips, int(a.hbm_gb * (1 << 30))))
    elif cmd == "check":
        from .syscheck import run_startup_checks

        run_startup_checks()
    elif cmd == "launch":
        from .launcher import main as launch_main

        return launch_main() or 0
    else:
        print(f"unknown command '{cmd}' — run `krasis-tpu --help`")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
